"""One-time generator for the committed golden parquet snapshots that
back the `parse_points` and `multimodal_features` oracles.

The corpus generator (gpx2tiles_spark.corpus) is deterministic per
doc_id, so these snapshots are stable across machines; regenerate ONLY
when the corpus or the parse/decoder semantics intentionally change —
the whole point of a golden oracle is that *unintentional* drift turns
the driver's CORRECTNESS row red.

Writes one single-file parquet per driver scale factor
(n = 12 / 40 / 120 docs — queries._sf_n_docs) into tests/golden/.

Usage: python tools/make_golden.py
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _write_single(df, dest: str) -> None:
    tmp = tempfile.mkdtemp(prefix="golden_")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    shutil.move(part, dest)
    shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    from gpx2tiles_spark.corpus import generate_documents
    from gpx2tiles_spark.operators.parse import parse_documents
    from gpx2tiles_spark.queries import (_GOLDEN_DIR, multimodal_comparable,
                                         parse_points_comparable)
    from gpx2tiles_spark.session import get_spark

    spark = get_spark(app="make_golden", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    # n=1200 is the synthesized sf1 decade (tools/bench_sf1.py)
    scales = ((12, "/root/testdata/sf0.001"), (40, "/root/testdata/sf0.01"),
              (120, "/root/testdata/sf0.1"),
              (1200, os.path.join(os.path.dirname(os.path.dirname(
                  os.path.abspath(__file__))), ".bench_sf1")))
    only = {int(a) for a in sys.argv[1:]} or None
    for n, sf_dir in scales:
        if only and n not in only:
            continue
        docs = generate_documents(spark, n)
        pts = parse_points_comparable(parse_documents(docs))
        _write_single(pts, os.path.join(_GOLDEN_DIR, f"parse_points_n{n}.parquet"))
        mm = multimodal_comparable(spark, sf_dir)
        _write_single(mm, os.path.join(
            _GOLDEN_DIR, f"multimodal_features_n{n}.parquet"))
        print(f"n={n}: parse rows={pts.count()}, media rows={mm.count()}")
    spark.stop()


if __name__ == "__main__":
    main()
