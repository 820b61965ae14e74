"""Per-query isolation bench + plan capture for the optimization round
(guide §1.4: noop sink so we time the computation, not the sink; §1.5:
jobs labelled).  Does NOT replace bench.py — the driver times that.

Usage:
  python bench_extra.py [--sf SF_DIR] [--attempts N] [--plans DIR] [--tag TAG] [query ...]

Prints one JSON line per query: {"query": ..., "samples": [...], "best": ...}
and, with --plans, writes DIR/<query>_<tag>.txt containing
df.explain("formatted") output.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_QUERIES = [
    "clip_candidates", "minhash_lsh_pairs", "fingerprints", "simhash16",
    "knn_bucketed", "zoom_census", "hll_zoom_census", "pmi_bigrams",
    "store_diff", "track_hausdorff", "dbscan_clusters", "map_match_segments",
    "track_simplify_dp", "tfidf_topterms",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--attempts", type=int, default=2)
    ap.add_argument("--plans", default=None,
                    help="directory for explain('formatted') dumps")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_TMPFS", "1")
    from gpx2tiles_spark.queries import queries as registry
    from gpx2tiles_spark.session import get_spark

    spark = get_spark(app="bench_extra", master=f"local[{args.cpus}]",
                      shuffle_partitions=max(8, args.cpus * 4))
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry()
    names = args.queries or DEFAULT_QUERIES

    # warm-up (same as bench.py): JVM codegen + Python worker pool
    qs["token_counts"](spark, args.sf).write.format("noop") \
        .mode("overwrite").save()

    for name in names:
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = qs[name](spark, args.sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(args.plans, f"{name}_{args.tag}.txt"),
                      "w") as f:
                f.write(buf.getvalue())
        samples = []
        for _ in range(args.attempts):
            spark.sparkContext.setJobDescription(f"{name} [{args.tag}]")
            t0 = time.time()
            qs[name](spark, args.sf).write.format("noop") \
                .mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        print(json.dumps({"query": name, "sf": args.sf, "samples": samples,
                          "best": min(samples) if samples else None}),
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
