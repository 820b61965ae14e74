"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., ...extras}

Extras reported: tile-assignments/sec for the render pipeline and the
pyramid point/tile volume (BASELINE.md target metrics).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run_bench(sf_dir: str, cpus: int, n_render_docs: int | None = None):
    from pyspark.sql import functions as F

    from gpx2tiles_spark.config import EngineConfig
    from gpx2tiles_spark.corpus import generate_documents
    from gpx2tiles_spark.plans.pipeline import render_pyramid
    from gpx2tiles_spark.queries import queries as registry
    from gpx2tiles_spark.session import get_spark

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # cpus*4 shuffle partitions: the rasterize fold pins this count
    # explicitly (row-cost-scaled Python stage — AQE's byte-based
    # coalescing would re-clump the hot-corridor tiles)
    spark = get_spark(app="bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(8, cpus * 4))
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    qs = registry()
    bench_queries = [
        "tile_assign_z12", "tile_counts_pyramid", "zoom_census",
        "pixel_positions_z16", "track_pairs", "clip_candidates",
        "knn_bucketed", "pip_rects", "sessionize", "dedup_exact",
        "minhash_lsh_pairs", "simhash16", "ngram_jaccard", "cosine_topk",
        "quality_scores", "language_id", "fingerprints", "token_counts",
    ]
    total0 = time.time()
    for name in bench_queries:
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    # headline: full tile-pyramid render on the deterministic corpus
    # (sized so the render is work-bound, not Spark-fixed-cost-bound)
    n_docs = n_render_docs or {"0.001": 96, "0.01": 768, "0.1": 4000}.get(sf, 768)
    cfg = EngineConfig(zoom_min=1, zoom_max=18)
    docs = generate_documents(spark, n_docs).persist()
    n_points = None
    t0 = time.time()
    from gpx2tiles_spark.operators.parse import parse_documents
    points = parse_documents(docs).persist()
    n_points = points.count()
    parse_sec = time.time() - t0
    timings["parse_documents"] = round(parse_sec, 3)

    t0 = time.time()
    from gpx2tiles_spark.operators.events import build_events
    from gpx2tiles_spark.operators.raster import rasterize
    tiles = rasterize(build_events(points, cfg), cfg)
    agg = tiles.agg(F.count("*").alias("tiles"),
                    F.sum("point_cnt").alias("assignments")).collect()[0]
    render_sec = time.time() - t0
    timings["render_pyramid_z1_18"] = round(render_sec, 3)
    points.unpersist()
    docs.unpersist()

    total = time.time() - total0
    n_assign = int(agg["assignments"])
    out = {
        "metric": "end-to-end headline query suite + tile-pyramid render",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": cpus,
        "render_docs": n_docs,
        "render_points": n_points,
        "render_tiles": int(agg["tiles"]),
        "tile_assignments": n_assign,
        "tile_assignments_per_sec": round(n_assign / render_sec, 1),
        "points_parsed_per_sec": round(n_points / parse_sec, 1),
    }
    spark.stop()
    return out


if __name__ == "__main__":
    # benches opt in to tmpfs shuffle spill (library default is disk)
    os.environ.setdefault("SPARK_GRAFT_TMPFS", "1")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    print(json.dumps(run_bench(sf_dir, cpus)))
