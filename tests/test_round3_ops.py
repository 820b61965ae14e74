"""Round-3 operator tests: hot-shingle df cap, skew-safe incremental
render, streaming windowed counts, and the -d diagnostic overlays."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from gpx2tiles_spark.operators import dedup


# ---------------------------------------------------------------------------
# ngram_jaccard hot-shingle guard (VERDICT r02 "What's wrong" #1)
# ---------------------------------------------------------------------------

def _shingle_df(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "shingle"]))


def test_ngram_hot_shingle_cap_bounds_candidates(spark):
    """1k docs sharing one boilerplate shingle must NOT emit the ~500k
    quadratic pairs: with the df cap the hot shingle is dropped from the
    join and only genuine (non-boilerplate) overlaps survive."""
    rows = [(i, "the boiler plate") for i in range(1000)]
    # two genuine near-dup pairs through rare shingles
    rows += [(1, "rare one two"), (2, "rare one two"),
             (3, "other rare sh"), (4, "other rare sh")]
    sh = _shingle_df(spark, rows)
    capped = dedup.ngram_jaccard_pairs(sh, max_id=10**9, max_df=100)
    got = {(r.doc_a, r.doc_b) for r in capped.collect()}
    assert got == {(1, 2), (3, 4)}  # boilerplate-only pairs are gone


def test_ngram_cap_inactive_below_threshold(spark):
    """Below the cap the guarded operator equals the unguarded one."""
    rows = [(i, f"sh{j}") for i in range(20) for j in range(i % 5 + 1)]
    sh = _shingle_df(spark, rows).distinct()
    a = dedup.ngram_jaccard_pairs(sh, max_id=100, max_df=10_000)
    b = dedup.ngram_jaccard_pairs(sh, max_id=100, max_df=None)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# ---------------------------------------------------------------------------
# Streaming windowed tile counts: watermark late-data semantics
# ---------------------------------------------------------------------------

def test_streaming_windowed_counts_late_data(spark, tmp_path):
    """Append-mode watermark semantics: an out-of-order event INSIDE the
    watermark lands in its (already-open) window; one arriving after the
    window finalized is dropped; each finalized window emits once."""
    import glob
    import os
    import shutil
    import time

    from gpx2tiles_spark.streaming.live import windowed_tile_counts

    src = tmp_path / "in"
    src.mkdir()

    def stage(i, times):
        df = spark.createDataFrame([(t, 48.0, 8.0) for t in times],
                                   "ts string, lat double, lon double") \
            .select(F.col("ts").cast("timestamp").alias("ts"), "lat", "lon")
        d = tmp_path / f"stage{i}"
        df.coalesce(1).write.mode("overwrite").parquet(str(d))
        shutil.move(glob.glob(str(d / "part-*.parquet"))[0],
                    str(src / f"{i:04d}.parquet"))
        time.sleep(1.1)

    # t0: two events in the 10:00 window + one advancing to 10:25
    stage(0, ["2024-01-01 10:00:00", "2024-01-01 10:05:00",
              "2024-01-01 10:25:00"])
    # t1: LATE 10:07 (watermark is 09:55 — inside) + advance to 11:30,
    #     which pushes the watermark to 11:00 and finalizes 10:00/10:20
    stage(1, ["2024-01-01 10:07:00", "2024-01-01 11:30:00"])
    # t2: watermark 11:00 effective → windows 10:00 and 10:20 emit now
    stage(2, ["2024-01-01 12:30:00"])
    # t3: very-late 10:08 — its window was finalized at t2 (watermark is
    #     12:00 now), so the row must be DROPPED, not re-aggregated
    stage(3, ["2024-01-01 10:08:00", "2024-01-01 13:30:00"])

    stream = (spark.readStream.schema("ts timestamp, lat double, lon double")
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    q = (windowed_tile_counts(stream, z=12, window="10 minutes",
                              watermark="30 minutes")
         .writeStream.format("memory").queryName("late_wc")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    rows = spark.table("late_wc").collect()
    by_window = {}
    for r in rows:
        key = r.window_start.strftime("%H:%M")
        by_window.setdefault(key, []).append(r.point_cnt)
    # 10:00 window: exactly one emission, late 10:07 in, 10:08 dropped
    assert by_window["10:00"] == [3]
    assert by_window["10:20"] == [1]
    dropped = sum(p["stateOperators"][0]["numRowsDroppedByWatermark"]
                  for p in q.recentProgress if p["stateOperators"])
    assert dropped == 1  # exactly the beyond-watermark 10:08 row


# ---------------------------------------------------------------------------
# Skew-safe incremental render (VERDICT r02 next #1)
# ---------------------------------------------------------------------------

def _tiles_map(df):
    return {(r.z, r.tx, r.ty): (r.point_cnt, bytes(r.png))
            for r in df.collect()}


def _batches(spark, n_docs, cfg):
    from gpx2tiles_spark.corpus import generate_documents
    from gpx2tiles_spark.operators.events import build_events
    from gpx2tiles_spark.operators.parse import parse_documents

    docs = generate_documents(spark, n_docs)
    pts = parse_documents(docs).persist()
    half = f"doc-{n_docs // 2:06x}"
    ev1 = build_events(pts.filter(F.col("doc_id") < half), cfg)
    ev2 = build_events(pts.filter(F.col("doc_id") >= half), cfg)
    return ev1, ev2


@pytest.mark.parametrize("heatmap", [False, True])
def test_incremental_overlay_equals_cogroup(spark, heatmap):
    """The skew-safe incremental path (fresh partition fold + overlay
    merge / hit-count chain continuation) must be byte-exact vs the
    sequential per-tile cogroup fold over the same store base."""
    from gpx2tiles_spark.config import EngineConfig
    from gpx2tiles_spark.operators.raster import (_rasterize_cogroup,
                                                  rasterize)

    cfg = EngineConfig(zoom_min=1, zoom_max=12, heatmap=heatmap)
    ev1, ev2 = _batches(spark, 16, cfg)
    store = rasterize(ev1, cfg).select("z", "tx", "ty", "point_cnt", "png") \
        .persist()
    store.count()
    got = _tiles_map(rasterize(ev2, cfg, store=store))
    want = _tiles_map(_rasterize_cogroup(ev2, cfg, store))
    assert set(got) == set(want)
    assert all(got[k] == want[k] for k in want)
    store.unpersist()


def test_incremental_hot_tile_is_salted(spark):
    """A hot tile in an incremental batch must go through the salted
    two-phase render (multiple partial canvases — not one task folding
    the whole tile) and still match the sequential cogroup fold."""
    from gpx2tiles_spark.config import EngineConfig
    from gpx2tiles_spark.operators.raster import (_rasterize_cogroup,
                                                  doc_salt_boundaries,
                                                  rasterize)

    cfg = EngineConfig(zoom_min=1, zoom_max=4, salt_buckets=4,
                       hot_tile_threshold=50, hot_detect_fraction=1.0)
    ev1, ev2 = _batches(spark, 16, cfg)
    # low zooms ⇒ z1 tiles hold hundreds of events > threshold 50
    low = ev2.filter(F.col("z") < 4)
    assert low.groupBy("z", "tx", "ty").count() \
        .filter(F.col("count") > 50).count() > 0, "fixture not hot"
    # the salted path splits hot tiles into >1 doc-range partials
    assert len(doc_salt_boundaries(low, 4)) >= 1
    store = rasterize(ev1, EngineConfig(zoom_min=1, zoom_max=4)) \
        .select("z", "tx", "ty", "point_cnt", "png").persist()
    store.count()
    got = _tiles_map(rasterize(ev2, cfg, store=store))
    want = _tiles_map(_rasterize_cogroup(ev2, cfg, store))
    assert got == want
    store.unpersist()


def test_incremental_pdop_zone_uses_base_canvas(spark):
    """z >= 17 events (PDOP alpha blends read the canvas) must fold over
    the store base — the whole-range cogroup is the semantic reference."""
    from gpx2tiles_spark.config import EngineConfig
    from gpx2tiles_spark.operators.raster import (_rasterize_cogroup,
                                                  rasterize)

    cfg = EngineConfig(zoom_min=16, zoom_max=18)
    ev1, ev2 = _batches(spark, 10, cfg)
    store = rasterize(ev1, cfg).select("z", "tx", "ty", "point_cnt", "png") \
        .persist()
    store.count()
    got = _tiles_map(rasterize(ev2, cfg, store=store))
    want = _tiles_map(_rasterize_cogroup(ev2, cfg, store))
    assert got == want
    store.unpersist()


def test_ngram_cap_keeps_true_denominators(spark):
    """Dropped hot shingles still count toward set SIZES (denominator):
    docs 1,2 share a rare shingle and both carry the boilerplate one —
    jaccard = 1 common / (2 + 2 - 1) sets of size 2."""
    rows = [(i, "the boiler plate") for i in range(300)]
    rows += [(1, "rare one two"), (2, "rare one two")]
    sh = _shingle_df(spark, rows)
    out = {(r.doc_a, r.doc_b): (r.n_common, r.jaccard_micro)
           for r in dedup.ngram_jaccard_pairs(sh, max_id=10**9, max_df=100).collect()}
    assert out[(1, 2)] == (1, 333_333)  # floor(1/3 * 1e6)
