"""Structured Streaming operators: watermarked windowed tile counts and
the applyInPandasWithState sessionizer (event-time replay == batch)."""

from __future__ import annotations

import glob
import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from gpx2tiles_spark.streaming.live import (sessionize_stateful,
                                            windowed_tile_counts)
from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_ORACLE}/events.parquet")


def _stream_dir(tmp_path, parts):
    """Write DataFrames as ordered single-file parquet arrivals."""
    d = str(tmp_path / "in")
    os.makedirs(d)
    for i, part in enumerate(parts):
        stage = str(tmp_path / f"stage{i}")
        part.coalesce(1).write.mode("overwrite").parquet(stage)
        src = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        shutil.move(src, os.path.join(d, f"{i:04d}.parquet"))
        time.sleep(1.1)  # distinct mod times → in-order pickup
    return d


def test_windowed_tile_counts_match_batch(spark, events, tmp_path):
    from gpx2tiles_spark import projection as P
    from gpx2tiles_spark.operators.geo import derived_points

    pts = derived_points(events).select(
        F.col("ts").cast("timestamp").alias("ts"), "lat", "lon")
    d = _stream_dir(tmp_path, [pts])
    stream = spark.readStream.schema(pts.schema).parquet(d)
    q = (windowed_tile_counts(stream, z=8, window="30 minutes",
                              watermark="1 hour")
         .writeStream.format("memory").queryName("wtc")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {(r.window_start, r.tx, r.ty): r.point_cnt
           for r in spark.table("wtc").collect()}
    want = {(r.ws, r.tx, r.ty): r.point_cnt for r in (
        pts.groupBy(F.window("ts", "30 minutes").alias("w"),
                    P.tilex_col(F.col("lon"), 8).alias("tx"),
                    P.tiley_col(F.col("lat"), 8).alias("ty"))
        .agg(F.count("*").alias("point_cnt"))
        .select(F.col("w.start").alias("ws"), "tx", "ty", "point_cnt")
        .collect())}
    # append mode emits only windows CLOSED by the final watermark; every
    # emitted window must match the batch computation exactly and most
    # windows must have closed
    assert got and len(got) >= len(want) * 0.5
    for k, v in got.items():
        assert want[k] == v, k


def test_stateful_sessionize_replay_equals_batch(spark, events, tmp_path):
    es = F.col("ts").cast("timestamp").cast("double")
    mid = events.select(F.percentile(es, F.lit(0.5))).collect()[0][0]
    d = _stream_dir(tmp_path,
                    [events.filter(es < mid), events.filter(es >= mid)])
    stream = (spark.readStream.schema(events.schema)
              .option("maxFilesPerTrigger", 1).parquet(d))
    q = (sessionize_stateful(stream, gap_minutes=30.0)
         .writeStream.format("memory").queryName("sess_t")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt2"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {r.user_id: (r.n_sessions, r.n_events) for r in (
        spark.table("sess_t").groupBy("user_id")
        .agg(F.max("n_sessions").alias("n_sessions"),
             F.max("n_events").alias("n_events")).collect())}
    from gpx2tiles_spark.operators.geo import sessionize
    want = {r.user_id: (r.n_sessions, r.n_events) for r in (
        sessionize(events, gap_minutes=30)
        .groupBy("user_id")
        .agg(F.max("session_id").cast("long").alias("n_sessions"),
             F.count("*").alias("n_events")).collect())}
    assert got == want
    # state genuinely crossed batches: users whose events straddle the
    # split must NOT have restarted their counters
    straddlers = (events.groupBy("user_id")
                  .agg(F.min(es).alias("lo"), F.max(es).alias("hi"))
                  .filter((F.col("lo") < mid) & (F.col("hi") >= mid)).count())
    assert straddlers > 0


def test_streaming_geofence_emits_cross_batch_transition(spark, tmp_path):
    """A region change whose two fixes land in DIFFERENT micro-batches
    must still be emitted exactly once (per-user last-region state
    carries across batches), and the converged emitted set must equal
    the batch geofence operator row-for-row."""
    import datetime as dt

    from gpx2tiles_spark.operators.geo import region_rects
    from gpx2tiles_spark.operators.trajectory import geofence_transitions
    from gpx2tiles_spark.streaming.live import geofence_stateful

    regions = spark.createDataFrame(
        [(k, f"R{k}") for k in range(5)], "r_regionkey long, r_name string")
    rects = region_rects(regions).select(
        "region_id", "lat_min", "lat_max", "lon_min", "lon_max")

    # batch 1 ends with user 1 INSIDE region 0; batch 2 starts with the
    # exit fix — the transition pair straddles the boundary.
    def mk(rows):
        data = [(p, u, dt.datetime.utcfromtimestamp(e), float(lo),
                 float(la), 0.0) for p, u, e, lo, la in rows]
        return spark.createDataFrame(
            data, "pid long, user_id long, ts timestamp, lon double, "
                  "lat double, kph double")

    b1 = [(1, 1, 100, 0.0, 80.0),      # outside
          (2, 1, 200, -169.0, -64.0)]  # region 0 -> enter (within batch 1)
    b2 = [(3, 1, 300, 0.0, 80.0),      # outside -> exit (CROSS-batch pair)
          (4, 1, 400, -105.0, -30.0)]  # region 1 -> enter
    d = _stream_dir(tmp_path, [mk(b1), mk(b2)])
    stream = (spark.readStream.schema(mk(b1).schema)
              .option("maxFilesPerTrigger", 1).parquet(d))
    q = (geofence_stateful(stream, rects)
         .writeStream.format("memory").queryName("geof_t")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckptg"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = sorted(map(tuple, spark.table("geof_t").collect()))
    want = sorted(map(tuple,
                      geofence_transitions(mk(b1 + b2), rects)
                      .select("user_id", "pid", "from_region", "to_region",
                              "kind").collect()))
    assert got == want
    assert (1, 3, 0, -1, "exit") in got  # the cross-batch pair
