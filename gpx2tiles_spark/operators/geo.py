"""Geo derivations over the driver testdata + point-in-polygon join.

``derived_points`` turns the `events` table into a deterministic GPS
point stream (pure integer/double arithmetic — bit-identical in any
engine, which the DuckDB oracle comparison requires).  The SQL text of
the same derivation lives in queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# lat in (-69.95, 69.95], lon in (-179.95, 179.95] — off tile boundaries
LON_EXPR = "(CAST(event_id % 3600 AS DOUBLE) / 10.0) - 179.95"
LAT_EXPR = "(CAST((event_id * 7 + user_id) % 1400 AS DOUBLE) / 10.0) - 69.95"
KPH_EXPR = "value"


def derived_points(events: DataFrame) -> DataFrame:
    return events.select(
        F.col("event_id").alias("pid"),
        F.col("user_id"),
        F.col("ts"),
        F.expr(LON_EXPR).alias("lon"),
        F.expr(LAT_EXPR).alias("lat"),
        F.col("value").alias("kph"),
    )


def region_rects(regions: DataFrame) -> DataFrame:
    """Deterministic lat/lon rectangle per region row (broadcast dim)."""
    k = F.col("r_regionkey").cast("double")
    return regions.select(
        F.col("r_regionkey").alias("region_id"),
        F.col("r_name").alias("region_name"),
        (k * 25.0 - 65.0).alias("lat_min"),
        (k * 25.0 - 40.0).alias("lat_max"),
        (k * 60.0 - 170.0).alias("lon_min"),
        (k * 60.0 - 115.0).alias("lon_max"),
    )


def points_in_rects(points: DataFrame, rects: DataFrame) -> DataFrame:
    """Point-in-polygon (axis-aligned rect) join: broadcast the dim side,
    containment as a theta-join predicate — Catalyst turns it into a
    BroadcastNestedLoopJoin; at 10^12 points the dim stays tiny so this
    is a map-side test with zero shuffle of the fact table."""
    p, r = points.alias("p"), rects.alias("r")
    return p.join(
        F.broadcast(r),
        (F.col("p.lat") >= F.col("r.lat_min")) & (F.col("p.lat") < F.col("r.lat_max"))
        & (F.col("p.lon") >= F.col("r.lon_min")) & (F.col("p.lon") < F.col("r.lon_max")),
        "inner",
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Sessionization: lag-gap cumsum per user (reference-free utility op)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    es = F.col("ts").cast("timestamp").cast("double")  # NTZ → epoch (UTC session)
    gap = es - F.lag(es).over(w)
    new_sess = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    df = events.withColumn("new_sess", new_sess)
    df = df.withColumn("session_id", F.sum("new_sess").over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
    return df
