"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The implementations live in ``gpx2tiles_spark.queries`` (a registry of
(Spark builder, DuckDB oracle SQL) pairs covering SURVEY.md §2).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: tile-pyramid point counts + hierarchical cell ids over the
    GPS point stream derived from sf0.001 events (A1/R5/K1-K2 end-to-end)."""
    from pyspark.sql import functions as F

    from gpx2tiles_spark import projection as P
    from gpx2tiles_spark.operators.geo import derived_points

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    pts = derived_points(events).withColumn(
        "z", F.explode(F.sequence(F.lit(1), F.lit(12))))
    tx = P.tilex_col(F.col("lon"), F.col("z"))
    ty = P.tiley_col(F.col("lat"), F.col("z"))
    return (
        pts.select("z", tx.alias("tx"), ty.alias("ty"))
        .groupBy("z", "tx", "ty")
        .agg(F.count("*").alias("point_cnt"))
        .withColumn("cell", P.quadkey_col(F.col("tx"), F.col("ty"), 12))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from gpx2tiles_spark.queries import queries as q
    return q()


def oracle_sql() -> dict[str, str]:
    from gpx2tiles_spark.queries import oracle_sql as o
    return o()
