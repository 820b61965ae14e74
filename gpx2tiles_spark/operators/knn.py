"""kNN track-point lookup (J4, mandated by the north rule).

Two physical strategies over the same logical op:

- ``knn_bruteforce`` — broadcast the (small) query set, cross join, rank.
  O(|Q|·|P|) but shuffle-free on the big side (queries broadcast); the
  correctness baseline.
- ``knn_bucketed`` — the scale path: bucket both sides by Mercator tile
  cell at a coarse zoom, explode each query to its 3×3 cell neighborhood,
  equi-join on the cell, then rank.  Turns the cross join into a bounded
  equi-join; correct whenever the k-th neighbor lies within the
  neighborhood (cell size ≫ k-NN radius — asserted against brute force
  in tests).

Distance is planar squared degrees with deterministic (dist2, id)
tie-break — chosen because it is bit-reproducible across engines (pure
*, +) which the DuckDB oracle comparison requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import projection as P


def _ranked(joined: DataFrame, k: int, salt_mod: int = 64) -> DataFrame:
    d2 = (
        (F.col("lat") - F.col("qlat")) * (F.col("lat") - F.col("qlat"))
        + (F.col("lon") - F.col("qlon")) * (F.col("lon") - F.col("qlon"))
    ).alias("dist2")
    base = joined.select("qid", "pid", "lat", "lon", "qlat", "qlon", d2)
    # two-stage top-k: the query set is tiny, so a single window over
    # qid funnels EVERY candidate row into |Q| tasks (the 199/200-tasks
    # skew shape — guide §2.5).  Stage 1 takes the per-(qid, salt) top-k
    # over a deterministic pid salt (|Q|·salt_mod keys spread across the
    # cluster), which provably contains the global top-k — a row with
    # global rank g <= k has salt-local rank <= g; stage 2 ranks the
    # <= |Q|·salt_mod·k survivors exactly.  Same (dist2, pid) total
    # order both stages, so the final ranks are identical.
    w1 = Window.partitionBy("qid", "_salt").orderBy("dist2", "pid")
    pre = (base.withColumn("_salt", F.pmod(F.col("pid"), F.lit(salt_mod)))
           .withColumn("_r1", F.row_number().over(w1))
           .filter(F.col("_r1") <= k).drop("_salt", "_r1"))
    w = Window.partitionBy("qid").orderBy("dist2", "pid")
    return (
        pre.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def knn_bruteforce(points: DataFrame, queries: DataFrame, k: int) -> DataFrame:
    """points(pid,lat,lon) × queries(qid,qlat,qlon) → top-k per query."""
    return _ranked(points.crossJoin(F.broadcast(queries)), k)


def knn_bucketed(points: DataFrame, queries: DataFrame, k: int,
                 z: int = 2) -> DataFrame:
    """Cell-bucketed kNN: equi-join on the query's 3×3 cell neighborhood."""
    pts = points.withColumn(
        "cell", P.tilex_col(F.col("lon"), z) + P.tiley_col(F.col("lat"), z) * F.lit(1 << z)
    )
    n = 1 << z
    neigh = queries.select(
        "qid", "qlat", "qlon",
        P.tilex_col(F.col("qlon"), z).alias("qtx"),
        P.tiley_col(F.col("qlat"), z).alias("qty"),
    ).withColumn("dx", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)]))) \
     .withColumn("dy", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)]))) \
     .select(
        "qid", "qlat", "qlon",
        # wrap x (antimeridian), clamp y
        (((F.col("qtx") + F.col("dx")) + n) % n
         + F.least(F.greatest(F.col("qty") + F.col("dy"), F.lit(0)), F.lit(n - 1)) * n
         ).alias("cell"),
    ).dropDuplicates(["qid", "cell"])
    return _ranked(pts.join(F.broadcast(neigh), "cell"), k)
