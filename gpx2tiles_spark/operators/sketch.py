"""Deterministic HyperLogLog distinct-count sketch (m = 256 registers).

The "novel sketch" custom-operator category: a cardinality sketch whose
every step is reproducible across engines, so the estimate itself can
be hash-checked by the DuckDB oracle — something no builtin
`approx_count_distinct` offers (Spark's HLL++ and DuckDB's sketch use
different hashes and bias tables, making their estimates incomparable).

Determinism comes from three choices:

- md5 as the hash (identical hex in every engine — the repo-wide rule);
- register extraction by pure STRING ops on the hex digest (bucket =
  first 2 hex chars, leading-zero-bits of the next 60 bits via a
  regexp strip + one nibble CASE) — no float, no bit intrinsics;
- the register sum kept in EXACT integer arithmetic: each register
  contributes 2^(30-reg) (reg capped at 30), so the per-group sum is
  ≤ 256·2^30 = 2^38 — exactly representable in a double, which makes
  the final α·m²/S division bit-identical on both sides.

Scale story: registers are a groupBy-MAX — associative, commutative,
map-side combinable; the shuffle carries ≤ m rows per group no matter
how many input rows, and two corpora's sketches MERGE by the same
groupBy-MAX (pytest-proven).  This is the exact shape a 100 TB
distinct-census wants: no COUNT(DISTINCT) shuffle of the key universe.

Reference analogy: gpx2tiles' per-zoom census (print_zoom_stats,
gpx2tiles.c:771-812) walks every tile bucket to count tiles; this
estimates the same cardinality with 256 longs per zoom.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

M = 256                    # registers (b = 8 bucket bits)
MAX_REG = 30               # register cap → 2^(30-reg) stays integral
_POW2_30 = 1073741824      # 2^30, the reg=0 contribution

# α_m·m² for m=256, computed ONCE in Python and embedded as an exact
# repr-literal on both sides: DuckDB parses short float literals as
# DECIMAL, so writing the formula literal-op-literal in SQL would run
# in decimal arithmetic and diverge from Spark's doubles by an ulp.
ALPHA_M2 = (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0


def _zero_bits(sfx: Column) -> Column:
    """Leading-zero BITS of a 15-hex-char (60-bit) string, by stripping
    leading '0' nibbles and classifying the first surviving nibble —
    mirrors the oracle SQL character-for-character."""
    st = F.regexp_replace(sfx, "^0*", "")
    fc = F.substring(st, 1, 1)
    return F.when(st == F.lit(""), F.lit(60)).otherwise(
        (F.lit(15) - F.length(st)) * 4
        + F.when(fc == "1", 3)
           .when(fc.isin("2", "3"), 2)
           .when(fc.isin("4", "5", "6", "7"), 1)
           .otherwise(0))


def hll_registers(df: DataFrame, key: Column,
                  group_cols: list[str]) -> DataFrame:
    """→ (group_cols..., bucket, reg): the per-group register table.
    ≤ m rows per group; merge two register tables with the SAME
    groupBy-MAX this uses (associativity is what makes the sketch
    distributable and resumable)."""
    h = F.md5(key)
    reg = F.least(_zero_bits(F.substring(h, 3, 15)) + 1, F.lit(MAX_REG))
    return (df.select(*group_cols,
                      F.substring(h, 1, 2).alias("bucket"),
                      reg.alias("reg"))
            .groupBy(*group_cols, "bucket")
            .agg(F.max("reg").alias("reg")))


def hll_merge(a: DataFrame, b: DataFrame,
              group_cols: list[str]) -> DataFrame:
    """Union-merge two register tables (sketch of the union of inputs)."""
    return (a.unionByName(b)
            .groupBy(*group_cols, "bucket")
            .agg(F.max("reg").alias("reg")))


def hll_estimate(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Registers → (group_cols..., hll_micro): the HLL estimate in
    micro-units, with the standard linear-counting small-range
    correction.  Every float op mirrors the oracle SQL's op tree."""
    agg = regs.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), F.lit(MAX_REG) - F.col("reg"))
              .cast("long")).alias("sp"),
        F.count("*").alias("mp"))
    s_total = (F.col("sp")
               + (F.lit(M).cast("long") - F.col("mp")) * F.lit(_POW2_30))
    raw = F.lit(ALPHA_M2) / (s_total.cast("double") / F.lit(float(_POW2_30)))
    v = F.lit(M).cast("long") - F.col("mp")
    est = F.when((raw <= F.lit(2.5 * M)) & (v > 0),
                 F.lit(256.0) * F.log(F.lit(256.0) / v.cast("double"))
                 ).otherwise(raw)
    return agg.select(
        *group_cols,
        F.floor(est * F.lit(1000000.0)).cast("long").alias("hll_micro"))


def hll_zbits_sql(sfx: str) -> str:
    """The oracle-side twin of ``_zero_bits`` over a 15-hex-char expr."""
    st = f"regexp_replace({sfx}, '^0*', '')"
    return (f"CASE WHEN {st} = '' THEN 60 ELSE (15 - length({st})) * 4"
            f" + CASE WHEN substr({st}, 1, 1) = '1' THEN 3"
            f" WHEN substr({st}, 1, 1) IN ('2', '3') THEN 2"
            f" WHEN substr({st}, 1, 1) IN ('4', '5', '6', '7') THEN 1"
            f" ELSE 0 END END")
