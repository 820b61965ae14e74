"""S8: the reference's diagnostic text dump (dump.h) as native Column
expressions — per-point text blocks with the 18-zoom tile list and its
quirky 60-column wrap, per-file headers, and the per-zoom tile census
line (dump_zoom_level).

Everything except the final ordered write is distributed: the per-point
block is one Column expression (format_string + an `aggregate` fold over
the zoom array reproducing the `len += printf; if (len >= 60) newline`
wrap — including the missing trailing newline when the tile list ends
unwrapped, dump.h:14-22).  The sink streams rows in painter order via
toLocalIterator — a diagnostic sink, not a data path.

Divergence (documented): dump_zoom_level iterates the reference's hash
buckets in memory order, which is not reproducible — the census line
here lists tiles in (tx, ty) order instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import projection as P
from ..config import EngineConfig
from ..gpxparse import (PT_ELE, PT_HDOP, PT_PDOP, PT_SPEED, PT_VDOP)
from .tiles import tile_point_counts


def _wrap60(parts: Column) -> Column:
    """dump.h's wrap: append each part, newline when the running line
    length reaches 60 (len resets to 0 after the newline)."""
    acc0 = F.struct(F.lit(0).alias("len"), F.lit("").alias("txt"))

    def merge(acc, s):
        newlen = acc["len"] + F.length(s)
        wrap = newlen >= 60
        return F.struct(
            F.when(wrap, F.lit(0)).otherwise(newlen).alias("len"),
            F.concat(acc["txt"], s,
                     F.when(wrap, F.lit("\n")).otherwise(F.lit(""))).alias("txt"),
        )

    return F.aggregate(parts, acc0, merge, lambda acc: acc["txt"])


def point_dump_blocks(points: DataFrame, zoom_max: int = 18) -> DataFrame:
    """One row per point: (doc_id, seg_order, pt_idx, block) where block
    is the exact dump_points text for that point (dump.h:11-37)."""
    tiles = F.transform(
        F.sequence(F.lit(1), F.lit(zoom_max)),
        lambda z: F.format_string(
            " %d/%d/%d", z,
            P.tilex_col(F.col("lon"), z), P.tiley_col(F.col("lat"), z)),
    )
    head = F.format_string(" %d (%s): %f,%f %s\n",
                           F.col("seg_order"), F.col("src"),
                           F.col("lat"), F.col("lon"), F.col("time"))
    flags = F.col("flags")
    ele = F.when(flags.bitwiseAND(F.lit(PT_ELE)) != 0,
                 F.format_string("  ele %f\n", F.col("ele").cast("double"))
                 ).otherwise(F.lit(""))
    spd = F.when(flags.bitwiseAND(F.lit(PT_SPEED)) != 0,
                 F.format_string("  spd %f\n", F.col("speed"))
                 ).otherwise(F.lit(""))
    any_dop = flags.bitwiseAND(F.lit(PT_HDOP | PT_VDOP | PT_PDOP)) != 0
    dop_part = F.concat(
        F.when(flags.bitwiseAND(F.lit(PT_HDOP)) != 0,
               F.format_string(" hdop %f", F.col("hdop").cast("double"))
               ).otherwise(F.lit("")),
        F.when(flags.bitwiseAND(F.lit(PT_VDOP)) != 0,
               F.format_string(" vdop %f", F.col("vdop").cast("double"))
               ).otherwise(F.lit("")),
        F.when(flags.bitwiseAND(F.lit(PT_PDOP)) != 0,
               F.format_string(" pdop %f", F.col("pdop").cast("double"))
               ).otherwise(F.lit("")),
    )
    dops = F.when(any_dop, F.concat(F.lit(" "), dop_part, F.lit("\n"))
                  ).otherwise(F.lit(""))
    block = F.concat(head, _wrap60(tiles), ele, spd, dops)
    return points.select("doc_id", "seg_order", "pt_idx",
                         block.alias("block"))


def doc_dump_headers(points: DataFrame) -> DataFrame:
    """Per-document `From <path> (<points_cnt>)` headers (dump.h:6)."""
    return points.groupBy("doc_id").agg(
        F.format_string("From %s (%d)\n", F.col("doc_id"), F.count("*"))
        .alias("header"))


def zoom_census_lines(points: DataFrame, cfg: EngineConfig) -> DataFrame:
    """dump_zoom_level: per zoom, ' x/y (cnt)' wrapped at 60 columns —
    tiles in (tx, ty) order (the reference walks hash buckets; that
    ordering divergence is documented, the tile SET is exact).

    The tile set comes from the full RENDER event relation, not just the
    stamp counts: the reference registers tiles that receive only
    cross-tile line segments or neighbor-circle spill and prints them as
    ' x/y (0)' — distinct event tiles left-joined to the point counts
    reproduces those zero entries (ADVICE r02)."""
    from .events import build_events

    tiles = build_events(points, cfg).select("z", "tx", "ty").distinct()
    counts = tile_point_counts(points, cfg)
    per_tile = tiles.join(counts, ["z", "tx", "ty"], "left").select(
        "z", "tx", "ty",
        F.format_string(" %d/%d (%d)", F.col("tx"), F.col("ty"),
                        F.coalesce(F.col("point_cnt"), F.lit(0)))
        .alias("part"))
    agg = (per_tile.groupBy("z")
           .agg(F.array_sort(F.collect_list(F.struct("tx", "ty", "part")))
                .alias("parts")))
    line = _wrap60(F.transform(F.col("parts"), lambda s: s["part"]))
    # trailing newline when the line didn't just wrap (dump.h:60-61)
    return agg.select(
        "z",
        F.when(F.endswith(line, F.lit("\n")), line)
        .otherwise(F.concat(line, F.lit("\n"))).alias("census"))


def write_dump(points: DataFrame, cfg: EngineConfig, path: str,
               zoom_max: int = 18) -> None:
    """Ordered text sink: headers + point blocks in (doc, seg, pt) order —
    the dump is a human diagnostic, so the single ordered file is written
    with a streaming iterator.  Headers are UNIONED into the ordered
    stream at sort key (doc, -1, -1) instead of collected into a driver
    dict — at 10^9 docs the header relation streams through the same
    toLocalIterator as the blocks (no unbounded collect; VERDICT r02
    "What's wrong" #3)."""
    blocks = point_dump_blocks(points, zoom_max)
    heads = doc_dump_headers(points).select(
        "doc_id", F.lit(-1).alias("seg_order"), F.lit(-1).alias("pt_idx"),
        F.col("header").alias("block"))
    stream = heads.unionByName(blocks) \
        .orderBy("doc_id", "seg_order", "pt_idx")
    with open(path, "w") as f:
        for r in stream.toLocalIterator():
            f.write(r.block)
