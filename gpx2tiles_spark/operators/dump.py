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

Round 4 closes the census ORDER divergence: the reference's find_tile
is MOVE-TO-FRONT (gpx2tiles.c:199-217, every lookup moves the tile to
its bucket's head; alloc_tile pushes new tiles to the head, :256), so
the chain order dump_zoom_level prints is exactly `bucket asc,
last-access desc` — and the last access per tile is derivable from the
draw loop's lookup sequence (census_accesses below).  The census is
now byte-identical INCLUDING order, verified against an independent
imperative MTF simulator (tests/test_round4_ops.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
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


def census_accesses(points: DataFrame, cfg: EngineConfig) -> DataFrame:
    """One row per TILE LOOKUP of the reference's draw loop:
    (z, tx, ty, doc_id, seg_order, pt_idx, slot, k).

    The lookup sequence per point (draw_track_points,
    gpx2tiles.c:602-712), each lookup moving the tile to its bucket
    head (find_tile MTF / alloc_tile head push):

      slot 0 — the point's own tile (get_tile_at(&xy), :612);
      slot 1 — the PREVIOUS point's tile (get_tile_at(&pxy), :624) for
               every point but the first of its chain — chains are per
               track segment, and ONE chain for the whole wpt list
               (make_tiles :729,:734; wpts only at z > z_no_wpts);
               this access happens BEFORE any line gate;
      slot 2 — waypoint circle neighbor-rect tiles (draw_point_circle
               :587), x inner / y outer (next_neigh_tile :559-577);
      slot 3 — cross-tile line candidates that satisfy the crossing
               predicate (:675-703), x outer stepping from the prev
               tile toward the current, y inner — skipped when the
               NO_LINES flag (z < z_no_lines, or heatmap mode) or the
               slow-segment gate fires, or the segment is same-tile.

    (doc_id, seg_order, pt_idx, slot, k) sorts in exact draw order:
    wpt rows carry seg_order 2^20, after every real segment."""
    from .events import (circle_rect_bounds, crossing_tile_col,
                         paired_points, with_pair_tiles)
    from .tiles import with_pixel
    from ..config import TILE_H, TILE_W

    key = ["doc_id", "seg_order", "pt_idx"]
    out_cols = ["z", "tx", "ty", *key, "slot", "k"]

    trk = with_pair_tiles(
        paired_points(points.filter(F.col("kind") == "trkpt")), cfg)
    wpt = with_pair_tiles(
        paired_points(points.filter(F.col("kind") == "wpt")), cfg) \
        .filter(F.col("z") > F.lit(cfg.z_no_wpts))
    both = trk.unionByName(wpt)

    own = both.select("z", "tx", "ty", *key,
                      F.lit(0).alias("slot"), F.lit(0).alias("k"))
    prev = both.filter(F.col("prev_lat").isNotNull()).select(
        "z", F.col("p_tx").alias("tx"), F.col("p_ty").alias("ty"), *key,
        F.lit(1).alias("slot"), F.lit(0).alias("k"))

    # slot 2: circle rect (x inner, y outer), wpts only — the SAME
    # shared bounds the circle event builder uses (circle_rect_bounds)
    wp = circle_rect_bounds(with_pixel(wpt), cfg.point_circle_diameter)
    circles = (wp.withColumn("cx", F.explode(F.sequence(F.col("lt_x"), F.col("rb_x"))))
               .withColumn("cy", F.explode(F.sequence(F.col("lt_y"), F.col("rb_y"))))
               .select("z", F.col("cx").alias("tx"), F.col("cy").alias("ty"),
                       *key, F.lit(2).alias("slot"),
                       ((F.col("cy") - F.col("lt_y"))
                        * (F.col("rb_x") - F.col("lt_x") + 1)
                        + (F.col("cx") - F.col("lt_x"))).alias("k")))

    # slot 3: crossing candidates (gates exactly as build_events)
    can_line = (
        F.lit(not cfg.heatmap)
        & F.col("prev_lat").isNotNull()
        & (F.col("z") >= F.lit(cfg.z_no_lines))
        & ~((F.col("flags").bitwiseAND(F.lit(8)) != 0)
            & (F.col("speed") * F.lit(3.6) < F.lit(cfg.no_lines_speed_kph)))
    )
    not_same = (F.col("tx") != F.col("p_tx")) | (F.col("ty") != F.col("p_ty"))
    cr = with_pixel(with_pixel(trk.filter(can_line & not_same)),
                    lat="prev_lat", lon="prev_lon", prefix="p_")
    cr = (cr.withColumn("cx", F.explode(F.sequence(F.col("p_tx"), F.col("tx"))))
            .withColumn("cy", F.explode(F.sequence(F.col("p_ty"), F.col("ty"))))
            .withColumn("lx1", F.col("p_px") - F.lit(TILE_W) * (F.col("cx") - F.col("p_tx")))
            .withColumn("ly1", F.col("p_py") - F.lit(TILE_H) * (F.col("cy") - F.col("p_ty")))
            .withColumn("lx2", F.col("px") - F.lit(TILE_W) * (F.col("cx") - F.col("tx")))
            .withColumn("ly2", F.col("py") - F.lit(TILE_H) * (F.col("cy") - F.col("ty")))
            .filter(crossing_tile_col(F.col("lx1"), F.col("ly1"),
                                      F.col("lx2"), F.col("ly2"))))
    crossing = cr.select(
        "z", F.col("cx").alias("tx"), F.col("cy").alias("ty"), *key,
        F.lit(3).alias("slot"),
        (F.abs(F.col("cx") - F.col("p_tx"))
         * (F.abs(F.col("ty") - F.col("p_ty")) + 1)
         + F.abs(F.col("cy") - F.col("p_ty"))).alias("k"))

    return (own.select(*out_cols)
            .unionByName(prev.select(*out_cols))
            .unionByName(circles.select(*out_cols))
            .unionByName(crossing.select(*out_cols)))


def census_ordered_tiles(points: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Per (z, tile): point_cnt + the reference's PRINT position —
    (z, tx, ty, point_cnt, bucket, pos) with pos = row_number over
    (bucket asc, last-access desc), matching dump_zoom_level's walk of
    the 256 hash buckets (hash_xy = ((y << 3) | (x & 7)) % 256,
    gpx2tiles.c:194-197) with MTF chains."""
    acc = census_accesses(points, cfg)
    last = acc.groupBy("z", "tx", "ty").agg(
        F.max(F.struct("doc_id", "seg_order", "pt_idx", "slot", "k"))
        .alias("last"))
    counts = tile_point_counts(points, cfg)
    per_tile = last.join(counts, ["z", "tx", "ty"], "left").select(
        "z", "tx", "ty", "last",
        F.coalesce(F.col("point_cnt"), F.lit(0)).alias("point_cnt"),
        (F.shiftleft(F.col("ty").cast("long"), 3)
         .bitwiseOR(F.col("tx").cast("long").bitwiseAND(F.lit(7)))
         % 256).cast("int").alias("bucket"))
    w = Window.partitionBy("z").orderBy(F.asc("bucket"), F.desc("last"))
    return per_tile.select("z", "tx", "ty", "point_cnt", "bucket",
                           F.row_number().over(w).alias("pos"))


def zoom_census_lines(points: DataFrame, cfg: EngineConfig) -> DataFrame:
    """dump_zoom_level: per zoom, ' x/y (cnt)' wrapped at 60 columns, in
    the reference's EXACT print order (bucket walk + MTF chain order —
    census_ordered_tiles).

    The tile set comes from the full access relation, not just the
    stamp counts: the reference registers tiles that receive only
    cross-tile line segments or neighbor-circle spill and prints them
    as ' x/y (0)' (ADVICE r02)."""
    per_tile = census_ordered_tiles(points, cfg).select(
        "z", "pos",
        F.format_string(" %d/%d (%d)", F.col("tx"), F.col("ty"),
                        F.col("point_cnt")).alias("part"))
    agg = (per_tile.groupBy("z")
           .agg(F.array_sort(F.collect_list(F.struct("pos", "part")))
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
