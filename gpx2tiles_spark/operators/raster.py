"""Per-tile rasterization: sorted event fold → 256×256 RGBA → PNG bytes.

A4, the "render aggregate" (SURVEY.md §2.4): an order-sensitive fold of
draw events into a canvas, executed as a grouped-map pandas UDF over
``groupBy(z, tx, ty)`` — one shuffle keyed by tile, then each tile is
rendered exactly once (the reference's open/evict/reload dance,
gpx2tiles.c:277-381, disappears).

Incremental mode (S5/J3) uses ``cogroup``: the new events of a tile meet
the tile's existing PNG from the store without duplicating the blob onto
every event row.

Heatmap mode is a faithful sequential fold (intensify reads canvas
state — gpx2tiles.c:627-636); speed mode batches consecutive stamp runs
vectorized (last-writer-wins preserved by numpy assignment order).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import draw
from ..colors import intensify
from ..config import HEATMAP_BASE_COLOR, PDOP_ALPHA, EngineConfig
from ..pngcodec import blank_tile, decode_png, encode_png
from .events import ET_CIRCLE, ET_LINE, ET_PDOP, ET_STAMP, ET_TEXT

TILES_SCHEMA = T.StructType([
    T.StructField("z", T.IntegerType(), False),
    T.StructField("tx", T.IntegerType(), False),
    T.StructField("ty", T.IntegerType(), False),
    T.StructField("point_cnt", T.LongType(), False),
    T.StructField("n_events", T.LongType(), False),
    T.StructField("n_docs", T.LongType(), False),
    T.StructField("png", T.BinaryType(), False),
])


def _base_canvas(cfg: EngineConfig) -> np.ndarray:
    """Canvas for a tile with no store base.  With -d1 (diag_shadows) a
    freshly CREATED tile gets the two SHADOW edge lines before any
    drawing (open_tile, gpx2tiles.c:301-304) — drawn at gd's default
    thickness 1 (gdImageSetThickness runs after them, c:308)."""
    canvas = blank_tile()
    if cfg.diag_shadows:
        from ..config import SHADOW_COLOR, TILE_H, TILE_W
        draw.draw_line(canvas, 0, TILE_H - 1, TILE_W - 1, TILE_H - 1,
                       SHADOW_COLOR)
        draw.draw_line(canvas, TILE_W - 1, 0, TILE_W - 1, TILE_H - 1,
                       SHADOW_COLOR)
    return canvas


def _fold_tile(pdf: pd.DataFrame, cfg: EngineConfig,
               base: np.ndarray | None) -> tuple[np.ndarray, int]:
    """Fold one tile's events (already sorted) into a canvas (pandas
    adapter over :func:`_fold_arrays` — used by the cogroup/salted paths)."""
    cols = {c: pdf[c].to_numpy() for c in ("z", "etype", "x1", "y1", "x2",
                                           "y2", "color")}
    return _fold_arrays(cols, 0, len(pdf), cfg, base)


def _fold_opaque(canvas: np.ndarray, et, x1, y1, x2, y2, color,
                 thick: int) -> None:
    """Vectorized fold of OPAQUE events (stamp/line/circle): compute every
    event's pixel list in batch (stamps = 1 px, lines = batched gd
    Bresenham, circles = gd midpoint spans), tag each pixel with its event
    index, stable-sort by it, and make ONE ordered fancy assignment —
    numpy assigns duplicate indices in array order, so last-writer-wins
    equals the sequential fold."""
    segs: list[tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]] = []

    stamp_m = et == ET_STAMP
    if stamp_m.any():
        idx = np.flatnonzero(stamp_m)
        segs.append((x1[idx], y1[idx], color[idx], idx))

    line_m = et == ET_LINE
    if line_m.any():
        idx = np.flatnonzero(line_m)
        h, w = canvas.shape[:2]
        # gd clip + endpoint swap + wid brush all inside the batch
        xs, ys, reps = draw.lines_points_batch(
            x1[idx], y1[idx], x2[idx], y2[idx], thick, w, h)
        lc = np.repeat(color[idx], reps)
        eidx = np.repeat(idx, reps)
        segs.append((xs, ys, lc, eidx))

    circ_m = et == ET_CIRCLE
    if circ_m.any():
        for i in np.flatnonzero(circ_m):
            cxs, cys = draw.ellipse_pixels(int(x1[i]), int(y1[i]),
                                           int(x2[i]), int(x2[i]))
            segs.append((cxs, cys,
                         np.full(len(cxs), color[i], np.int64),
                         np.full(len(cxs), i, np.int64)))

    text_m = et == ET_TEXT
    if text_m.any():
        # -d4 speed text: ≤1 per tile (string + underline + pointer)
        for i in np.flatnonzero(text_m):
            txs, tys = draw.speed_text_points(int(x2[i]), int(x1[i]),
                                              int(y1[i]), thick)
            segs.append((txs, tys,
                         np.full(len(txs), color[i], np.int64),
                         np.full(len(txs), i, np.int64)))

    if segs:
        xs = np.concatenate([s[0] for s in segs])
        ys = np.concatenate([s[1] for s in segs])
        cs = np.concatenate([s[2] for s in segs])
        eidx = np.concatenate([s[3] for s in segs])
        order = np.argsort(eidx, kind="stable")
        draw.stamp_pixels(canvas, xs[order], ys[order], cs[order])


def _fold_arrays(cols: dict, s: int, e: int, cfg: EngineConfig,
                 base: np.ndarray | None) -> tuple[np.ndarray, int]:
    """Numpy-only event fold over cols[s:e] — no pandas in the loop."""
    canvas = base if base is not None else _base_canvas(cfg)
    z = int(cols["z"][s])
    thick = max(1, cfg.thickness.get(z, 0))
    et = cols["etype"][s:e]
    x1 = cols["x1"][s:e]
    y1 = cols["y1"][s:e]
    x2 = cols["x2"][s:e]
    y2 = cols["y2"][s:e]
    color = cols["color"][s:e]
    n = e - s

    if not cfg.heatmap:
        # PDOP ellipses alpha-blend (read canvas state), so the vectorized
        # opaque fold runs in segments between them; PDOP events are rare
        # (z >= 17 & pdop > 1.8), so the common case is one full-range call
        pdop_idx = np.flatnonzero(et == ET_PDOP)
        prev = 0
        for pi in pdop_idx:
            if pi > prev:
                _fold_opaque(canvas, et[prev:pi], x1[prev:pi], y1[prev:pi],
                             x2[prev:pi], y2[prev:pi], color[prev:pi], thick)
            draw.blend_ellipse_outline(canvas, int(x1[pi]), int(y1[pi]),
                                       int(x2[pi]), int(color[pi]), PDOP_ALPHA)
            prev = pi + 1
        if prev < n:
            _fold_opaque(canvas, et[prev:n], x1[prev:n], y1[prev:n],
                         x2[prev:n], y2[prev:n], color[prev:n], thick)
    else:
        # heatmap mode: stamps (+ wpt circles at z > z_no_wpts, + PDOP at
        # z >= 17) — NEVER lines (z_no_lines == INT_MAX, gpx2tiles.c:976)
        big = z >= cfg.z_heatmap_bigdots
        h, w = canvas.shape[:2]
        if (not big and base is None and not cfg.diag_shadows
                and (et == ET_STAMP).all()):
            # pure single-pixel stamp tile: the sequential
            # read→intensify→write chain per pixel is a function of the
            # hit count alone — count hits and colorize once (the
            # commutative reformulation; byte-exact vs the loop)
            _heat_count_paint(canvas, x1, y1)
        else:
            cur_color = HEATMAP_BASE_COLOR
            for i in range(n):
                if et[i] == ET_STAMP:
                    xx, yy = int(x1[i]), int(y1[i])
                    if not (0 <= xx < w and 0 <= yy < h):
                        # gd's out-of-range read returns 0 → base color
                        cur_color = HEATMAP_BASE_COLOR
                    else:
                        px = canvas[yy, xx]
                        # gd returns 0 for never-touched truecolor pixels;
                        # our alpha==0 marker plays that role (c:628-629)
                        if px[3] == 0:
                            cur_color = HEATMAP_BASE_COLOR
                        else:
                            packed = (int(px[0]) << 16) | (int(px[1]) << 8) | int(px[2])
                            cur_color = int(intensify(np.array([packed]))[0])
                    if big:
                        draw.fill_rect(canvas, xx - 1, yy - 1, xx + 1, yy + 1,
                                       cur_color)
                    else:
                        draw.set_pixel(canvas, xx, yy, cur_color)
                elif et[i] == ET_PDOP:
                    # PDOP uses the running heat color (sentinel -1,
                    # c:660); -d1 shadow events carry SHADOW explicitly
                    c = int(color[i])
                    draw.blend_ellipse_outline(canvas, int(x1[i]), int(y1[i]),
                                               int(x2[i]),
                                               c if c >= 0 else cur_color,
                                               PDOP_ALPHA)
                elif et[i] == ET_TEXT:
                    # -d4 speed text draws opaquely in heatmap mode too
                    txs, tys = draw.speed_text_points(int(x2[i]), int(x1[i]),
                                                      int(y1[i]), thick)
                    draw.stamp_pixels(canvas, txs, tys,
                                      np.full(len(txs), color[i], np.int64))
                else:  # ET_CIRCLE
                    draw.fill_ellipse(canvas, int(x1[i]), int(y1[i]),
                                      int(x2[i]), int(x2[i]), int(color[i]))
    point_cnt = int((et == ET_STAMP).sum())
    return canvas, point_cnt


_HEAT_CHAIN: np.ndarray | None = None


def _heat_chain() -> np.ndarray:
    """intensify^k(heatmapclr) until its fixed point (18 steps for the
    default 0x061A5B): the color a pixel shows after k+1 hits."""
    global _HEAT_CHAIN
    if _HEAT_CHAIN is None:
        vals = [HEATMAP_BASE_COLOR]
        while True:
            nxt = int(intensify(np.array([vals[-1]]))[0])
            if nxt == vals[-1]:
                break
            vals.append(nxt)
        _HEAT_CHAIN = np.asarray(vals, np.int64)
    return _HEAT_CHAIN


def _heat_count_paint(canvas: np.ndarray, xs: np.ndarray, ys: np.ndarray) -> None:
    """Hit-count heatmap colorize: per-pixel hits → chain[min(hits-1, sat)].
    Commutes across any event split, so salted/partitioned heatmap folds
    merge by ADDING counts — the scale path for hot low-zoom tiles."""
    h, w = canvas.shape[:2]
    m = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
    if not m.any():
        return
    key = ys[m].astype(np.int64) * w + xs[m].astype(np.int64)
    uniq, counts = np.unique(key, return_counts=True)
    chain = _heat_chain()
    colors = chain[np.minimum(counts - 1, len(chain) - 1)]
    draw.stamp_pixels(canvas, uniq % w, uniq // w, colors)


def _sort_events(pdf: pd.DataFrame) -> pd.DataFrame:
    # the reference's draw order: file → segment → point → stamp/circle/line
    return pdf.sort_values(["doc_id", "seg_order", "pt_idx", "etype"],
                           kind="stable")


def _canvas_read_z(cfg: EngineConfig) -> int:
    """First zoom at which a draw op can READ canvas state (PDOP alpha
    blends at z >= 17 in speed mode; the sequential heatmap zone —
    bigdots / circles / PDOP — in heatmap mode).  Below it every draw is
    an opaque write, so partial canvases compose by overlay."""
    from ..config import PDOP_MIN_Z
    if cfg.heatmap:
        return min(cfg.z_heatmap_bigdots, cfg.z_no_wpts + 1, PDOP_MIN_Z)
    return PDOP_MIN_Z


def rasterize(events: DataFrame, cfg: EngineConfig,
              store: DataFrame | None = None) -> DataFrame:
    """events (+ optional existing tile store (z,tx,ty,png)) → tiles.

    Both fresh and incremental renders split at :func:`_canvas_read_z`:

    - below it (where urban-corridor skew lives — low zoom = few huge
      tiles) draws never read the canvas, so the render is the skew-safe
      partition-sliced fold (salted two-phase for hot tiles when
      ``cfg.salt_buckets > 0``) in speed mode, or the relational
      per-pixel hit-count aggregate in heatmap mode; with a store, the
      batch result then overlay-merges onto the base tile (one join row
      per touched tile — byte-exact because every op is an opaque
      write, and no single task ever folds a whole hot tile);
    - at or above it (tiles are geometrically small) the sequential
      canvas-reading fold runs per tile, over the store base when given.
    """
    # -d1 shadows alpha-blend an ellipse on EVERY point (reads canvas at
    # every zoom) and -d4 text breaks the heatmap pure-stamp premise —
    # diagnostics force the sequential fold paths (the reference itself
    # is single-threaded; diagnostics are not the 100 TB path)
    diag_sequential = cfg.diag_shadows or (cfg.heatmap and cfg.diag_speed_text)
    if store is None:
        if diag_sequential:
            return _rasterize_partitions(events, cfg)
        if cfg.heatmap:
            pure_z = _canvas_read_z(cfg)
            low = events.filter(F.col("z") < F.lit(pure_z))
            high = events.filter(F.col("z") >= F.lit(pure_z))
            return _rasterize_heatmap_counts(low, cfg).unionByName(
                _rasterize_partitions(high, cfg))
        if cfg.salt_buckets > 0:
            return rasterize_salted(events, cfg)
        return _rasterize_partitions(events, cfg)

    if diag_sequential:
        return _rasterize_cogroup(events, cfg, store)
    split = _canvas_read_z(cfg)
    zooms = cfg.zooms()
    # static branch pruning: don't put an (empty-by-construction) branch
    # into the plan when the configured zoom range sits entirely on one
    # side of the canvas-reading split
    if max(zooms) < split:
        return _incremental_low(events, cfg, store)
    if min(zooms) >= split:
        return _rasterize_cogroup(events, cfg, store)
    zcol = F.col("z")
    high = _rasterize_cogroup(events.filter(zcol >= F.lit(split)), cfg,
                              store.filter(zcol >= F.lit(split)))
    low = _incremental_low(events.filter(zcol < F.lit(split)), cfg,
                           store.filter(zcol < F.lit(split)))
    return low.unionByName(high)


def _incremental_low(events: DataFrame, cfg: EngineConfig,
                     store: DataFrame) -> DataFrame:
    """Skew-safe incremental render for the opaque-draw zoom zone."""
    if cfg.heatmap:
        return _heatmap_counts_incremental(events, cfg, store)
    if cfg.salt_buckets > 0:
        fresh = rasterize_salted(events, cfg)
    else:
        fresh = _rasterize_partitions(events, cfg)
    return _overlay_on_store(fresh, store)


def _rasterize_cogroup(events: DataFrame, cfg: EngineConfig,
                       store: DataFrame) -> DataFrame:
    """Per-tile sequential fold over the store base (the only correct
    shape once draws read canvas state).  Used for z >= _canvas_read_z,
    where a tile covers a tiny geographic cell — per-tile event counts
    are geometry-bounded, so the one-task-per-tile group is safe there.
    (Kept callable on any zoom range as the reference implementation the
    skew-safe paths are byte-compared against in tests.)"""

    def fold_cogroup(ev: pd.DataFrame, old: pd.DataFrame) -> pd.DataFrame:
        if not len(ev):
            return pd.DataFrame(columns=[f.name for f in TILES_SCHEMA.fields])
        ev = _sort_events(ev)
        base = decode_png(bytes(old["png"].iloc[0])) if len(old) else None
        canvas, point_cnt = _fold_tile(ev, cfg, base)
        if len(old) and "point_cnt" in old.columns:
            point_cnt += int(old["point_cnt"].iloc[0])
        return pd.DataFrame([{
            "z": int(ev["z"].iloc[0]), "tx": int(ev["tx"].iloc[0]),
            "ty": int(ev["ty"].iloc[0]), "point_cnt": point_cnt,
            "n_events": len(ev), "n_docs": ev["doc_id"].nunique(),
            "png": encode_png(canvas),
        }])

    return (
        events.groupBy("z", "tx", "ty")
        .cogroup(store.groupBy("z", "tx", "ty"))
        .applyInPandas(lambda ev, old: fold_cogroup(ev, old), TILES_SCHEMA)
    )


def _overlay_on_store(fresh: DataFrame, store: DataFrame) -> DataFrame:
    """Overlay freshly-rendered batch tiles onto their store base: one
    equi-join row per TOUCHED tile (store-only tiles stay in the store's
    older snapshots — delta semantics), then an Arrow-batched pixel
    overlay.  Exact for opaque draws: base-then-draw == draw-then-
    overlay-where-painted.  point_cnt accumulates; n_events/n_docs stay
    batch-local (matching the cogroup fold's delta bookkeeping)."""
    bcols = [F.col("z"), F.col("tx"), F.col("ty"),
             F.col("png").alias("base_png")]
    has_pc = "point_cnt" in store.columns
    if has_pc:
        bcols.append(F.col("point_cnt").alias("base_point_cnt"))
    joined = fresh.join(store.select(*bcols), ["z", "tx", "ty"], "left")

    def merge(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                pc = int(r.point_cnt)
                if r.base_png is None:
                    png = bytes(r.png)
                else:
                    canvas = decode_png(bytes(r.base_png))
                    overlay = decode_png(bytes(r.png))
                    mask = overlay[..., 3] != 0
                    canvas[mask] = overlay[mask]
                    png = encode_png(canvas)
                    if has_pc and r.base_point_cnt is not None:
                        pc += int(r.base_point_cnt)
                out.append({
                    "z": int(r.z), "tx": int(r.tx), "ty": int(r.ty),
                    "point_cnt": pc, "n_events": int(r.n_events),
                    "n_docs": int(r.n_docs), "png": png,
                })
            yield pd.DataFrame(
                out, columns=[f.name for f in TILES_SCHEMA.fields])

    return joined.mapInPandas(merge, TILES_SCHEMA)


def _heatmap_counts_incremental(events: DataFrame, cfg: EngineConfig,
                                store: DataFrame) -> DataFrame:
    """Incremental heatmap for the pure-stamp zone: aggregate new events
    to per-pixel hit counts FIRST (map-side combinable — the skew dies in
    the aggregate), then continue each pixel's intensify chain from the
    BASE tile's color.  chain[i] is strictly brighter until its fixed
    point, so a base pixel's chain position is recoverable and
    chain[min(pos + new_hits, sat)] == folding the new stamps
    sequentially over the base — byte-exact, while per-tile work is
    bounded by 65536 aggregated pixels however many events hit the tile."""
    counts = events.groupBy("z", "tx", "ty", "x1", "y1").agg(
        F.count("*").alias("hits"))
    docs = events.groupBy("z", "tx", "ty").agg(
        F.countDistinct("doc_id").alias("n_docs"))
    part = counts.join(docs, ["z", "tx", "ty"])
    has_pc = "point_cnt" in store.columns
    scols = ["z", "tx", "ty", "png"] + (["point_cnt"] if has_pc else [])

    def heat_merge(cnt: pd.DataFrame, old: pd.DataFrame) -> pd.DataFrame:
        if not len(cnt):
            return pd.DataFrame(columns=[f.name for f in TILES_SCHEMA.fields])
        chain = _heat_chain()
        sat = len(chain) - 1
        base_pc = 0
        if len(old):
            canvas = decode_png(bytes(old["png"].iloc[0]))
            if has_pc and old["point_cnt"].iloc[0] is not None:
                base_pc = int(old["point_cnt"].iloc[0])
        else:
            canvas = blank_tile()
        h, w = canvas.shape[:2]
        xs = cnt["x1"].to_numpy()
        ys = cnt["y1"].to_numpy()
        hits = cnt["hits"].to_numpy().astype(np.int64)
        m = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
        xs, ys, mh = xs[m], ys[m], hits[m]
        prior = canvas[ys, xs]
        packed = ((prior[:, 0].astype(np.int64) << 16)
                  | (prior[:, 1].astype(np.int64) << 8)
                  | prior[:, 2].astype(np.int64))
        order = np.argsort(chain, kind="stable")
        pos = np.searchsorted(chain[order], packed)
        pos = np.clip(pos, 0, sat)
        known = chain[order][pos] == packed
        idx = np.where(prior[:, 3] == 0, np.int64(-1), order[pos])
        new_idx = np.minimum(idx + mh, sat)
        colors = chain[new_idx]
        # alpha != 0 pixels whose color is outside the chain (store tile
        # from a different mode): step intensify from the stored color
        odd = np.flatnonzero((prior[:, 3] != 0) & ~known)
        for i in odd:
            c = int(packed[i])
            for _ in range(int(mh[i])):
                c = int(intensify(np.array([c]))[0])
            colors[i] = c
        draw.stamp_pixels(canvas, xs, ys, colors)
        total = int(hits.sum())
        return pd.DataFrame([{
            "z": int(cnt["z"].iloc[0]), "tx": int(cnt["tx"].iloc[0]),
            "ty": int(cnt["ty"].iloc[0]), "point_cnt": base_pc + total,
            "n_events": total, "n_docs": int(cnt["n_docs"].iloc[0]),
            "png": encode_png(canvas),
        }])

    return (
        part.groupBy("z", "tx", "ty")
        .cogroup(store.select(*scols).groupBy("z", "tx", "ty"))
        .applyInPandas(lambda c, o: heat_merge(c, o), TILES_SCHEMA)
    )


def _rasterize_heatmap_counts(events: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Relational heatmap render for the pure-stamp zoom zone.

    Plan: hash aggregate on (z,tx,ty,x1,y1) with map-side partial
    aggregation — per-pixel keys are fine-grained, so a hot tile's events
    combine locally instead of converging on one task (the salting story
    for heatmap mode; the opaque-mode equivalent is rasterize_salted).
    The aggregated relation is bounded at 65536 rows per tile, so the
    per-tile paint that follows cannot skew.  Byte-exact vs the
    sequential fold: chain[min(hits-1, fixedpoint)] == the canvas the
    read→intensify→write loop leaves (test_pipeline_e2e)."""
    counts = events.groupBy("z", "tx", "ty", "x1", "y1").agg(
        F.count("*").alias("hits"))
    docs = events.groupBy("z", "tx", "ty").agg(
        F.countDistinct("doc_id").alias("n_docs"))
    part = (
        counts.join(docs, ["z", "tx", "ty"])  # co-partitioned after the aggs
        .repartition(_fold_partitions(counts, cfg), "z", "tx", "ty")
        .sortWithinPartitions("z", "tx", "ty")
    )
    _COLS = ("z", "tx", "ty", "x1", "y1", "hits", "n_docs")

    def fold_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: dict | None = None
        chain = _heat_chain()

        def finish(cols: dict, s: int, e: int) -> dict:
            canvas = blank_tile()
            hits = cols["hits"][s:e]
            colors = chain[np.minimum(hits - 1, len(chain) - 1)]
            draw.stamp_pixels(canvas, cols["x1"][s:e], cols["y1"][s:e], colors)
            total = int(hits.sum())
            return {
                "z": int(cols["z"][s]), "tx": int(cols["tx"][s]),
                "ty": int(cols["ty"][s]), "point_cnt": total,
                "n_events": total, "n_docs": int(cols["n_docs"][s]),
                "png": encode_png(canvas),
            }

        for pdf in batches:
            cols = {c: pdf[c].to_numpy() for c in _COLS}
            if carry is not None:
                cols = {c: np.concatenate([carry[c], cols[c]]) for c in _COLS}
                carry = None
            m = len(cols["z"])
            if not m:
                continue
            keys = (cols["z"].astype(np.int64) << 40) \
                 ^ (cols["tx"].astype(np.int64) << 20) \
                 ^ cols["ty"].astype(np.int64)
            change = np.flatnonzero(keys[1:] != keys[:-1]) + 1
            starts = np.concatenate(([0], change))
            ends = np.concatenate((change, [m]))
            out = [finish(cols, s, e) for s, e in zip(starts[:-1], ends[:-1])]
            carry = {c: cols[c][starts[-1]:ends[-1]].copy() for c in _COLS}
            if out:
                yield pd.DataFrame(out)
        if carry is not None and len(carry["z"]):
            yield pd.DataFrame([finish(carry, 0, len(carry["z"]))])

    return part.mapInPandas(fold_partition, TILES_SCHEMA)


# Target rows per Python-fold task (the incremental store's measured
# "~20k events/task" sweet spot): big enough to amortize the per-task
# Arrow/worker round trip, small enough that a task is sub-second.
_FOLD_TARGET_ROWS = 20_000


def _cached_rowcount_estimate(df: DataFrame) -> int | None:
    """Largest MATERIALIZED cached-relation row count inside ``df``'s
    optimized logical plan (a py4j plan walk — no job).  The render's
    input is a persisted points relation the caller typically counted
    already; when that cache is visible its row count lets the fold
    shuffle be sized from actual input volume instead of the session
    constant (guide §2: derive partitioning from input size).  Returns
    None when no materialized cache is in the plan (e.g. a cold full-
    scale run) — callers keep the session setting."""
    try:
        best = None
        stack = [df._jdf.queryExecution().optimizedPlan()]
        while stack:
            p = stack.pop()
            if p.getClass().getSimpleName() == "InMemoryRelation":
                rc = p.stats().rowCount()
                if rc.isDefined():
                    best = max(best or 0, int(str(rc.get())))
            it = p.children().iterator()
            while it.hasNext():
                stack.append(it.next())
        return best
    except Exception:  # plan shapes we don't know — never fail the plan
        return None


def _fold_partitions(df: DataFrame, cfg: EngineConfig | None = None) -> int:
    """Partition count for shuffles feeding the Python fold — EXPLICIT,
    so AQE cannot coalesce them.  AQE's byte-based advisory (64 MB)
    is calibrated for JVM operators; a 64 MB event partition is ~1.5M
    rows ≈ a minute of single-core Python fold — at 4N cores the
    coalesced hot-corridor partitions become the wall-time floor
    (measured: top partitions 8× the mean on the skewed corpus).
    ``cfg.fold_partitions`` overrides for callers that know the batch
    volume (see EngineConfig); otherwise, when the event relation sits
    on a materialized points cache, the count is derived from its row
    count × zoom fan-out at ~:data:`_FOLD_TARGET_ROWS` rows/task,
    floored at the cluster's defaultParallelism (never fewer than one
    task per core) and capped at the session shuffle-partition setting
    (the documented full-scale behavior — an uncached 100 TB input
    keeps the session value)."""
    if cfg is not None and cfg.fold_partitions:
        return int(cfg.fold_partitions)
    conf_n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    cached = _cached_rowcount_estimate(df)
    if cached:
        import math

        fanout = max(1, len(cfg.zooms())) if cfg is not None else 1
        by_rows = math.ceil(cached * fanout / _FOLD_TARGET_ROWS)
        floor = df.sparkSession.sparkContext.defaultParallelism
        return max(1, min(conf_n, max(floor, by_rows)))
    return conf_n


def prepared_events(events: DataFrame,
                    cfg: EngineConfig | None = None) -> DataFrame:
    """The rasterizer's physical input: one shuffle keyed (z,tx,ty) +
    in-partition painter sort + string-free projection.

    The JVM sort fixes the painter order; python only needs numeric
    columns — the doc_id string is replaced by a hash AFTER the sort
    (projection preserves row order) so the Arrow→pandas payload is
    string-free (5-10× cheaper conversion at millions of events)."""
    return (
        events.repartition(_fold_partitions(events, cfg), "z", "tx", "ty")
        .sortWithinPartitions("z", "tx", "ty", "doc_id", "seg_order",
                              "pt_idx", "etype")
        .select("z", "tx", "ty", "etype", "x1", "y1", "x2", "y2", "color",
                F.xxhash64("doc_id").alias("doc_key"))
    )


def partition_folder(cfg: EngineConfig):
    """mapInPandas generator over :func:`prepared_events` output: slices
    contiguous tile groups out of each Arrow batch (one tile = one numpy
    slice, not one pandas DataFrame + one UDF invocation), carrying the
    trailing partial group into the next batch."""
    _COLS = ("z", "tx", "ty", "etype", "x1", "y1", "x2", "y2", "color",
             "doc_key")

    def fold_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: dict | None = None

        def finish(cols: dict, s: int, e: int) -> dict:
            canvas, point_cnt = _fold_arrays(cols, s, e, cfg, None)
            return {
                "z": int(cols["z"][s]), "tx": int(cols["tx"][s]),
                "ty": int(cols["ty"][s]), "point_cnt": point_cnt,
                "n_events": e - s,
                "n_docs": len(np.unique(cols["doc_key"][s:e])),
                "png": encode_png(canvas),
            }

        for pdf in batches:
            cols = {c: pdf[c].to_numpy() for c in _COLS}
            if carry is not None:
                cols = {c: np.concatenate([carry[c], cols[c]]) for c in _COLS}
                carry = None
            m = len(cols["z"])
            if not m:
                continue
            keys = (cols["z"].astype(np.int64) << 40) \
                 ^ (cols["tx"].astype(np.int64) << 20) \
                 ^ cols["ty"].astype(np.int64)
            # boundaries of contiguous (z,tx,ty) runs
            change = np.flatnonzero(keys[1:] != keys[:-1]) + 1
            starts = np.concatenate(([0], change))
            ends = np.concatenate((change, [m]))
            out = [finish(cols, s, e)
                   for s, e in zip(starts[:-1], ends[:-1])]
            carry = {c: cols[c][starts[-1]:ends[-1]].copy() for c in _COLS}
            if out:
                yield pd.DataFrame(out)
        if carry is not None and len(carry["z"]):
            yield pd.DataFrame([finish(carry, 0, len(carry["z"]))])

    return fold_partition


def _rasterize_partitions(events: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Fast path: shuffle + painter sort (prepared_events) → partition-
    sliced fold (partition_folder).  Same result as
    groupBy().applyInPandas without the per-group pandas overhead."""
    return prepared_events(events, cfg).mapInPandas(partition_folder(cfg),
                                                    TILES_SCHEMA)


PIXELS_SCHEMA = T.StructType([
    T.StructField("z", T.IntegerType(), False),
    T.StructField("tx", T.IntegerType(), False),
    T.StructField("ty", T.IntegerType(), False),
    T.StructField("px", T.IntegerType(), False),
    T.StructField("py", T.IntegerType(), False),
    T.StructField("rgb", T.IntegerType(), False),
    T.StructField("lat", T.DoubleType(), False),
    T.StructField("lon", T.DoubleType(), False),
])


def tiles_to_pixels(tiles: DataFrame) -> DataFrame:
    """Raster→vector: decode tile PNGs back to painted pixels with their
    inverse-projected geographic pixel-center coordinates (J4's
    round-trip direction; inverse of R5/R6 — slippy-map.h:23-32)."""
    from .. import projection as P

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                img = decode_png(bytes(r.png))
                ys, xs = np.nonzero(img[..., 3])
                if not len(xs):
                    continue
                rgb = ((img[ys, xs, 0].astype(np.int64) << 16)
                       | (img[ys, xs, 1].astype(np.int64) << 8)
                       | img[ys, xs, 2].astype(np.int64))
                s, w, n, e = P.tile_bbox(np.int64(r.tx), np.int64(r.ty), int(r.z))
                lon = w + (xs + 0.5) * (e - w) / img.shape[1]
                lat = n + (ys + 0.5) * (s - n) / img.shape[0]
                out.append(pd.DataFrame({
                    "z": np.full(len(xs), r.z, np.int32),
                    "tx": np.full(len(xs), r.tx, np.int32),
                    "ty": np.full(len(xs), r.ty, np.int32),
                    "px": xs.astype(np.int32), "py": ys.astype(np.int32),
                    "rgb": rgb.astype(np.int32),
                    "lat": lat, "lon": lon,
                }))
            yield (pd.concat(out, ignore_index=True) if out
                   else pd.DataFrame(columns=[f.name for f in PIXELS_SCHEMA.fields]))

    return tiles.select("z", "tx", "ty", "png").mapInPandas(extract, PIXELS_SCHEMA)


# ---------------------------------------------------------------------------
# Skew handling: range-salted two-phase render for hot tiles
# ---------------------------------------------------------------------------

def doc_salt_boundaries(events: DataFrame, buckets: int,
                        target_sample: int = 10_000,
                        est_count: float | None = None) -> list[str]:
    """Order-preserving salt boundaries over doc_id from a pure Bernoulli
    sample sized off a count: every partition contributes proportionally,
    so boundaries reflect the whole doc_id range (a sample().limit()
    variant satisfied the LIMIT from the first partitions, drawing every
    boundary from a partition-order prefix — the exact skew salting
    exists to fix).  The driver sees ~target_sample·buckets ids.
    Row-frequency weighting is a feature — boundaries land where the
    events are, balancing bucket LOAD, and boundaries only affect load
    balance, never correctness (contiguous ranges either way).

    ``est_count``: caller-supplied row-count estimate (e.g. scaled up
    from a detection sample) — sizing the Bernoulli fraction is its only
    use, so an estimate is as good as the exact figure and skips a full
    extra pass over the un-persisted event relation."""
    cnt = float(events.count() if est_count is None else est_count)
    if cnt <= 0:
        return []
    frac = min(1.0, float(target_sample * buckets) / cnt)
    rows = events.select("doc_id").sample(False, frac, seed=7).collect()
    ids = sorted({r.doc_id for r in rows})
    if len(ids) < buckets:
        return []  # too few docs for salting to help — unsalted path
    step = max(1, len(ids) // buckets)
    return ids[step::step][: buckets - 1]


def rasterize_salted(events: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Two-phase skew-safe render (speed-color mode only).

    Urban-corridor skew makes a handful of (z,tx,ty) groups carry most
    events (at z=1 the whole world is 4 tiles) — a plain per-tile group
    is maximally skewed and AQE cannot split a single pandas group.

    Phase A salts *hot* tiles by contiguous doc_id ranges (order-
    preserving boundaries) and renders partial canvases per (tile, salt).
    Phase B overlays the partials per tile in salt order.  Because salt
    ranges are contiguous in doc order and all draw ops are opaque
    writes, overlay-in-salt-order == the unsalted painter fold exactly.
    Heatmap mode's skew path is _rasterize_heatmap_counts (hit-count
    merge) inside rasterize() — its low-zoom tiles commute, and its
    big-dot/circle zone sits at high zooms where tiles are small.
    """
    assert not cfg.heatmap, "heatmap skew is handled by rasterize()'s count merge"
    assert not cfg.diag_shadows, \
        "-d1 shadow blends read canvas state; rasterize() routes them sequentially"
    buckets = max(2, cfg.salt_buckets)

    # hot tiles are by definition few — detect them FIRST on a 1% sample
    # (the threshold is ≥ 200k events, so a 1% sample still sees ≥ ~2k
    # per hot tile; sub-hot tiles misclassified hot just pay a harmless
    # extra merge) and collect only keys above the scaled threshold:
    # bounded output, and the detection pass scans 1% of the exploded
    # relation instead of all of it.  No hot tiles (the common case) →
    # the boundary sampling pass is skipped entirely.
    det_frac = min(1.0, max(cfg.hot_detect_fraction, 1e-6))
    sampled = events if det_frac >= 1.0 else events.sample(False, det_frac, seed=13)
    # rollup instead of groupBy: the grand-total row rides along in the
    # SAME aggregation pass, giving the event-count estimate the salt
    # boundary sampler needs — the r03 plan paid a third full pass
    # (events.count()) for that number.  The filter keeps only full
    # (z,tx,ty) rows over the threshold plus the all-null total row, so
    # the collect stays bounded.
    det = (sampled.rollup("z", "tx", "ty").count()
           .filter(((F.col("count") > cfg.hot_tile_threshold * det_frac)
                    & F.col("ty").isNotNull())
                   | F.col("z").isNull()).collect())
    total_sampled = next((r["count"] for r in det if r["z"] is None), 0)
    hot_rows = [r for r in det if r["z"] is not None and r["ty"] is not None]
    if not hot_rows:
        return _rasterize_partitions(events, cfg)

    bounds = doc_salt_boundaries(events, buckets,
                                 est_count=total_sampled / det_frac)
    if not bounds:
        return _rasterize_partitions(events, cfg)

    salt = F.lit(0)
    for b in bounds:
        salt = salt + F.when(F.col("doc_id") >= F.lit(b), 1).otherwise(0)
    key_col = (F.col("z").cast("long") * F.lit(1 << 48)
               + F.col("tx").cast("long") * F.lit(1 << 24)
               + F.col("ty").cast("long"))
    hot_keys = [(r.z << 48) + (r.tx << 24) + r.ty for r in hot_rows]
    # ONLY hot tiles pay the two-phase cost (partial canvases + overlay
    # merge); the cold majority keeps the single-pass fold with no extra
    # PNG decode/encode round-trip
    cold = events.filter(~key_col.isin(hot_keys))
    ev = events.filter(key_col.isin(hot_keys)).withColumn("salt", salt)

    part = (
        ev.repartition(_fold_partitions(ev, cfg), "z", "tx", "ty", "salt")
        .sortWithinPartitions("z", "tx", "ty", "salt", "doc_id", "seg_order",
                              "pt_idx", "etype")
    )

    partial_schema = T.StructType(TILES_SCHEMA.fields + [
        T.StructField("salt", T.IntegerType(), False)])

    def fold_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None

        def finish(group: pd.DataFrame) -> dict:
            canvas, point_cnt = _fold_tile(group, cfg, None)
            return {
                "z": int(group["z"].iloc[0]), "tx": int(group["tx"].iloc[0]),
                "ty": int(group["ty"].iloc[0]), "point_cnt": point_cnt,
                "n_events": len(group), "n_docs": group["doc_id"].nunique(),
                "png": encode_png(canvas), "salt": int(group["salt"].iloc[0]),
            }

        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if not len(pdf):
                continue
            keys = (pdf["z"].to_numpy().astype(np.int64) << 48) \
                 ^ (pdf["tx"].to_numpy().astype(np.int64) << 28) \
                 ^ (pdf["ty"].to_numpy().astype(np.int64) << 8) \
                 ^ pdf["salt"].to_numpy().astype(np.int64)
            change = np.flatnonzero(keys[1:] != keys[:-1]) + 1
            starts = np.concatenate(([0], change))
            ends = np.concatenate((change, [len(pdf)]))
            out = [finish(pdf.iloc[s:e]) for s, e in zip(starts[:-1], ends[:-1])]
            carry = pdf.iloc[starts[-1]:ends[-1]].copy()
            if out:
                yield pd.DataFrame(out)
        if carry is not None and len(carry):
            yield pd.DataFrame([finish(carry)])

    partials = part.mapInPandas(fold_partition, partial_schema)

    def merge_tile(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("salt")
        canvas = decode_png(bytes(pdf["png"].iloc[0]))
        for i in range(1, len(pdf)):
            overlay = decode_png(bytes(pdf["png"].iloc[i]))
            mask = overlay[..., 3] != 0
            canvas[mask] = overlay[mask]
        return pd.DataFrame([{
            "z": int(pdf["z"].iloc[0]), "tx": int(pdf["tx"].iloc[0]),
            "ty": int(pdf["ty"].iloc[0]),
            "point_cnt": int(pdf["point_cnt"].sum()),
            "n_events": int(pdf["n_events"].sum()),
            "n_docs": int(pdf["n_docs"].sum()),
            "png": encode_png(canvas),
        }])

    merged_hot = partials.groupBy("z", "tx", "ty").applyInPandas(
        merge_tile, TILES_SCHEMA)
    return merged_hot.unionByName(_rasterize_partitions(cold, cfg))


def write_tile_pyramid(tiles: DataFrame, out_dir: str) -> None:
    """Filesystem sink: ``{out_dir}/{z}/{tx}/{ty}.png`` with tmp+rename
    (atomic per tile, like flush_tile gpx2tiles.c:312-348), executed on
    the executors via foreachPartition — no driver collect."""

    def write_partition(rows) -> None:
        import os

        for r in rows:
            d = os.path.join(out_dir, str(r.z), str(r.tx))
            os.makedirs(d, exist_ok=True)
            tmp = os.path.join(d, f"{r.ty}.png.tmp")
            with open(tmp, "wb") as f:
                f.write(bytes(r.png))
            os.replace(tmp, os.path.join(d, f"{r.ty}.png"))

    tiles.select("z", "tx", "ty", "png").foreachPartition(write_partition)
