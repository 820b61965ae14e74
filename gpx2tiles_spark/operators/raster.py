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
from ..config import HEATMAP_BASE_COLOR, EngineConfig
from ..pngcodec import blank_tile, decode_png, encode_png
from .events import ET_CIRCLE, ET_LINE, ET_STAMP

TILES_SCHEMA = T.StructType([
    T.StructField("z", T.IntegerType(), False),
    T.StructField("tx", T.IntegerType(), False),
    T.StructField("ty", T.IntegerType(), False),
    T.StructField("point_cnt", T.LongType(), False),
    T.StructField("n_events", T.LongType(), False),
    T.StructField("n_docs", T.LongType(), False),
    T.StructField("png", T.BinaryType(), False),
])


def _fold_tile(pdf: pd.DataFrame, cfg: EngineConfig,
               base: np.ndarray | None) -> tuple[np.ndarray, int]:
    """Fold one tile's events (already sorted) into a canvas."""
    canvas = base if base is not None else blank_tile()
    z = int(pdf["z"].iloc[0])
    thick = max(1, cfg.thickness.get(z, 0))
    et = pdf["etype"].to_numpy()
    x1 = pdf["x1"].to_numpy()
    y1 = pdf["y1"].to_numpy()
    x2 = pdf["x2"].to_numpy()
    y2 = pdf["y2"].to_numpy()
    color = pdf["color"].to_numpy()
    n = len(pdf)

    if not cfg.heatmap:
        i = 0
        while i < n:
            if et[i] == ET_STAMP:
                j = i
                while j < n and et[j] == ET_STAMP:
                    j += 1
                draw.stamp_pixels(canvas, x1[i:j], y1[i:j], color[i:j])
                i = j
            elif et[i] == ET_LINE:
                draw.draw_line(canvas, x1[i], y1[i], x2[i], y2[i],
                               int(color[i]), thick)
                i += 1
            else:
                draw.fill_ellipse(canvas, int(x1[i]), int(y1[i]),
                                  int(x2[i]), int(x2[i]), int(color[i]))
                i += 1
    else:
        big = z >= cfg.z_heatmap_bigdots
        h, w = canvas.shape[:2]
        cur_color = HEATMAP_BASE_COLOR
        for i in range(n):
            if et[i] == ET_STAMP:
                xx, yy = int(x1[i]), int(y1[i])
                if not (0 <= xx < w and 0 <= yy < h):
                    # gd's out-of-range read returns 0 → base color
                    cur_color = HEATMAP_BASE_COLOR
                else:
                    px = canvas[yy, xx]
                    # gd returns 0 for never-touched truecolor pixels; our
                    # alpha==0 marker plays that role (gpx2tiles.c:628-629)
                    if px[3] == 0:
                        cur_color = HEATMAP_BASE_COLOR
                    else:
                        packed = (int(px[0]) << 16) | (int(px[1]) << 8) | int(px[2])
                        cur_color = int(intensify(np.array([packed]))[0])
                if big:
                    draw.fill_rect(canvas, xx - 1, yy - 1, xx + 1, yy + 1, cur_color)
                else:
                    draw.set_pixel(canvas, xx, yy, cur_color)
            elif et[i] == ET_LINE:
                # heatmap lines use the last computed heat color
                # (gpx2tiles.c:627-671: `color` carries over into the line)
                c = int(color[i]) if color[i] >= 0 else cur_color
                draw.draw_line(canvas, x1[i], y1[i], x2[i], y2[i], c, thick)
            else:
                draw.fill_ellipse(canvas, int(x1[i]), int(y1[i]),
                                  int(x2[i]), int(x2[i]), int(color[i]))
    point_cnt = int((et == ET_STAMP).sum())
    return canvas, point_cnt


def _sort_events(pdf: pd.DataFrame) -> pd.DataFrame:
    # the reference's draw order: file → segment → point → stamp/circle/line
    return pdf.sort_values(["doc_id", "seg_order", "pt_idx", "etype"],
                           kind="stable")


def rasterize(events: DataFrame, cfg: EngineConfig,
              store: DataFrame | None = None) -> DataFrame:
    """events (+ optional existing tile store (z,tx,ty,png)) → tiles."""

    def fold_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = _sort_events(pdf)
        canvas, point_cnt = _fold_tile(pdf, cfg, None)
        return pd.DataFrame([{
            "z": int(pdf["z"].iloc[0]), "tx": int(pdf["tx"].iloc[0]),
            "ty": int(pdf["ty"].iloc[0]), "point_cnt": point_cnt,
            "n_events": len(pdf), "n_docs": pdf["doc_id"].nunique(),
            "png": encode_png(canvas),
        }])

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

    if store is None:
        return events.groupBy("z", "tx", "ty").applyInPandas(fold_group, TILES_SCHEMA)
    return (
        events.groupBy("z", "tx", "ty")
        .cogroup(store.groupBy("z", "tx", "ty"))
        .applyInPandas(lambda ev, old: fold_cogroup(ev, old), TILES_SCHEMA)
    )


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
