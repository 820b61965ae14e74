"""Speed→color mapping and HSV heatmap intensify kernels (numpy).

Reference semantics: speed table gpx2tiles.c:72-91, lookup :470-479
(first threshold >= C-truncated kph, linear scan, clamp to last); HSV
round-trip rgbhsv.h:13-114 with value += step clamp 1.0 (gpx2tiles.c:449-468).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

from .config import SPDCLR

_THRESHOLDS = np.array([t for t, _ in SPDCLR], dtype=np.int64)
_COLORS = np.array([c for _, c in SPDCLR], dtype=np.int64)


def speed_kph_to_clridx(kph: np.ndarray) -> np.ndarray:
    """Vectorized speed_kph_to_clridx (gpx2tiles.c:470-479).

    C does ``(int)kph <= spdclr[i].kph`` on a linear scan — i.e. first index
    whose threshold >= trunc(kph); above the last threshold → last index.
    """
    k = np.trunc(np.asarray(kph, np.float64)).astype(np.int64)
    idx = np.searchsorted(_THRESHOLDS, k, side="left")
    return np.minimum(idx, len(_THRESHOLDS) - 1)


def clridx_to_rgb(idx: np.ndarray) -> np.ndarray:
    return _COLORS[np.asarray(idx, np.int64)]


def speed_clridx_col(kph: Column) -> Column:
    """Same lookup as a JVM-side CASE chain (for pure-SQL queries)."""
    k = F.floor(kph).cast("long")  # kph >= 0 in practice; trunc == floor
    expr = F.lit(len(SPDCLR) - 1)
    for i in range(len(SPDCLR) - 1, -1, -1):
        expr = F.when(k <= F.lit(SPDCLR[i][0]), F.lit(i)).otherwise(expr)
    return expr


def speed_clridx_sql(kph_expr: str) -> str:
    """DuckDB-oracle SQL for the same lookup."""
    cases = " ".join(
        f"WHEN CAST(FLOOR({kph_expr}) AS BIGINT) <= {t} THEN {i}"
        for i, (t, _) in enumerate(SPDCLR)
    )
    return f"(CASE {cases} ELSE {len(SPDCLR) - 1} END)"


# ---------------------------------------------------------------------------
# HSV heatmap intensify (vectorized port of the public hsv<->rgb identities;
# the reference's rgbhsv.h implements the same standard conversion)
# ---------------------------------------------------------------------------

def rgb_int_to_float(c: np.ndarray) -> np.ndarray:
    """0xRRGGBB int64 -> (..., 3) float in [0,1]."""
    c = np.asarray(c, np.int64)
    return np.stack(
        [((c >> 16) & 0xFF) / 255.0, ((c >> 8) & 0xFF) / 255.0, (c & 0xFF) / 255.0],
        axis=-1,
    )


def rgb_float_to_int(rgb: np.ndarray) -> np.ndarray:
    """(..., 3) float -> 0xRRGGBB with C (int) truncation (gpx2tiles.c:463-466)."""
    q = np.trunc(rgb * 255.0).astype(np.int64)
    return (q[..., 0] << 16) | (q[..., 1] << 8) | q[..., 2]


def intensify(c: np.ndarray, step: float = 0.05) -> np.ndarray:
    """HSV value += step (clamp 1.0) on packed RGB ints (gpx2tiles.c:449-468).

    Implemented directly on V = max(R,G,B): raising V in HSV with H,S fixed
    scales all channels by newV/V (or sets gray when V == 0) — identical to
    the round-trip conversion without materializing H and S.
    """
    rgb = rgb_int_to_float(c)
    v = rgb.max(axis=-1)
    new_v = np.minimum(v + step, 1.0)
    scale = np.where(v > 0, new_v / np.where(v > 0, v, 1.0), 0.0)
    out = rgb * scale[..., None]
    # v == 0 (black): S is 0, so the result is the gray (new_v, new_v, new_v)
    out = np.where(v[..., None] > 0, out, new_v[..., None])
    return rgb_float_to_int(out)
