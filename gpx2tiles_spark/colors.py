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
# HSV heatmap intensify — exact vectorized transcription of the reference's
# rgbhsv.h conversions (rgb2hsv:13-57, hsv2rgb:59-114) including the
# delta < 0.00001 gray guard and the i/ff/p/q/t reconstruction.  A direct
# newV/V channel scaling is NOT bit-identical at the (int)(x*255)
# truncation (~4% of colors differ by 1 in a channel), so the full round
# trip is reproduced op-for-op.
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


def _rgb2hsv(rgb: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """rgbhsv.h rgb2hsv, vectorized.  (The max==0 NAN branch is dead code:
    delta <= max, so max == 0 implies delta < 0.00001 → gray branch.)"""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    mx = rgb.max(axis=-1)
    mn = rgb.min(axis=-1)
    delta = mx - mn
    gray = delta < 0.00001
    d = np.where(gray, 1.0, delta)  # guard; gray rows discard h/s anyway
    h = np.where(
        r >= mx, (g - b) / d,
        np.where(g >= mx, 2.0 + (b - r) / d, 4.0 + (r - g) / d),
    ) * 60.0
    h = np.where(h < 0.0, h + 360.0, h)
    h = np.where(gray, 0.0, h)
    s = np.where(gray, 0.0, delta / np.where(mx > 0.0, mx, 1.0))
    return h, s, mx


def _hsv2rgb(h: np.ndarray, s: np.ndarray, v: np.ndarray) -> np.ndarray:
    """rgbhsv.h hsv2rgb, vectorized (switch((long)(h/60)) reconstruction)."""
    hh = np.where(h >= 360.0, 0.0, h) / 60.0
    i = hh.astype(np.int64)  # C (long) truncation; hh >= 0 here
    ff = hh - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * ff)
    t = v * (1.0 - s * (1.0 - ff))
    conds = [i == 0, i == 1, i == 2, i == 3, i == 4]
    r = np.select(conds, [v, q, p, p, t], default=v)
    g = np.select(conds, [t, v, v, q, p], default=p)
    b = np.select(conds, [p, p, t, v, v], default=q)
    gray = s <= 0.0
    out = np.stack([np.where(gray, v, r), np.where(gray, v, g),
                    np.where(gray, v, b)], axis=-1)
    return out


def intensify(c: np.ndarray, step: float = 0.05) -> np.ndarray:
    """HSV value += step (clamp 1.0) on packed RGB ints — the exact
    rgb2hsv/hsv2rgb round trip of gpx2tiles.c:449-468."""
    rgb = rgb_int_to_float(c)
    h, s, v = _rgb2hsv(rgb)
    v = np.minimum(v + step, 1.0)
    return rgb_float_to_int(_hsv2rgb(h, s, v))
