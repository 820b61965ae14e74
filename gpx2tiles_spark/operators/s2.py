"""True S2 cell ids (face + quadratic ST projection + Hilbert curve).

The north rule asks for "H3/S2-indexed tile cells"; projection.quadkey
covers the Mercator-aligned hierarchical id, this module adds the real
S2 curve — the public algorithm from s2geometry.io (s2coords.h /
s2cell_id.cc, Apache-2.0; transcribed from the published algorithm
description, no code copied):

1. (lat, lon) → unit vector (x, y, z) on the sphere;
2. face 0-5 = dominant |component| (+x,+y,+z,-x,-y,-z order) with
   (u, v) the two cross-ratios of that face;
3. quadratic ST transform s = u≥0 ? √(1+3u)/2 : 1-√(1-3u)/2 (the
   area-equalizing projection S2 defaults to);
4. (i, j) = ⌊s·2^level⌋ clamped — computed AT the target level (the
   canonical code floors at 2^30 then truncates; ⌊s·2^30⌋ >> (30-L)
   ≡ ⌊s·2^L⌋, and flooring at the coarse grid keeps the FP decision
   margin 2^(30-L) times wider for the DuckDB oracle);
5. Hilbert-curve position via the per-bit state machine with S2's
   IJ→position tables and orientation modifiers (swap=1, invert=2,
   initial orientation = face & 1);
6. id = face·2^61 | pos·2^(61-2L) | 2^(60-2L)  (uint64, viewed int64).

Everything is vectorized numpy over Arrow batches (north_star: "batch-
project lat/lon … via vectorized Arrow UDFs") — the per-bit loop is
``level`` fancy-indexed array passes, no per-row Python.  A native
Column formulation would nest the orientation CASE ~4^level deep once
Catalyst's CollapseProject inlines the aliases (the giant-tree planning
trap documented in queries.py), so Arrow is the right lane here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

# S2's position→(i,j) quadrant tables for the 4 curve orientations
# (s2coords: kIJtoPos / kPosToOrientation; swap=1, invert=2).
# _IJ_TO_POS[orientation][2*i_bit + j_bit] = sub-position on the curve.
_IJ_TO_POS = np.array([
    [0, 1, 3, 2],   # canonical
    [0, 3, 1, 2],   # swap
    [2, 3, 1, 0],   # invert
    [2, 1, 3, 0],   # swap | invert
], dtype=np.int64)
# orientation ^= _POS_TO_ORIENT[sub-position]
_POS_TO_ORIENT = np.array([1, 0, 0, 3], dtype=np.int64)

MAX_LEVEL = 30


def _face_uv(lat_deg: np.ndarray, lon_deg: np.ndarray):
    """(lat, lon) degrees → (face, u, v).  |component| ties break
    toward the HIGHER axis index (strict >), matching s2geometry's
    LargestAbsComponent; mirrored exactly in the SQL oracle."""
    lat = np.radians(lat_deg)
    lon = np.radians(lon_deg)
    clat = np.cos(lat)
    x = clat * np.cos(lon)
    y = clat * np.sin(lon)
    z = np.sin(lat)
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)

    x_major = (ax > ay) & (ax > az)
    y_major = ~x_major & (ay > az)
    axis = np.where(x_major, 0, np.where(y_major, 1, 2))
    major = np.where(x_major, x, np.where(y_major, y, z))
    face = np.where(major >= 0, axis, axis + 3).astype(np.int64)

    # u/v per face (s2coords FaceXYZtoUV): select the numerator per face,
    # divide once by the major component (≥ 1/√3 in magnitude — the
    # vector is unit length — so the division is always safe).
    u_num = np.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4],
        [y, -x, -x, z, z], default=-y)
    v_num = np.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4],
        [z, z, -y, y, -x], default=-x)
    return face, u_num / major, v_num / major


def _st(u: np.ndarray) -> np.ndarray:
    """Quadratic UV→ST transform (s2coords UVtoST)."""
    half = 0.5 * np.sqrt(1.0 + 3.0 * np.abs(u))   # = √(1+3u)/2 for u≥0,
    return np.where(u >= 0.0, half, 1.0 - half)   #   √(1-3u)/2 mirrored


def _hilbert_pos(face: np.ndarray, i: np.ndarray, j: np.ndarray,
                 level: int) -> np.ndarray:
    """Hilbert-curve position of (i, j) on `face` at `level` (2·level
    bits), via the per-bit orientation state machine."""
    orient = face & 1                       # initial orientation = swap bit
    pos = np.zeros_like(i)
    for k in range(level - 1, -1, -1):
        ij = ((i >> k) & 1) * 2 + ((j >> k) & 1)
        sub = _IJ_TO_POS[orient, ij]        # vectorized 2-d fancy index
        pos = pos * 4 + sub
        orient = orient ^ _POS_TO_ORIENT[sub]
    return pos


def s2_cell_id(lat_deg: np.ndarray, lon_deg: np.ndarray,
               level: int = 12) -> np.ndarray:
    """Vectorized S2 cell id (int64 view of the canonical uint64) at
    `level` for arrays of degrees.  faces 4/5 set bit 63 → negative
    int64, exactly like the canonical id reinterpreted signed."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level {level} outside [0, {MAX_LEVEL}]")
    face, u, v = _face_uv(np.asarray(lat_deg, dtype=np.float64),
                          np.asarray(lon_deg, dtype=np.float64))
    n = np.int64(1) << level
    i = np.clip(np.floor(_st(u) * n).astype(np.int64), 0, n - 1)
    j = np.clip(np.floor(_st(v) * n).astype(np.int64), 0, n - 1)
    pos = _hilbert_pos(face, i, j, level)
    ident = (face.astype(np.uint64) << np.uint64(61)) \
        | (pos.astype(np.uint64) << np.uint64(61 - 2 * level)) \
        | (np.uint64(1) << np.uint64(60 - 2 * level))
    return ident.view(np.int64)


def s2_parent(cell_id: Column | np.ndarray, level: int,
              parent_level: int):
    """Parent cell id at `parent_level` — pure integer math, works on
    Spark Columns and numpy alike: keep the leading face+position bits,
    re-plant the sentinel bit."""
    if parent_level > level:
        raise ValueError("parent_level must be <= level")
    lsb_new = 1 << (60 - 2 * parent_level)
    if isinstance(cell_id, Column):
        return cell_id.bitwiseAND(F.lit(~(2 * lsb_new - 1))) \
                      .bitwiseOR(F.lit(lsb_new))
    return (cell_id & ~(2 * lsb_new - 1)) | lsb_new


def s2_cell_col(lat: Column, lon: Column, level: int = 12) -> Column:
    """Arrow-batched S2 encode as a Column expression (pandas_udf).

    Marked non-deterministic ON PURPOSE (the function itself is pure):
    it stops Catalyst duplicating the UDF — with a deterministic mark,
    the inferred ``isnotnull(join key)`` constraint of an equi-join on
    the cell is pushed below the projection with the UDF's arguments
    inlined, materializing a SECOND ArrowEvalPython pass per join side
    (the round-3 plan wart in docs/PLANS.md).  Non-deterministic
    expressions are never collapsed into or pushed through projections,
    so the encode runs exactly once per side."""
    @F.pandas_udf(LongType())
    def _enc(la: pd.Series, lo: pd.Series) -> pd.Series:
        return pd.Series(s2_cell_id(la.to_numpy(np.float64),
                                    lo.to_numpy(np.float64), level))
    return _enc.asNondeterministic()(lat, lon)


def with_s2_cell(df: DataFrame, level: int = 12,
                 lat_col: str = "lat", lon_col: str = "lon",
                 out_col: str = "s2_cell") -> DataFrame:
    """Attach the S2 cell id column — the skew-aware spatial bucketing
    key for joins/rollups (repartition on it to co-locate cell work)."""
    return df.withColumn(out_col,
                         s2_cell_col(F.col(lat_col), F.col(lon_col), level))
