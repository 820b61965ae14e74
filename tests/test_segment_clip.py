"""Liang–Barsky tile-boundary segment clip (geo.clip_segments_to_tiles)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from gpx2tiles_spark.operators.geo import clip_segments_to_tiles


def _segs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["sid", "gx0", "gy0", "gx1", "gy1"]))


def test_clip_pieces_cover_segment_and_stay_in_tiles(spark):
    """A diagonal crossing several tiles: every clipped piece lies in
    its tile's closed rect, pieces chain continuously (each piece's end
    == next piece's start), and the union spans the whole segment."""
    out = clip_segments_to_tiles(
        _segs(spark, [(1, 10.0, 20.0, 700.0, 600.0)])).orderBy("cx0")
    rows = out.collect()
    assert len(rows) >= 3  # crosses at least x=256,512 and y=256
    for r in rows:
        assert r.tx * 256 - 1e-9 <= r.cx0 <= (r.tx + 1) * 256 + 1e-9
        assert r.tx * 256 - 1e-9 <= r.cx1 <= (r.tx + 1) * 256 + 1e-9
        assert r.ty * 256 - 1e-9 <= r.cy0 <= (r.ty + 1) * 256 + 1e-9
        assert r.ty * 256 - 1e-9 <= r.cy1 <= (r.ty + 1) * 256 + 1e-9
    assert rows[0].cx0 == 10.0 and rows[0].cy0 == 20.0
    assert rows[-1].cx1 == 700.0 and rows[-1].cy1 == 600.0
    for a, b in zip(rows, rows[1:]):
        assert abs(a.cx1 - b.cx0) < 1e-9 and abs(a.cy1 - b.cy0) < 1e-9


def test_clip_in_tile_segment_unchanged(spark):
    rows = clip_segments_to_tiles(
        _segs(spark, [(1, 5.0, 6.0, 100.0, 99.0)])).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.tx, r.ty) == (0, 0)
    assert (r.cx0, r.cy0, r.cx1, r.cy1) == (5.0, 6.0, 100.0, 99.0)


def test_clip_axis_parallel_and_bbox_corner_miss(spark):
    """A horizontal segment exercises the parallel-slab branch; a steep
    near-diagonal has a bbox corner tile its line never enters — the
    parametric filter must drop that corner."""
    rows = clip_segments_to_tiles(
        _segs(spark, [(1, 100.0, 300.0, 600.0, 300.0)])).collect()
    assert sorted((r.tx, r.ty) for r in rows) == [(0, 1), (1, 1), (2, 1)]
    for r in rows:
        assert r.cy0 == 300.0 and r.cy1 == 300.0

    # from (250,6) to (262,506): bbox covers tiles (0,0),(1,0),(0,1),(1,1)
    # but the line crosses x=256 at y≈256 — whether (1,0) survives is a
    # geometry fact, not a bbox fact: it must appear only if the line
    # really enters it (it does, barely, at y<256 for x>256).
    rows = clip_segments_to_tiles(
        _segs(spark, [(2, 250.0, 6.0, 262.0, 506.0)])).collect()
    got = {(r.tx, r.ty) for r in rows}
    # crossing x=256: t=(256-250)/12=0.5 → y=6+0.5*500=256 → corner graze
    assert (0, 0) in got and (1, 1) in got
    # the graze point (256,256) belongs to all four rects as a closed
    # interval — zero-length touches are kept by design
    for r in rows:
        if (r.tx, r.ty) in {(1, 0), (0, 1)}:
            assert abs(r.cx1 - r.cx0) < 1e-9 and abs(r.cy1 - r.cy0) < 1e-9


def test_clip_max_span_guard_drops_glitch_segments(spark):
    """A cross-continent glitch segment (bbox 100 tiles) is dropped by
    the span guard instead of exploding into 10k candidate rows."""
    out = clip_segments_to_tiles(
        _segs(spark, [(1, 0.0, 0.0, 25600.0, 10.0),   # 100-tile span
                      (2, 0.0, 0.0, 100.0, 100.0)]),  # fine
        max_span=4)
    assert [r.sid for r in out.select("sid").distinct().collect()] == [2]


def test_clip_plan_is_udf_free(spark):
    """The operator must stay JVM-side: no Python UDF / Arrow eval in
    the physical plan (it's a hot-path per-segment fan-out)."""
    plan = clip_segments_to_tiles(
        _segs(spark, [(1, 0.0, 0.0, 10.0, 10.0)]))._jdf \
        .queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


# ---------------------------------------------------------------------------
# Property-based: Spark clip vs an independent scalar model
# ---------------------------------------------------------------------------

def _scalar_clip(gx0, gy0, gx1, gy1, tile=256, max_span=4):
    """Independent scalar Liang–Barsky reference (not shared with the
    operator code) — returns {(tx, ty): (cx0, cy0, cx1, cy1)}."""
    import math
    txa, txb = math.floor(gx0 / tile), math.floor(gx1 / tile)
    tya, tyb = math.floor(gy0 / tile), math.floor(gy1 / tile)
    if abs(txb - txa) > max_span or abs(tyb - tya) > max_span:
        return {}
    out = {}
    dx, dy = gx1 - gx0, gy1 - gy0
    for tx in range(min(txa, txb), max(txa, txb) + 1):
        for ty in range(min(tya, tyb), max(tya, tyb) + 1):
            lox, hix = tx * tile, tx * tile + tile
            loy, hiy = ty * tile, ty * tile + tile
            if dx > 0:
                t_lo_x, t_hi_x = (lox - gx0) / dx, (hix - gx0) / dx
            elif dx < 0:
                t_lo_x, t_hi_x = (hix - gx0) / dx, (lox - gx0) / dx
            else:
                t_lo_x, t_hi_x = ((0.0, 1.0) if lox <= gx0 <= hix
                                  else (2.0, -1.0))
            if dy > 0:
                t_lo_y, t_hi_y = (loy - gy0) / dy, (hiy - gy0) / dy
            elif dy < 0:
                t_lo_y, t_hi_y = (hiy - gy0) / dy, (loy - gy0) / dy
            else:
                t_lo_y, t_hi_y = ((0.0, 1.0) if loy <= gy0 <= hiy
                                  else (2.0, -1.0))
            t0 = max(0.0, t_lo_x, t_lo_y)
            t1 = min(1.0, t_hi_x, t_hi_y)
            if t0 <= t1:
                out[(tx, ty)] = (gx0 + t0 * dx, gy0 + t0 * dy,
                                 gx0 + t1 * dx, gy0 + t1 * dy)
    return out


def test_clip_property_random_segments(spark):
    """120 seeded random segments (mixed spans, axis-parallel, and
    degenerate points): the distributed clip equals the scalar model
    per tile, every returned t-range is inside the tile's closed rect,
    and kept segments' pieces start/end at the original endpoints."""
    import numpy as np
    rng = np.random.RandomState(99)
    rows = []
    for sid in range(120):
        gx0 = float(rng.uniform(-1000, 3000))
        gy0 = float(rng.uniform(-1000, 3000))
        if sid % 7 == 0:       # axis-parallel
            gx1, gy1 = gx0, float(gy0 + rng.uniform(-900, 900))
        elif sid % 11 == 0:    # degenerate point segment
            gx1, gy1 = gx0, gy0
        else:
            gx1 = float(gx0 + rng.uniform(-2000, 2000))
            gy1 = float(gy0 + rng.uniform(-2000, 2000))
        rows.append((sid, gx0, gy0, gx1, gy1))

    got = {}
    out = clip_segments_to_tiles(_segs(spark, rows)).collect()
    for r in out:
        got.setdefault(r.sid, {})[(r.tx, r.ty)] = (r.cx0, r.cy0,
                                                   r.cx1, r.cy1)
    for sid, gx0, gy0, gx1, gy1 in rows:
        want = _scalar_clip(gx0, gy0, gx1, gy1)
        have = got.get(sid, {})
        assert set(have) == set(want), sid
        for k in want:
            assert have[k] == want[k], (sid, k)
