"""Douglas–Peucker simplification: independent recursive reference,
the eps-tolerance guarantee, and partitioning independence."""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
import pytest

from gpx2tiles_spark.operators.simplify import _dp_keep, simplify_tracks
from tests.conftest import SF_SMOKE


def _dp_recursive(pts, eps):
    """Textbook recursive DP (true recursion, perpendicular distance
    with sqrt/division — a genuinely different formulation)."""
    keep = set()

    def rec(i0, i1):
        keep.add(i0)
        keep.add(i1)
        if i1 - i0 < 2:
            return
        (x0, y0), (x1, y1) = pts[i0], pts[i1]
        best_d, best = -1.0, -1
        for j in range(i0 + 1, i1):
            xp, yp = pts[j]
            if (x0, y0) == (x1, y1):
                d = math.hypot(xp - x0, yp - y0)
            else:
                d = abs((x1 - x0) * (y0 - yp) - (y0 - y1) * (xp - x0)) \
                    / math.hypot(x1 - x0, y1 - y0)
            if d > best_d:
                best_d, best = d, j
        if best_d > eps:
            rec(i0, best)
            rec(best, i1)

    rec(0, len(pts) - 1)
    return sorted(keep)


@pytest.mark.parametrize("seed,n", [(1, 40), (7, 200), (42, 97)])
def test_dp_keep_matches_recursive_reference(seed, n):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-50, 50, n)
    y = rng.uniform(-30, 30, n)
    eps = 8.0
    keep = _dp_keep(x, y, eps * eps)
    got = [i for i in range(n) if keep[i]]
    want = _dp_recursive(list(zip(x.tolist(), y.tolist())), eps)
    assert got == want


@pytest.mark.parametrize("seed", [3, 11])
def test_dp_tolerance_guarantee(seed):
    """Every dropped point lies within eps of the chord of its
    enclosing kept span — the DP contract."""
    rng = np.random.default_rng(seed)
    n, eps = 150, 10.0
    x = rng.uniform(-60, 60, n)
    y = rng.uniform(-40, 40, n)
    keep = _dp_keep(x, y, eps * eps)
    kept_idx = np.flatnonzero(keep)
    for a, b in zip(kept_idx[:-1], kept_idx[1:]):
        if b - a < 2:
            continue
        dx, dy = x[b] - x[a], y[b] - y[a]
        ln = math.hypot(dx, dy)
        for j in range(a + 1, b):
            if ln == 0.0:
                d = math.hypot(x[j] - x[a], y[j] - y[a])
            else:
                d = abs(dx * (y[j] - y[a]) - dy * (x[j] - x[a])) / ln
            assert d <= eps + 1e-9


def test_dp_degenerate_tracks():
    # 2 points: both kept
    assert _dp_keep(np.array([0.0, 1.0]), np.array([0.0, 0.0]), 1.0).all()
    # identical coordinates: endpoints only (interior within eps of point)
    x = np.zeros(5)
    k = _dp_keep(x, x, 0.25)
    assert list(k) == [True, False, False, False, True]
    # identical endpoints, far interior point: kept (len2==0 branch)
    x = np.array([0.0, 30.0, 0.0])
    y = np.array([0.0, 0.0, 0.0])
    assert list(_dp_keep(x, y, 4.0)) == [True, True, True]


def test_simplify_tracks_partitioning_independent(spark):
    from gpx2tiles_spark.operators.geo import derived_points
    pts = derived_points(
        spark.read.parquet(os.path.join(SF_SMOKE, "events.parquet")))
    a = simplify_tracks(pts, 20.0).toPandas()
    b = simplify_tracks(pts.repartition(17), 20.0).toPandas()
    key = ["user_id", "pid"]
    assert (a.sort_values(key).reset_index(drop=True)
            .equals(b.sort_values(key).reset_index(drop=True)))
    # endpoints of every track are kept
    full = pts.toPandas().sort_values(["user_id", "ts", "pid"])
    ends = full.groupby("user_id").agg(first=("pid", "first"),
                                       last=("pid", "last"))
    kept = set(zip(a.user_id, a.pid))
    for uid, r in ends.iterrows():
        assert (uid, r["first"]) in kept and (uid, r["last"]) in kept
