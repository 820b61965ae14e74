"""Ray-cast point-in-polygon over concave polygons (geo.points_in_polygons)."""

from __future__ import annotations

import pandas as pd

from gpx2tiles_spark.operators.geo import points_in_polygons, polygon_edges


def _polys(spark, d):
    return spark.createDataFrame(pd.DataFrame([
        {"poly_id": k,
         "vertices": [{"x": float(x), "y": float(y)} for x, y in vs]}
        for k, vs in d.items()]))


def _pts(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["pid", "lon", "lat"]))


_L_SHAPE = {1: [(0, 0), (40, 0), (40, 20), (20, 20), (20, 40), (0, 40)]}


def test_polygon_edges_close_the_ring(spark):
    e = polygon_edges(_polys(spark, {7: [(0, 0), (10, 0), (5, 8)]})).collect()
    assert len(e) == 3
    assert {(r.x1, r.y1, r.x2, r.y2) for r in e} == {
        (0.0, 0.0, 10.0, 0.0), (10.0, 0.0, 5.0, 8.0), (5.0, 8.0, 0.0, 0.0)}


def test_concave_l_shape_membership(spark):
    """The L's notch (the removed upper-right quadrant) must be outside
    even though it's inside the convex hull."""
    pts = _pts(spark, [
        (1, 10.0, 10.0),   # lower-left arm: inside
        (2, 30.0, 10.0),   # lower-right arm: inside
        (3, 10.0, 30.0),   # upper-left arm: inside
        (4, 30.0, 30.0),   # the notch: OUTSIDE (convex hull would say in)
        (5, 50.0, 10.0),   # fully outside
        (6, -5.0, 10.0),   # fully outside, ray crosses twice
    ])
    got = {(r.pid, r.poly_id)
           for r in points_in_polygons(pts, _polys(spark, _L_SHAPE)).collect()}
    assert got == {(1, 1), (2, 1), (3, 1)}


def test_multiple_polygons_and_overlap(spark):
    """A point inside two overlapping polygons reports both ids."""
    polys = _polys(spark, {
        1: [(0, 0), (20, 0), (20, 20), (0, 20)],
        2: [(10, 10), (30, 10), (30, 30), (10, 30)],
    })
    pts = _pts(spark, [(1, 15.0, 15.0), (2, 5.0, 5.0), (3, 25.0, 25.0)])
    got = {(r.pid, r.poly_id)
           for r in points_in_polygons(pts, polys).collect()}
    assert got == {(1, 1), (1, 2), (2, 1), (3, 2)}


def test_shared_vertex_counted_once(spark):
    """A ray through a vertex (two edges meet at y=10) must not double
    count — the half-open rule keeps parity correct."""
    polys = _polys(spark, {1: [(10, 0), (20, 10), (10, 20), (0, 10)]})
    pts = _pts(spark, [(1, -5.0, 10.0),   # outside, ray passes both vertices
                       (2, 10.0, 10.0)])  # dead center
    got = {(r.pid, r.poly_id)
           for r in points_in_polygons(pts, polys).collect()}
    assert got == {(2, 1)}


def test_pip_plan_broadcasts_both_stages(spark):
    """Stage 1 (bbox gate) is a broadcast nested loop on the tiny box
    table; stage 2 (edge test) must be a broadcast HASH join on
    poly_id — the point table never shuffles before a join."""
    plan = points_in_polygons(
        _pts(spark, [(1, 1.0, 1.0)]), _polys(spark, _L_SHAPE))._jdf \
        .queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
