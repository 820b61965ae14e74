"""Projection kernel tests vs the golden values extracted from the
reference (FIXTURES.md §4.2) + property-based invariants."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gpx2tiles_spark import projection as P

# FIXTURES.md §4.2 — every fixture point shares these tiles
GOLDEN_TILES = {14: (8579, 5632), 15: (17158, 11264), 16: (34316, 22529),
                17: (68632, 45059), 18: (137264, 90119)}

# FIXTURES.md §4.2 — per-point pixels (lat, lon) -> {z: (px, py)}
GOLDEN_PIXELS = [
    (48.91569597, 8.50383737, {16: (19, 226), 17: (39, 196), 18: (78, 137)}),
    (48.91580663, 8.50387266, {16: (21, 218), 17: (42, 181), 18: (84, 106)}),
    (48.91579259, 8.50376588, {16: (16, 219), 17: (32, 183), 18: (64, 110)}),
    (48.91569810, 8.50381483, {16: (18, 226), 17: (36, 196), 18: (73, 137)}),
    (48.91562950, 8.50382580, {16: (19, 231), 17: (38, 206), 18: (76, 156)}),
    (48.91571480, 8.50387160, {16: (21, 225), 17: (42, 194), 18: (84, 132)}),
    (48.91567930, 8.50384240, {16: (19, 227), 17: (39, 199), 18: (79, 142)}),
]


def test_golden_tiles():
    lat = np.array([p[0] for p in GOLDEN_PIXELS])
    lon = np.array([p[1] for p in GOLDEN_PIXELS])
    for z, (gx, gy) in GOLDEN_TILES.items():
        assert (P.lon_to_tilex(lon, z) == gx).all()
        assert (P.lat_to_tiley(lat, z) == gy).all()


def test_golden_pixels():
    for lat, lon, per_z in GOLDEN_PIXELS:
        for z, (gpx_, gpy) in per_z.items():
            px, py = P.pixel_pos(np.array([lon]), np.array([lat]), z)
            assert (px[0], py[0]) == (gpx_, gpy), (lat, lon, z)


def test_earth_distance_golden():
    # FIXTURES.md §4.1: net/1 -> net/2: 0.014138 m/s over 401 s
    d = P.earth_distance_m(48.91567930, 8.50384240, 48.91562950, 8.50382580)
    assert d[()] / 401.0 == pytest.approx(0.014138, abs=1e-6)
    # ~2cm separation underflows to exactly 0.0 under law of cosines
    d0 = P.earth_distance_m(48.91567930, 8.50384210, 48.91567930, 8.50384240)
    assert float(d0) == 0.0


@settings(max_examples=200, deadline=None)
@given(
    lat=st.floats(-85.0, 85.0), lon=st.floats(-180.0, 179.999999),
    z=st.integers(1, 18),
)
def test_projection_invariants(lat, lon, z):
    tx = int(P.lon_to_tilex(np.array([lon]), z)[0])
    ty = int(P.lat_to_tiley(np.array([lat]), z)[0])
    assert 0 <= tx < 2 ** z
    assert 0 <= ty < 2 ** z
    # inverse bounds (eps: the forward map rounds in double, so a lon
    # epsilon-below a tile boundary can land in the right-hand tile — the
    # C code has the identical absorption)
    eps = 1e-9
    assert P.tilex_to_lon(np.array([tx]), z)[0] <= lon + eps
    assert lon < P.tilex_to_lon(np.array([tx + 1]), z)[0] + eps
    px, py = P.pixel_pos(np.array([lon]), np.array([lat]), z,
                         np.array([tx]), np.array([ty]))
    assert 0 <= px[0] <= 256
    assert 0 <= py[0] <= 256


@settings(max_examples=50, deadline=None)
@given(tx=st.integers(0, 2 ** 12 - 1), ty=st.integers(0, 2 ** 12 - 1))
def test_quadkey_hierarchy(tx, ty):
    z = 12
    cell = int(P.quadkey(np.array([tx]), np.array([ty]), z)[0])
    parent = int(P.quadkey(np.array([tx // 2]), np.array([ty // 2]), z - 1)[0])
    assert cell >> 2 == parent
    assert cell != parent


def test_column_exprs_match_numpy(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    rng = np.random.default_rng(7)
    lat = rng.uniform(-85, 85, 500)
    lon = rng.uniform(-180, 180, 500)
    pdf = pd.DataFrame({"lat": lat, "lon": lon})
    df = spark.createDataFrame(pdf)
    for z in (3, 12, 18):
        tx_c, ty_c = P.tilex_col(F.col("lon"), z), P.tiley_col(F.col("lat"), z)
        px_c, py_c = P.pixel_cols(F.col("lon"), F.col("lat"), tx_c, ty_c, z)
        out = (
            df.select(tx_c.alias("tx"), ty_c.alias("ty"),
                      px_c.alias("px"), py_c.alias("py"))
            .toPandas()
        )
        assert (out.tx.to_numpy() == P.lon_to_tilex(lon, z)).all()
        assert (out.ty.to_numpy() == P.lat_to_tiley(lat, z)).all()
        epx, epy = P.pixel_pos(lon, lat, z)
        assert (out.px.to_numpy() == epx).all()
        assert (out.py.to_numpy() == epy).all()
