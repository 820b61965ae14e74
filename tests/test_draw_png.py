"""PNG codec round-trip + raster primitive + clip predicate tests."""

from __future__ import annotations

import numpy as np

from gpx2tiles_spark import draw
from gpx2tiles_spark.colors import intensify, speed_kph_to_clridx
from gpx2tiles_spark.pngcodec import blank_tile, decode_png, encode_png


def test_png_roundtrip():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(64, 32, 4), dtype=np.uint8)
    assert (decode_png(encode_png(img)) == img).all()


def test_png_deterministic():
    img = blank_tile()
    draw.draw_line(img, 0, 0, 255, 255, 0xA46100)
    assert encode_png(img) == encode_png(img.copy())


def test_speed_color_table():
    # gpx2tiles.c:470-479 lookup semantics incl. (int) truncation
    kph = np.array([0.0, 0.9, 10.0, 10.9, 13.0, 25.0, 59.9, 60.0, 61.0, 1000.0])
    idx = speed_kph_to_clridx(kph)
    assert idx.tolist() == [0, 0, 1, 1, 2, 3, 7, 7, 7, 7]
    # 13 kph (fixture gps/4, 3.62 m/s) -> brown #a46100 (FIXTURES.md §4.3)
    from gpx2tiles_spark.colors import clridx_to_rgb
    assert clridx_to_rgb(np.array([2]))[0] == 0xA46100


def test_intensify_black_and_clamp():
    # black (v=0) -> gray step; near-white clamps at 255
    assert intensify(np.array([0x000000]), 0.05)[0] == 0x0C0C0C
    assert intensify(np.array([0xFFFFFF]), 0.05)[0] == 0xFFFFFF
    # repeated intensify raises V to 1.0: dominant channel saturates (the
    # per-step (int) truncation keeps tiny channels small — same quantization
    # the C round-trip has, gpx2tiles.c:463-466)
    c = np.array([0x061A5B])
    for _ in range(40):
        c = intensify(c, 0.05)
    assert c[0] & 0xFF == 0xFF


def test_crossing_tile_predicate():
    # horizontal segment crossing the right edge
    assert bool(draw.crossing_tile(200, 100, 300, 100))
    # fully interior segment does not cross
    assert not bool(draw.crossing_tile(10, 10, 200, 200))
    # fully outside but passing through the tile: crosses two borders
    assert bool(draw.crossing_tile(-50, 128, 300, 128))
    # vectorized
    m = draw.crossing_tile(
        np.array([200, 10]), np.array([100, 10]),
        np.array([300, 20]), np.array([100, 20])
    )
    assert m.tolist() == [True, False]


def test_bresenham_endpoints_and_symmetry():
    # gd normalizes to the left-most (dx-major) / top-most (dy-major)
    # endpoint before rasterizing, so the pixel SET is direction-
    # independent and both endpoints are always in it
    for (x1, y1, x2, y2) in [(0, 0, 10, 3), (5, 5, 5, 5), (9, 2, 0, 7), (3, 8, 3, 1)]:
        xs, ys = draw.line_points(x1, y1, x2, y2)
        pts = set(zip(xs.tolist(), ys.tolist()))
        assert (x1, y1) in pts and (x2, y2) in pts
        assert len(xs) == max(abs(x2 - x1), abs(y2 - y1)) + 1
        rx, ry = draw.line_points(x2, y2, x1, y1)
        assert set(zip(rx.tolist(), ry.tolist())) == pts


def test_fill_ellipse_center_and_extent():
    img = blank_tile(32, 32)
    draw.fill_ellipse(img, 16, 16, 9, 9, 0x061A5B)
    assert (img[16, 16, :3] == (0x06, 0x1A, 0x5B)).all()
    assert img[16, 16 - 4, 3] == 255 and img[16, 16 + 4, 3] == 255
    assert img[16, 16 - 6, 3] == 0 and img[16 - 6, 16, 3] == 0
