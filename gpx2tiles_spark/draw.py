"""Raster primitives on numpy RGBA canvases + integer clip predicates.

Replaces the reference's libgd calls (gdImageSetPixel / gdImageLine /
gdImageFilledRectangle / gdImageFilledEllipse — gpx2tiles.c §K12) with
numpy kernels, and the int64 CCW segment-intersection predicate
(gpx2tiles.c:421-447) with vectorized numpy int64 math.

Lines are plain Bresenham: the reference configures gd antialiasing but
never draws with the gdAntiAliased pseudo-color, so its output lines are
plain Bresenham too (SURVEY.md §2.8 K11).
"""

from __future__ import annotations

import numpy as np

from .config import TILE_H, TILE_W

# ---------------------------------------------------------------------------
# Integer CCW intersection predicates (vectorized)
# ---------------------------------------------------------------------------

def turn(p1x, p1y, p2x, p2y, p3x, p3y):
    """Orientation sign of (p1,p2,p3) in int64, as the reference's `turn`
    (gpx2tiles.c:421-432): sign((p3y-p1y)(p2x-p1x) - (p2y-p1y)(p3x-p1x))."""
    a = (np.int64(p3y) - np.int64(p1y)) * (np.int64(p2x) - np.int64(p1x))
    b = (np.int64(p2y) - np.int64(p1y)) * (np.int64(p3x) - np.int64(p1x))
    return np.sign(a - b).astype(np.int64)


def intersects(p1, p2, p3, p4):
    """Proper segment intersection (gpx2tiles.c:434-437); each p = (x, y)."""
    return (
        turn(p1[0], p1[1], p3[0], p3[1], p4[0], p4[1])
        != turn(p2[0], p2[1], p3[0], p3[1], p4[0], p4[1])
    ) & (
        turn(p1[0], p1[1], p2[0], p2[1], p3[0], p3[1])
        != turn(p1[0], p1[1], p2[0], p2[1], p4[0], p4[1])
    )


def crossing_tile(x1, y1, x2, y2, w: int = TILE_W, h: int = TILE_H):
    """True where segment (x1,y1)-(x2,y2) crosses one of the four tile border
    edges (gpx2tiles.c:439-447).  Vectorized over numpy arrays."""
    p1 = (np.asarray(x1, np.int64), np.asarray(y1, np.int64))
    p2 = (np.asarray(x2, np.int64), np.asarray(y2, np.int64))
    edges = [
        ((0, 0), (w - 1, 0)),
        ((0, 0), (0, h - 1)),
        ((w - 1, 0), (w - 1, h - 1)),
        ((0, h - 1), (w - 1, h - 1)),
    ]
    out = np.zeros(np.broadcast(p1[0], p2[0]).shape, dtype=bool)
    for e1, e2 in edges:
        out |= intersects(p1, p2, e1, e2)
    return out


# ---------------------------------------------------------------------------
# Canvas primitives.  Canvas = (H, W, 4) uint8 RGBA, row = y, col = x.
# Coordinates may fall outside the canvas — clipped, like gd does.
# ---------------------------------------------------------------------------

def _put(canvas: np.ndarray, xs: np.ndarray, ys: np.ndarray, color: int) -> None:
    h, w = canvas.shape[:2]
    m = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
    if not m.any():
        return
    r, g, b = (color >> 16) & 0xFF, (color >> 8) & 0xFF, color & 0xFF
    canvas[ys[m], xs[m]] = (r, g, b, 255)


def set_pixel(canvas: np.ndarray, x: int, y: int, color: int) -> None:
    _put(canvas, np.asarray([x]), np.asarray([y]), color)


def fill_rect(canvas: np.ndarray, x1: int, y1: int, x2: int, y2: int, color: int) -> None:
    """gdImageFilledRectangle-equivalent (inclusive corners)."""
    h, w = canvas.shape[:2]
    xa, xb = max(0, min(x1, x2)), min(w - 1, max(x1, x2))
    ya, yb = max(0, min(y1, y2)), min(h - 1, max(y1, y2))
    if xa > xb or ya > yb:
        return
    r, g, b = (color >> 16) & 0xFF, (color >> 8) & 0xFF, color & 0xFF
    canvas[ya : yb + 1, xa : xb + 1] = (r, g, b, 255)


def line_points(x1: int, y1: int, x2: int, y2: int) -> tuple[np.ndarray, np.ndarray]:
    """Bresenham integer line from (x1,y1) to (x2,y2), inclusive, as arrays."""
    dx, dy = abs(x2 - x1), abs(y2 - y1)
    n = max(dx, dy) + 1
    if dx >= dy:
        xs = np.arange(x1, x2 + (1 if x2 >= x1 else -1), 1 if x2 >= x1 else -1)
        if dx == 0:
            ys = np.asarray([y1])
        else:
            # classic Bresenham y accumulation without FP drift
            t = np.abs(xs - x1)
            ys = y1 + np.sign(y2 - y1) * ((2 * t * dy + dx) // (2 * dx))
    else:
        ys = np.arange(y1, y2 + (1 if y2 >= y1 else -1), 1 if y2 >= y1 else -1)
        t = np.abs(ys - y1)
        xs = x1 + np.sign(x2 - x1) * ((2 * t * dx + dy) // (2 * dy))
    assert len(xs) == n and len(ys) == n
    return np.asarray(xs, np.int64), np.asarray(ys, np.int64)


def draw_line(canvas: np.ndarray, x1: int, y1: int, x2: int, y2: int,
              color: int, thickness: int = 1) -> None:
    """Bresenham line with gd-style square thickness brush.

    gd's thick lines stamp a wid×wid block per step; thickness <= 1 is a
    plain 1px line (the reference's default thickness table is all zeros,
    gpx2tiles.c:60,308 — gd treats that as 1px)."""
    xs, ys = line_points(int(x1), int(y1), int(x2), int(y2))
    if thickness <= 1:
        _put(canvas, xs, ys, color)
        return
    half = thickness // 2
    for ox in range(-half, thickness - half):
        for oy in range(-half, thickness - half):
            _put(canvas, xs + ox, ys + oy, color)


def lines_points_batch(x1, y1, x2, y2):
    """Vectorized Bresenham for a batch of lines.

    Returns (xs, ys, reps) where reps[i] is the pixel count of line i and
    xs/ys concatenate every line's pixels in order (start→end, line after
    line) — identical pixel sequence to calling :func:`line_points` per
    line, so a single ordered stamp preserves last-writer-wins semantics.
    """
    x1 = np.asarray(x1, np.int64); y1 = np.asarray(y1, np.int64)
    x2 = np.asarray(x2, np.int64); y2 = np.asarray(y2, np.int64)
    dx = np.abs(x2 - x1); dy = np.abs(y2 - y1)
    n = np.maximum(dx, dy) + 1
    total = int(n.sum())
    line_start = np.concatenate(([0], np.cumsum(n)[:-1]))
    t = np.arange(total) - np.repeat(line_start, n)
    sx = np.repeat(np.sign(x2 - x1), n)
    sy = np.repeat(np.sign(y2 - y1), n)
    rdx = np.repeat(dx, n); rdy = np.repeat(dy, n)
    rx1 = np.repeat(x1, n); ry1 = np.repeat(y1, n)
    major = rdx >= rdy
    safe_dx = np.where(rdx > 0, rdx, 1)
    safe_dy = np.where(rdy > 0, rdy, 1)
    xs = np.where(major, rx1 + sx * t,
                  rx1 + sx * ((2 * t * rdx + rdy) // (2 * safe_dy)))
    ys = np.where(major, ry1 + sy * ((2 * t * rdy + rdx) // (2 * safe_dx)),
                  ry1 + sy * t)
    return xs, ys, n


def fill_ellipse(canvas: np.ndarray, cx: int, cy: int, dw: int, dh: int, color: int) -> None:
    """Filled ellipse with center (cx,cy), axis diameters (dw,dh) —
    gdImageFilledEllipse-equivalent: rows at dy in [-h/2, h/2], each row's
    half-width from the ellipse equation (midpoint-style)."""
    a, b = max(dw // 2, 0), max(dh // 2, 0)
    if a == 0 or b == 0:
        set_pixel(canvas, cx, cy, color)
        return
    dy = np.arange(-b, b + 1)
    half_w = np.trunc(a * np.sqrt(np.maximum(0.0, 1.0 - (dy / b) ** 2)) + 0.5).astype(np.int64)
    for row, hw in zip(cy + dy, half_w):
        fill_rect(canvas, cx - int(hw), int(row), cx + int(hw), int(row), color)


def ellipse_pixels(cx: int, cy: int, dw: int, dh: int) -> tuple[np.ndarray, np.ndarray]:
    """Pixel list of :func:`fill_ellipse` (row spans, top to bottom)."""
    a, b = max(dw // 2, 0), max(dh // 2, 0)
    if a == 0 or b == 0:
        return np.asarray([cx], np.int64), np.asarray([cy], np.int64)
    dy = np.arange(-b, b + 1)
    half_w = np.trunc(a * np.sqrt(np.maximum(0.0, 1.0 - (dy / b) ** 2)) + 0.5).astype(np.int64)
    counts = 2 * half_w + 1
    ys = np.repeat(cy + dy, counts)
    xs = np.concatenate([np.arange(cx - h, cx + h + 1) for h in half_w])
    return xs, ys


def stamp_pixels(canvas: np.ndarray, xs: np.ndarray, ys: np.ndarray,
                 colors: np.ndarray) -> None:
    """Vectorized last-writer-wins pixel stamps (np.add-free; later rows win
    because numpy fancy assignment applies in index order)."""
    h, w = canvas.shape[:2]
    xs = np.asarray(xs, np.int64)
    ys = np.asarray(ys, np.int64)
    colors = np.asarray(colors, np.int64)
    m = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
    if not m.any():
        return
    xs, ys, colors = xs[m], ys[m], colors[m]
    canvas[ys, xs, 0] = (colors >> 16) & 0xFF
    canvas[ys, xs, 1] = (colors >> 8) & 0xFF
    canvas[ys, xs, 2] = colors & 0xFF
    canvas[ys, xs, 3] = 255
