"""Per-glyph parity check of draw._FONT_6x13 against an X11 BDF font.

The -d4 speed-text glyphs are transcribed from the public X11 misc-fixed
6x13 font (the ancestor of gd's gdFontSmall — gd gdfonts.c).  This
container ships neither libgd nor the BDF, so the comparison is
SCRIPTED rather than run in CI: point it at a `6x13.bdf` (e.g. from the
xorg font-misc-misc distribution) and it prints per-glyph parity.

    python tools/check_glyphs_bdf.py /path/to/6x13.bdf

BDF handling: each glyph's BITMAP rows are placed into the 6x13 cell
using BBX offsets against FONTBOUNDINGBOX (ascent-aligned), then
compared row-by-row to the engine's 6-bit-MSB rows.

Exit status 0 iff every charset glyph matches.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gpx2tiles_spark.draw import _FONT_6x13, FONT_H, FONT_W  # noqa: E402


def parse_bdf(path: str) -> dict[str, list[int]]:
    """encoding char → 13 rows of MSB-left bits in a 6-wide cell."""
    glyphs: dict[str, list[int]] = {}
    with open(path, encoding="latin-1") as f:
        lines = iter(f.read().splitlines())
    font_bbx = None  # (w, h, xoff, yoff)
    cur_enc = None
    cur_bbx = None
    for line in lines:
        tok = line.split()
        if not tok:
            continue
        if tok[0] == "FONTBOUNDINGBOX":
            font_bbx = tuple(int(x) for x in tok[1:5])
        elif tok[0] == "ENCODING":
            cur_enc = int(tok[1])
        elif tok[0] == "BBX":
            cur_bbx = tuple(int(x) for x in tok[1:5])
        elif tok[0] == "BITMAP":
            rows_hex = []
            for bl in lines:
                if bl.strip() == "ENDCHAR":
                    break
                rows_hex.append(bl.strip())
            if cur_enc is None or not (32 <= cur_enc < 127):
                continue
            ch = chr(cur_enc)
            if ch not in _FONT_6x13:
                continue
            bw, bh, bxoff, byoff = cur_bbx
            fw, fh, fxoff, fyoff = font_bbx
            # cell rows top→bottom; glyph top row index within the cell:
            # cell top = ascent = fh + fyoff ... top pad rows =
            # fh - bh - (byoff - fyoff)
            top_pad = fh - bh - (byoff - fyoff)
            rows = [0] * fh
            for i, hx in enumerate(rows_hex):
                bits = int(hx, 16)
                nbytes = len(hx) // 2
                # BDF rows are MSB-left padded to byte; shift into a
                # byte-wide MSB-left 6-bit cell row
                row = bits >> (8 * nbytes - 8)  # keep leftmost byte
                row = (row >> (bxoff - fxoff)) if bxoff > fxoff else \
                      (row << (fxoff - bxoff)) if fxoff > bxoff else row
                rows[top_pad + i] = row & 0xFF
            glyphs[ch] = rows[:fh]
    return glyphs


def main() -> int:
    if len(sys.argv) != 2:
        sys.stderr.write(__doc__ + "\n")
        return 2
    bdf = parse_bdf(sys.argv[1])
    bad = 0
    for ch, want in sorted(_FONT_6x13.items()):
        got = bdf.get(ch)
        if got is None:
            print(f"{ch!r}: MISSING from BDF")
            bad += 1
            continue
        ok = list(got[:FONT_H]) == list(want)
        print(f"{ch!r}: {'MATCH' if ok else 'DIFF'}")
        if not ok:
            for i, (g, w) in enumerate(zip(got, want)):
                if g != w:
                    print(f"   row {i}: bdf={g:#04x} engine={w:#04x}")
            bad += 1
    print(f"{len(_FONT_6x13) - bad}/{len(_FONT_6x13)} glyphs match "
          f"({FONT_W}x{FONT_H} cell)")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
