"""Minimal deterministic baseline JPEG codec (stdlib + numpy only).

Encodes/decodes 8-bit RGB images as numpy (H, W, 3) uint8 arrays:
baseline sequential DCT, 4:4:4 (no chroma subsampling), JFIF color
transform, and OPTIMIZED canonical Huffman tables computed from the
image's own symbol frequencies (what libjpeg's ``optimize_coding``
emits) — the file is fully self-describing: the decoder builds its
Huffman decoders and quantizers from the DHT/DQT segments it parses,
never from assumptions shared with the encoder.

Scope (documented, validated by the decoder):
- SOF0 baseline only, 8-bit, 1 or 3 components, 1x1 sampling;
- no restart markers, no progressive, no arithmetic coding;
- quantization uses a single scaled table for all components (any
  table is legal — it travels in DQT).

Determinism: quantization is ``floor(x/q + 0.5)`` (no banker's
rounding), the DCT is a fixed float64 matrix product, and Huffman ties
break by symbol value — identical input bytes in, identical JPEG bytes
out, on any machine.

This is the engine's real decode path for ``media_kind == 'jpeg'``
(operators/multimodal.py); round-trip and structural properties are
tested in tests/test_jpegcodec.py.
"""

from __future__ import annotations

import struct

import numpy as np

# --- constants -------------------------------------------------------------

_ZIGZAG = np.array([
    [0, 1, 5, 6, 14, 15, 27, 28],
    [2, 4, 7, 13, 16, 26, 29, 42],
    [3, 8, 12, 17, 25, 30, 41, 43],
    [9, 11, 18, 24, 31, 40, 44, 53],
    [10, 19, 23, 32, 39, 45, 52, 54],
    [20, 22, 33, 38, 46, 51, 55, 60],
    [21, 34, 37, 47, 50, 56, 59, 61],
    [35, 36, 48, 49, 57, 58, 62, 63],
])
_ZZ_FLAT = _ZIGZAG.reshape(-1)           # block index -> zigzag position
_UNZZ = np.argsort(_ZZ_FLAT)             # zigzag position -> block index

# Annex-K-style luminance quantization table (any table is legal; this
# one travels in the DQT segment either way)
_QBASE = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.float64)


def _dct_matrix() -> np.ndarray:
    k = np.arange(8)
    A = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16.0)
    A[0] *= 1.0 / np.sqrt(2.0)
    return A * 0.5


_A = _dct_matrix()


def _quant_table(scale: float) -> np.ndarray:
    q = np.clip(np.round(_QBASE * scale), 1, 255)
    return q.astype(np.float64)


# --- bit IO ----------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:           # byte stuffing
                self.out.append(0x00)
        # drop emitted bits — an unbounded bigint acc makes every shift
        # O(stream length), i.e. quadratic encode (ADVICE r04 #1)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG (entropy data exhausted)")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG (entropy data exhausted)")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1            # stuffed byte
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        # mask consumed bits before accumulating (same quadratic-bigint
        # trap as the writer — ADVICE r04 #1)
        self.acc = ((self.acc & ((1 << self.nbits) - 1)) << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


# --- Huffman ---------------------------------------------------------------


def _code_lengths(freq: dict[int, int], cap: int = 16) -> dict[int, int]:
    """Canonical Huffman code lengths from frequencies (heap merge),
    with the JPEG 16-bit cap enforced by the classic Adjust_BITS move.
    Ties break by symbol value for determinism."""
    import heapq

    if not freq:
        return {}
    if len(freq) == 1:
        return {next(iter(freq)): 1}
    # Tie-break on equal frequency by HIGHEST contained symbol value
    # (the rank tuple of negated symbols): this is libjpeg's rule, and
    # it guarantees the reserved phantom symbol 256 joins the FIRST
    # merge and therefore ends at maximal depth — i.e. last in
    # canonical order, on the all-1-bits code the spec sets aside.
    def rank(symbols: tuple[int, ...]) -> tuple[int, ...]:
        return tuple(sorted(-s for s in symbols))

    heap = [(f, rank((s,)), (s,)) for s, f in sorted(freq.items())]
    heapq.heapify(heap)
    depth: dict[int, int] = {s: 0 for s in freq}
    while len(heap) > 1:
        f1, _r1, s1 = heapq.heappop(heap)
        f2, _r2, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        merged = tuple(sorted(s1 + s2))
        heapq.heappush(heap, (f1 + f2, rank(merged), merged))
    # cap at 16 (Adjust_BITS): repeatedly shorten the deepest pair
    counts: dict[int, int] = {}
    for _s, d in depth.items():
        counts[d] = counts.get(d, 0) + 1
    maxd = max(counts)
    while maxd > cap:
        # take two symbols at maxd -> one at maxd-1, move one symbol
        # from some shorter level j down to j+1
        counts[maxd] -= 2
        counts[maxd - 1] = counts.get(maxd - 1, 0) + 1
        j = maxd - 2
        while counts.get(j, 0) == 0:
            j -= 1
        counts[j] -= 1
        counts[j + 1] = counts.get(j + 1, 0) + 2
        while counts.get(maxd, 0) == 0:
            maxd -= 1
    # reassign lengths canonically: sort symbols by (orig depth, value)
    order = sorted(depth, key=lambda s: (depth[s], s))
    out: dict[int, int] = {}
    i = 0
    for length in sorted(counts):
        for _ in range(counts[length]):
            out[order[i]] = length
            i += 1
    return out


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical order (length, then symbol)."""
    code = 0
    prev_len = 0
    out: dict[int, tuple[int, int]] = {}
    for s in sorted(lengths, key=lambda s: (lengths[s], s)):
        ln = lengths[s]
        code <<= (ln - prev_len)
        out[s] = (code, ln)
        code += 1
        prev_len = ln
    return out


def _dht_payload(tc: int, th: int, lengths: dict[int, int]) -> bytes:
    bits = [0] * 16
    for _s, ln in lengths.items():
        bits[ln - 1] += 1
    vals = sorted(lengths, key=lambda s: (lengths[s], s))
    return bytes([(tc << 4) | th] + bits + vals)


class _HuffDecoder:
    """Spec F.2.2.3 MINCODE/MAXCODE/VALPTR decoder from a DHT segment."""

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        self.vals = vals
        code = 0
        k = 0
        for ln in range(1, 17):
            if bits[ln - 1]:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += bits[ln - 1]
                k += bits[ln - 1]
                self.maxcode[ln] = code - 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = br.bit()
        ln = 1
        while code > self.maxcode[ln]:
            code = (code << 1) | br.bit()
            ln += 1
            if ln > 16:
                raise ValueError("bad Huffman code")
        return self.vals[self.valptr[ln] + code - self.mincode[ln]]


# --- category / magnitude coding ------------------------------------------


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _magnitude_bits(v: int, cat: int) -> int:
    return v if v >= 0 else v + (1 << cat) - 1


def _extend(v: int, cat: int) -> int:
    if cat == 0:
        return 0
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


# --- encoder ---------------------------------------------------------------


def _blocks_of(chan: np.ndarray) -> np.ndarray:
    h, w = chan.shape
    H = (h + 7) // 8 * 8
    W = (w + 7) // 8 * 8
    padded = np.pad(chan, ((0, H - h), (0, W - w)), mode="edge")
    return (padded.reshape(H // 8, 8, W // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    m = np.array([[0.299, 0.587, 0.114],
                  [-0.168736, -0.331264, 0.5],
                  [0.5, -0.418688, -0.081312]])
    out = rgb.astype(np.float64) @ m.T
    out[..., 1:] += 128.0
    return out


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0]
    cb = ycc[..., 1] - 128.0
    cr = ycc[..., 2] - 128.0
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def encode_jpeg(rgb: np.ndarray, quant_scale: float = 1.0) -> bytes:
    """RGB (H, W, 3) or gray (H, W) uint8 -> baseline JPEG bytes."""
    arr = np.asarray(rgb)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    q = _quant_table(quant_scale)
    if gray:
        chans = [arr.astype(np.float64)]
    else:
        ycc = _rgb_to_ycbcr(arr)
        chans = [ycc[..., i] for i in range(3)]

    # DCT + quantize every 8x8 block of every channel
    qblocks = []
    for chan in chans:
        b = _blocks_of(chan) - 128.0
        coef = np.einsum("ij,njk,lk->nil", _A, b, _A)
        qb = np.floor(coef / q + 0.5).astype(np.int64)
        qblocks.append(qb.reshape(-1, 64)[:, _UNZZ])  # zigzag order

    # interleave blocks MCU by MCU (1x1 sampling: one block per
    # component per MCU, components in order)
    n_mcu = qblocks[0].shape[0]

    def symbol_stream():
        prev_dc = [0] * len(qblocks)
        for m in range(n_mcu):
            for ci, qb in enumerate(qblocks):
                blk = qb[m]
                diff = int(blk[0]) - prev_dc[ci]
                prev_dc[ci] = int(blk[0])
                cls = 0 if ci == 0 else 1
                cat = _category(diff)
                yield ("dc", cls, cat, _magnitude_bits(diff, cat), cat)
                run = 0
                nz = np.nonzero(blk[1:])[0]
                last = nz[-1] + 1 if len(nz) else 0
                for k in range(1, last + 1):
                    v = int(blk[k])
                    if v == 0:
                        run += 1
                        continue
                    while run >= 16:
                        yield ("ac", cls, 0xF0, 0, 0)  # ZRL
                        run -= 16
                    cat = _category(v)
                    yield ("ac", cls, (run << 4) | cat,
                           _magnitude_bits(v, cat), cat)
                    run = 0
                if last < 63:
                    yield ("ac", cls, 0x00, 0, 0)      # EOB

    # pass 1: frequencies -> optimized canonical tables.  A phantom
    # symbol 256 (count 1, sorts last) reserves the all-1-bits code the
    # spec sets aside: it lands on the longest code, is excluded from
    # the DHT, and is never emitted — libjpeg's optimize_coding trick.
    freqs = {("dc", 0): {}, ("dc", 1): {}, ("ac", 0): {}, ("ac", 1): {}}
    for kind, cls, sym, _mag, _cat in symbol_stream():
        f = freqs[(kind, cls)]
        f[sym] = f.get(sym, 0) + 1
    lengths = {k: _code_lengths({**v, 256: 1}) if v else {}
               for k, v in freqs.items()}
    codes = {k: _canonical_codes(v) for k, v in lengths.items()}
    lengths = {k: {s: ln for s, ln in v.items() if s != 256}
               for k, v in lengths.items()}

    # pass 2: entropy-coded data
    bw = _BitWriter()
    for kind, cls, sym, mag, cat in symbol_stream():
        code, ln = codes[(kind, cls)][sym]
        bw.put(code, ln)
        if cat:
            bw.put(mag, cat)
    scan = bw.flush()

    # assemble segments
    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    # DQT payload stores the table in zigzag order
    qzz = np.floor(q).astype(np.uint8).reshape(-1)[_UNZZ]
    out = [b"\xff\xd8"]                                  # SOI
    out.append(seg(0xFFDB, bytes([0x00]) + qzz.tobytes()))   # DQT id 0
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0])  # 1x1 sampling, quant table 0
    out.append(seg(0xFFC0, sof))                         # SOF0 baseline
    for (kind, cls), ln in lengths.items():
        if ln:
            out.append(seg(0xFFC4, _dht_payload(
                0 if kind == "dc" else 1, cls, ln)))     # DHT
    sos = bytes([ncomp])
    for ci in range(ncomp):
        td_ta = 0 if ci == 0 else 0x11
        sos += bytes([ci + 1, td_ta])
    sos += bytes([0, 63, 0])
    out.append(seg(0xFFDA, sos))                         # SOS
    out.append(scan)
    out.append(b"\xff\xd9")                              # EOI
    return b"".join(out)


# --- decoder ---------------------------------------------------------------


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> RGB (H, W, 3) uint8 (gray is broadcast).

    A real structural parser: quantizers come from DQT, Huffman
    decoders from DHT, dimensions/components from SOF0 — nothing is
    assumed from the encoder.  Rejects progressive (SOF2), arithmetic
    coding, subsampling and restart intervals."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    frame = None
    comps: list[tuple[int, int, int]] = []   # (id, sampling, tq)
    scan_comps: list[tuple[int, int, int]] = []  # (id, td, ta)
    scan_data = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        if pos + 2 > len(data):
            raise ValueError("truncated JPEG (marker cut short)")
        marker = struct.unpack_from(">H", data, pos)[0]
        pos += 2
        if marker == 0xFFD9:
            break
        if marker == 0xFF01 or 0xFFD0 <= marker <= 0xFFD7:
            continue                     # TEM/RSTn: standalone, no length
        if marker in (0xFFC2, 0xFFC1, 0xFFC3):
            raise ValueError("unsupported JPEG (need baseline SOF0)")
        if pos + 2 > len(data):
            raise ValueError("truncated JPEG (segment length cut short)")
        (ln,) = struct.unpack_from(">H", data, pos)
        if ln < 2 or pos + ln > len(data):
            raise ValueError("truncated JPEG (segment body cut short)")
        payload = data[pos + 2: pos + ln]
        pos += ln
        if marker == 0xFFDB:
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.frombuffer(payload[p + 1: p + 65],
                                    dtype=np.uint8).astype(np.float64)
                qtables[tq] = tbl[_ZZ_FLAT].reshape(8, 8)
                p += 65
        elif marker == 0xFFC4:
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1: p + 17])
                nv = sum(bits)
                vals = list(payload[p + 17: p + 17 + nv])
                huff[(tc, th)] = _HuffDecoder(bits, vals)
                p += 17 + nv
        elif marker == 0xFFC0:
            prec, h, w, nc = struct.unpack_from(">BHHB", payload, 0)
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            frame = (h, w, nc)
            for ci in range(nc):
                cid, samp, tq = payload[6 + 3 * ci: 9 + 3 * ci]
                if samp != 0x11:
                    raise ValueError("chroma subsampling unsupported")
                comps.append((cid, samp, tq))
        elif marker == 0xFFDA:
            ns = payload[0]
            for ci in range(ns):
                cid, tdta = payload[1 + 2 * ci: 3 + 2 * ci]
                scan_comps.append((cid, tdta >> 4, tdta & 0xF))
            # entropy data runs until the next real marker (EOI)
            end = pos
            while True:
                if end + 1 >= len(data):
                    raise ValueError("truncated JPEG (file ends mid-scan)")
                if data[end] == 0xFF and data[end + 1] not in (0x00,):
                    break
                end += 1
            scan_data = data[pos:end]
            pos = end
        elif marker == 0xFFDD:
            raise ValueError("restart intervals unsupported")
        # APPn/COM segments are skipped silently
    if frame is None or scan_data is None:
        raise ValueError("JPEG missing SOF/SOS")

    h, w, nc = frame
    bh, bw_ = (h + 7) // 8, (w + 7) // 8
    n_mcu = bh * bw_
    br = _BitReader(scan_data)
    planes = [np.zeros((bh * 8, bw_ * 8)) for _ in range(nc)]
    prev_dc = [0] * nc
    for m in range(n_mcu):
        by, bx = divmod(m, bw_)
        for ci in range(nc):
            _cid, td, ta = scan_comps[ci]
            tq = comps[ci][2]
            dcd, acd = huff[(0, td)], huff[(1, ta)]
            zz = np.zeros(64, np.int64)
            cat = dcd.decode(br)
            diff = _extend(br.bits(cat), cat) if cat else 0
            prev_dc[ci] += diff
            zz[0] = prev_dc[ci]
            k = 1
            while k <= 63:
                rs = acd.decode(br)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r == 15:
                        k += 16
                        continue
                    break                       # EOB
                k += r
                if k > 63:
                    raise ValueError("AC run past block end")
                zz[k] = _extend(br.bits(s), s)
                k += 1
            coef = zz[_ZZ_FLAT].reshape(8, 8) * qtables[tq]
            blk = _A.T @ coef @ _A + 128.0
            planes[ci][by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = blk
    planes = [p[:h, :w] for p in planes]
    if nc == 1:
        g = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    return _ycbcr_to_rgb(np.stack(planes, axis=-1))
