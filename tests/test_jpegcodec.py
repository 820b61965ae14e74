"""Baseline JPEG codec (gpx2tiles_spark.jpegcodec): round-trip,
determinism, structural validation, and spec-conformance properties."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from gpx2tiles_spark.jpegcodec import decode_jpeg, encode_jpeg


def _gradient(h, w):
    x = np.linspace(0, 255, w)[None, :] * np.ones((h, 1))
    y = np.linspace(0, 255, h)[:, None] * np.ones((1, w))
    return np.stack([x, y, (x + y) / 2], axis=-1).astype(np.uint8)


def test_roundtrip_smooth_image_bounded_error():
    rgb = _gradient(40, 56)
    out = decode_jpeg(encode_jpeg(rgb))
    assert out.shape == rgb.shape
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 12


def test_roundtrip_noise_near_lossless_at_unit_quant():
    """With a unit quantization table the only loss is DCT/YCbCr float
    rounding — even white noise must round-trip within ±3."""
    rng = np.random.default_rng(7)
    for _ in range(3):
        h, w = int(rng.integers(8, 70)), int(rng.integers(8, 70))
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, quant_scale=0.01))
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 3


def test_gray_and_nonmultiple_of_8_dims():
    g = np.linspace(0, 255, 37)[None, :] * np.ones((21, 1))
    g = g.astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g))
    assert out.shape == (21, 37, 3)
    assert np.abs(out[..., 0].astype(int) - g.astype(int)).max() <= 8
    assert (out[..., 0] == out[..., 1]).all()  # gray broadcast


def test_deterministic_and_structural():
    rgb = _gradient(24, 24)
    a = encode_jpeg(rgb)
    assert a == encode_jpeg(rgb)
    assert a[:2] == b"\xff\xd8" and a[-2:] == b"\xff\xd9"
    # every 0xFF inside the scan is stuffed or a marker: walking the
    # segment structure must land exactly on EOI
    markers = []
    pos = 2
    while pos < len(a) - 2:
        assert a[pos] == 0xFF, f"structure broken at {pos}"
        marker = struct.unpack_from(">H", a, pos)[0]
        markers.append(marker)
        (ln,) = struct.unpack_from(">H", a, pos + 2)
        pos += 2 + ln
        if marker == 0xFFDA:  # scan: skip entropy data to EOI
            while not (a[pos] == 0xFF and a[pos + 1] != 0x00):
                pos += 1
    assert 0xFFDB in markers and 0xFFC0 in markers and 0xFFC4 in markers
    assert a[pos:pos + 2] == b"\xff\xd9"


def test_huffman_tables_reserve_all_ones_code():
    """No DHT table may assign a symbol to the all-1-bits code of its
    longest length (spec B.2.4.2 reservation, libjpeg-style phantom)."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    a = encode_jpeg(img, quant_scale=0.01)
    pos = 2
    while pos < len(a) - 2:
        marker = struct.unpack_from(">H", a, pos)[0]
        (ln,) = struct.unpack_from(">H", a, pos + 2)
        if marker == 0xFFC4:
            payload = a[pos + 4:pos + 2 + ln]
            bits = list(payload[1:17])
            # canonical: total codes at the max used length must be <
            # the number of available codes (all-ones one left over)
            code = 0
            for length in range(1, 17):
                code = (code << 1) + bits[length - 1]
            maxlen = max(i + 1 for i in range(16) if bits[i])
            all_ones = (1 << maxlen) - 1
            # reconstruct the last assigned code at maxlen
            c = 0
            for length in range(1, maxlen + 1):
                c <<= 1
                c += bits[length - 1]
            assert c - 1 < all_ones, "all-ones code assigned"
        if marker == 0xFFDA:
            break
        pos += 2 + ln


def test_decoder_rejects_unsupported():
    rgb = _gradient(16, 16)
    a = bytearray(encode_jpeg(rgb))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"nope")
    # flip SOF0 -> SOF2 (progressive)
    i = bytes(a).find(b"\xff\xc0")
    a[i + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(a))


def test_property_roundtrip_random_images():
    """Hypothesis-style property sweep (seeded, no flaky shrink): any
    8-bit RGB image round-trips within ±3 at unit quantization, for
    shapes crossing both 8-multiple and ragged block boundaries."""
    try:
        from hypothesis import given, settings, strategies as st
    except ImportError:  # hypothesis is in the container, but be safe
        import pytest
        pytest.skip("hypothesis unavailable")

    @settings(max_examples=25, deadline=None)
    @given(
        st.integers(1, 40), st.integers(1, 40),
        st.integers(0, 2**32 - 1),
    )
    def check(h, w, seed):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, quant_scale=0.01))
        assert out.shape == img.shape
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 3

    check()


def test_property_wav_roundtrip():
    try:
        from hypothesis import given, settings, strategies as st
    except ImportError:
        import pytest
        pytest.skip("hypothesis unavailable")
    from gpx2tiles_spark.operators.multimodal import (
        decode_wav, synth_wav, synth_wav_len)

    @settings(max_examples=40, deadline=None)
    @given(st.binary(min_size=0, max_size=32), st.integers(1, 5000))
    def check(seed, n):
        data = synth_wav(seed, n)
        assert len(data) == synth_wav_len(n)
        assert decode_wav(data).shape == (n,)

    check()
