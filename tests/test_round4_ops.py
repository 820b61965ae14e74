"""Round-4 hardening tests: real PNG decode in the multimodal path,
closed-form level-0 PNG lengths, decode routing."""

from __future__ import annotations

import numpy as np
import pytest

from gpx2tiles_spark.operators.multimodal import (
    MEDIA_SCHEMA, decode_luma, media_features, synth_png, synth_png_len)
from gpx2tiles_spark.pngcodec import decode_png, encode_png


def test_synth_png_is_real_png_with_closed_form_length():
    for (w, h) in [(16, 16), (79, 79), (17, 61)]:
        data = synth_png(b"seed", w, h)
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        assert len(data) == synth_png_len(w, h) == 68 + h * (1 + 4 * w)
        rgba = decode_png(data)
        assert rgba.shape == (h, w, 4)
        assert (rgba[..., 3] == 255).all()
    # deterministic: same seed → same bytes
    assert synth_png(b"x", 20, 20) == synth_png(b"x", 20, 20)
    assert synth_png(b"x", 20, 20) != synth_png(b"y", 20, 20)


def test_decode_luma_known_png_known_luma():
    """A hand-built 2x2 PNG decodes to the exact Rec.601 luma values."""
    rgba = np.zeros((2, 2, 4), dtype=np.uint8)
    rgba[0, 0] = (255, 0, 0, 255)    # pure red   → 0.299*255
    rgba[0, 1] = (0, 255, 0, 255)    # pure green → 0.587*255
    rgba[1, 0] = (0, 0, 255, 255)    # pure blue  → 0.114*255
    rgba[1, 1] = (255, 255, 255, 255)  # white    → 255
    luma = decode_luma(encode_png(rgba), "png", 2, 2)
    want = np.array([[0.299 * 255, 0.587 * 255],
                     [0.114 * 255, 255.0]])
    assert np.allclose(luma, want)


def test_decode_luma_rejects_mismatched_metadata():
    data = synth_png(b"s", 8, 8)
    with pytest.raises(ValueError, match="metadata"):
        decode_luma(data, "png", 9, 8)


def test_media_features_decodes_real_pixels(spark):
    """Spark-side round trip: a known PNG payload through the
    mapInPandas extractor yields the luma stats of the ACTUAL pixels
    (constant gray 100 → mean_luma exactly 100)."""
    rgba = np.full((4, 6, 4), 100, dtype=np.uint8)
    rgba[..., 3] = 255
    payload = encode_png(rgba)
    media = spark.createDataFrame(
        [("d0", 0, "media://t", bytearray(payload), "png", 6, 4)],
        MEDIA_SCHEMA)
    row = media_features(media, feat_dim=3).collect()[0]
    assert row.n_bytes == len(payload)
    assert row.mean_luma_milli == 100_000  # floor(100.0 * 1000)
    assert [round(f, 5) for f in row.feature] == [round(100 / 255.0, 5)] * 3


def test_media_features_nonpng_uses_declared_fake(spark):
    """Kinds with no in-container codec still flow through the declared
    deterministic stand-in (documented stub, not silent)."""
    media = spark.createDataFrame(
        [("d0", 0, "media://j", bytearray(b"notapng"), "jpeg", 5, 5)],
        MEDIA_SCHEMA)
    row = media_features(media).collect()[0]
    assert 0 <= row.mean_luma_milli <= 255_000
