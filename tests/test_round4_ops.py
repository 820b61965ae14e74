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


def test_kmeans_centroids_balance_and_recall(spark):
    """Real Lloyd iterations must (a) move off the first-n seed, (b)
    balance cells on a clustered corpus (max/mean bounded), and (c) keep
    the IVF top-k exact when the probe covers the clusters."""
    import numpy as np
    from gpx2tiles_spark.operators import ann

    rng = np.random.default_rng(42)
    n_clusters, per, dim = 8, 40, 16
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    # first 8 ids: one noisy member per cluster (realistic seeding)
    for c in range(n_clusters):
        v = centers[c] + rng.normal(0, 0.25, dim)
        rows.append((vid, [float(x) for x in v])); vid += 1
    for c in range(n_clusters):
        for _ in range(per - 1):
            v = centers[c] + rng.normal(0, 0.15, dim)
            rows.append((vid, [float(x) for x in v])); vid += 1
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    seed = ann._seed_centroids(vecs, n_clusters)
    cents = ann.kmeans_centroids(vecs, n_cells=n_clusters, n_iter=4)
    assert cents != seed  # Lloyd actually updated

    from pyspark.sql import functions as F
    sizes = {r.cell: r.n for r in
             ann._ivf_assign(vecs, "embedding", "vec_id", cents, 1)
             .groupBy("cell").agg(F.count("*").alias("n"))
             .collect()}
    mean = sum(sizes.values()) / n_clusters
    assert max(sizes.values()) <= 2.0 * mean, sizes
    assert len(sizes) == n_clusters  # no empty cells on this corpus

    # recall: k-means IVF with a full probe == brute force
    qs = vecs.filter("vec_id < 2").selectExpr(
        "vec_id AS qid", "embedding AS q_embedding")
    got = {(r.qid, r.rnk): r.vec_id for r in ann.cosine_topk_ivf(
        vecs, qs, k=5, n_cells=n_clusters, n_probe=n_clusters,
        centroids=cents).collect()}
    want = {(r.qid, r.rnk): r.vec_id for r in
            ann.cosine_topk_bruteforce(vecs, qs, k=5).collect()}
    assert got == want


def test_glyph_table_checksums_pinned():
    """Drift guard + provenance record for the -d4 6x13 glyph table:
    the exact row bytes are pinned by checksum so any edit is a
    deliberate, reviewable change.  TRUE parity against the public X11
    misc-fixed 6x13 BDF is scripted in tools/check_glyphs_bdf.py — the
    container ships neither libgd nor the BDF, so it runs out-of-band;
    these hashes are the values an external check verifies against."""
    import hashlib
    from gpx2tiles_spark.draw import _FONT_6x13, FONT_H

    pinned = {
        ".": "9f369643a7468725",
        "0": "060c39ff4def2677",
        "1": "4e0e0145b0540495",
        "2": "1436b67e916c5f8d",
        "3": "f16d0a5f94ac3f4c",
        "4": "bc7abd19d7c449db",
        "5": "9a98634835e101c4",
        "6": "9c40ec0b2b756c25",
        "7": "2a23adca71818adf",
        "8": "98124edf150e6384",
        "9": "b6100eaf387290cd",
    }
    assert set(_FONT_6x13) == set(pinned)  # full "%.1f" charset
    for ch, rows in _FONT_6x13.items():
        assert len(rows) == FONT_H
        assert all(0 <= r <= 0xFC and (r & 0x03) == 0 for r in rows), \
            f"{ch!r}: bits outside the 6-wide cell"
        got = hashlib.sha256(bytes(rows)).hexdigest()[:16]
        assert got == pinned[ch], f"glyph {ch!r} drifted"
