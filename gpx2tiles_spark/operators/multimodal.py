"""Multimodal column plumbing: media spans as opaque binary + typed
metadata, with Arrow-batched decode + feature extraction.

The *decode* step is REAL for PNG payloads: the synthetic corpus's media
objects are genuine RGBA PNGs (``synth_png``, built with the repo's own
pure-stdlib codec in ``pngcodec.py``) and ``media_features`` routes
``media_kind == 'png'`` through ``pngcodec.decode_png`` — the luma plane
and pooled features come from actually-decoded pixels.  Only kinds with
no in-container codec (jpeg/audio/video) fall back to the clearly-marked
deterministic stand-in ``_fake_decode``; swapping that for PIL/ffmpeg is
a one-function change on the executors.

Synthetic payloads are encoded at deflate level 0 (stored blocks), so
the byte length is closed-form — ``68 + height + 4*width*height`` for
any tile smaller than one 64 KiB deflate block — which keeps the
``multimodal_meta`` n_bytes column expressible in the DuckDB oracle SQL
even though the payload itself is a real compressed container format.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..pngcodec import decode_png, encode_png

MEDIA_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("span_idx", T.IntegerType(), False),
    T.StructField("media_ref", T.StringType(), False),
    T.StructField("payload", T.BinaryType(), False),
    T.StructField("media_kind", T.StringType(), False),
    T.StructField("width", T.IntegerType(), False),
    T.StructField("height", T.IntegerType(), False),
])

FEATURES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("span_idx", T.IntegerType(), False),
    T.StructField("media_ref", T.StringType(), False),
    T.StructField("media_kind", T.StringType(), False),
    T.StructField("n_bytes", T.IntegerType(), False),
    T.StructField("width", T.IntegerType(), False),
    T.StructField("height", T.IntegerType(), False),
    T.StructField("mean_luma_milli", T.LongType(), False),
    T.StructField("feature", T.ArrayType(T.FloatType()), False),
])

# Rec. 601 luma weights — the standard RGB→Y conversion.
_LUMA_W = np.array([0.299, 0.587, 0.114], dtype=np.float64)


def synth_png(seed_bytes: bytes, width: int, height: int) -> bytes:
    """Deterministic synthetic media object: a real RGBA PNG whose pixel
    content is md5-seeded Philox noise (opaque alpha).  Level 0 (stored
    deflate) keeps ``len() == 68 + height + 4*width*height`` exactly for
    images under one 64 KiB deflate block — see module docstring."""
    seed = int.from_bytes(hashlib.md5(seed_bytes).digest()[:8], "big")
    rng = np.random.default_rng(np.random.Philox(key=seed))
    rgba = rng.integers(0, 256, size=(height, width, 4), dtype=np.uint8)
    rgba[..., 3] = 255
    return encode_png(rgba, level=0)


def synth_png_len(width: int, height: int) -> int:
    """Closed-form byte length of ``synth_png`` output (level-0 deflate,
    single stored block): 8 sig + 25 IHDR + 12 IDAT framing + 12 IEND
    + 11 zlib framing (2 hdr + 5 block hdr + 4 adler) + raw scanlines."""
    raw = height * (1 + 4 * width)
    assert raw <= 65535, "multiple stored blocks — formula no longer holds"
    return 68 + raw


def _fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB: deterministic stand-in for media kinds with no in-container
    codec (jpeg/audio frames/video stills).

    Real deployments replace this with PIL/libjpeg/ffmpeg on the
    executor; the fake derives a (h, w) luma plane from the payload
    bytes so downstream shapes and statistics are real and reproducible.
    PNG payloads never reach this — they go through the real decoder."""
    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width), dtype=np.uint8)


def decode_luma(payload: bytes, media_kind: str,
                width: int, height: int) -> np.ndarray:
    """payload → (h, w) float64 luma plane.  PNG: real decode via the
    repo codec + Rec. 601 luma.  Other kinds: the declared fake."""
    if media_kind == "png":
        rgba = decode_png(bytes(payload))
        if rgba.shape[:2] != (height, width):
            raise ValueError(
                f"decoded PNG is {rgba.shape[1]}x{rgba.shape[0]}, "
                f"metadata says {width}x{height}")
        return rgba[..., :3].astype(np.float64) @ _LUMA_W
    return _fake_decode(bytes(payload), width, height).astype(np.float64)


@F.pandas_udf(T.BinaryType())
def _synth_png_udf(ref: pd.Series, w: pd.Series, h: pd.Series) -> pd.Series:
    return pd.Series(
        [synth_png(r.encode("utf-8"), int(wi), int(hi))
         for r, wi, hi in zip(ref, w, h)],
        dtype=object)


def media_table(documents: DataFrame) -> DataFrame:
    """Materialize media spans as an opaque-binary table with metadata.
    The payload is a REAL PNG synthesized deterministically from the
    media_ref on the executors (the ref stands in for a blob-store
    fetch; everything after it — bytes, decode, features — is the real
    pipeline)."""
    spans = documents.select(
        "doc_id", F.posexplode("spans").alias("span_idx", "span")
    ).filter(F.col("span.kind") == "media").select(
        "doc_id", "span_idx", F.col("span.media_ref").alias("media_ref"),
    )
    sized = spans.select(
        "doc_id", "span_idx", "media_ref",
        F.lit("png").alias("media_kind"),
        (F.abs(F.hash("media_ref")) % 64 + 16).cast("int").alias("width"),
        (F.abs(F.hash("media_ref", "doc_id")) % 64 + 16).cast("int").alias("height"),
    )
    return sized.select(
        "doc_id", "span_idx", "media_ref",
        _synth_png_udf("media_ref", "width", "height").alias("payload"),
        "media_kind", "width", "height")


def media_table_from_flat_docs(documents: DataFrame) -> DataFrame:
    """MEDIA_SCHEMA table derived from a flat documents table
    (doc_id, text): every 3rd document owns one media object whose ref is
    the md5 of its text.  Metadata arithmetic is SQL-expressible —
    including n_bytes, because level-0 PNGs have a closed-form length —
    so the whole metadata path has an exact DuckDB oracle."""
    sel = documents.filter(F.col("doc_id") % 3 == 0)
    ref = F.concat(F.lit("media://"), F.md5(F.col("text")))
    sized = sel.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.lit(0).alias("span_idx"),
        ref.alias("media_ref"),
        F.lit("png").alias("media_kind"),
        (F.col("doc_id") % 64 + 16).cast("int").alias("width"),
        ((F.col("doc_id") * 7 + 3) % 64 + 16).cast("int").alias("height"),
    )
    return sized.select(
        "doc_id", "span_idx", "media_ref",
        _synth_png_udf("media_ref", "width", "height").alias("payload"),
        "media_kind", "width", "height")


def media_features(media: DataFrame, feat_dim: int = 8) -> DataFrame:
    """Arrow-batched decode + feature extraction over a MEDIA_SCHEMA
    table (one UDF invocation per Arrow batch, not per row — the batch
    shape the real codec would see).  PNG payloads are REALLY decoded
    (pngcodec.decode_png); the luma plane, mean luma and column-pooled
    feature vector come from the decoded pixels."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                luma = decode_luma(bytes(r.payload), r.media_kind,
                                   int(r.width), int(r.height))
                # column-mean pooled feature (vectorized numpy)
                pooled = luma.mean(axis=0)
                idx = np.linspace(0, len(pooled) - 1, feat_dim).astype(int)
                rows.append({
                    "doc_id": r.doc_id, "span_idx": int(r.span_idx),
                    "media_ref": r.media_ref, "media_kind": r.media_kind,
                    "n_bytes": len(bytes(r.payload)),
                    "width": int(r.width), "height": int(r.height),
                    "mean_luma_milli": int(np.floor(luma.mean() * 1000)),
                    "feature": (pooled[idx] / 255.0).astype(np.float32).tolist(),
                })
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURES_SCHEMA.fields])

    return media.mapInPandas(extract, FEATURES_SCHEMA)


def document_media_features(documents: DataFrame, feat_dim: int = 8) -> DataFrame:
    """media spans of a (doc_id, spans) corpus → features."""
    return media_features(media_table(documents), feat_dim)
