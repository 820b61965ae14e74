"""Multimodal column plumbing: media spans as opaque binary + typed
metadata, with Arrow-batched feature extraction.

The container has no image/audio codecs, so the *decode* step is a
clearly-marked deterministic fake (`_fake_decode`) — but everything
Spark-side is real and tested: schema, binary columns, batch shapes,
`mapInPandas` signature, partitioning.  Swapping `_fake_decode` for a
PIL/ffmpeg call is a one-function change on the executors.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


def _fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB: deterministic stand-in for an image decoder.

    Real deployments replace this with PIL/libjpeg on the executor; the
    fake derives a (h, w) luma plane from the payload bytes so downstream
    shapes and statistics are real and reproducible.
    """
    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width), dtype=np.uint8)


def media_table(documents: DataFrame) -> DataFrame:
    """Materialize media spans as an opaque-binary table with metadata
    (payload faked from the media_ref — the plumbing, not the codec)."""
    spans = documents.select(
        "doc_id", F.posexplode("spans").alias("span_idx", "span")
    ).filter(F.col("span.kind") == "media").select(
        "doc_id", "span_idx", F.col("span.media_ref").alias("media_ref"),
    )
    return spans.select(
        "doc_id", "span_idx", "media_ref",
        F.encode(F.col("media_ref"), "utf-8").alias("payload"),
        F.lit("image").alias("media_kind"),
        (F.abs(F.hash("media_ref")) % 64 + 16).cast("int").alias("width"),
        (F.abs(F.hash("media_ref", "doc_id")) % 64 + 16).cast("int").alias("height"),
    )


def media_table_from_flat_docs(documents: DataFrame) -> DataFrame:
    """MEDIA_SCHEMA table derived from a flat documents table
    (doc_id, text): every 3rd document owns one media object whose ref is
    the md5 of its text.  Deliberately SQL-expressible arithmetic only, so
    the whole metadata path has an exact DuckDB oracle."""
    sel = documents.filter(F.col("doc_id") % 3 == 0)
    ref = F.concat(F.lit("media://"), F.md5(F.col("text")))
    return sel.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.lit(0).alias("span_idx"),
        ref.alias("media_ref"),
        F.encode(ref, "utf-8").alias("payload"),
        F.lit("image").alias("media_kind"),
        (F.col("doc_id") % 64 + 16).cast("int").alias("width"),
        ((F.col("doc_id") * 7 + 3) % 64 + 16).cast("int").alias("height"),
    )


def media_features(media: DataFrame, feat_dim: int = 8) -> DataFrame:
    """Arrow-batched decode + feature extraction over a MEDIA_SCHEMA
    table (one UDF invocation per Arrow batch, not per row — the batch
    shape the real codec would see)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                img = _fake_decode(bytes(r.payload), int(r.width), int(r.height))
                # column-mean pooled feature (vectorized numpy)
                pooled = img.mean(axis=0)
                idx = np.linspace(0, len(pooled) - 1, feat_dim).astype(int)
                rows.append({
                    "doc_id": r.doc_id, "span_idx": int(r.span_idx),
                    "media_ref": r.media_ref, "media_kind": r.media_kind,
                    "n_bytes": len(bytes(r.payload)),
                    "width": int(r.width), "height": int(r.height),
                    "mean_luma_milli": int(np.floor(img.mean() * 1000)),
                    "feature": (pooled[idx] / 255.0).astype(np.float32).tolist(),
                })
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURES_SCHEMA.fields])

    return media.mapInPandas(extract, FEATURES_SCHEMA)


def document_media_features(documents: DataFrame, feat_dim: int = 8) -> DataFrame:
    """media spans of a (doc_id, spans) corpus → features."""
    return media_features(media_table(documents), feat_dim)
