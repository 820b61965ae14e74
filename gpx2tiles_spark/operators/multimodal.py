"""Multimodal column plumbing: media spans as opaque binary + typed
metadata, with Arrow-batched decode + feature extraction.

The *decode* step is REAL for four media kinds, all via pure
stdlib/numpy parsers shipped in this repo:

  png    — genuine RGBA PNGs (``synth_png`` via ``pngcodec``), decoded
           with ``pngcodec.decode_png``; luma/features come from
           actually-decoded pixels (Rec. 601).
  jpeg   — genuine baseline JPEGs (``synth_jpeg`` via ``jpegcodec`` —
           DCT, optimized Huffman tables), decoded by a real
           structural parser (quantizers from DQT, Huffman from DHT).
  wav    — genuine RIFF/WAVE 16-bit PCM mono containers, chunk-walked
           by ``decode_wav``; the feature plane is the real amplitude.
  adpcm  — genuine COMPRESSED audio: RIFF/WAVE IMA ADPCM containers
           (format tag 0x11, 4-bit adaptive DPCM) encoded and decoded
           by the repo's own ``adpcmcodec``.
  pngseq — a frame-sequence video stand-in whose every SAMPLED frame
           is really PNG-decoded (``decode_pngseq_frames`` — skipped
           frames are never decompressed, the point of frame sampling
           at scale).

Every media kind the engine emits has a REAL in-repo decoder — there
is no fake/stub path (retired round 5); an unknown kind raises, and a
production deployment plugs ffmpeg in behind a new branch of
``decode_luma`` on the executors.

Synthetic payloads have CLOSED-FORM byte lengths (PNG at deflate level
0: ``68 + height*(1 + 4*width)``; WAV: ``44 + 2*n_samples``; ADPCM WAV:
``60 + 256*n_blocks``; pngseq: ``4 + n_frames*(4 + png_len)``), which
keeps the ``multimodal_meta`` / ``multimodal_av_meta`` n_bytes columns
expressible in DuckDB oracle SQL even though the payloads are real
container formats.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..jpegcodec import decode_jpeg, encode_jpeg
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


def synth_jpeg(seed_bytes: bytes, width: int, height: int) -> bytes:
    """Deterministic synthetic JPEG: a smooth seeded gradient-plus-noise
    RGB field through the repo's own baseline encoder (jpegcodec.py —
    optimized Huffman tables, 4:4:4).  Unlike the level-0 PNG there is
    no closed-form byte length (entropy coding), so jpeg media are
    oracled through the features GOLDEN, not the metadata SQL."""
    seed = int.from_bytes(hashlib.md5(seed_bytes).digest()[:8], "big")
    rng = np.random.default_rng(np.random.Philox(key=seed ^ 0x19E6))
    gx = np.linspace(0, 255, width)[None, :]
    gy = np.linspace(0, 255, height)[:, None]
    base = (gx + gy) / 2.0
    rgb = np.stack([base, 255.0 - base, base], axis=-1)
    rgb = rgb + rng.normal(0, 12.0, size=(height, width, 3))
    return encode_jpeg(np.clip(rgb, 0, 255).astype(np.uint8))


def synth_wav(seed_bytes: bytes, n_samples: int, rate: int = 8000) -> bytes:
    """Deterministic synthetic audio object: a real RIFF/WAVE container
    (16-bit PCM mono) of md5-seeded Philox noise.  Byte length is
    closed-form: 44 header bytes + 2 per sample."""
    import struct

    seed = int.from_bytes(hashlib.md5(seed_bytes).digest()[:8], "big")
    rng = np.random.default_rng(np.random.Philox(key=seed ^ 0xA0D10))
    pcm = rng.integers(-32768, 32768, size=n_samples, dtype=np.int16)
    data = pcm.tobytes()
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
           + b"data" + struct.pack("<I", len(data)))
    return hdr + data


def synth_wav_len(n_samples: int) -> int:
    return 44 + 2 * n_samples


def synth_adpcm_wav(seed_bytes: bytes, n_blocks: int,
                    block_align: int = 256, rate: int = 8000) -> bytes:
    """Deterministic synthetic COMPRESSED audio object: a real RIFF/WAVE
    container with IMA ADPCM payload (format tag 0x0011, mono, 4-bit) —
    genuinely entropy-reduced audio through the repo's own
    ``adpcmcodec`` encoder.  The signal is a seeded random-walk (smooth,
    so the adaptive step tracker actually adapts).  Byte length is
    closed-form: 60 header bytes (RIFF + 20-byte fmt + fact + data
    headers) + ``n_blocks * block_align`` payload bytes."""
    import struct

    from ..adpcmcodec import encode_blocks, samples_per_block

    spb = samples_per_block(block_align)
    n_samples = n_blocks * spb
    seed = int.from_bytes(hashlib.md5(seed_bytes).digest()[:8], "big")
    rng = np.random.default_rng(np.random.Philox(key=seed ^ 0xADCF))
    walk = np.cumsum(rng.integers(-600, 601, size=n_samples))
    pcm = np.clip(walk, -32768, 32767).astype(np.int16)
    data = encode_blocks(pcm, block_align)
    hdr = (b"RIFF" + struct.pack("<I", 52 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHHHH", 20, 0x11, 1, rate,
                                   rate * block_align // spb, block_align,
                                   4, 2, spb)
           + b"fact" + struct.pack("<II", 4, n_samples)
           + b"data" + struct.pack("<I", len(data)))
    return hdr + data


def synth_adpcm_wav_len(n_blocks: int, block_align: int = 256) -> int:
    return 60 + n_blocks * block_align


def decode_wav(data: bytes) -> np.ndarray:
    """RIFF/WAVE → int16 sample array.  Walks the chunk list like a
    real parser — fmt validated, data extracted — and dispatches on the
    format tag: 0x0001 = 16-bit PCM mono (raw samples), 0x0011 = IMA
    ADPCM mono (REAL decompression through ``adpcmcodec``)."""
    import struct

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos = 12
    fmt = None
    body_data = None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (ln,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8:pos + 8 + ln]
        pos += 8 + ln + (ln & 1)
        if tag == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif tag == b"data":
            body_data = body
    if fmt is None or body_data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if fmt[0] == 1 and fmt[1] == 1 and fmt[5] == 16:
        return np.frombuffer(body_data, dtype="<i2")
    if fmt[0] == 0x11 and fmt[1] == 1 and fmt[5] == 4:
        from ..adpcmcodec import decode_blocks
        return decode_blocks(body_data, block_align=fmt[4])
    raise ValueError("unsupported WAV (need 16-bit PCM or IMA ADPCM mono)")


def synth_pngseq(seed_bytes: bytes, width: int, height: int,
                 n_frames: int) -> bytes:
    """Deterministic synthetic video stand-in: a trivial container of
    ``n_frames`` REAL PNGs — u32 frame count, then per frame a u32
    length + the PNG bytes.  (The container format is this repo's own —
    the point is the Spark-side plumbing plus genuinely decoding every
    sampled frame; a production deployment swaps an mp4 demuxer in.)
    Byte length is closed-form: 4 + n_frames*(4 + synth_png_len)."""
    import struct

    out = [struct.pack("<I", n_frames)]
    for fi in range(n_frames):
        png = synth_png(seed_bytes + b"|frame%d" % fi, width, height)
        out.append(struct.pack("<I", len(png)))
        out.append(png)
    return b"".join(out)


def synth_pngseq_len(width: int, height: int, n_frames: int) -> int:
    return 4 + n_frames * (4 + synth_png_len(width, height))


def decode_pngseq_frames(data: bytes, every: int = 1) -> list[np.ndarray]:
    """Container → RGBA frames, decoding every ``every``-th frame (frame
    sampling — the frames skipped are never decompressed, which is the
    whole point of sampling at scale)."""
    import struct

    (n,) = struct.unpack_from("<I", data, 0)
    pos = 4
    frames = []
    for fi in range(n):
        (ln,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if fi % every == 0:
            frames.append(decode_png(data[pos:pos + ln]))
        pos += ln
    return frames


def decode_luma(payload: bytes, media_kind: str,
                width: int, height: int) -> np.ndarray:
    """payload → (h, w) float64 intensity plane in [0, 255].

    REAL decoders (all pure-stdlib/numpy, shipped in this repo):
      png    — pngcodec.decode_png + Rec. 601 luma
      jpeg   — jpegcodec.decode_jpeg (baseline DCT, Huffman tables and
               quantizers parsed from the file's own DHT/DQT) + luma
      wav    — RIFF 16-bit PCM parse; the (1, n_samples) plane is the
               amplitude mapped linearly to 0..255 (metadata: width =
               n_samples, height = 1)
      adpcm  — RIFF IMA ADPCM (format tag 0x11): 4-bit compressed audio
               genuinely decompressed by adpcmcodec; same plane mapping
               as wav
      pngseq — frame-sampled video stand-in: every 2nd frame is really
               PNG-decoded, the plane is the mean luma across sampled
               frames
    Any other kind is an explicit error — there is NO fake path; a
    production deployment plugs external codecs (ffmpeg on the
    executors) in behind a new media_kind branch here."""
    if media_kind == "png":
        rgba = decode_png(bytes(payload))
        if rgba.shape[:2] != (height, width):
            raise ValueError(
                f"decoded PNG is {rgba.shape[1]}x{rgba.shape[0]}, "
                f"metadata says {width}x{height}")
        return rgba[..., :3].astype(np.float64) @ _LUMA_W
    if media_kind == "jpeg":
        rgb = decode_jpeg(bytes(payload))
        if rgb.shape[:2] != (height, width):
            raise ValueError(
                f"decoded JPEG is {rgb.shape[1]}x{rgb.shape[0]}, "
                f"metadata says {width}x{height}")
        return rgb.astype(np.float64) @ _LUMA_W
    if media_kind in ("wav", "adpcm"):
        samples = decode_wav(bytes(payload))
        if len(samples) != width or height != 1:
            raise ValueError(
                f"decoded WAV has {len(samples)} samples, "
                f"metadata says {width}x{height}")
        return ((samples.astype(np.float64) + 32768.0)
                / 65535.0 * 255.0).reshape(1, width)
    if media_kind == "pngseq":
        frames = decode_pngseq_frames(bytes(payload), every=2)
        if not frames or frames[0].shape[:2] != (height, width):
            raise ValueError("decoded frame size mismatches metadata")
        lumas = [f[..., :3].astype(np.float64) @ _LUMA_W for f in frames]
        return np.mean(lumas, axis=0)
    raise ValueError(
        f"no in-repo decoder for media kind {media_kind!r}; route such "
        f"media through an external decoder (ffmpeg) on the executors")


@F.pandas_udf(T.BinaryType())
def _synth_png_udf(ref: pd.Series, w: pd.Series, h: pd.Series) -> pd.Series:
    return pd.Series(
        [synth_png(r.encode("utf-8"), int(wi), int(hi))
         for r, wi, hi in zip(ref, w, h)],
        dtype=object)


def media_table(documents: DataFrame) -> DataFrame:
    """Materialize media spans as an opaque-binary table with metadata.
    Payloads are REAL containers synthesized deterministically from the
    media_ref on the executors — every 3rd media object a baseline
    JPEG (repo jpegcodec), the rest RGBA PNGs (the ref stands in for a
    blob-store fetch; everything after it — bytes, decode, features —
    is the real pipeline)."""
    spans = documents.select(
        "doc_id", F.posexplode("spans").alias("span_idx", "span")
    ).filter(F.col("span.kind") == "media").select(
        "doc_id", "span_idx", F.col("span.media_ref").alias("media_ref"),
    )
    kind = F.when(F.abs(F.hash("media_ref", "doc_id")) % 3 == 0,
                  F.lit("jpeg")).otherwise(F.lit("png"))
    sized = spans.select(
        "doc_id", "span_idx", "media_ref",
        kind.alias("media_kind"),
        (F.abs(F.hash("media_ref")) % 64 + 16).cast("int").alias("width"),
        (F.abs(F.hash("media_ref", "doc_id")) % 64 + 16).cast("int").alias("height"),
    )
    return sized.select(
        "doc_id", "span_idx", "media_ref",
        _synth_av_udf("media_kind", "media_ref", "width", "height",
                      F.lit(1)).alias("payload"),
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


@F.pandas_udf(T.BinaryType())
def _synth_av_udf(kind: pd.Series, ref: pd.Series, w: pd.Series,
                  h: pd.Series, nf: pd.Series) -> pd.Series:
    out = []
    for k, r, wi, hi, f in zip(kind, ref, w, h, nf):
        if k == "wav":
            out.append(synth_wav(r.encode("utf-8"), int(wi)))
        elif k == "adpcm":
            out.append(synth_adpcm_wav(r.encode("utf-8"), int(f)))
        elif k == "pngseq":
            out.append(synth_pngseq(r.encode("utf-8"), int(wi), int(hi),
                                    int(f)))
        elif k == "jpeg":
            out.append(synth_jpeg(r.encode("utf-8"), int(wi), int(hi)))
        else:
            out.append(synth_png(r.encode("utf-8"), int(wi), int(hi)))
    return pd.Series(out, dtype=object)


def media_table_av_from_flat_docs(documents: DataFrame) -> DataFrame:
    """Audio + video MEDIA_SCHEMA table from a flat documents table:
    every 4th document owns a real WAV (16-bit PCM mono; width =
    n_samples, height = 1), every 4th+1 a real PNG frame sequence
    (width/height = frame dims), every 4th+2 a real COMPRESSED audio
    container (IMA ADPCM WAV; width = n_samples = 505 per block).  All
    metadata arithmetic — including n_bytes, thanks to the closed-form
    container sizes — is SQL-expressible, so the whole A/V decode path
    has an exact DuckDB metadata oracle (the pixel/sample-derived stats
    are pytest-covered: they come from genuinely parsed containers)."""
    base = documents.select("doc_id", F.md5("text").alias("h"))
    wav = base.filter(F.col("doc_id") % 4 == 0).select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.lit(0).alias("span_idx"),
        F.concat(F.lit("media://wav/"), F.col("h")).alias("media_ref"),
        F.lit("wav").alias("media_kind"),
        (F.col("doc_id") % 4000 + 1000).cast("int").alias("width"),
        F.lit(1).alias("height"),
        F.lit(1).alias("n_frames"))
    seq = base.filter(F.col("doc_id") % 4 == 1).select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.lit(1).alias("span_idx"),
        F.concat(F.lit("media://seq/"), F.col("h")).alias("media_ref"),
        F.lit("pngseq").alias("media_kind"),
        (F.col("doc_id") % 32 + 16).cast("int").alias("width"),
        ((F.col("doc_id") * 5 + 7) % 32 + 16).cast("int").alias("height"),
        (F.col("doc_id") % 6 + 2).cast("int").alias("n_frames"))
    # compressed audio: n_frames doubles as the ADPCM block count;
    # width = n_samples = 505 * blocks (samples_per_block at align 256)
    adp = base.filter(F.col("doc_id") % 4 == 2).select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.lit(2).alias("span_idx"),
        F.concat(F.lit("media://adpcm/"), F.col("h")).alias("media_ref"),
        F.lit("adpcm").alias("media_kind"),
        ((F.col("doc_id") % 3 + 1) * 505).cast("int").alias("width"),
        F.lit(1).alias("height"),
        (F.col("doc_id") % 3 + 1).cast("int").alias("n_frames"))
    sized = wav.unionByName(seq).unionByName(adp)
    return sized.select(
        "doc_id", "span_idx", "media_ref",
        _synth_av_udf("media_kind", "media_ref", "width", "height",
                      "n_frames").alias("payload"),
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
