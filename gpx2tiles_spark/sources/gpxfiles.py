"""GPX *file* source: real ``.gpx`` files on disk → the engine's
canonical ``documents(doc_id, spans)`` table.

The reference consumes GPX files given on the command line (or a
NUL-terminated list on stdin with ``-0`` — gpx2tiles.c:908-930,1014-1045)
and draws them IN LIST ORDER, which fixes the painter order.  The
engine's painter order is the ``doc_id`` sort, so this source prefixes
each doc_id with the file's zero-padded list index — list order and
doc-sort order coincide by construction.

Distributed read: ``binaryFile`` (one task per file split-group; at
10^6+ files the listing parallelizes and no file body ever touches the
driver).  The bytes decode as UTF-8 with replacement — the reference's
expat parser operates on raw bytes and the engine's parser on str; GPX
is XML and declares UTF-8 in practice.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def binary_rows_to_documents(df: DataFrame, doc_id=None) -> DataFrame:
    """``binaryFile`` rows (path, content, ...) → the canonical
    ``documents(doc_id, spans)`` table.  Shared by the batch directory
    read and the streaming file-arrival source (same decode, same span
    shape — a file behaves identically whether it arrived up front or
    mid-stream)."""
    span = F.struct(
        F.lit("gpx").alias("kind"),
        F.decode(F.col("content"), "UTF-8").alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
        F.lit(0).alias("offset"),
    )
    return df.select((doc_id if doc_id is not None else F.col("path"))
                     .alias("doc_id"), F.array(span).alias("spans"))


def read_gpx_documents(spark: SparkSession, paths: list[str] | str,
                       ordered: bool = True) -> DataFrame:
    """Load GPX files as a documents table.

    ``paths``: a directory / glob (str) or an explicit file list.  With
    ``ordered=True`` and an explicit list, doc_ids are prefixed with the
    list index so the painter order equals the given order (the
    reference's argv semantics); for directory input the order is the
    lexicographic path order.
    """
    if isinstance(paths, str):
        reader = (spark.read.format("binaryFile")
                  .option("pathGlobFilter", "*.gpx")
                  .option("recursiveFileLookup", "true"))
        df = reader.load(paths)
        doc_id = F.col("path")
    else:
        # Normalize BOTH sides of the index lookup to the absolute path:
        # the CLI hands relative paths ("gpx2tiles -C out *.gpx" from a
        # data dir) while binaryFile returns URI-qualified absolute
        # paths — keying the map on the raw argv string would miss and
        # silently NULL every doc_id.
        norm = [os.path.abspath(p) for p in paths]
        # The reference accepts the same file twice on argv and draws it
        # twice (two painter slots); binaryFile dedupes the read, so map
        # each unique path to ALL its list indices and explode — one
        # row (and doc_id) per occurrence.
        by_path: dict[str, list[int]] = {}
        for i, p in enumerate(norm):
            by_path.setdefault(p, []).append(i)
        df = spark.read.format("binaryFile").load(sorted(by_path))
        if ordered:
            # plan-literal lookup map: the file list is CLI-sized
            mapping = F.create_map(
                *[x for p, idxs in by_path.items()
                  for x in (F.lit(p), F.array(*[F.lit(i) for i in idxs]))])
            # binaryFile paths come back URI-qualified; strip the scheme
            stripped = F.regexp_replace(F.col("path"), "^file:", "")
            # try_element_at, not element_at: under Spark 4's ANSI
            # default a missing map key THROWS inside element_at before
            # the isNull() guard can fire — the try_ variant returns
            # NULL so the crafted diagnostic below is the error users see
            found = F.try_element_at(mapping, stripped)
            # fail loudly on a lookup miss instead of emitting NULL
            # doc_ids (which would collapse painter order downstream)
            checked = F.when(
                found.isNull(),
                F.raise_error(F.concat(
                    F.lit("gpx file list: path returned by binaryFile "
                          "not in the given list: "), F.col("path")))
                .cast("array<int>")).otherwise(found)
            df = df.select(F.col("content"), stripped.alias("_path"),
                           F.explode(checked).alias("_idx"))
            doc_id = F.concat(
                F.lpad(F.col("_idx").cast("string"), 8, "0"),
                F.lit(":"), F.col("_path"))
        else:
            doc_id = F.col("path")
    return binary_rows_to_documents(df, doc_id)


def read_gpx_file_list(spark: SparkSession, file_list: list[str]) -> DataFrame:
    """Explicit-order variant used by the CLI (argv + -0 stdin list)."""
    return read_gpx_documents(spark, file_list, ordered=True)
