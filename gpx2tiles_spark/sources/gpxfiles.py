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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


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
        df = spark.read.format("binaryFile").load(list(paths))
        if ordered:
            # plan-literal lookup map: the file list is CLI-sized
            mapping = F.create_map(
                *[F.lit(x) for i, p in enumerate(paths) for x in (p, i)])
            # binaryFile paths come back URI-qualified; strip the scheme
            stripped = F.regexp_replace(F.col("path"), "^file:", "")
            doc_id = F.concat(
                F.lpad(F.element_at(mapping, stripped).cast("string"),
                       8, "0"),
                F.lit(":"), stripped)
        else:
            doc_id = F.col("path")
    span = F.struct(
        F.lit("gpx").alias("kind"),
        F.decode(F.col("content"), "UTF-8").alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
        F.lit(0).alias("offset"),
    )
    return df.select(doc_id.alias("doc_id"), F.array(span).alias("spans"))


def read_gpx_file_list(spark: SparkSession, file_list: list[str]) -> DataFrame:
    """Explicit-order variant used by the CLI (argv + -0 stdin list)."""
    return read_gpx_documents(spark, file_list, ordered=True)
