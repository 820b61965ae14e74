"""Corpus generator determinism + Spark parse stage end-to-end."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from gpx2tiles_spark.corpus import generate_document, generate_documents
from gpx2tiles_spark.operators.parse import (
    explode_spans, parse_documents, reassemble_spans)


def test_generator_deterministic():
    a = generate_document(42)
    b = generate_document(42)
    assert a == b
    assert a != generate_document(43)
    kinds = {s["kind"] for s in a}
    assert "gpx" in kinds and "text" in kinds
    offs = [s["offset"] for s in a]
    assert offs == sorted(offs)


def test_distributed_generation_matches_local(spark):
    df = generate_documents(spark, 20, partitions=4)
    rows = {r.doc_id: r.spans for r in df.collect()}
    assert len(rows) == 20
    local = generate_document(7)
    got = [s.asDict() for s in rows["doc00000007"]]
    assert got == local


@pytest.fixture(scope="module")
def docs(spark):
    return generate_documents(spark, 40, partitions=4).cache()


def test_parse_stage_no_shuffle(spark, docs):
    points = parse_documents(docs)
    plan = points._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-only: zero shuffle
    pdf = points.toPandas()
    assert len(pdf) > 100
    assert set(pdf.kind.unique()) <= {"trkpt", "wpt"}
    # garbled lat rows dropped, all lat/lon finite and in range
    assert pdf.lat.abs().max() <= 90.0
    # per (doc, seg): pt_idx dense from 0
    g = pdf[pdf.kind == "trkpt"].groupby(["doc_id", "seg_order"]).pt_idx
    assert (g.min() == 0).all()
    assert (g.max() + 1 == g.count()).all()


def test_parse_matches_pure_python(spark, docs):
    from gpx2tiles_spark.gpxparse import parse_gpx_document

    points = parse_documents(docs).toPandas()
    row = docs.filter(F.col("doc_id") == "doc00000000").first()
    gpx_texts = [s.text for s in row.spans if s.kind == "gpx"]
    _, segs, wpts, cnt = parse_gpx_document(gpx_texts)
    sub = points[points.doc_id == "doc00000000"]
    assert len(sub) == cnt
    assert len(sub[sub.kind == "wpt"]) == len(wpts)
    first_seg = sub[(sub.seg_order == 0) & (sub.kind == "trkpt")].sort_values("pt_idx")
    assert list(first_seg.lat) == [p.lat for p in segs[0].points]
    assert list(first_seg["flags"]) == [p.flags for p in segs[0].points]


def test_span_sequence_invariant(spark, docs):
    """(kind, text, media_ref, order) survives explode + reassemble."""
    back = reassemble_spans(explode_spans(docs))
    orig = {r.doc_id: [tuple(s) for s in r.spans] for r in docs.collect()}
    got = {r.doc_id: [(s.kind, s.text, s.media_ref, s.offset) for s in r.spans]
           for r in back.collect()}
    assert orig == got


def test_speed_synthesis_present(spark, docs):
    """hard docs contain TIME-without-SPEED runs → synthesized flags==8."""
    pdf = parse_documents(docs).toPandas()
    assert (pdf["flags"] == 8).any()
