"""Trajectory-mining family (operators/trajectory.py): stay points,
OD flows, co-visitation, exact decayed tile counters, span context —
each checked against an independent naive Python reference, plus the
contracts that make them scale (bucket cap, integer-exact decay)."""
from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMOKE


def _tile(lon, lat, z):
    n = 2.0 ** z
    tx = int(math.floor((lon + 180.0) / 360.0 * n))
    la = math.radians(lat)
    ty = int(math.floor((1.0 - math.log(math.tan(la) + 1.0 / math.cos(la))
                         / math.pi) / 2.0 * n))
    return tx, ty


def _mk_points(spark, rows):
    """rows: (pid, user_id, epoch_sec, lon, lat)."""
    data = [(p, u, dt.datetime.utcfromtimestamp(e), float(lo), float(la), 0.0)
            for p, u, e, lo, la in rows]
    return spark.createDataFrame(
        data, "pid long, user_id long, ts timestamp, lon double, "
              "lat double, kph double")


def test_dwell_islands_matches_naive(spark):
    from gpx2tiles_spark.operators.trajectory import dwell_islands

    # two docs: doc0 dwells 5 fixes in one z14 tile, hops, dwells 4 more;
    # doc1 never repeats a tile.
    rows = []
    for i in range(5):
        rows.append(("d0", 0, i, 48.00001 + i * 1e-6, 8.00001 + i * 1e-6))
    for i in range(3):
        rows.append(("d0", 1, i, 48.5 + i * 0.3, 9.0 + i * 0.3))
    for i in range(4):
        rows.append(("d0", 1, 3 + i, 50.00001 + i * 1e-6, 10.00001))
    for i in range(6):
        rows.append(("d1", 0, i, -30.0 + i, 20.0 + i))
    df = spark.createDataFrame(
        [(d, s, p, la, lo) for d, s, p, la, lo in rows],
        "doc_id string, seg_order int, pt_idx int, lat double, lon double")
    got = {(r.doc_id, r.island): (r.tx, r.ty, r.n_fixes)
           for r in dwell_islands(df, zoom=14, min_fixes=4).collect()}

    # naive islands
    ref = {}
    for doc in ("d0", "d1"):
        seq = [r for r in rows if r[0] == doc]
        seq.sort(key=lambda r: (r[1], r[2]))
        isl, prev = 0, None
        counts = {}
        for _, _, _, la, lo in seq:
            t = _tile(lo, la, 14)
            if t != prev:
                isl += 1
                prev = t
            counts.setdefault((doc, isl), [t, 0])[1] += 1
        for k, (t, n) in counts.items():
            if n >= 4:
                ref[k] = (t[0], t[1], n)
    assert got == ref
    assert len(got) == 2  # the two deliberate dwells


def test_od_matrix_matches_naive(spark):
    from gpx2tiles_spark.operators.trajectory import od_matrix

    # user 1: one session A->B, then (gap > 30min) session C->C (1 fix);
    # user 2: one session B->A.
    a, b, c = (8.0, 48.0), (13.4, 52.5), (-74.0, 40.7)
    rows = [
        (1, 1, 1000, *a), (2, 1, 1060, 8.01, 48.01), (3, 1, 1120, *b),
        (4, 1, 1120 + 1801, *c),
        (5, 2, 500, *b), (6, 2, 700, *a),
    ]
    got = {(r.o_tx, r.o_ty, r.d_tx, r.d_ty): (r.n_trips, r.n_users)
           for r in od_matrix(_mk_points(spark, rows), zoom=8,
                              gap_minutes=30).collect()}
    ta, tb, tc = _tile(*a, 8), _tile(*b, 8), _tile(*c, 8)
    assert got == {
        (*ta, *tb): (1, 1),
        (*tc, *tc): (1, 1),
        (*tb, *ta): (1, 1),
    }


def test_co_visit_cap_drops_hot_bucket(spark):
    from gpx2tiles_spark.operators.trajectory import co_visit_pairs

    # bucket X: 3 users on day 0 AND day 1 (pairs share 2 buckets);
    # bucket Y: 50 users (over cap 32) -> contributes nothing.
    rows = []
    pid = 0
    for day in (0, 1):
        for u in (1, 2, 3):
            pid += 1
            rows.append((pid, u, day * 86400 + 100, 8.0, 48.0))
    for u in range(100, 150):
        pid += 1
        rows.append((pid, u, 100, -74.0, 40.7))
    got = {(r.ua, r.ub): r.n_shared
           for r in co_visit_pairs(_mk_points(spark, rows), zoom=7,
                                   max_users=32, min_shared=2).collect()}
    assert got == {(1, 2): 2, (1, 3): 2, (2, 3): 2}

    # raising the cap exposes the hot bucket's pairs (min_shared=1)
    loose = co_visit_pairs(_mk_points(spark, rows), zoom=7,
                           max_users=64, min_shared=1)
    assert loose.count() == 3 + 50 * 49 // 2


def test_tile_decay_exact_integer_weights(spark):
    from gpx2tiles_spark.operators.trajectory import tile_decay

    # one tile: 3 hits on the newest day, 2 hits 1 day older, 1 hit
    # beyond the horizon (weight 0).
    h = 5
    rows = [(1, 1, 10 * 86400 + 1, 8.0, 48.0),
            (2, 1, 10 * 86400 + 2, 8.0, 48.0),
            (3, 2, 10 * 86400 + 3, 8.0, 48.0),
            (4, 1, 9 * 86400 + 1, 8.0, 48.0),
            (5, 2, 9 * 86400 + 2, 8.0, 48.0),
            (6, 1, 4 * 86400 + 1, 8.0, 48.0)]
    out = tile_decay(_mk_points(spark, rows), zoom=6,
                     horizon_days=h).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_days, r.n_points) == (3, 6)
    assert r.decayed_x2h == 3 * 2 ** h + 2 * 2 ** (h - 1) + 0


def test_tile_decay_merge_associativity(spark):
    """The decayed counter must be mergeable (resumable partial aggs):
    decay(A ∪ B) == decay(A) + decay(B) per tile when both halves share
    the max day — the property a 10^12-row partial aggregation relies
    on, and exactly what float EWMA weights would break."""
    from gpx2tiles_spark.operators.trajectory import tile_decay

    rows = [(i, i % 3, (7 + i % 4) * 86400 + i, 8.0 + (i % 2) * 10, 48.0)
            for i in range(40)]
    rows += [(100, 9, 10 * 86400 + 50, 8.0, 48.0),
             (101, 9, 10 * 86400 + 60, 18.0, 48.0)]  # pin max day in both
    whole = {(r.tx, r.ty): r.decayed_x2h
             for r in tile_decay(_mk_points(spark, rows), zoom=6,
                                 horizon_days=29).collect()}
    ha = [r for r in rows[:-2] if r[0] % 2 == 0] + [rows[-2], rows[-1]]
    hb = [r for r in rows[:-2] if r[0] % 2 == 1] + [rows[-2], rows[-1]]
    da = {(r.tx, r.ty): r.decayed_x2h
          for r in tile_decay(_mk_points(spark, ha), zoom=6,
                              horizon_days=29).collect()}
    db = {(r.tx, r.ty): r.decayed_x2h
          for r in tile_decay(_mk_points(spark, hb), zoom=6,
                              horizon_days=29).collect()}
    dup = {(r.tx, r.ty): r.decayed_x2h
           for r in tile_decay(_mk_points(spark, [rows[-2], rows[-1]]),
                               zoom=6, horizon_days=29).collect()}
    for t, v in whole.items():
        assert da.get(t, 0) + db.get(t, 0) - dup.get(t, 0) == v


def test_span_media_context_order(spark):
    """Media spans must bind to the nearest PRECEDING text span — the
    span-sequence invariant is what makes the association well-defined."""
    from gpx2tiles_spark.operators.parse import explode_spans
    from pyspark.sql import Window

    docs = spark.createDataFrame(
        [("d", [("text", "t0", None, 0), ("media", None, "m0", 2),
                ("gpx", "<gpx/>", None, 18), ("text", "t1", None, 24),
                ("media", None, "m1", 26), ("media", None, "m2", 42)])],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>")
    sp = explode_spans(docs)
    w = Window.partitionBy("doc_id").orderBy("span_idx") \
        .rowsBetween(Window.unboundedPreceding, -1)
    ctx = F.last(F.when(F.col("kind") == "text", F.col("text")),
                 ignorenulls=True).over(w)
    got = {r.media_ref: r.ctx for r in
           sp.withColumn("ctx", ctx).filter(F.col("kind") == "media")
           .select("media_ref", "ctx").collect()}
    assert got == {"m0": "t0", "m1": "t1", "m2": "t1"}


def test_trajectory_partitioning_independence(spark):
    """Same answers at 1 and 13 input partitions (shuffle-grain proof)."""
    from gpx2tiles_spark.operators.trajectory import co_visit_pairs, od_matrix

    rows = [(i, i % 7, 86400 * (i % 5) + i * 37, -170.0 + (i * 13 % 340),
             -60.0 + (i * 7 % 120)) for i in range(300)]
    base = _mk_points(spark, rows)
    for fn in (lambda d: od_matrix(d, zoom=8, gap_minutes=30),
               lambda d: co_visit_pairs(d, zoom=7, max_users=32,
                                        min_shared=2)):
        one = sorted(map(tuple, fn(base.coalesce(1)).collect()))
        many = sorted(map(tuple, fn(base.repartition(13)).collect()))
        assert one == many and one
