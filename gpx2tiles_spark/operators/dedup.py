"""Corpus deduplication operators — the training-data-pipeline family.

All hashing is md5-based (identical hex in Spark and DuckDB) so every
operator has an exact SQL oracle; no engine-specific hash functions.

- exact: content-hash groupBy (keep lowest id per group)
- MinHash + LSH: word shingles → k md5-min signatures → banded buckets →
  candidate pairs via self-equi-join on (band, band_key)
- SimHash: per-document bit-vote fingerprint from word hashes
- n-gram Jaccard: exact pairwise similarity on shingle sets

Scale notes: shingle explode is a narrow map; the LSH bucket join is an
equi-join on band keys (shuffle on band_key — bounded bucket sizes make
it skew-safe, and at 10^12 docs banding is the only pairwise-comparison
strategy that avoids the quadratic cross join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def doc_shingles(docs: DataFrame, n: int = 3,
                 id_col: str = "doc_id", text_col: str = "text",
                 distinct: bool = True) -> DataFrame:
    """Word n-gram shingles per document (distinct by default).

    The shingle string is built in the codegen'd explode/concat_ws/slice
    pipeline rather than a transform(...) higher-order function (HOFs
    are interpreted per element — same fix as textstats.fingerprints).
    The distinct's clustering requirement ({doc_id, shingle} ⊇ {doc_id})
    is satisfied when the input is already hash-partitioned on doc_id
    (the fact-scan spread), so it usually plans with no extra exchange.
    ``distinct=False`` skips the dedup aggregation entirely for
    consumers whose aggregate is duplicate-invariant (MIN-of-md5
    minhash signatures) — identical results, one hash aggregation of
    the full shingle relation less."""
    words = F.split(F.col(text_col), " ")
    sh = docs.select(
        F.col(id_col).alias("doc_id"), words.alias("ws"),
        F.explode(F.sequence(
            F.lit(0), F.greatest(F.size(words) - n, F.lit(0)))).alias("i"))
    shingle = F.concat_ws(" ", F.slice(F.col("ws"), F.col("i") + 1, n))
    out = sh.select("doc_id", shingle.alias("shingle"))
    return out.distinct() if distinct else out


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Exact dedup via content hash: (content_hash, n_docs, keep_id)."""
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_id"))
    )


def minhash_signatures(shingles: DataFrame, num_hashes: int = 8) -> DataFrame:
    """k min-of-md5 signature columns per doc (one aggregate pass)."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"s{i}|"), F.col("shingle")))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return shingles.groupBy("doc_id").agg(*aggs)


def lsh_band_rows(signatures: DataFrame, num_hashes: int = 8,
                  band_size: int = 2,
                  max_bucket: int | None = 10_000) -> DataFrame:
    """(doc_id, band, band_key) rows, oversize buckets already dropped —
    the shared substrate of the candidate join and the scale-decade
    predictor (tools/bench_sf10_pairs.py), which needs the surviving
    bucket membership itself, not just the pairs."""
    bands = num_hashes // band_size
    # one explode, not a bands-way union: a union's branches each
    # re-execute the whole shingle+signature pipeline upstream (Spark
    # re-runs self-referenced subtrees — measured 4× the corpus pass at
    # 4 bands), while a Generate fans each signature row into its
    # (band, band_key) rows after computing it once — the same shape
    # simhash_hamming_pairs already uses
    band_structs = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.md5(F.concat_ws("|", *[
                F.col(f"mh{b * band_size + j}") for j in range(band_size)
            ])).alias("band_key"))
        for b in range(bands)
    ])
    band_rows = (signatures
                 .select("doc_id", F.explode(band_structs).alias("_b"))
                 .select("doc_id", F.col("_b.band").alias("band"),
                         F.col("_b.band_key").alias("band_key")))
    if max_bucket is not None:
        w = Window.partitionBy("band", "band_key")
        band_rows = (band_rows
                     .withColumn("_bucket_n", F.count("*").over(w))
                     .filter(F.col("_bucket_n") <= max_bucket)
                     .drop("_bucket_n"))
    return band_rows


def lsh_candidate_pairs(signatures: DataFrame, num_hashes: int = 8,
                        band_size: int = 2,
                        max_bucket: int | None = 10_000) -> DataFrame:
    """Banded LSH: docs sharing any band's key become a candidate pair.

    ``max_bucket`` is the standard degenerate-bucket guard: a band key
    shared by more than that many docs (empty texts, boilerplate) would
    emit O(bucket²) candidates — one such key at 10^12 docs is quadratic
    death.  Oversize buckets are dropped, not split: their members are
    near-IDENTICAL under the whole band signature, which the exact
    content-hash dedup (exact_duplicates) already collapses; LSH's job is
    the near-dup tail.  The count uses the same (band, band_key) shuffle
    key as the join, so AQE coalesces it into the join's exchange."""
    band_rows = lsh_band_rows(signatures, num_hashes, band_size, max_bucket)
    a = band_rows.alias("a")
    b = band_rows.alias("b")
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def simhash16(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """16-bit SimHash: bit j votes ±1 per word by the j-th md5 nibble's
    high bit; portable to SQL (hex-digit comparison)."""
    words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("word"),
    ).withColumn("h", F.md5(F.col("word")))
    votes = [
        F.sum(
            F.when(F.substring("h", j + 1, 1) >= "8", 1).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(16)
    ]
    agg = words.groupBy("doc_id").agg(*votes)
    sim = None
    for j in range(16):
        bit = F.when(F.col(f"v{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sim = bit if sim is None else sim + bit
    return agg.select("doc_id", sim.cast("long").alias("simhash"))


def simhash_hamming_pairs(sims: DataFrame, max_hamming: int = 4) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming via a banded
    bit-chunk equi-join — NO all-pairs theta-join.

    The 16 bits split into max_hamming+1 bands (pigeonhole: any pair
    within max_hamming differing bits agrees exactly on at least one
    band), candidates come from a self-equi-join on (band, band_bits),
    then the exact hamming re-rank filters.  At 10^12 docs the join keys
    are (band, chunk-value) buckets instead of an O(n²) cross product.
    """
    nbands = max_hamming + 1
    # split 16 bits into nbands chunks (sizes as even as possible)
    sizes = [(16 + b) // nbands for b in range(nbands)]  # e.g. 3,3,3,3,4
    offs, o = [], 0
    for s in sizes:
        offs.append(o)
        o += s
    # one explode, not an nbands-way union: the upstream simhash
    # aggregation is computed ONCE and a Generate fans each row into its
    # nbands (band, band_bits) rows — at 10^12 docs a union would rescan
    # and re-aggregate the corpus per band
    band_structs = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright(F.col("simhash"), off)
            .bitwiseAND(F.lit((1 << size) - 1)).alias("band_bits"))
        for b, (off, size) in enumerate(zip(offs, sizes))
    ])
    bands = (sims.select("doc_id", "simhash",
                         F.explode(band_structs).alias("_b"))
             .select("doc_id", "simhash", F.col("_b.band").alias("band"),
                     F.col("_b.band_bits").alias("band_bits")))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, ["band", "band_bits"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                F.col("a.simhash").alias("sim_a"),
                F.col("b.simhash").alias("sim_b"))
        .distinct()
    )
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (cand.withColumn("hamming", ham.cast("int"))
            .filter(F.col("hamming") <= max_hamming)
            .select("doc_a", "doc_b", "hamming"))


def ngram_jaccard_pairs(shingles: DataFrame, max_id,
                        max_df: int | None = 10_000) -> DataFrame:
    """Exact pairwise Jaccard over shingle sets for doc_id <= max_id —
    relational form (explode + self-join + count) so the SQL oracle is a
    transliteration.  jaccard scaled to micro-units for stable hashing.

    ``max_df`` is the hot-shingle guard (the self-join twin of LSH's
    ``max_bucket``): a shingle shared by d documents emits O(d²) join
    rows, so one boilerplate trigram at 10^12 docs is quadratic death.
    Shingles with document frequency above the cap are dropped from the
    JOIN (a stopword-shingle filter) — pairs whose overlap rides on such
    shingles are near-boilerplate and belong to the exact/LSH tiers;
    set sizes stay uncapped so surviving pairs keep true denominators.
    The df window shares the join's `shingle` shuffle key, so AQE folds
    the count into the join's own exchange."""
    sizes = shingles.groupBy("doc_id").agg(F.count("*").alias("sz"))
    pop = shingles.filter(F.col("doc_id") <= max_id)
    if max_df is not None:
        w = Window.partitionBy("shingle")
        pop = (pop.withColumn("_df", F.count("*").over(w))
               .filter(F.col("_df") <= max_df).drop("_df"))
    a = pop.alias("a")
    b = pop.alias("b")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .select(
            "doc_a", "doc_b", "n_common",
            F.floor(
                F.col("n_common") * F.lit(1000000.0)
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_common"))
            ).cast("long").alias("jaccard_micro"),
        )
    )


def connected_components(pairs: DataFrame, src: str = "doc_a",
                         dst: str = "doc_b",
                         max_iter: int = 30) -> DataFrame:
    """Connected components over candidate near-dup pairs →
    (doc_id, cluster_id) with cluster_id = the component's minimum
    doc_id — the cluster-formation step a dedup pipeline runs after
    MinHash/SimHash/embedding candidates, turning pairwise evidence
    into one keep/drop decision per group.

    Implementation is the alternating Large-Star / Small-Star
    MapReduce algorithm (Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC'14) re-expressed relationally: each
    half-round is ONE groupBy-min on the node id plus ONE equi-join —
    no driver-side graph state, every shuffle keyed on node id.
    Converges in O(log n) rounds, and Large-Star's v > u split is the
    published skew balancer: a giant component never funnels through a
    single reducer key, because large neighbors re-attach to the
    current minimum rather than piling onto the hub (at 10^12 docs a
    boilerplate cluster IS a giant component — this is the operator's
    scale story, same spirit as the LSH degenerate-bucket cap).
    Each round is localCheckpoint()ed: iterative plans otherwise grow
    Catalyst lineage exponentially (on a real cluster this becomes a
    reliable checkpoint to the cluster FS).

    Docs that appear in no pair are their own (absent) singleton
    cluster; callers wanting them materialized can union the
    complement.  Output is exactly one row per distinct doc id in
    ``pairs``."""
    # lazy initial checkpoint: the digest right below is what
    # materializes it — one job instead of eager-checkpoint + digest
    E = (pairs.select(F.col(src).cast("long").alias("u"),
                      F.col(dst).cast("long").alias("v"))
         .filter(F.col("u") != F.col("v")).distinct()
         .localCheckpoint(eager=False))

    def large_star(e: DataFrame) -> DataFrame:
        sym = e.unionByName(e.select(F.col("v").alias("u"),
                                     F.col("u").alias("v")))
        mins = (sym.groupBy("u").agg(F.min("v").alias("mv"))
                .select("u", F.least("mv", F.col("u")).alias("m")))
        return (sym.join(mins, "u")
                .filter(F.col("v") > F.col("u"))
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .filter(F.col("u") != F.col("v")).distinct())

    def small_star(e: DataFrame) -> DataFrame:
        o = e.select(F.greatest("u", "v").alias("u"),
                     F.least("u", "v").alias("v")).distinct()
        mins = o.groupBy("u").agg(F.min("v").alias("m"))
        return (o.join(mins, "u")
                .select(F.explode(F.array("u", "v")).alias("n"), "m")
                .filter(F.col("n") != F.col("m"))
                .select(F.col("n").alias("u"), F.col("m").alias("v"))
                .distinct())

    def digest(e: DataFrame):
        # commutative set digest (count, xor-of-row-hashes — E is
        # always distinct, and xor can't hit the ANSI int64-overflow
        # a sum would): one map-side-combined agg job vs the two full
        # exceptAll shuffles a per-round set-equality check would cost
        # (the check dominated small-corpus rounds: the 2→8 core
        # scaling probe measured the loop fixed-cost-bound)
        row = e.agg(F.count("*").alias("n"),
                    F.bit_xor(F.xxhash64("u", "v")).alias("h")).collect()[0]
        return row["n"], row["h"]

    d = digest(E)
    for _ in range(max_iter):
        # lazy checkpoint: the digest job immediately after is what
        # materializes it, so each round runs ONE job instead of two
        # (eager checkpoint + digest) — the loop is fixed-cost-bound on
        # small edge sets (the 2→8 core probe's finding)
        nxt = small_star(large_star(E)).localCheckpoint(eager=False)
        nd = digest(nxt)
        if nd == d:
            # digests agree → confirm EXACT set equality once (digest
            # collisions are ~2^-64 but correctness here is not a
            # probabilistic contract); one action for both directions —
            # the union is empty iff both exceptAll legs are
            if nxt.exceptAll(E).unionByName(E.exceptAll(nxt)).isEmpty():
                E = nxt
                break
        E, d = nxt, nd
    else:
        raise RuntimeError(f"connected_components: no convergence "
                           f"in {max_iter} rounds")

    # converged: E is a star forest (child -> component min)
    roots = E.select(F.col("v").alias("doc_id"),
                     F.col("v").alias("cluster_id")).distinct()
    return (E.select(F.col("u").alias("doc_id"),
                     F.col("v").alias("cluster_id"))
            .unionByName(roots))
