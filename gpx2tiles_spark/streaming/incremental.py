"""Incremental tile updates with delta-snapshot/manifest checkpointing.

The reference updates tiles in place by drawing over existing PNGs
(open_tile loads `{z}/{x}/{y}.png` as the base — gpx2tiles.c:277-310,
README.md:20-22).  The engine's equivalent is an Iceberg-style
merge-on-read **TileStore**:

- each batch writes a DELTA snapshot containing ONLY the tiles it
  touched (per-batch write volume ∝ touched tiles, never O(store) — the
  round-1 copy-on-write full-store rewrite is gone);
- ``current()`` is the manifest-ordered latest-wins union of the live
  snapshots (one hash aggregate keyed (z,tx,ty) with ``max_by`` on the
  snapshot id — the Iceberg MERGE read shape);
- ``compact()`` folds the live snapshots into one and marks it in the
  manifest, bounding read amplification; ``apply_batch`` auto-compacts
  every ``compact_every`` deltas.

Resume = skip batch keys already in the manifest — re-running a killed
job is idempotent.  No Iceberg jar is guaranteed in this environment, so
the substrate is plain parquet + JSON with the same semantics (atomic
manifest replace, immutable snapshot dirs, monotonic ids).

``run_streaming`` wraps the same batch update as a Structured Streaming
``foreachBatch`` sink over a documents directory — micro-batch arrival
of new document files incrementally updates the store.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import EngineConfig
from ..operators.events import build_events
from ..operators.parse import parse_documents
from ..operators.raster import TILES_SCHEMA, rasterize

_TILE_KEY = ["z", "tx", "ty"]


@dataclass
class TileStore:
    spark: SparkSession
    root: str
    compact_every: int = 8  # auto-compact after this many live deltas

    @property
    def manifest_path(self) -> str:
        return os.path.join(self.root, "manifest.json")

    def manifest(self) -> dict:
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                return json.load(f)
        return {"snapshots": []}

    def committed_batches(self) -> set[str]:
        return {s["batch_key"] for s in self.manifest()["snapshots"]}

    @staticmethod
    def _live_upto(snaps: list[dict]) -> list[dict]:
        """Of the given snapshot prefix, the ones that contribute to its
        end state: everything since (and including) the last compaction."""
        start = 0
        for i, s in enumerate(snaps):
            if s.get("kind") == "compact":
                start = i
        return snaps[start:]

    def _live(self) -> list[dict]:
        return self._live_upto(self.manifest()["snapshots"])

    def as_of(self, snapshot_id: int) -> DataFrame | None:
        """Time travel: the table state as of `snapshot_id` (inclusive) —
        the Iceberg-checkpoint read path.  A compaction at or before the
        id bounds how many deltas the merge touches, exactly like
        current(); later snapshots never contribute."""
        snaps = [s for s in self.manifest()["snapshots"]
                 if s["id"] <= snapshot_id]
        return self._merge(self._live_upto(snaps))

    def current(self) -> DataFrame | None:
        """Latest-wins merge of the live delta snapshots (merge-on-read)."""
        return self._merge(self._live())

    def diff(self, a_id: int, b_id: int | None = None) -> DataFrame | None:
        """Changed-tile detection between two snapshots: the partial
        re-render driver of an incremental pipeline (at 10^12 docs you
        re-render the tiles a new batch TOUCHED, not the pyramid).

        Full outer join of as_of(a) with as_of(b) (b defaults to the
        current state) on the tile key; per changed tile the point_cnt
        delta.  Both sides are per-tile-bounded stores, the join key is
        the store's own partition key, and counters are ADDITIVE, so the
        delta of two snapshots equals the stamp pyramid of the batches
        between them — the property the store_diff oracle row checks."""
        a = self.as_of(a_id)
        b = self.current() if b_id is None else self.as_of(b_id)
        if b is None:
            return None
        cols = ["z", "tx", "ty"]
        av = a.select(*cols, F.col("point_cnt").alias("_a")) if a is not None \
            else None
        bv = b.select(*cols, F.col("point_cnt").alias("_b"))
        j = bv if av is None else av.join(bv, cols, "full_outer")
        if av is None:
            j = j.withColumn("_a", F.lit(None).cast("long"))
        delta = F.coalesce(F.col("_b"), F.lit(0)) - F.coalesce(F.col("_a"),
                                                               F.lit(0))
        return (j.withColumn("delta", delta.cast("long"))
                .filter(F.col("delta") != 0)
                .select(*cols, "delta"))

    def _merge(self, live: list[dict]) -> DataFrame | None:
        if not live:
            return None
        dfs = [
            self.spark.read.parquet(os.path.join(self.root, s["path"]))
            .withColumn("_sid", F.lit(s["id"]))
            for s in live
        ]
        df = dfs[0]
        for d in dfs[1:]:
            df = df.unionByName(d)
        if len(dfs) == 1:
            return df.drop("_sid")
        vals = [c for c in df.columns if c not in _TILE_KEY + ["_sid"]]
        merged = df.groupBy(*_TILE_KEY).agg(
            F.max_by(F.struct(*vals), F.col("_sid")).alias("_t"))
        return merged.select(*_TILE_KEY,
                             *[F.col(f"_t.{c}").alias(c) for c in vals])

    def _commit(self, batch_key: str, tiles: DataFrame,
                kind: str = "delta") -> dict:
        m = self.manifest()
        sid = len(m["snapshots"])
        rel = f"snapshot-{sid:05d}"
        path = os.path.join(self.root, rel)
        tiles.write.mode("overwrite").parquet(path)
        written = self.spark.read.parquet(path)
        # per-partition (zoom) lineage + metrics — the north rule's
        # per-partition accounting, derived from the rasterizer's
        # n_events/n_docs columns.  n_tiles = the sum of the per-zoom
        # rows of the SAME aggregation pass — the separate count() job
        # this used to run re-read every snapshot file for a number the
        # stats already contain.
        stats = [r.asDict() for r in (
            written.groupBy("z").agg(
                F.count("*").alias("tiles"),
                F.sum("point_cnt").alias("points"),
                F.sum("n_events").alias("events"),
                F.max("n_docs").alias("max_docs_per_tile"),
            ).orderBy("z").collect())]
        entry = {
            "id": sid, "batch_key": batch_key, "path": rel, "kind": kind,
            "committed_at": time.time(),
            "n_tiles": sum(int(s["tiles"]) for s in stats),
            "partitions": stats,
        }
        m["snapshots"].append(entry)
        os.makedirs(self.root, exist_ok=True)
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, self.manifest_path)  # atomic manifest swap
        return entry

    def compact(self) -> dict | None:
        """Fold the live snapshots into a single one (bounds the number of
        files current() must merge).  A no-op with <2 live snapshots."""
        if len(self._live()) < 2:
            return None
        cur = self.current()
        return self._commit(f"compact-{len(self.manifest()['snapshots']):05d}",
                            cur, kind="compact")

    def apply_batch(self, batch_key: str, documents: DataFrame,
                    cfg: EngineConfig) -> dict | None:
        """Render one batch of documents over the current store state and
        commit a DELTA snapshot of only the touched tiles.  Idempotent:
        committed keys are skipped."""
        if batch_key in self.committed_batches():
            return None
        # persist: the event union's branches each re-derive from the
        # scan otherwise (see plans/pipeline.py render_pyramid); released
        # in the finally once _commit has materialized the snapshot, so
        # long incremental runs don't accumulate cached batches
        points = parse_documents(documents).persist()
        try:
            # the persisted batch's size is known (one cheap job over the
            # cache), so size the raster-fold shuffles ∝ the batch instead
            # of the session's full-render partition count: a small delta
            # batch otherwise pays hundreds of near-empty Python tasks
            # per rasterize/write stage (events ≈ points × zooms; ~20k
            # events per fold task)
            if cfg.fold_partitions is None:
                import dataclasses
                import math
                conf_parts = int(self.spark.conf.get(
                    "spark.sql.shuffle.partitions"))
                est_events = points.count() * max(1, len(cfg.zooms()))
                cfg = dataclasses.replace(cfg, fold_partitions=max(
                    1, min(conf_parts, math.ceil(est_events / 20_000))))
            events = build_events(points, cfg)
            store = self.current()
            if store is None:
                updated = rasterize(events, cfg)
            else:
                updated = rasterize(
                    events, cfg,
                    store=store.select("z", "tx", "ty", "point_cnt", "png"))
            entry = self._commit(batch_key, updated)
        finally:
            points.unpersist()
        if len(self._live()) > self.compact_every:
            self.compact()
        return entry


def doc_range_bounds(documents: DataFrame, n_ranges: int,
                     target_sample: int = 10_000) -> list[str]:
    """Contiguous, ascending doc_id range boundaries from a BOUNDED
    sample: count (parquet-footer cheap) → Bernoulli row sample sized to
    ~target_sample → driver-side sort of ≤ O(target_sample) ids.  No
    distinct shuffle, no unbounded collect — at 10^12 docs the driver
    sees 10^4 strings, not 10^12."""
    if n_ranges <= 1:
        return []
    cnt = documents.count()
    if cnt == 0:
        return []
    frac = min(1.0, float(target_sample) / float(cnt))
    ids = sorted({
        r.doc_id for r in
        documents.select("doc_id").sample(False, frac, seed=11).collect()
    })
    if len(ids) < n_ranges:
        return []
    step = max(1, len(ids) // n_ranges)
    return ids[step::step][: n_ranges - 1]


def _range_predicate(lo: str | None, hi: str | None):
    p = F.lit(True)
    if lo is not None:
        p = p & (F.col("doc_id") >= F.lit(lo))
    if hi is not None:
        p = p & (F.col("doc_id") < F.lit(hi))
    return p


def process_batches(spark: SparkSession, documents: DataFrame,
                    store_dir: str, cfg: EngineConfig | None = None,
                    n_batches: int = 4) -> TileStore:
    """Batch the corpus by contiguous doc_id RANGES (boundaries from a
    bounded sample — no driver-side id list) and apply each batch in
    order, resuming from the manifest.  Ascending contiguous ranges
    preserve the painter ordering across batches; the range predicates
    are plan literals of size O(n_batches), not an isin() of every id."""
    cfg = cfg or EngineConfig()
    store = TileStore(spark, store_dir)
    bounds = doc_range_bounds(documents, n_batches)
    edges: list[tuple[str | None, str | None]] = []
    cuts: list[str | None] = [None] + list(bounds) + [None]
    for i in range(len(cuts) - 1):
        edges.append((cuts[i], cuts[i + 1]))
    for b, (lo, hi) in enumerate(edges):
        batch = documents.filter(_range_predicate(lo, hi))
        store.apply_batch(f"batch-{b:04d}", batch, cfg)
    return store


def run_streaming(spark: SparkSession, docs_dir: str, store_dir: str,
                  cfg: EngineConfig | None = None,
                  checkpoint_dir: str | None = None):
    """Structured Streaming wrapper: new parquet files of documents
    arriving in docs_dir incrementally update the tile store via
    foreachBatch (exactly-once through manifest idempotence + Spark's
    streaming checkpoint)."""
    from ..corpus import SPANS_SCHEMA

    cfg = cfg or EngineConfig()
    store = TileStore(spark, store_dir)

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        store.apply_batch(f"epoch-{epoch_id:06d}", batch_df, cfg)

    stream = (
        spark.readStream.schema(SPANS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(docs_dir)
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation",
                checkpoint_dir or os.path.join(store_dir, "_stream_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    return q


def run_gpx_streaming(spark: SparkSession, gpx_dir: str, store_dir: str,
                      cfg: EngineConfig | None = None,
                      max_files_per_trigger: int = 4,
                      checkpoint_dir: str | None = None,
                      available_now: bool = True):
    """The reference's ``-0`` stdin arrival loop as Structured Streaming.

    gpx2tiles reads NUL-terminated file names from stdin and processes
    each as it arrives, the pipe buffer providing natural backpressure
    (gpx2tiles.c:1098-1108).  The Spark-native equivalent is a
    ``binaryFile`` FILE-ARRIVAL source over a drop directory:

    - arrival        = the file appearing in ``gpx_dir`` (the streaming
      source lists new files per trigger, exactly-once via the
      checkpoint's seen-files log);
    - backpressure   = ``maxFilesPerTrigger`` bounds each micro-batch
      like the pipe buffer bounds the reference's read loop;
    - processing     = each micro-batch runs the SAME batch pipeline
      (decode → parse → events → rasterize over the current store) via
      foreachBatch into the incremental :class:`TileStore`, whose
      manifest idempotence makes replays after a crash no-ops.

    With ``available_now`` the query drains the directory and stops
    (the reference's stdin-EOF exit); pass False for a continuous
    micro-batch trigger."""
    from ..sources.gpxfiles import binary_rows_to_documents

    cfg = cfg or EngineConfig()
    store = TileStore(spark, store_dir)

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        store.apply_batch(f"gpx-epoch-{epoch_id:06d}",
                          binary_rows_to_documents(batch_df), cfg)

    stream = (
        spark.readStream.format("binaryFile")
        # the binaryFile source's fixed schema, stated explicitly
        # (streaming sources don't infer)
        .schema("path string, modificationTime timestamp, "
                "length long, content binary")
        .option("pathGlobFilter", "*.gpx")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(gpx_dir)
    )
    writer = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation",
                checkpoint_dir or os.path.join(store_dir,
                                               "_stream_checkpoint"))
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
