"""Incremental tile updates with snapshot/manifest checkpointing.

The reference updates tiles in place by drawing over existing PNGs
(open_tile loads `{z}/{x}/{y}.png` as the base — gpx2tiles.c:277-310,
README.md:20-22).  The engine's equivalent is an Iceberg-style
copy-on-write **TileStore**: each batch produces a new immutable
snapshot (parquet of (z,tx,ty,point_cnt,png)) plus a JSON manifest entry
with per-partition lineage and metrics.  Resume = skip batch keys
already in the manifest — re-running a killed job is idempotent.

No Iceberg jar is guaranteed in this environment, so the snapshot +
manifest substrate is plain parquet + JSON with the same semantics
(atomic manifest replace, immutable snapshot dirs, monotonic ids).

``run_streaming`` wraps the same batch update as a Structured Streaming
``foreachBatch`` sink over a documents directory — micro-batch arrival
of new document files incrementally updates the store.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import EngineConfig
from ..operators.events import build_events
from ..operators.parse import parse_documents
from ..operators.raster import TILES_SCHEMA, rasterize


@dataclass
class TileStore:
    spark: SparkSession
    root: str

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

    def current(self) -> DataFrame | None:
        snaps = self.manifest()["snapshots"]
        if not snaps:
            return None
        return self.spark.read.parquet(
            os.path.join(self.root, snaps[-1]["path"]))

    def _commit(self, batch_key: str, tiles: DataFrame) -> dict:
        m = self.manifest()
        sid = len(m["snapshots"])
        rel = f"snapshot-{sid:05d}"
        path = os.path.join(self.root, rel)
        tiles.write.mode("overwrite").parquet(path)
        written = self.spark.read.parquet(path)
        # per-partition (zoom) lineage + metrics — the north rule's
        # per-partition accounting, derived from the rasterizer's
        # n_events/n_docs columns
        stats = [r.asDict() for r in (
            written.groupBy("z").agg(
                F.count("*").alias("tiles"),
                F.sum("point_cnt").alias("points"),
                F.sum("n_events").alias("events"),
                F.max("n_docs").alias("max_docs_per_tile"),
            ).orderBy("z").collect())]
        entry = {
            "id": sid, "batch_key": batch_key, "path": rel,
            "committed_at": time.time(),
            "n_tiles": written.count(),
            "partitions": stats,
        }
        m["snapshots"].append(entry)
        os.makedirs(self.root, exist_ok=True)
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, self.manifest_path)  # atomic manifest swap
        return entry

    def apply_batch(self, batch_key: str, documents: DataFrame,
                    cfg: EngineConfig) -> dict | None:
        """Render one batch of documents over the current store state and
        commit a new snapshot.  Idempotent: committed keys are skipped."""
        if batch_key in self.committed_batches():
            return None
        points = parse_documents(documents)
        events = build_events(points, cfg)
        store = self.current()
        if store is None:
            updated = rasterize(events, cfg)
            return self._commit(batch_key, updated)
        updated = rasterize(events, cfg,
                            store=store.select("z", "tx", "ty", "point_cnt", "png"))
        untouched = store.join(updated.select("z", "tx", "ty"),
                               ["z", "tx", "ty"], "left_anti")
        return self._commit(batch_key, updated.unionByName(untouched))


def process_batches(spark: SparkSession, documents: DataFrame,
                    store_dir: str, cfg: EngineConfig | None = None,
                    n_batches: int = 4) -> TileStore:
    """Batch the corpus by doc_id hash-range and apply each batch in
    order, resuming from the manifest.  doc order inside a batch and
    batch order together preserve the painter ordering (doc_id ranges
    are contiguous and ascending)."""
    cfg = cfg or EngineConfig()
    store = TileStore(spark, store_dir)
    ids = sorted(r.doc_id for r in documents.select("doc_id").distinct().collect())
    size = max(1, (len(ids) + n_batches - 1) // n_batches)
    for b in range(n_batches):
        chunk = ids[b * size:(b + 1) * size]
        if not chunk:
            break
        batch = documents.filter(F.col("doc_id").isin(chunk))
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
