"""SparkSession factory with the engine's tuned defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "gpx2tiles_spark", master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Local-mode tuned session.

    - AQE on (runtime coalesce + skew split),
    - shuffle partitions ~ cores (not the 200 default),
    - Arrow enabled for all pandas-UDF exchange,
    - session timezone pinned UTC (reference K6 quirk documented in
      SURVEY.md §2.8; oracle comparisons need UTC).
    """
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    cores = os.cpu_count() or 8
    if shuffle_partitions is None:
        if master.startswith("local[") and master[6:-1].isdigit():
            cores = int(master[6:-1])
        shuffle_partitions = max(8, cores)
    b = (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "128m")
    )
    # OPT-IN shuffle spill on tmpfs (SPARK_GRAFT_TMPFS=1): the sandbox's
    # single virtual disk serializes concurrent shuffle writers (a real
    # cluster gives each executor local NVMe); measured −22% on the
    # event-gen phase with 4 executor JVMs.  Opt-in rather than default:
    # spill consuming RAM can OOM a memory-tight host, so the benchmarks
    # enable it explicitly and library consumers keep disk spill.
    if (os.environ.get("SPARK_GRAFT_TMPFS") and os.path.isdir("/dev/shm")
            and "SPARK_LOCAL_DIRS" not in os.environ):
        b = b.config("spark.local.dir", "/dev/shm/gpx2tiles_spark_tmp")
    return b.getOrCreate()
