"""SparkSession factory tuned for this engine.

Local-mode defaults mirror what we would set fleet-wide on a real
cluster: AQE on (runtime re-plan, skew-join splitting, partition
coalescing), shuffle partitions sized to cores rather than the 200
default, Arrow enabled for the few pandas-UDF paths, UTC session
timezone so timestamp semantics match the UTC-naive parquet testdata
(and the DuckDB oracle).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "shflow", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE sizes post-shuffle stages by INPUT bytes with a 1 MiB
        # floor per coalesced partition — on kilobyte-scale shuffle
        # stages whose downstream work FANS OUT (band/block self-joins,
        # explode over aggregates) that floor collapses the stage to
        # 1-2 tasks and serializes the fan-out (measured: the h=6
        # simhash probe pinned one core for ~15 s). A 64 KiB floor
        # keeps parallelismFirst effective for such stages; at
        # production scale partitions carry far more than 1 MiB, so
        # the floor never binds and plans are unchanged.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # scan-split sizing: 128 MiB splits keep a decompressed+decoded
        # partition well under per-task memory at 100 TB (the setting
        # that decides scan parallelism; raise only with fat executors)
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SHFLOW_DRIVER_MEM", "8g"))
        .getOrCreate()
    )


def tune_for_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable tunings to an externally-provided session.

    The verification driver hands us its own SparkSession; only
    runtime-mutable confs can be set on it (timezone matters most for
    oracle comparison; shuffle partitions for local perf).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    for k, v in {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        "spark.sql.shuffle.partitions": str(cpus),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64k",
        "spark.sql.adaptive.skewJoin.enabled": "true",
    }.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # conf not runtime-settable on this session — keep going
    return spark
