"""foreachBatch incremental upsert of a long-form aggregate table.

The batch-incremental OD/occupancy story from SURVEY.md §2.10: each
micro-batch's partial counts are merged (added) into a persistent
long-form parquet table. No lakehouse format in this environment, so
the merge is read-modify-write with a two-generation directory swap —
the exactly-once contract comes from the streaming checkpoint (a batch
re-run overwrites the same generation deterministically).

At scale the swap becomes a MERGE INTO on Delta/Iceberg and the
read-modify-write narrows to the touched partitions (counts are
partitioned by hour → only the watermark-recent partitions rewrite).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class IncrementalCountTable:
    """Additive count table keyed by `keys`, maintained across batches."""

    def __init__(self, spark: SparkSession, path: str, keys: list[str]):
        self.spark = spark
        self.path = path
        self.keys = keys

    def _current(self) -> str | None:
        ptr = os.path.join(self.path, "CURRENT")
        if os.path.exists(ptr):
            with open(ptr) as f:
                return os.path.join(self.path, f.read().strip())
        return None

    def read(self) -> DataFrame | None:
        cur = self._current()
        if cur is None:
            return None
        return self.spark.read.parquet(cur)

    def merge_batch(self, delta: DataFrame, epoch_id: int) -> None:
        """Add a batch's (keys..., cnt) partial counts into the table."""
        existing = self.read()
        merged = (
            existing.unionByName(delta) if existing is not None else delta
        )
        merged = merged.groupBy(*self.keys).agg(
            F.sum("cnt").alias("cnt")
        )
        gen = f"gen_{epoch_id}"
        out = os.path.join(self.path, gen)
        if os.path.exists(out):
            shutil.rmtree(out)  # re-run of the same epoch → idempotent
        merged.write.mode("overwrite").parquet(out)
        tmp = os.path.join(self.path, "CURRENT.tmp")
        with open(tmp, "w") as f:
            f.write(gen)
        os.replace(tmp, os.path.join(self.path, "CURRENT"))


def incremental_occupancy_stream(
    spark: SparkSession,
    events_dir: str,
    table_path: str,
    checkpoint_dir: str,
    schema: str = "user_id long, hour timestamp, region_id int",
):
    """Stream position files → additive (region_id, hour) occupancy
    table via foreachBatch. Returns the StreamingQuery."""
    table = IncrementalCountTable(spark, table_path, ["region_id", "hour"])

    def upsert(batch_df: DataFrame, epoch_id: int) -> None:
        delta = batch_df.groupBy("region_id", "hour").agg(
            F.count("*").alias("cnt")
        )
        table.merge_batch(delta, epoch_id)

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(events_dir)
    )
    return (
        src.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
