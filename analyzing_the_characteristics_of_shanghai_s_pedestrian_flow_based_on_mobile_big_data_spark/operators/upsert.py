"""MERGE-style upsert without a lakehouse format.

Delta/Iceberg jars aren't in this environment, so MERGE INTO is
emulated with the classic anti-join + union (the pattern the engine
would compile MERGE to anyway): keep every target row whose key is not
in the updates, then append the updates. Combined with a partitioned
parquet sink this gives idempotent incremental loads — the batch side
of the streaming ``foreachBatch`` story.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def merge_upsert(
    target: DataFrame, updates: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Rows of ``updates`` win on key collision; all other target rows
    survive. Columns must match by name."""
    keep = target.join(updates.select(*keys).distinct(), list(keys), "left_anti")
    return keep.unionByName(updates)
