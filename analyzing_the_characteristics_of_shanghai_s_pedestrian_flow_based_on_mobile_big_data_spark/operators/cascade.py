"""Cascading-fallback join (SURVEY.md J2) — single-pass rewrite.

The reference resolves each ping's region/POI-type by trying a
broadcast join at geohash precision 8, re-joining the unmatched rows at
precision 7, … down to a constant default — 8 sequential
join → isNull-split → union rounds (``cal_subarea_portion.py:34-76``;
``cal_orig_area.py:24-43,88-90``). Without caching, each round re-reads
the fact's whole lineage; with caching it still materializes N times.

Here the cascade is ONE pass: left-join *all* levels in the same plan
(each dimension broadcast), then take the highest-precision hit with
``coalesce``. The fact table is scanned once; Catalyst stacks N
BroadcastHashJoins in a single stage, so cost is one fact scan + N
cheap hash probes — the plan you'd want at 100 TB.

Requirement (same as the reference's implicit one): each dim must be
unique on its join key — enforced here with a deterministic dedupe.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cascade_join(
    fact: DataFrame,
    levels: Sequence[tuple[DataFrame, str, str, str]],
    output_col: str,
    default: Column,
    broadcast_dims: bool = True,
) -> DataFrame:
    """Attach ``output_col`` to ``fact`` by cascading key precision.

    ``levels``: ordered most-precise-first, each
    ``(dim, fact_key, dim_key, dim_value_col)``.
    Each dim is deduped on its key (min value wins — deterministic).
    Result: fact columns + ``output_col`` =
    coalesce(level1.value, level2.value, …, default).
    """
    out = fact
    hit_cols: list[Column] = []
    for i, (dim, fact_key, dim_key, value_col) in enumerate(levels):
        hit = f"__cascade_{i}"
        d = (
            dim.groupBy(dim_key)
            .agg(F.min(value_col).alias(hit))
            .withColumnRenamed(dim_key, f"__k_{i}")
        )
        if broadcast_dims:
            d = F.broadcast(d)
        out = out.join(d, out[fact_key] == d[f"__k_{i}"], "left").drop(f"__k_{i}")
        hit_cols.append(F.col(hit))
    out = out.withColumn(output_col, F.coalesce(*hit_cols, default))
    return out.drop(*[f"__cascade_{i}" for i in range(len(levels))])
