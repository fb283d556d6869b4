"""Region-dimension construction and ping→region assignment.

Re-expresses the reference's region pipeline:

- ``region.py:42-53``: geohash-encode POIs at precisions 5–8 and mint a
  dense surrogate ``agent_id`` over geohash5. The reference forces a
  single-partition window with a constant-literal partition key
  (``region.py:50`` — every row through one task). Here the dimension
  is small by definition (regions, not pings), so a global dense_rank
  is acceptable; for very large dims swap in the two-phase variant
  below (distinct keys → sorted ids → broadcast join back).
- ``cal_orig_area.py:24-43,88-90``: cascading geohash broadcast joins
  (try fine precision, fall back to coarse, default 0) — built on the
  single-pass :func:`..operators.cascade.cascade_join`, so the ping
  fact is scanned once, not once per precision.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.geohash import geohash_encode
from .cascade import cascade_join


def build_region_dim(
    poi: DataFrame,
    lat_col: str = "latitude",
    lon_col: str = "longitude",
    precisions: Sequence[int] = (5, 6, 7, 8),
    anchor_precision: int = 5,
) -> DataFrame:
    """POI table → region dimension with geohash columns and a dense
    1-based ``agent_id`` keyed on the anchor-precision geohash
    (region.py:42-53)."""
    out = poi
    for p in precisions:
        out = out.withColumn(
            f"geohash{p}", geohash_encode(F.col(lat_col), F.col(lon_col), p)
        )
    anchor = f"geohash{anchor_precision}"
    w = Window.orderBy(anchor)
    return out.withColumn("agent_id", F.dense_rank().over(w))


def assign_region(
    pings: DataFrame,
    region_dim: DataFrame,
    lat_col: str = "ltt",
    lon_col: str = "lgt",
    precisions: Sequence[int] = (6, 5),
    default_region: int = 0,
) -> DataFrame:
    """Attach ``agent_id`` to each ping by cascading geohash precision
    (finest first), defaulting to the out-of-area sentinel
    (cal_orig_area.py:24-43 + default at :88-90, single-pass)."""
    fact = pings
    for p in precisions:
        fact = fact.withColumn(
            f"__gh{p}", geohash_encode(F.col(lat_col), F.col(lon_col), p)
        )
    levels = [
        (region_dim, f"__gh{p}", f"geohash{p}", "agent_id") for p in precisions
    ]
    out = cascade_join(
        fact, levels, "region_id", F.lit(default_region), broadcast_dims=True
    )
    return out.drop(*[f"__gh{p}" for p in precisions]).withColumn(
        "region_id", F.col("region_id").cast("int")
    )
