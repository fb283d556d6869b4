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


#: The reference's POI-type probe order: type 7 at geohash8, 6 and 5 at
#: geohash7, 4..1 at geohash6, unmatched → 8
#: (cal_subarea_portion.py:40-76).
DEFAULT_TYPE_LEVELS: Sequence[tuple[int, int]] = (
    (7, 8),
    (6, 7),
    (5, 7),
    (4, 6),
    (3, 6),
    (2, 6),
    (1, 6),
)


def assign_poi_type(
    pings: DataFrame,
    poi_dim: DataFrame,
    lat_col: str = "ltt",
    lon_col: str = "lgt",
    type_levels: Sequence[tuple[int, int]] = DEFAULT_TYPE_LEVELS,
    default_type: int = 8,
) -> DataFrame:
    """Attach a POI ``type`` to each ping via the reference's 8-level
    type-priority cascade (cal_subarea_portion.py:34-76), single-pass.

    ``poi_dim`` must carry ``type`` and the geohash columns produced by
    :func:`build_region_dim`. Each cascade level is (poi_type,
    geohash_precision): a ping matches the level if its geohash at that
    precision equals any POI cell of that type; the first (highest-
    priority) hit wins, else ``default_type`` (the reference's
    "unmatched" 8).
    """
    precisions = sorted({p for _, p in type_levels})
    fact = pings
    for p in precisions:
        fact = fact.withColumn(
            f"__gh{p}", geohash_encode(F.col(lat_col), F.col(lon_col), p)
        )
    levels = []
    for t, p in type_levels:
        dim = (
            poi_dim.filter(F.col("type") == t)
            .select(F.col(f"geohash{p}"), F.lit(t).alias("lvl_type"))
        )
        levels.append((dim, f"__gh{p}", f"geohash{p}", "lvl_type"))
    out = cascade_join(fact, levels, "poi_type", F.lit(default_type))
    return out.drop(*[f"__gh{p}" for p in precisions]).withColumn(
        "poi_type", F.col("poi_type").cast("int")
    )


def nearest_poi_type(
    pings: DataFrame,
    poi: DataFrame,
    key: str = "agent_id",
    ping_lat: str = "ltt",
    ping_lon: str = "lgt",
) -> DataFrame:
    """Type of the nearest POI within the ping's own subarea — replaces
    the reference's closure-capturing python UDF over a driver dict
    (cal_subarea_portion.py:142-149, D3) with a join + native haversine
    + ``min_by``. Ties break to the smallest type (the reference's
    np.argmin takes the first, which is load-order dependent; ours is
    deterministic)."""
    from ..functions.geo import haversine_m

    cand = poi.select(
        F.col(key), F.col("latitude"), F.col("longitude"), F.col("type")
    )
    joined = pings.join(F.broadcast(cand), key)
    dist = haversine_m(
        F.col(ping_lat), F.col(ping_lon), F.col("latitude"), F.col("longitude")
    )
    ping_keys = [c for c in pings.columns]
    return (
        joined.withColumn("__dist", dist)
        .groupBy(*ping_keys)
        .agg(
            F.min_by("type", F.struct("__dist", "type")).alias("nearest_type")
        )
    )


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
