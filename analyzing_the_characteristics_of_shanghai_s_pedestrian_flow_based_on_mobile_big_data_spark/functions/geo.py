"""Geospatial scalar functions — pure Catalyst expressions, no UDFs.

The reference computes haversine distance in numpy inside a
closure-capturing python UDF (``cal_subarea_portion.py:83-92``,
``:142-149``). Here it is a native column expression: stays inside
whole-stage codegen, vectorizes, and never crosses the JVM↔python
boundary — the difference between O(rows) pickling and zero overhead
at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6372800.0  # matches the reference constant (cal_subarea_portion.py:85)


def haversine_m(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in meters (haversine formula).

    Mirrors the reference's numpy implementation
    (cal_subarea_portion.py:83-92) as a Catalyst expression.
    """
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.pow(F.sin(dlon / 2), 2)
    )
    return F.lit(2 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))
