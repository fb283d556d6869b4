"""Vectorized geohash encode / neighbor expansion.

The reference wraps the external ``Geohash`` package in row-at-a-time
python UDFs at four precisions (``region.py:34-40``,
``cal_orig_area.py:45-52``, ``cal_subarea_portion.py:79-80,152-155``)
and expands neighbors with a driver-side loop
(``cal_orig_area.py:62-72``). Here the base32 bit-interleave encode is
re-implemented in pure numpy (no external dependency) and exposed as
Arrow-batched pandas UDFs — the only python that ever runs executor-side
in this engine, and it runs vectorized over whole Arrow batches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_BASE32 = np.frombuffer(b"0123456789bcdefghjkmnpqrstuvwxyz", dtype="S1")
_BASE32_STR = "0123456789bcdefghjkmnpqrstuvwxyz"


def _encode_np(lat: np.ndarray, lon: np.ndarray, precision: int) -> np.ndarray:
    """Vectorized geohash encode: returns array of byte strings."""
    n = lat.shape[0]
    nbits = precision * 5
    lat_min = np.full(n, -90.0)
    lat_max = np.full(n, 90.0)
    lon_min = np.full(n, -180.0)
    lon_max = np.full(n, 180.0)
    bits = np.zeros((n, nbits), dtype=np.uint8)
    for b in range(nbits):
        if b % 2 == 0:  # even bit: longitude
            mid = (lon_min + lon_max) / 2
            hi = lon >= mid
            bits[:, b] = hi
            lon_min = np.where(hi, mid, lon_min)
            lon_max = np.where(hi, lon_max, mid)
        else:  # odd bit: latitude
            mid = (lat_min + lat_max) / 2
            hi = lat >= mid
            bits[:, b] = hi
            lat_min = np.where(hi, mid, lat_min)
            lat_max = np.where(hi, lat_max, mid)
    # pack each group of 5 bits into a base32 index
    weights = np.array([16, 8, 4, 2, 1], dtype=np.uint8)
    idx = bits.reshape(n, precision, 5) @ weights  # (n, precision)
    chars = _BASE32[idx]  # (n, precision) of S1
    return chars.view(f"S{precision}").ravel()


def _decode_bbox(gh: str) -> tuple[float, float, float, float]:
    """(lat_min, lat_max, lon_min, lon_max) of one geohash cell."""
    lat_min, lat_max = -90.0, 90.0
    lon_min, lon_max = -180.0, 180.0
    even = True
    for ch in gh:
        v = _BASE32_STR.index(ch)
        for w in (16, 8, 4, 2, 1):
            if even:
                mid = (lon_min + lon_max) / 2
                if v & w:
                    lon_min = mid
                else:
                    lon_max = mid
            else:
                mid = (lat_min + lat_max) / 2
                if v & w:
                    lat_min = mid
                else:
                    lat_max = mid
            even = not even
    return lat_min, lat_max, lon_min, lon_max


def _neighbors_one(gh: str) -> list[str]:
    """The 3×3 block of cells centered on ``gh`` (self + 8 neighbors),
    replacing the reference's driver-side ``geohash.expand`` loop
    (cal_orig_area.py:62-72)."""
    p = len(gh)
    lat_min, lat_max, lon_min, lon_max = _decode_bbox(gh)
    clat = (lat_min + lat_max) / 2
    clon = (lon_min + lon_max) / 2
    dlat = lat_max - lat_min
    dlon = lon_max - lon_min
    out = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            lat = clat + dy * dlat
            lon = clon + dx * dlon
            if -90 < lat < 90:
                lon = ((lon + 180) % 360) - 180
                out.append(
                    _encode_np(np.array([lat]), np.array([lon]), p)[0].decode()
                )
    return sorted(set(out))


def _interleave_to_chars(xl: Column, yl: Column, precision: int) -> Column:
    """Morton-interleave integer cell coords (xl: nlon bits, yl: nlat
    bits) MSB-first — even stream bits from longitude, odd from
    latitude — then emit the base-32 string."""
    nbits = precision * 5
    nlon = (nbits + 1) // 2
    nlat = nbits // 2
    v = None
    for i in range(nlon):
        term = F.shiftleft(
            F.shiftright(xl, nlon - 1 - i).bitwiseAND(F.lit(1)), nbits - 1 - 2 * i
        )
        v = term if v is None else v.bitwiseOR(term)
    for i in range(nlat):
        term = F.shiftleft(
            F.shiftright(yl, nlat - 1 - i).bitwiseAND(F.lit(1)), nbits - 2 - 2 * i
        )
        v = v.bitwiseOR(term)
    alphabet = F.lit(_BASE32_STR)
    chars = [
        F.substring(
            alphabet,
            (
                F.shiftright(v, 5 * (precision - 1 - k)).bitwiseAND(F.lit(31)) + 1
            ).cast("int"),
            1,
        )
        for k in range(precision)
    ]
    return F.concat(*chars)


def geohash_encode_native(lat: Column, lon: Column, precision: int) -> Column:
    """JVM-native geohash encode — no Python anywhere.

    The bisection in :func:`_encode_np` is mathematically the fixed-point
    index ``floor((coord - lo) / (hi - lo) * 2**nbits)``; computing that
    directly lets the whole encode stay in whole-stage codegen:
    two floor-scales, one Morton-style bit interleave (shift/and/or),
    then base-32 char lookup. This is the canonical encode for queries
    (`geohash_cells`); its SQL twin :func:`geohash_sql` is generated from
    the same loop so Spark and the DuckDB oracle can never drift.

    .. warning:: Do NOT mix this encoder with the Arrow bisection
       encoder (:func:`geohash_encode`) as join keys in one query: for
       coordinates within ~1 ulp of a cell boundary the two-rounding
       fixed-point formula here can disagree with the bisection
       (which compares against exact dyadic midpoints) by one cell.
       Each is self-consistent; pick one per key domain.

    Replaces the reference's row-at-a-time external-lib UDF
    (``region.py:34-40``, ``cal_orig_area.py:45-52``).
    """
    nbits = precision * 5
    nlon = (nbits + 1) // 2
    nlat = nbits // 2
    xl = F.least(
        F.greatest(
            F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(1 << nlon))),
            F.lit(0),
        ),
        F.lit((1 << nlon) - 1),
    ).cast("long")
    yl = F.least(
        F.greatest(
            F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(1 << nlat))),
            F.lit(0),
        ),
        F.lit((1 << nlat) - 1),
    ).cast("long")
    return _interleave_to_chars(xl, yl, precision)


def geohash_sql(lat_expr: str, lon_expr: str, precision: int) -> str:
    """DuckDB SQL expression computing the SAME geohash as
    :func:`geohash_encode_native` — identical operation order so the
    IEEE-754 double roundings match bit-for-bit. Kept next to the Spark
    builder so the two can never drift."""
    nbits = precision * 5
    nlon = (nbits + 1) // 2
    nlat = nbits // 2
    xl = (
        f"least(greatest(CAST(floor(({lon_expr} + 180.0) / 360.0 * "
        f"{float(1 << nlon)}) AS BIGINT), 0), {(1 << nlon) - 1})"
    )
    yl = (
        f"least(greatest(CAST(floor(({lat_expr} + 90.0) / 180.0 * "
        f"{float(1 << nlat)}) AS BIGINT), 0), {(1 << nlat) - 1})"
    )
    terms = [
        f"((({xl} >> {nlon - 1 - i}) & 1) << {nbits - 1 - 2 * i})"
        for i in range(nlon)
    ] + [
        f"((({yl} >> {nlat - 1 - i}) & 1) << {nbits - 2 - 2 * i})"
        for i in range(nlat)
    ]
    v = "(" + " | ".join(terms) + ")"
    chars = [
        f"substr('{_BASE32_STR}', CAST((({v} >> {5 * (precision - 1 - k)}) & 31) "
        f"+ 1 AS INTEGER), 1)"
        for k in range(precision)
    ]
    return "(" + " || ".join(chars) + ")"


def geohash_encode(lat: Column, lon: Column, precision: int) -> Column:
    """Arrow-vectorized geohash encode at the given precision (1–12)."""

    @F.pandas_udf(T.StringType())
    def _enc(la: pd.Series, lo: pd.Series) -> pd.Series:
        la_np = la.to_numpy(dtype=np.float64)
        lo_np = lo.to_numpy(dtype=np.float64)
        valid = ~(np.isnan(la_np) | np.isnan(lo_np))
        out = np.full(la_np.shape[0], None, dtype=object)
        if valid.any():
            enc = _encode_np(la_np[valid], lo_np[valid], precision)
            out[valid] = [s.decode() for s in enc]
        return pd.Series(out)

    return _enc(lat, lon)


def geohash_neighbors_native(gh: Column, precision: int) -> Column:
    """JVM-native 3×3 neighbor block (self included, sorted distinct) —
    the geohash grid is just Morton-interleaved integer cell coords, so
    neighbors are ±1 arithmetic on those coords, no float geometry:

    1. decode the base-32 string back to the interleaved bit value
       (``instr`` per char — the exact inverse of the encode's char
       lookup),
    2. de-interleave into the (x=lon, y=lat) cell integers,
    3. for each of the 9 (dx, dy) offsets: wrap x modulo 2^nlon
       (longitude is periodic), DROP cells with y outside [0, 2^nlat)
       (no rows beyond the poles — same semantics as the Arrow
       version's latitude bound check),
    4. re-interleave and re-encode each surviving cell.

    Pure shift/and/or/substr — whole-stage codegen, no
    ``BatchEvalPython``. Output order/content matches
    :func:`geohash_neighbors` exactly (pytest-pinned), but derived
    from the NATIVE encoder's bit math; per the encoder-mixing warning
    on :func:`geohash_encode_native`, don't join these cells against
    keys produced by the Arrow encoder."""
    nbits = precision * 5
    nlon = (nbits + 1) // 2
    nlat = nbits // 2
    v = None
    for k in range(precision):
        val = (
            F.instr(F.lit(_BASE32_STR), F.substring(gh, k + 1, 1)) - F.lit(1)
        ).cast("long")
        term = F.shiftleft(val, 5 * (precision - 1 - k))
        v = term if v is None else v.bitwiseOR(term)
    x = None
    for i in range(nlon):
        term = F.shiftleft(
            F.shiftright(v, nbits - 1 - 2 * i).bitwiseAND(F.lit(1)), nlon - 1 - i
        )
        x = term if x is None else x.bitwiseOR(term)
    y = None
    for i in range(nlat):
        term = F.shiftleft(
            F.shiftright(v, nbits - 2 - 2 * i).bitwiseAND(F.lit(1)), nlat - 1 - i
        )
        y = term if y is None else y.bitwiseOR(term)
    cells = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            xn = F.pmod(x + F.lit(dx), F.lit(1 << nlon))
            yn = y + F.lit(dy)
            cells.append(
                F.when(
                    (yn >= 0) & (yn < (1 << nlat)),
                    _interleave_to_chars(xn, yn, precision),
                )
            )
    return F.array_sort(
        F.array_distinct(F.filter(F.array(*cells), lambda c: c.isNotNull()))
    )


def geohash_neighbors(gh: Column) -> Column:
    """Array of the 3×3 cell block around each geohash (self included).
    Use with ``F.explode`` to get the dim-side neighbor expansion the
    reference builds on the driver (cal_orig_area.py:62-72).

    Arrow-batched pandas variant, kept for parity testing against the
    bisection encoder; :func:`geohash_neighbors_native` is the
    query-path version (no Python). Don't mix the two families as
    join keys (see :func:`geohash_encode_native`)."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _nb(s: pd.Series) -> pd.Series:
        return s.map(lambda g: _neighbors_one(g) if isinstance(g, str) else None)

    return _nb(gh)
