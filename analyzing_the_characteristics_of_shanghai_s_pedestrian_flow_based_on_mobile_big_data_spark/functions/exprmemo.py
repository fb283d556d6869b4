"""Process-level memo for expensive-to-CONSTRUCT Column trees.

Some expression families here are large enough that merely BUILDING
them through py4j dominates query wall-clock: the 32-language trigram
classifier is ~640 profile entries × ~6 gateway round-trips ≈ 4,000
py4j calls — measured ~5 s per construction (after JVM warm-up) — and
the bench pays that on every timed pass because each pass re-builds
its DataFrame. The trees themselves are PURE: they reference input
columns by NAME (unresolved attributes) and literals only, so one
constructed Column is reusable across any number of DataFrames and
queries within a JVM.

This memo caches such Columns keyed by a caller-chosen tuple, guarded
by the py4j gateway identity: if the JVM/gateway is ever torn down and
relaunched (tests that stop the gateway, the bench's post-run
shutdown), cached JavaObject handles would dangle — a gateway change
invalidates the whole memo. No data, no plans, no results are cached:
only expression ASTs, the same ones the builder would reconstruct
call after call.
"""

from __future__ import annotations

from typing import Any, Callable

_MEMO: dict[tuple, tuple[Any, Any]] = {}


def _gateway() -> Any:
    from pyspark import SparkContext

    return SparkContext._gateway


def memoized_expr(key: tuple, build: Callable[[], Any]) -> Any:
    """Return ``build()``, cached per (py4j gateway, key).

    ``build`` must construct a pure expression value — a Column, or a
    dict/list of Columns — that references input columns by NAME only
    (never a DataFrame-bound column, whose expression ids pin it to
    one plan)."""
    gw = _gateway()
    hit = _MEMO.get(key)
    if hit is not None and hit[0] is gw:
        return hit[1]
    val = build()
    _MEMO[key] = (gw, val)
    return val
