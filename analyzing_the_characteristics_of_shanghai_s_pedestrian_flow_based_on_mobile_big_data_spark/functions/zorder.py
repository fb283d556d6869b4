"""Z-order (Morton) keys — space-filling-curve clustering for layout.

A parquet scan prunes row groups by min/max stats. Sorting by latitude
alone leaves longitude scattered, so a lon-bounded query reads
everything; interleaving the bits of the two grid coordinates gives a
single sort key where nearby (lat, lon) cells are nearby in key space
— both dimensions prune. This is what lakehouse OPTIMIZE ZORDER does;
here it is a native column expression (shiftleft/and/or — whole-stage
codegen, no UDF) plus a writer that range-partitions and sorts by the
key before writing.

The bit math is plain integer arithmetic, so the DuckDB oracle
reproduces keys exactly (`zorder_cells` query).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_key(cell_x: Column, cell_y: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` of two non-negative int cells:
    result bit 2i = x bit i, bit 2i+1 = y bit i. Cells must fit in
    ``bits`` (callers clamp/bin first)."""
    x = cell_x.cast("long")
    y = cell_y.cast("long")
    out = None
    for i in range(bits):
        xi = F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        yi = F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        term = xi.bitwiseOR(yi)
        out = term if out is None else out.bitwiseOR(term)
    return out


def grid_cell(coord: Column, lo: float, hi: float, cells: int) -> Column:
    """Uniform [lo, hi) binning to 0..cells-1 (clamped)."""
    scaled = F.floor((coord - F.lit(lo)) / F.lit(hi - lo) * F.lit(cells))
    return F.greatest(F.lit(0), F.least(F.lit(cells - 1), scaled)).cast("long")


def cluster_by_zorder(
    df: DataFrame,
    key: Column,
    num_files: int,
    key_name: str = "__zkey",
) -> DataFrame:
    """Layout pass before a write: range-partition on the z-key (one
    shuffle, balanced output files) and sort within each partition so
    every parquet row group covers a tight key interval — min/max
    pruning then works for BOTH interleaved dimensions. Drop-in before
    ``.write.parquet``; the key column is kept for stats/debug."""
    keyed = df.withColumn(key_name, key)
    return keyed.repartitionByRange(num_files, F.col(key_name)).sortWithinPartitions(
        key_name
    )
