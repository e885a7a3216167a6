"""Physical data-layout operators: multi-dimensional clustering.

At 100 TB the scan is the query cost, and the scan is bounded by FILE and
ROW-GROUP pruning on min/max statistics.  A linear sort makes one
column's stats tight and leaves every other column's range full-width per
file; Z-ORDER (Morton) interleaving makes ALL clustered columns' ranges
partially tight, so selective predicates on any of them prune files.
This is the public Delta/Iceberg ``OPTIMIZE ZORDER BY`` recipe expressed
with plain Spark primitives: a bit-interleaving column expression +
``repartitionByRange`` + ``sortWithinPartitions`` — no engine extension,
no UDF, wholly codegen'd.

The key is deterministic integer arithmetic, so the DuckDB oracle
reproduces it bit-for-bit (catalog query ``zorder_key``); the layout win
itself is asserted from parquet footer statistics in pytest (the z-curve
dominates each single-column sort on the OTHER column's per-file range).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Scale a numeric column into the integer grid [0, 2^bits): the
    Z-order preprocessor.  Clamps out-of-range values; the grid edges are
    closed so ``hi`` lands in the top cell."""
    cells = 1 << bits
    scaled = F.floor((col.cast("double") - F.lit(lo)) / F.lit(hi - lo) * cells)
    return (
        F.least(F.lit(cells - 1).cast("long"), F.greatest(F.lit(0).cast("long"), scaled))
    ).cast("long")


def zorder_key(c1: Column, c2: Column, bits: int = 10) -> Column:
    """Morton/Z-order interleave of two ALREADY-QUANTIZED non-negative
    integer columns (each < 2^bits): bit b of c1 lands at position 2b,
    bit b of c2 at 2b+1.  Pure shift/and/or column algebra — codegen'd,
    map-only, and exactly reproducible in any engine with integer bit
    ops (the DuckDB oracle mirrors it term by term)."""
    key = F.lit(0).cast("long")
    for b in range(bits):
        key = key.bitwiseOR(
            F.shiftleft(F.shiftright(c1.cast("long"), b).bitwiseAND(F.lit(1)), 2 * b)
        ).bitwiseOR(
            F.shiftleft(
                F.shiftright(c2.cast("long"), b).bitwiseAND(F.lit(1)), 2 * b + 1
            )
        )
    return key


def zorder_layout(
    df: DataFrame,
    key_col: Column,
    n_files: int,
    sort_extra: tuple[str, ...] = (),
) -> DataFrame:
    """Cluster a frame along a Z-order key for writing: range-partition on
    the key (so each output file owns a contiguous z-curve segment — this
    is what makes footer min/max stats tight) and sort within partitions.
    Returns the re-laid-out frame; caller writes it.  Scale shape: one
    range exchange (with Spark's sampling-based range boundaries), then a
    local sort — identical cost to a plain global sort."""
    with_key = df.withColumn("_zkey", key_col)
    return (
        with_key.repartitionByRange(n_files, F.col("_zkey"))
        .sortWithinPartitions("_zkey", *sort_extra)
        .drop("_zkey")
    )
