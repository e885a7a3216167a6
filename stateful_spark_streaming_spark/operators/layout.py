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


def zorder_compact(
    spark,
    path: str,
    c1: str,
    c2: str,
    bits: int = 10,
    n_files: int | None = None,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_extra: tuple[str, ...] = (),
) -> None:
    """OPTIMIZE ZORDER for a GROWN parquet directory — the layout analog
    of ``ivf_retrain``: appends land cheap in arrival order (footer
    min/max stats near-useless, small files accumulate), and this cadence
    job rewrites the table z-clustered so range predicates on either
    clustered column prune row groups again.  Public recipe: Delta /
    Iceberg ``OPTIMIZE ZORDER BY`` (bin-pack + multi-dimensional
    cluster), expressed with plain Spark primitives + the directory-swap
    atomics the staged-sink compactions use.

    Grid bounds come from the table's own column stats (one aggregate —
    the standard recipe; a grid sized to a larger domain wastes curve
    bits), and ``n_files`` defaults to bin-packing the current bytes into
    ~``target_file_bytes`` files, so a thousand drip-appended small files
    compact into few well-sized ones in the same pass.  A constant
    column degrades gracefully to a single sort on the other axis (its
    quantized cell is 0 everywhere); with BOTH axes degenerate no
    clustering is possible and the rewrite keeps only the bin-packing
    half (round-robin repartition — a constant range key would collapse
    the table into one task/file).

    Run between appends (same contract as ``compact_partial_log``): the
    rewritten generation is fully materialized at ``<path>.tmp`` before
    the swap, and the swap itself goes through ``generations`` —
    rename-only promotion with crash recovery on the next call, never a
    half-deleted live directory."""
    import os

    from stateful_spark_streaming_spark.generations import (
        recover_generation,
        swap_generation,
    )

    recover_generation(path)
    if not os.path.isdir(path):
        raise FileNotFoundError(f"no parquet table at {path}")
    df = spark.read.parquet(path)
    # NaN-safe stats (nanvl → NULL, which min/max skip): a single NaN row
    # would otherwise poison max() and silently drop that axis from the
    # curve.  n_rows distinguishes an empty table (no-op) from an
    # all-NULL column (still compacted, that axis degraded to constant).
    stats = df.agg(
        F.count(F.lit(1)),
        F.min(F.nanvl(F.col(c1).cast("double"), F.lit(None))),
        F.max(F.nanvl(F.col(c1).cast("double"), F.lit(None))),
        F.min(F.nanvl(F.col(c2).cast("double"), F.lit(None))),
        F.max(F.nanvl(F.col(c2).cast("double"), F.lit(None))),
    ).first()
    n_rows, lo1, hi1, lo2, hi2 = stats
    if n_rows == 0:  # zero rows: nothing to lay out
        return
    if n_files is None:
        total = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(path)
            for f in fs
            if f.endswith(".parquet")
        )
        n_files = max(1, -(-total // target_file_bytes))

    def axis(col_name, lo, hi):
        # all-NULL/NaN column or constant: contribute nothing to the key
        if lo is None or hi is None or float(hi) - float(lo) <= 0:
            return None
        return quantize(F.col(col_name), float(lo), float(hi), bits)

    a1, a2 = axis(c1, lo1, hi1), axis(c2, lo2, hi2)
    if a1 is None and a2 is None:
        # BOTH axes degenerate: a constant z-key would range-partition the
        # whole table into ONE task/file — no clustering is possible, so
        # keep only the bin-packing half of the contract (round-robin)
        laid = df.repartition(n_files)
    else:
        zero = F.lit(0).cast("long")
        laid = zorder_layout(
            df,
            zorder_key(a1 if a1 is not None else zero,
                       a2 if a2 is not None else zero, bits),
            n_files, sort_extra,
        )
    laid.write.mode("overwrite").parquet(path + ".tmp")  # materialized first
    swap_generation(path)


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
    local sort — identical cost to a plain global sort.

    Raises if the frame already has a ``_zkey`` column: withColumn would
    silently REPLACE it and the final drop would delete the caller's data
    (zorder_compact applies this to stored tables in place, where that
    would be permanent loss)."""
    if "_zkey" in df.columns:
        raise ValueError(
            "input already has a _zkey column — rename it first; "
            "zorder_layout would silently overwrite then drop it"
        )
    with_key = df.withColumn("_zkey", key_col)
    return (
        with_key.repartitionByRange(n_files, F.col("_zkey"))
        .sortWithinPartitions("_zkey", *sort_extra)
        .drop("_zkey")
    )


def ensure_bucketed_table(
    spark,
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    location: str,
) -> str:
    """Materialize ``df`` ONCE as a hash-bucketed, per-bucket-sorted
    parquet table and register it in the session catalog — the layout
    investment that makes every subsequent equi-join or aggregation on
    ``key`` SHUFFLE-FREE (Spark reports the scan as
    ``HashPartitioning(key, n_buckets)``, so sort-merge joins between
    co-bucketed tables and key-grouped aggregates need no Exchange).

    At 100 TB this is THE fact-table join strategy: both sides of a
    recurring big-big join are written bucketed on the join key (size
    ``n_buckets`` to data volume — hundreds/thousands on a cluster; 8 at
    test SF) and the per-query shuffle of the largest tables disappears;
    the one-time write cost amortizes over every downstream query.

    Idempotent across sessions and crash-safe in the usual parquet way:
    - table already in this session's catalog → no-op;
    - data already on disk (``_SUCCESS`` present — e.g. written by a
      previous session whose in-memory catalog died with it) → re-register
      the existing files via ``CREATE TABLE … CLUSTERED BY … LOCATION``
      without rewriting a byte;
    - otherwise write it: ``repartition(n_buckets, key)`` first so each
      task holds exactly one bucket → ONE file per bucket, which is what
      lets the sorted-bucket read elide the join's Sort as well.
      (A torn previous write has no ``_SUCCESS`` and is overwritten.)
    """
    import json
    import os

    spec_path = os.path.join(location, "_bucket_spec.json")

    def _check_spec() -> None:
        # The layout on disk was produced under ONE (key, n_buckets);
        # registering metadata that contradicts it would make Spark trust
        # a HashPartitioning the files don't have — the shuffle-free SMJ
        # would silently drop join matches.  The spec sidecar pins it.
        if os.path.exists(spec_path):
            with open(spec_path) as f:
                spec = json.load(f)
            if spec != {"key": key, "n_buckets": n_buckets}:
                raise ValueError(
                    f"bucketed data at {location} was written with "
                    f"{spec}, not (key={key!r}, n_buckets={n_buckets}) — "
                    "use a different location or rewrite"
                )

    if spark.catalog.tableExists(table):
        _check_spec()
        return table
    if os.path.exists(os.path.join(location, "_SUCCESS")):
        _check_spec()
        cols = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
        )
        spark.sql(
            f"CREATE TABLE {table} ({cols}) USING parquet "
            f"CLUSTERED BY ({key}) SORTED BY ({key}) INTO {n_buckets} BUCKETS "
            f"LOCATION '{location}'"
        )
        return table
    (
        df.repartition(n_buckets, F.col(key))
        .write.format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", location)
        .mode("overwrite")
        .saveAsTable(table)
    )
    with open(spec_path, "w") as f:
        json.dump({"key": key, "n_buckets": n_buckets}, f)
    return table


def ensure_partitioned_dataset(
    df: DataFrame,
    part_col: str,
    location: str,
) -> str:
    """Materialize ``df`` ONCE as a directory-partitioned parquet dataset
    (``location/part_col=value/…``) — the layout investment that makes
    every subsequent filter on ``part_col`` a PARTITION-PRUNED scan: Spark
    resolves the matching directories from the partition index and never
    opens a file outside the predicate's range (the scan reports
    ``PartitionFilters``, and data files don't even store the column).

    At 100 TB this is table stakes — a time-range query over an events
    corpus partitioned by day touches 5/3650ths of the files, not all of
    them.  Idempotent the usual parquet way: an existing ``_SUCCESS``
    means a previous session already paid the write and the files are
    reused byte-identical; a torn write (no ``_SUCCESS``) is overwritten.
    """
    import os

    if not os.path.exists(os.path.join(location, "_SUCCESS")):
        (
            df.repartition(F.col(part_col))
            .write.partitionBy(part_col)
            .mode("overwrite")
            .parquet(location)
        )
    return location
