"""Mergeable fixed-width histograms and histogram-derived quantiles.

The scale problem these solve: exact percentiles over 100 TB need a
global sort (or ``percentile`` on a shuffled group — same thing), and
Spark's ``percentile_approx`` sketch is order-sensitive enough that a
streaming twin can't promise batch parity.  A FIXED-WIDTH histogram is
the boring answer that composes: per-partition bin counts are exact
integers, addition is the merge operator (associative / commutative /
no replay hazard beyond the usual batch-stamp dedupe), and any quantile
is answered from the ~``n_bins`` aggregated rows with integer-rank
arithmetic — resolution is the bin width, stated up front, instead of a
sketch's data-dependent error.  This is the same family as the repo's
DataSketches-HLL pair (``relational.distinct_sketch_stats``): a
mergeable summary whose streaming twin is pytested as EXACT equality
with the batch pass, not a tolerance.

Cross-engine determinism: values are binned through SCALED-INTEGER
arithmetic — ``bp = round(v * scale)`` (exact when ``v`` is already
rounded to ``log10(scale)`` places, as the repo's quality scores are),
then ``bin = bp * n_bins // scale`` — so a score sitting exactly on a
bin edge (0.5500 with 20 bins) lands in the same bin in Spark and in
the DuckDB oracle; raw ``floor((v - lo) / width)`` on doubles flips at
edges between engines.  Bin edges are likewise emitted as integer basis
points first, with the double form derived as ``bp / scale`` (an
IEEE-exact int/int division, identical in both engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scaled_bin(value: Column, n_bins: int, scale: int = 10_000) -> Column:
    """Bin a value in ``[0, 1]`` into ``n_bins`` equal bins via
    scaled-integer arithmetic (NULL in → NULL out).  ``floor`` on the
    double quotient is safe here: the quotient's granularity is
    ``1/scale``, ~11 orders of magnitude above double ulp at these
    magnitudes, so it can never straddle an integer boundary."""
    bp = F.round(value * scale, 0).cast("long")
    # guard the cap explicitly: F.least SKIPS nulls (least(NULL, 19) = 19),
    # so without the when() a NULL value would land in the last bin
    # instead of propagating
    return F.when(
        bp.isNotNull(),
        F.least(F.floor(bp * n_bins / F.lit(scale)), F.lit(n_bins - 1)),
    ).cast("int")


def histogram_finalize(
    counts: DataFrame, n_bins: int, scale: int = 10_000
) -> DataFrame:
    """Attach bin-edge columns to a ``(..., bin, n)`` counts frame — the
    shared tail of the batch operator and the streaming merge-on-read
    (same column set ⇒ the twins share one oracle).  ``bin_lo_bp`` is
    the integer ground truth; ``bin_lo`` is its derived double.

    The true lower edge of bin ``b`` under ``scaled_bin``'s
    ``bp * n_bins // scale`` rule is the smallest bp with that quotient,
    i.e. ``ceil(b * scale / n_bins)`` — computed in integers as
    ``(b * scale + n_bins - 1) div n_bins`` so edges stay exact when
    ``n_bins`` does not divide ``scale`` (3 bins over 10000 bp: bin 2
    starts at 6667, not truncation's 6666)."""
    lo_bp = F.floor(
        (F.col("bin") * F.lit(scale) + F.lit(n_bins - 1)) / F.lit(n_bins)
    )
    return counts.select(
        *[c for c in counts.columns if c not in ("bin", "n")],
        "bin",
        lo_bp.cast("int").alias("bin_lo_bp"),
        (lo_bp / F.lit(float(scale))).alias("bin_lo"),
        F.col("n").cast("long").alias("n"),
    )


def fixed_width_histogram(
    df: DataFrame,
    value: Column,
    group_cols: tuple[str, ...] = (),
    n_bins: int = 20,
    scale: int = 10_000,
) -> DataFrame:
    """Exact sparse histogram of ``value`` (a ``[0, 1]``-ranged column
    expression) per ``group_cols``: one row per non-empty ``(group, bin)``
    with its exact count — the partial-aggregatable shape (map-side
    combine collapses each task to ≤ ``groups × n_bins`` rows before the
    single exchange, so the shuffle is summary-sized regardless of input
    rows).  NULL values are dropped, matching SQL aggregate semantics."""
    binned = df.select(*group_cols, scaled_bin(value, n_bins, scale).alias("bin"))
    counts = (
        binned.filter(F.col("bin").isNotNull())
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return histogram_finalize(counts, n_bins, scale)


def histogram_quantiles(
    hist: DataFrame,
    group_cols: tuple[str, ...] = (),
    qs_bp: tuple[int, ...] = (2_500, 5_000, 7_500, 9_500),
    scale: int = 10_000,
) -> DataFrame:
    """Quantiles from a :func:`fixed_width_histogram` frame, resolved to
    the LOWER EDGE of the bin where the cumulative count first reaches
    ``ceil(q × total)`` — the classic histogram-quantile estimator, kept
    in pure integer arithmetic (ranks via ``(total × q + scale−1) div
    scale``) so both engines pick the same bin always.

    The window here is NOT the banned hot-key shape: it runs over the
    AGGREGATED histogram (≤ ``n_bins`` rows per group), never over raw
    data, so the largest possible partition is ``n_bins`` rows.  Output:
    one row per group with ``p{q}`` double columns (bin-lower-edge
    values) plus ``total``."""
    w = (
        Window.partitionBy(*[F.col(c) for c in group_cols])
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tw = Window.partitionBy(*[F.col(c) for c in group_cols])
    cum = hist.select(
        *group_cols,
        "bin",
        "bin_lo_bp",
        F.sum("n").over(w).alias("cum"),
        F.sum("n").over(tw).alias("total"),
    )
    aggs = [F.max("total").cast("long").alias("total")]
    for q in qs_bp:
        # ceil(total * q / scale) in integers; floor() on the double
        # quotient is edge-safe for the same granularity reason as
        # scaled_bin
        rank = F.floor((F.col("total") * q + (scale - 1)) / F.lit(scale))
        name = f"p{q // (scale // 100)}"
        aggs.append(
            F.min(
                F.when(F.col("cum") >= rank, F.col("bin_lo_bp"))
            ).alias(f"__{name}_bp")
        )
    out = cum.groupBy(*group_cols).agg(*aggs)
    for q in qs_bp:
        name = f"p{q // (scale // 100)}"
        out = out.withColumn(name, F.col(f"__{name}_bp") / F.lit(float(scale)))
    return out.select(*group_cols, "total", *[f"p{q // (scale // 100)}" for q in qs_bp])
