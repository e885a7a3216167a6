"""Temporal join operators Spark lacks as built-ins: as-of join and
banded range join.

The reference has no temporal joins at all (SURVEY §2.7); these are the
standard time-series extensions (kdb aj / pandas merge_asof / DuckDB
ASOF JOIN semantics), implemented as SHUFFLE-ONCE compositions of
DataFrame primitives — no range-condition sort-merge explosion, no
cartesian fallback:

- **as-of join**: union both sides tagged, one window sort per key,
  ``last(<packed right row>, ignorenulls)`` carries the most recent right
  match forward onto each left row.  One exchange on the key — the same
  cost as a plain groupBy, regardless of how many right rows precede each
  left row.
- **range join**: bucket timestamps to tolerance-width cells, replicate
  the right side into its 3 neighboring cells, equi-join on (key, cell),
  filter the exact band.  Join fan-out is bounded by rows-per-cell, never
  all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: tuple[str, ...] = (),
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join: for every left row, attach the right row of the
    same ``key`` with the greatest ``right_ts`` <= ``left_ts`` (DuckDB
    ``ASOF LEFT JOIN`` / pandas ``merge_asof`` semantics; unmatched left
    rows keep nulls).

    Implementation: tag sides, union, one window sorted by (ts, side) per
    key — right rows sort before left rows at equal ts so equality matches —
    then ``last(packed, ignorenulls=True)`` over the unbounded-preceding
    frame.  The right row rides as ONE struct so a legitimately-null right
    value column can't be skipped past to an older row.

    If several right rows share (key, ts), the last one in (arbitrary but
    deterministic post-shuffle) struct order wins — dedupe the right side
    first when that matters, as q_asof_clicks_purchases does.
    """
    rstruct = F.struct(
        F.col(right_ts).alias("__rts"), *[F.col(c) for c in right_cols]
    )
    r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        rstruct.alias("__r"),
    )
    l = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
        "*",
    )
    u = l.unionByName(r.withColumns({c: F.lit(None) for c in left.columns
                                     if c not in r.columns}), allowMissingColumns=True)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("__match", F.last("__r", ignorenulls=True).over(w))
    out = matched.filter(F.col("__side") == 1).select(
        *left.columns,
        F.col("__match.__rts").alias(f"{prefix}{right_ts}"),
        *[F.col(f"__match.{c}").alias(f"{prefix}{c}") for c in right_cols],
    )
    return out


def range_join_pairs(
    events: DataFrame,
    key: str,
    ts: str = "ts",
    id_col: str = "event_id",
    tolerance_seconds: int = 600,
) -> DataFrame:
    """Banded self range join: pairs of rows with the same ``key`` whose
    timestamps differ by at most ``tolerance_seconds`` (id_a < id_b).

    Scale shape: bucket = floor(epoch_ms / tol_ms); the right side is
    replicated into cells {b-1, b, b+1} (explode of a 3-literal array), the
    join is a plain equi-join on (key, cell), and the exact |Δt| ≤ tol band
    is a post-filter.  Shuffle volume is 4× the input rows — never a range
    sort-merge or cartesian.  Pair fan-out is bounded by rows per
    (key, cell), i.e. by data density within one tolerance window.
    """
    tol_ms = tolerance_seconds * 1000
    base = events.select(
        F.col(key).alias("__k"),
        F.col(id_col).alias("__id"),
        F.unix_millis(F.col(ts)).alias("__ms"),
    )
    cell = (F.col("__ms") / F.lit(tol_ms)).cast("long")
    a = base.select("__k", F.col("__id").alias("id_a"),
                    F.col("__ms").alias("ms_a"), cell.alias("__cell"))
    b = base.select(
        "__k",
        F.col("__id").alias("id_b"),
        F.col("__ms").alias("ms_b"),
        F.explode(F.array(cell - 1, cell, cell + 1)).alias("__cell"),
    )
    return (
        a.join(b, ["__k", "__cell"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("ms_a") - F.col("ms_b")) <= tol_ms)
        )
        .select(
            F.col("__k").alias(key),
            "id_a",
            "id_b",
            F.abs(F.col("ms_a") - F.col("ms_b")).alias("gap_ms"),
        )
    )
    # no dedup needed: id_a's cell is fixed, so of id_b's 3 replicas exactly
    # one can land in it — each qualifying pair is emitted exactly once


def funnel_steps(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    type_col: str = "event_type",
    steps: tuple[str, ...] = ("view", "click", "purchase"),
) -> DataFrame:
    """Ordered funnel analysis: for each key, the earliest time each step
    was reached GIVEN the previous step happened strictly before it —
    step N's timestamp is the min event time of its type that is LATER
    than step N-1's resolved timestamp (the standard product-analytics
    conversion funnel, sequential semantics, not mere presence).

    Scale shape: one exchange on the key, then one chained window select
    per step over the SAME partitioning (no join, no re-shuffle — each
    step's conditional min is a window aggregate referencing the previous
    step's column), finished by a per-key aggregate that reuses the
    partitioning.  Compare: the join formulation shuffles the event table
    once per step."""
    wu = Window.partitionBy(key)
    out = df.select(key, ts, type_col)
    prev = None
    names = []
    for i, step in enumerate(steps):
        name = f"__t{i}"
        cond = F.col(type_col) == step
        if prev is not None:
            cond = cond & (F.col(ts) > F.col(prev))
        out = out.withColumn(name, F.min(F.when(cond, F.col(ts))).over(wu))
        prev = name
        names.append(name)
    # build the CASE inside-out: ascending order leaves the DEEPEST step as
    # the outermost branch (step i non-null implies step i-1 non-null, so
    # the deepest non-null step must win)
    reached = F.lit(0)
    for i in range(len(steps)):
        reached = F.when(F.col(f"__t{i}").isNotNull(), F.lit(i + 1)).otherwise(
            reached
        )
    return (
        out.withColumn("steps_completed", reached)
        .groupBy(key)
        .agg(
            *[
                F.unix_millis(F.min(n)).alias(f"t_{s}_ms")
                for n, s in zip(names, steps)
            ],
            F.max("steps_completed").alias("steps_completed"),
        )
    )


def interval_overlap_pairs(
    intervals: DataFrame,
    id_col: str = "event_id",
    start_ms: str = "start_ms",
    end_ms: str = "end_ms",
    bin_ms: int = 7_200_000,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Interval self-overlap join: all pairs of half-open intervals
    [start, end) that overlap (``a.start < b.end AND b.start < a.end``,
    ``id_a < id_b``), without a range sort-merge or cartesian product.

    Scale shape (bin blocking): each interval explodes into the epoch
    bins it covers (``floor(start/W) … floor((end−1)/W)`` — fan-out is
    interval_length/W + 1, so size W to the typical interval), the join
    is a plain equi-join on the bin, and each qualifying pair is emitted
    EXACTLY ONCE — only at the bin containing the overlap's start
    (``floor(greatest(start_a, start_b)/W)``), a bin both intervals cover
    by construction — so no distinct pass is needed.  Join fan-out is
    bounded by intervals alive per bin (data density), never all-pairs.
    """
    base = intervals.select(
        F.col(id_col).alias("__id"),
        F.col(start_ms).alias("__s"),
        F.col(end_ms).alias("__e"),
        *[F.col(c) for c in carry_cols],
    ).filter(F.col("__e") > F.col("__s"))
    # empty/degenerate intervals ([s, e) with e <= s) are dropped up
    # front: they can overlap nothing under the half-open condition, and
    # letting them through would make `sequence` count DOWN (its step
    # defaults to -1 when start > stop), exploding bogus bins
    w = F.lit(int(bin_ms))
    bins = F.sequence(
        (F.col("__s") / w).cast("long"), ((F.col("__e") - 1) / w).cast("long")
    )
    e = base.select(
        "__id", "__s", "__e", *carry_cols, F.explode(bins).alias("__bin")
    )
    a = e.select(
        F.col("__id").alias("id_a"), F.col("__s").alias("s_a"),
        F.col("__e").alias("e_a"), "__bin",
        *[F.col(c).alias(f"{c}_a") for c in carry_cols],
    )
    b = e.select(
        F.col("__id").alias("id_b"), F.col("__s").alias("s_b"),
        F.col("__e").alias("e_b"), "__bin",
        *[F.col(c).alias(f"{c}_b") for c in carry_cols],
    )
    overlap_start = F.greatest(F.col("s_a"), F.col("s_b"))
    return (
        a.join(b, "__bin")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("s_a") < F.col("e_b"))
            & (F.col("s_b") < F.col("e_a"))
            & ((overlap_start / w).cast("long") == F.col("__bin"))
        )
        .select(
            "id_a",
            "id_b",
            *[f"{c}_a" for c in carry_cols],
            *[f"{c}_b" for c in carry_cols],
            (F.least(F.col("e_a"), F.col("e_b")) - overlap_start).alias(
                "overlap_ms"
            ),
        )
    )
