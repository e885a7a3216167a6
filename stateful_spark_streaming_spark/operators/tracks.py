"""Track algebra — the reference's per-key time-series operators, batch form.

The reference maintains per-key "tracks": chronologically sorted,
timestamp-deduplicated, count-bounded buffers of features
(FeatureTrack.scala:17-138, FeatureTrackPurger.scala:3-12), and exposes a
small query algebra over them: size / latest / oldest / previous / next /
time-range slices (SURVEY §2.3-2.4, T3-T4, W1-W9).

Batch realization: every one of those is a window function or keyed
aggregate — Catalyst-native, whole-stage-codegen'd, one shuffle on the track
key.  At 100 TB the shuffle is hash-partitioned on the key; skew is handled
by AQE skew-join/partition-split, and the per-key top-N never materializes
more than N rows per key past the window operator.

Semantics pinned down (SURVEY §7 "hard/risky" list):
- dedup keeps the FIRST arrival among equal (key, ts) rows — TreeSet.add
  rejects later equals (FeatureTrack.scala:23-38).  Batch parity needs a
  deterministic arrival order, supplied by ``arrival_col`` (a monotonic id).
- retention keeps the N most-recent-by-event-time rows (purge evicts oldest,
  FeatureTrackPurger.scala:7-12), applied AFTER dedup.
- null event time: the reference treats empty time as equal-to-everything
  (SimpleTime.scala:42-48) and failed parses as epoch 0; our policy is
  "coalesce to epoch 0" at parse time, so by this layer ts is non-null.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_MAX_PER_TRACK = 10  # MaxFeaturesPerTrackPurger(10), StreamWithStates.scala:65


def dedup_first_arrival(
    df: DataFrame, key: str, ts: str, arrival_col: str
) -> DataFrame:
    """T3: drop rows whose (key, event-time) already exists, keeping the
    earliest arrival.

    Implemented as a lag-based duplicate test over a window partitioned by
    ``key`` ALONE (ordered by ts, arrival): within a run of equal timestamps
    only the first arrival sees a different predecessor ts.  Partitioning by
    (key, ts) would be semantically identical but forces a second exchange —
    this form shares one hash partitioning on ``key`` with every downstream
    track operator (verified by tools/plan_audit.py: whole track_snapshot
    plan = exactly one Exchange)."""
    w = Window.partitionBy(key).orderBy(F.col(ts).asc(), F.col(arrival_col).asc())
    prev_ts = F.lag(F.col(ts)).over(w)
    return (
        df.withColumn("__dup", prev_ts.isNotNull() & (prev_ts == F.col(ts)))
        .filter(~F.col("__dup"))
        .drop("__dup")
    )


def bound_last_n(
    df: DataFrame, key: str, ts: str, arrival_col: str, n: int = DEFAULT_MAX_PER_TRACK
) -> DataFrame:
    """T4: per-key retention of the n most-recent rows by event time.

    ``arrival_col`` breaks ts ties deterministically (later arrival evicted
    first, matching TreeSet insert-then-purge-oldest order).
    """
    w = Window.partitionBy(key).orderBy(F.col(ts).desc(), F.col(arrival_col).desc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n)
        .drop("__rk")
    )


def build_tracks(
    df: DataFrame,
    key: str,
    ts: str,
    arrival_col: str,
    max_per_track: int = DEFAULT_MAX_PER_TRACK,
) -> DataFrame:
    """dedup → bound: the full FeatureTrack ingest semantics, batch form.

    Both steps share the same partitioning key, so Catalyst plans a single
    exchange on ``key`` reused by both window operators.
    """
    deduped = dedup_first_arrival(df, key, ts, arrival_col)
    return bound_last_n(deduped, key, ts, arrival_col, max_per_track)


def track_counts(tracks: DataFrame, key: str) -> DataFrame:
    """W1: the reference's ``Flights`` snapshot view — (key, count)
    (StreamWithStates.scala:41-43)."""
    return tracks.groupBy(key).agg(F.count(F.lit(1)).alias("track_count"))


def track_latest(tracks: DataFrame, key: str, ts: str, cols: list[str]) -> DataFrame:
    """W2: most recent feature per key — README's latest-position table
    (README.md:10-23).  max_by is a hash aggregate: map-side partial, no sort."""
    aggs = [F.max_by(F.col(c), F.col(ts)).alias(f"latest_{c}") for c in cols]
    return tracks.groupBy(key).agg(F.max(F.col(ts)).alias("latest_ts"), *aggs)


def track_oldest(tracks: DataFrame, key: str, ts: str, cols: list[str]) -> DataFrame:
    """W3: earliest feature per key (FeatureTrack.oldest)."""
    aggs = [F.min_by(F.col(c), F.col(ts)).alias(f"oldest_{c}") for c in cols]
    return tracks.groupBy(key).agg(F.min(F.col(ts)).alias("oldest_ts"), *aggs)


def track_neighbors(
    tracks: DataFrame, key: str, ts: str, cols: list[str], n: int = 1
) -> DataFrame:
    """W4/W5: previous/next features within a track, as LAG/LEAD columns.

    ``previous(f, n)`` / ``next(f, n)`` in the reference walk the sorted
    TreeSet (FeatureTrack.scala:68-111); here one window sort per key yields
    all lags/leads in a single pass.
    """
    w = Window.partitionBy(key).orderBy(F.col(ts).asc())
    out = tracks
    for k in range(1, n + 1):
        for c in cols:
            out = out.withColumn(f"prev{k}_{c}", F.lag(F.col(c), k).over(w))
            out = out.withColumn(f"next{k}_{c}", F.lead(F.col(c), k).over(w))
    return out


def track_range(
    tracks: DataFrame, ts: str, start=None, end=None, inclusive: bool = False
) -> DataFrame:
    """W6: headSet/tailSet/subSet — time-range slice of tracks.

    Strict bounds by default (the reference's ``before``/``after`` are strict:
    SimpleTime.scala:27-48).  A plain filter: Catalyst pushes it into the scan.
    """
    out = tracks
    if start is not None:
        out = out.filter(F.col(ts) >= start if inclusive else F.col(ts) > start)
    if end is not None:
        out = out.filter(F.col(ts) <= end if inclusive else F.col(ts) < end)
    return out


def track_contains(tracks: DataFrame, key: str, ts: str, at) -> DataFrame:
    """W7 ``contains``: per key, does the track hold a feature at event time
    ``at``?  (FeatureTrack.scala:23-27 — TreeSet membership is by time,
    since the ordering compares start times.)  One hash aggregate."""
    return tracks.groupBy(key).agg(
        F.max(F.col(ts) == at).alias("contains_at")
    )


def track_remove(tracks: DataFrame, ts: str, at) -> DataFrame:
    """W7 ``remove``: drop the feature at event time ``at`` from every track
    it appears in (FeatureTrack.scala:29-33).  A plain filter — pushed into
    the scan when ``at`` is a literal."""
    return tracks.filter(~(F.col(ts) == at))


def track_clear(tracks: DataFrame, key: str, keys: DataFrame | list | None = None) -> DataFrame:
    """W7 ``clear``: empty the tracks of ``keys`` (all tracks when None) —
    FeatureTrack.scala:35-39.  Keyed form is a broadcast anti join."""
    if keys is None:
        return tracks.limit(0)
    if not isinstance(keys, DataFrame):
        keys = tracks.sparkSession.createDataFrame([(k,) for k in keys], [key])
    return tracks.join(F.broadcast(keys.select(key)), key, "left_anti")


def track_is_empty(tracks: DataFrame, key: str, universe: DataFrame) -> DataFrame:
    """W7 ``isEmpty``: for every key in ``universe``, whether its track holds
    no features (FeatureTrack.scala:41-43).  Emptiness is relative to a key
    universe because an empty track has no rows to speak for it."""
    present = tracks.select(key).distinct().withColumn("__present", F.lit(True))
    return (
        universe.select(key)
        .distinct()
        .join(present, key, "left")
        .select(key, F.coalesce(~F.col("__present"), F.lit(True)).alias("is_empty"))
    )


def track_snapshot(
    df: DataFrame,
    key: str,
    ts: str,
    arrival_col: str,
    value_cols: list[str],
    max_per_track: int = DEFAULT_MAX_PER_TRACK,
) -> DataFrame:
    """The flagship query: full FeatureTrack ingest + snapshot projection.

    Equivalent of running the reference pipeline to completion and reading
    the state snapshot view: per key → track_count plus latest/oldest
    feature values (T1-T5 + W1-W3 in one plan).
    """
    tracks = build_tracks(df, key, ts, arrival_col, max_per_track)
    aggs: list[Column] = [
        F.count(F.lit(1)).alias("track_count"),
        F.unix_millis(F.max(F.col(ts))).alias("latest_ts_ms"),
        F.unix_millis(F.min(F.col(ts))).alias("oldest_ts_ms"),
    ]
    for c in value_cols:
        aggs.append(F.max_by(F.col(c), F.col(ts)).alias(f"latest_{c}"))
    return tracks.groupBy(key).agg(*aggs)


def track_rolling_stats(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    order_col: str = "event_id",
    value_col: str = "value",
    frame: int = 4,
) -> DataFrame:
    """Per-key rolling time-series features over the event stream: mean /
    max / count of ``value_col`` over the current row and the ``frame``
    preceding events (ROWS frame, (ts, order_col)-ordered, deterministic
    under equal timestamps) — the classic feature-engineering shape
    (moving averages for anomaly scores, rate features for models).

    Scale shape: ONE exchange on the track key, then a single sorted
    window pass computes all three frames — identical cost to any other
    track operator regardless of frame width (ROWS frames are O(1)
    per row for these aggregates)."""
    w = (
        Window.partitionBy(key)
        .orderBy(ts, order_col)
        .rowsBetween(-frame, Window.currentRow)
    )
    return df.select(
        order_col,
        key,
        F.unix_millis(F.col(ts)).alias("ts_ms"),
        F.col(value_col),
        F.round(F.avg(value_col).over(w), 4).alias("roll_avg"),
        F.round(F.max(value_col).over(w), 4).alias("roll_max"),
        F.count(F.lit(1)).over(w).alias("roll_n"),
    )
