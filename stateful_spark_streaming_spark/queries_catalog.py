"""The query catalog: every implemented operator as a (spark, sf_dir) -> DF
callable, with a DuckDB-oracle SQL twin where SQL can express it.

This is the coverage ledger the driver checks (SURVEY.md §2 inventory).
Conventions:
- every computed column is aliased identically in Spark and oracle SQL;
- timestamps leaving a query are cast to epoch milliseconds (BIGINT) so the
  two engines hash identically regardless of timestamp internals;
- double aggregates are rounded where accumulation order could differ.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from stateful_spark_streaming_spark.sources.tables import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query; ``oracle=None`` marks a non-SQL-expressible op
    (driver then records the weaker rows-only check)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Track algebra (reference core: FeatureTrack / purger / snapshot semantics)
# --------------------------------------------------------------------------
from stateful_spark_streaming_spark.operators import tracks as TR  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

_EVENT_COLS = ["event_type", "value"]


@query(
    "track_snapshot",
    oracle="""
    WITH dedup AS (
      SELECT * EXCLUDE (rn) FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id) AS rn
        FROM events) WHERE rn = 1
    ), bounded AS (
      SELECT * EXCLUDE (rk) FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rk
        FROM dedup) WHERE rk <= 10
    )
    SELECT user_id,
           count(*) AS track_count,
           epoch_ms(max(ts)) AS latest_ts_ms,
           epoch_ms(min(ts)) AS oldest_ts_ms,
           arg_max(event_type, ts) AS latest_event_type,
           arg_max(value, ts) AS latest_value
    FROM bounded GROUP BY user_id
    """,
)
def q_track_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: FeatureTrack ingest (ts-dedup + last-10) + snapshot view
    (T1-T5, W1-W3). Reference: StreamWithStates.scala:58-81,36-53."""
    ev = _t(spark, sf_dir, "events")
    return TR.track_snapshot(ev, "user_id", "ts", "event_id", _EVENT_COLS)


@query(
    "track_counts",
    oracle="""
    SELECT user_id, count(*) AS track_count
    FROM (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id) AS rn
        FROM events) WHERE rn = 1)
    GROUP BY user_id
    """,
)
def q_track_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: (key, size) — the reference's Flights view without the cap."""
    ev = _t(spark, sf_dir, "events")
    deduped = TR.dedup_first_arrival(ev, "user_id", "ts", "event_id")
    return TR.track_counts(deduped, "user_id")


@query(
    "track_latest",
    oracle="""
    SELECT user_id,
           epoch_ms(max(ts)) AS latest_ts_ms,
           arg_max(event_type, ts) AS latest_event_type,
           arg_max(value, ts) AS latest_value,
           arg_max(event_id, ts) AS latest_event_id
    FROM events GROUP BY user_id
    """,
)
def q_track_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: latest feature per track (README.md:10-23 golden table shape)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.unix_millis(F.max("ts")).alias("latest_ts_ms"),
        F.max_by("event_type", "ts").alias("latest_event_type"),
        F.max_by("value", "ts").alias("latest_value"),
        F.max_by("event_id", "ts").alias("latest_event_id"),
    )


@query(
    "track_oldest",
    oracle="""
    SELECT user_id,
           epoch_ms(min(ts)) AS oldest_ts_ms,
           arg_min(event_type, ts) AS oldest_event_type,
           arg_min(value, ts) AS oldest_value
    FROM events GROUP BY user_id
    """,
)
def q_track_oldest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: oldest feature per track (FeatureTrack.oldest)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.unix_millis(F.min("ts")).alias("oldest_ts_ms"),
        F.min_by("event_type", "ts").alias("oldest_event_type"),
        F.min_by("value", "ts").alias("oldest_value"),
    )


@query(
    "track_neighbors",
    oracle="""
    SELECT event_id, user_id, epoch_ms(ts) AS ts_ms,
           lag(value) OVER w AS prev1_value,
           lead(value) OVER w AS next1_value,
           lag(event_type, 2) OVER w AS prev2_event_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_track_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4/W5: previous/next via LAG/LEAD over the per-key chronological sort."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return ev.select(
        "event_id",
        "user_id",
        F.unix_millis("ts").alias("ts_ms"),
        F.lag("value").over(w).alias("prev1_value"),
        F.lead("value").over(w).alias("next1_value"),
        F.lag("event_type", 2).over(w).alias("prev2_event_type"),
    )


@query(
    "track_range",
    oracle="""
    SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, event_type, value
    FROM events
    WHERE ts > TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'
    """,
)
def q_track_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6: strict time-range slice (headSet/tailSet/subSet semantics).
    The predicate is pushed into the parquet scan."""
    ev = _t(spark, sf_dir, "events")
    sliced = TR.track_range(ev, "ts", start="2024-01-10 00:00:00", end="2024-01-20 00:00:00")
    return sliced.select(
        "event_id", "user_id", F.unix_millis("ts").alias("ts_ms"), "event_type", "value"
    )


@query(
    "track_dedup",
    oracle="""
    SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, event_type, value
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id) AS rn
      FROM events) WHERE rn = 1
    """,
)
def q_track_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3: timestamp dedup keeping first arrival (TreeSet add-reject)."""
    ev = _t(spark, sf_dir, "events")
    return TR.dedup_first_arrival(ev, "user_id", "ts", "event_id").select(
        "event_id", "user_id", F.unix_millis("ts").alias("ts_ms"), "event_type", "value"
    )


@query(
    "track_last_n",
    oracle="""
    SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, event_type, value
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rk
      FROM events) WHERE rk <= 10
    """,
)
def q_track_last_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4: last-10-per-key retention (MaxFeaturesPerTrackPurger(10))."""
    ev = _t(spark, sf_dir, "events")
    return TR.bound_last_n(ev, "user_id", "ts", "event_id", 10).select(
        "event_id", "user_id", F.unix_millis("ts").alias("ts_ms"), "event_type", "value"
    )
