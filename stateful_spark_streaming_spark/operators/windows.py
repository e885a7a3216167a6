"""Time-window aggregations: tumbling / sliding / session + bucket rollups.

The reference has NO window aggregation at all (SURVEY §2.7 — its only
"window" is the per-key last-N track buffer).  These are the idiomatic
Spark forms, shared between batch and streaming (same functions accept a
streaming DataFrame; add ``withWatermark`` upstream for append-mode output).

Scale notes: time-window groupBy shuffles on (window, key) — at 100 TB the
bucket count is what bounds state, so prefer coarse buckets + rollup for
dashboards, and session windows ONLY with watermark + state TTL (session
state is per-key-unbounded otherwise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    ts: str = "ts",
    width: str = "6 hours",
    extra_keys: tuple[str, ...] = (),
) -> DataFrame:
    """Epoch-aligned fixed windows: (bucket_ms, *keys) → count/sum/avg."""
    return (
        events.groupBy(F.window(ts, width).alias("w"), *extra_keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
        .select(
            F.unix_millis(F.col("w.start")).alias("bucket_ms"),
            *extra_keys,
            "n_events",
            "sum_value",
            "avg_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    ts: str = "ts",
    width: str = "1 day",
    slide: str = "6 hours",
) -> DataFrame:
    """Overlapping windows (width/slide): each event lands in width÷slide
    windows; Spark expands via the window generator expression."""
    return (
        events.groupBy(F.window(ts, width, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            F.unix_millis(F.col("w.end")).alias("window_end_ms"),
            "n_events",
            "sum_value",
        )
    )


def session_windows(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap: str = "30 minutes",
) -> DataFrame:
    """Per-key session windows: a session extends while successive events
    are within ``gap``.  Spark's session_window end = last event + gap."""
    return (
        events.groupBy(key, F.session_window(ts, gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            key,
            F.unix_millis(F.col("w.start")).alias("session_start_ms"),
            F.unix_millis(F.col("w.end")).alias("session_end_ms"),
            "n_events",
            "sum_value",
        )
    )


def bucket_rollup(
    events: DataFrame, ts: str = "ts", width: str = "6 hours"
) -> DataFrame:
    """Hypertable-style continuous-aggregate shape: time bucket × dimension
    ROLLUP in one pass (bucket, event_type) + per-bucket + grand totals."""
    bucket = F.unix_millis(F.window(ts, width).getField("start")).alias("bucket_ms")
    return (
        events.select(bucket, "event_type", "value")
        .rollup("bucket_ms", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )
