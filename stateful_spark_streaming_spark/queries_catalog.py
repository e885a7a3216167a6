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


# --------------------------------------------------------------------------
# Relational surface (SURVEY §2.6-2.7: the generalized "any SQL" hook)
# --------------------------------------------------------------------------
from stateful_spark_streaming_spark.operators import relational as REL  # noqa: E402


@query(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return REL.pricing_summary(_t(spark, sf_dir, "lineitem"))


@query(
    "shipping_priority",
    oracle="""
    SELECT l_orderkey, o_orderdate::DATE AS o_orderdate, o_orderpriority,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = REL.shipping_priority(
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
    )
    return out.select(
        "l_orderkey",
        F.col("o_orderdate").cast("date").alias("o_orderdate"),
        "o_orderpriority",
        "revenue",
    )


@query(
    "local_supplier_volume",
    oracle="""
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE c_nationkey = s_nationkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    return REL.local_supplier_volume(
        _t(spark, sf_dir, "region"),
        _t(spark, sf_dir, "nation"),
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "supplier"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
    )


@query(
    "forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return REL.forecast_revenue(_t(spark, sf_dir, "lineitem"))


@query(
    "returns_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_returns_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return REL.returns_rollup(_t(spark, sf_dir, "lineitem"))


@query(
    "priority_top_orders",
    oracle="""
    SELECT o_orderpriority, rank_in_priority, o_orderkey, o_totalprice
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank_in_priority
      FROM orders)
    WHERE rank_in_priority <= 3
    """,
)
def q_priority_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return REL.priority_top_orders(_t(spark, sf_dir, "orders"))


@query(
    "customers_without_recent_orders",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2001-01-01')
    """,
)
def q_customers_without_recent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return REL.customers_without_recent_orders(
        _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    )


@query(
    "segment_set_ops",
    oracle="""
    (SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
     UNION ALL
     SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
    INTERSECT
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    EXCEPT
    SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 400000
    """,
)
def q_segment_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    return REL.segment_set_ops(
        _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    )


@query(
    "monthly_revenue",
    oracle="""
    SELECT date_trunc('month', o_orderdate)::DATE AS month,
           round(sum(o_totalprice), 2) AS revenue,
           count(*) AS n_orders,
           count(DISTINCT o_custkey) AS n_customers
    FROM orders GROUP BY 1
    """,
)
def q_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return REL.monthly_revenue(_t(spark, sf_dir, "orders"))


@query(
    "order_stats_conditional",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n_orders,
           CAST(sum(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
           round(avg(o_totalprice), 4) AS avg_price,
           round(max(o_totalprice), 2) AS max_price,
           round(min(o_totalprice), 2) AS min_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_order_stats_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    return REL.order_stats_conditional(_t(spark, sf_dir, "orders"))


@query(
    "part_text_functions",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_upper,
           substring(p_name, 1, 8) AS name_prefix,
           CAST(length(p_name) AS INT) AS name_len,
           concat_ws('/', p_brand, p_type) AS brand_type,
           (p_type LIKE '%BRASS%') AS is_brass,
           regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowels
    FROM part
    """,
)
def q_part_text_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return REL.part_text_functions(_t(spark, sf_dir, "part"))


@query(
    "events_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           event_type
    FROM events
    """,
)
def q_events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    return REL.events_json_extract(_t(spark, sf_dir, "events"))


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
