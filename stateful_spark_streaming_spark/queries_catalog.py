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

import os
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


#: Queries RETIRED from the driver gate (r12 verdict #2: at 148 queries vs
#: the 150-entry rotation capacity, one mis-rotated round strands evidence;
#: these entries' ORACLE evidence was subsumed by a sibling that stays).
#: Retired ≠ deleted: the query function, its oracle, and its plan-audit
#: spec all remain — `tests/test_retired_query_pins.py` runs each retired
#: pair through the SAME driver-style canonicalized hash compare the gate
#: uses (via tools/check_oracle.canon_pandas), and tools/plan_audit.py
#: still audits their physical plans — so the evidence class is preserved
#: in pytest while the gate window regains real headroom.
RETIRED_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
RETIRED_ORACLES: dict[str, str] = {}


def retired_query(name: str, oracle: str | None = None, subsumed_by: str = ""):
    """Register a catalog-retired query: kept callable and oracle-paired
    for pytest + plan audit, but NOT in ``QUERIES`` (consumes no gate
    rotation capacity).  ``subsumed_by`` names the surviving sibling(s)
    whose gate evidence covers this entry's machinery."""

    def deco(fn):
        RETIRED_QUERIES[name] = fn
        if oracle is not None:
            RETIRED_ORACLES[name] = oracle
        fn.__retired_subsumed_by__ = subsumed_by
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _fixture_tag(sf_dir: str, table: str) -> str:
    """Cache key for derived per-corpus fixtures (IVF index, synthesized
    image table): path PLUS the source file's (mtime, size) fingerprint, so
    regenerating data at the same path invalidates the fixture instead of
    silently serving stale derived data."""
    import hashlib

    p = os.path.join(os.path.abspath(sf_dir), f"{table}.parquet")
    try:
        st = os.stat(p)
        sig = f"{p}|{st.st_mtime_ns}|{st.st_size}"
    except OSError:
        sig = p
    return hashlib.md5(sig.encode()).hexdigest()[:12]


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

    Filter-THEN-convert: the range predicate is applied to the RAW scan
    column (NTZ wall clock ≡ UTC here), where Catalyst pushes it into the
    parquet scan for row-group pruning — a predicate on the converted
    instant would sit above a projection no source filter can express.
    Time-slicing a 100 TB event table is exactly where this matters; the
    plan audit asserts the pushed GreaterThan/LessThan on ts."""
    from pyspark.sql.types import TimestampNTZType, TimestampType

    from stateful_spark_streaming_spark.sources.tables import (
        events_ts_to_instant,
        load_events_raw,
    )

    raw = load_events_raw(spark, sf_dir)
    if isinstance(raw.schema["ts"].dataType, (TimestampNTZType, TimestampType)):
        sliced = TR.track_range(
            raw, "ts", start="2024-01-10 00:00:00", end="2024-01-20 00:00:00"
        )
        out = events_ts_to_instant(sliced)
    else:  # raw LONG nanos (legacy conf): string bounds don't compare — use
        out = TR.track_range(  # the converted instants (pushdown forfeited)
            _t(spark, sf_dir, "events"),
            "ts", start="2024-01-10 00:00:00", end="2024-01-20 00:00:00",
        )
    return out.select(
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


#: checkpoints produced by streaming runs this process, keyed by sf_dir —
#: one stream, many readers: the state-store reader query scans the same
#: checkpoint the snapshot query produced (exactly how the two surfaces
#: relate in a deployment) instead of re-running the whole pipeline.
_STREAM_CKPTS: dict[str, str] = {}


def _run_tracked_stream(spark: SparkSession, sf_dir: str) -> tuple[str, DataFrame]:
    import os as _os
    import tempfile as _tf

    from stateful_spark_streaming_spark.streaming.pipeline import run_snapshot_query

    ckpt = _tf.mkdtemp(prefix="sss_ckpt_catalog_")
    # state partitions sized to this table's key cardinality (≤ thousands of
    # keys): fewer Arrow worker rounds beat idle parallelism; production key
    # volumes pass None and inherit the session's shuffle sizing
    out = run_snapshot_query(
        spark, _os.path.join(sf_dir, "events.parquet"),
        checkpoint_dir=ckpt, state_partitions=8,
    )
    _STREAM_CKPTS[sf_dir] = ckpt
    return ckpt, out


@query(
    "streaming_track_snapshot",
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
def q_streaming_track_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL stateful streaming operator (applyInPandasWithState) run to
    completion with an availableNow trigger — same oracle as the batch
    track_snapshot because single-batch ingest ≡ batch semantics.
    Reference: mapWithState graph at StreamWithStates.scala:58-81."""
    _, out = _run_tracked_stream(spark, sf_dir)
    return out.select(
        "user_id", "track_count", "latest_ts_ms", "oldest_ts_ms",
        "latest_event_type", "latest_value",
    )


@query(
    "state_store_snapshot",
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
def q_state_store_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE stateSnapshots() parity (StreamWithStates.scala:74-77): read ALL
    keys' state straight from the checkpointed RocksDB files via the state
    data source — a distributed scan of the state store itself, no sink,
    same oracle as the batch operator.  Reads the checkpoint the streaming
    query produced (one stream, many readers); runs the stream itself only
    when invoked standalone."""
    from stateful_spark_streaming_spark.streaming.state_reader import (
        state_snapshot_view,
    )

    ckpt = _STREAM_CKPTS.get(sf_dir)
    if ckpt is None:
        ckpt, _ = _run_tracked_stream(spark, sf_dir)
    return state_snapshot_view(spark, ckpt)


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


@retired_query(
    "priority_top_orders_salted",
    subsumed_by="priority_top_orders (identical oracle; salted-decomposition "
    "exactness pinned by test_salted_topn_equals_plain_topn_under_skew)",
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
def q_priority_top_orders_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SKEW-RESISTANT form of priority_top_orders: two-phase salted
    top-N (local top-N per salt bucket, then global) — same oracle as the
    single-phase query, proving the decomposition is exact while a hot key
    spreads over salt_buckets tasks instead of one."""
    out = REL.salted_topn(
        _t(spark, sf_dir, "orders"),
        key="o_orderpriority",
        order_col="o_totalprice",
        n=3,
        salt_buckets=16,
        tiebreak="o_orderkey",
    )
    return out.select(
        "o_orderpriority",
        F.col("rank_in_key").alias("rank_in_priority"),
        "o_orderkey",
        "o_totalprice",
    )


# approx_distinct_stats RETIRED as a catalog query in r11 (verdict #5):
# it and distinct_sketch_stats answered the same question rows-only; the
# MERGEABLE DataSketches form below is the one with the streaming twin
# and the partition-invariance pin, so it keeps the slot.  The OPERATOR
# (relational.py approx_distinct_stats — Spark HLL++/t-digest) remains
# part of the engine surface, pytest-covered in test_relational.py and
# test_rows_only_pins.py.
# KMV oracle: md5-derived 60-bit hashes are re-derivable in DuckDB, so
# the whole estimator — distinct bottom-k AND the floor'd (k-1)*2^60/h_k
# division — hash-checks cross-engine (the MinHash/SRP/CMS move applied
# to the last sketch family; r11 verdict #2).  k=64 < the 150 distinct
# users at sf0.01, so the gate exercises the ESTIMATION branch, not just
# the exact-count fallback.
_KMV_K = 64
_KMV_SQL = f"""
    WITH hashes AS (
      SELECT DISTINCT event_type,
             ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM events WHERE user_id IS NOT NULL
    ), ranked AS (
      SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM hashes
    ), sk AS (
      SELECT event_type, COUNT(*) AS m, MAX(h) AS hk
      FROM ranked WHERE rn <= {_KMV_K} GROUP BY event_type
    ), counts AS (
      SELECT event_type, COUNT(*) AS n_rows FROM events GROUP BY event_type
    )
    SELECT counts.event_type, counts.n_rows,
           COALESCE(CASE WHEN sk.m < {_KMV_K} THEN sk.m
                         ELSE CAST(floor({float(_KMV_K - 1)} * power(2.0, 60)
                                        / CAST(sk.hk AS DOUBLE)) AS BIGINT)
                    END, 0) AS kmv_distinct
    FROM counts LEFT JOIN sk ON counts.event_type = sk.event_type
"""


@query("distinct_sketch_stats", oracle=_KMV_SQL)
def q_distinct_sketch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct-user counts via the bottom-k (KMV) sketch
    — mergeable like the DataSketches HLL sibling (which remains the
    engine surface for binary-sketch storage, pytest-covered), but every
    step is plain SQL DuckDB re-derives, so the gate hash-checks the
    estimator itself."""
    return REL.distinct_kmv_stats(
        _t(spark, sf_dir, "events"), key="event_type", count_col="user_id",
        k=_KMV_K,
    )


@query("streaming_distinct_stats", oracle=_KMV_SQL)
def q_streaming_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time cardinality tracking: per-batch (count, bottom-k hash
    array) partials appended by foreachBatch, set-union + re-bottom-k on
    read — streaming ≡ batch EXACTLY (bottom-k of unioned bottom-ks is
    the global bottom-k), so the BATCH oracle gates the streaming path
    at full hash strength."""
    import os as _os

    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_distinct_kmv,
    )

    return run_streaming_distinct_kmv(
        spark, _os.path.join(sf_dir, "events.parquet"), k=_KMV_K
    )


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
    "customer_value_distribution",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           ntile(4) OVER w AS value_quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume,
           CAST(rank() OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
    """,
)
def q_customer_value_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions per segment: ntile/percent_rank/
    cume_dist/rank/dense_rank — one shuffle on the segment key, one sort."""
    from pyspark.sql import Window

    cust = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("value_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
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
    "revenue_cube",
    oracle="""
    SELECT order_year, o_orderstatus,
           round(sum(o_totalprice), 2) AS revenue,
           count(*) AS n_orders,
           CAST(GROUPING(order_year) AS INT) AS g_year,
           CAST(GROUPING(o_orderstatus) AS INT) AS g_status
    FROM (SELECT CAST(year(o_orderdate) AS INT) AS order_year,
                 o_orderstatus, o_totalprice
          FROM orders)
    GROUP BY CUBE (order_year, o_orderstatus)
    """,
)
def q_revenue_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets with grouping() markers (SURVEY §2.7: the
    reference has no grouping-set aggregation at all)."""
    return REL.revenue_cube(_t(spark, sf_dir, "orders"))


_FUZZY_PROBES = ["red widgit", "small ringer", "blue bolt"]


@retired_query(
    "fuzzy_part_match",
    subsumed_by="similar_part_names (the lossless token-bucket sibling covers "
    "the fuzzy-match surface; edit-distance kernel pinned by "
    "test_fuzzy_part_match_known_distances)",
    oracle="""
    SELECT p_partkey, p_name, probe,
           CAST(levenshtein(p_name, probe) AS INT) AS edit_dist
    FROM part, (VALUES ('red widgit'), ('small ringer'), ('blue bolt')) AS probes(probe)
    WHERE levenshtein(p_name, probe) <= 2
    """,
)
def q_fuzzy_part_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy lookup: tiny probe list broadcast over the part
    scan — broadcast nested-loop, map-only on the big side."""
    return REL.fuzzy_part_match(
        _t(spark, sf_dir, "part"), _FUZZY_PROBES, max_dist=2
    )


@query(
    "profile_columns",
    oracle="""
    SELECT 'lang' AS column_name, count(*) AS n_rows,
           CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           count(DISTINCT lang) AS n_distinct
    FROM documents
    UNION ALL
    SELECT 'source', count(*),
           CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(DISTINCT source)
    FROM documents
    UNION ALL
    SELECT 'n_chars', count(*),
           CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(DISTINCT n_chars)
    FROM documents
    """,
)
def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiling: per-column null/distinct counts in one pass —
    the pipeline-health gate run before any 100 TB training build."""
    return REL.profile_columns(
        _t(spark, sf_dir, "documents"), ["lang", "source", "n_chars"]
    )


@query(
    "market_share",
    oracle="""
    WITH joined AS (
      SELECT CAST(year(o.o_orderdate) AS INT) AS order_year,
             sn.n_name AS supp_nation,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'ECONOMY'
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      JOIN region r ON cn.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
      JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    ), per_nation AS (
      SELECT order_year, supp_nation, sum(volume) AS nation_volume
      FROM joined GROUP BY order_year, supp_nation
    )
    SELECT order_year, supp_nation,
           round(nation_volume, 2) AS nation_revenue,
           round(nation_volume / sum(nation_volume) OVER (PARTITION BY order_year), 6)
             AS mkt_share
    FROM per_nation
    """,
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style national market share: snowflake join, all dims
    broadcast, one fact shuffle, one window over the tiny aggregate."""
    return REL.market_share(
        _t(spark, sf_dir, "region"),
        _t(spark, sf_dir, "nation"),
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "supplier"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "part"),
    )


# --------------------------------------------------------------------------
# Temporal joins (SURVEY §2.7 gap: as-of / range join — kdb aj, DuckDB ASOF)
# --------------------------------------------------------------------------
from stateful_spark_streaming_spark.operators import temporal as TMP  # noqa: E402


@query(
    "asof_clicks_purchases",
    oracle="""
    WITH purchases AS (
      SELECT user_id, ts, max(value) AS purchase_value
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts),
    clicks AS (SELECT * FROM events WHERE event_type = 'click')
    SELECT c.event_id, c.user_id, epoch_ms(c.ts) AS ts_ms,
           epoch_ms(p.ts) AS asof_ts_ms,
           p.purchase_value AS asof_purchase_value
    FROM clicks c
    ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def q_asof_clicks_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click gets the user's most recent purchase at or
    before it (nulls before the first purchase).  Spark form: union + one
    keyed window — one exchange, no range sort-merge."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    out = TMP.asof_join(
        clicks, purchases, key="user_id", left_ts="ts", right_ts="ts",
        right_cols=("purchase_value",),
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_millis("ts").alias("ts_ms"),
        F.unix_millis("asof_ts").alias("asof_ts_ms"),
        "asof_purchase_value",
    )


@query(
    "event_pairs_within_10min",
    oracle="""
    SELECT a.user_id AS user_id, a.event_id AS id_a, b.event_id AS id_b,
           abs(epoch_ms(a.ts) - epoch_ms(b.ts)) AS gap_ms
    FROM events a JOIN events b
      ON a.user_id = b.user_id AND a.event_id < b.event_id
     AND abs(epoch_ms(a.ts) - epoch_ms(b.ts)) <= 600000
    """,
)
def q_event_pairs_within_10min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded range join: same-user event pairs within 10 minutes.  The
    bucketed equi-join form — 4× shuffle volume, never an all-pairs join."""
    ev = _t(spark, sf_dir, "events")
    return TMP.range_join_pairs(
        ev, key="user_id", ts="ts", id_col="event_id", tolerance_seconds=600
    )


@query(
    "value_percentiles",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           round(quantile_cont(value, 0.5), 4) AS p50,
           round(quantile_cont(value, 0.9), 4) AS p90,
           round(quantile_cont(value, 0.99), 4) AS p99
    FROM events GROUP BY event_type
    """,
)
def q_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles per group (Spark `percentile`
    ≡ DuckDB `quantile_cont`).  At 100 TB swap in approx_percentile — the
    exact form needs a per-group sort."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("value", F.lit(0.99)), 4).alias("p99"),
    )


@query(
    "monthly_running_revenue",
    oracle="""
    WITH monthly AS (
      SELECT date_trunc('month', o_orderdate)::DATE AS month,
             round(sum(o_totalprice), 2) AS revenue
      FROM orders GROUP BY 1)
    SELECT month, revenue,
           round(sum(revenue) OVER (ORDER BY month
                 ROWS UNBOUNDED PRECEDING), 2) AS running_revenue,
           round(avg(revenue) OVER (ORDER BY month
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mov3_avg
    FROM monthly
    """,
)
def q_monthly_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative + moving-frame window aggregates over the monthly rollup.
    The global ordering window runs over month-cardinality rows (≤ a few
    hundred) — post-aggregation, so the single-partition sort is trivial."""
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    w_run = Window.orderBy("month").rowsBetween(Window.unboundedPreceding, 0)
    w_mov = Window.orderBy("month").rowsBetween(-2, 0)
    return monthly.select(
        "month",
        "revenue",
        F.round(F.sum("revenue").over(w_run), 2).alias("running_revenue"),
        F.round(F.avg("revenue").over(w_mov), 4).alias("mov3_avg"),
    )


# --------------------------------------------------------------------------
# Time-window aggregations (SURVEY §2.7 gap: tumbling/sliding/session)
# --------------------------------------------------------------------------
from stateful_spark_streaming_spark.operators import windows as WIN  # noqa: E402


@query(
    "tumbling_window_counts",
    oracle="""
    SELECT epoch_ms(time_bucket(INTERVAL '6 hours', ts)) AS bucket_ms,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value,
           round(avg(value), 4) AS avg_value
    FROM events GROUP BY 1
    """,
)
def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return WIN.tumbling_counts(_t(spark, sf_dir, "events"))


@query(
    "streaming_tumbling_counts",
    oracle="""
    SELECT epoch_ms(time_bucket(INTERVAL '6 hours', ts)) AS bucket_ms,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value,
           round(avg(value), 4) AS avg_value
    FROM events GROUP BY 1
    """,
)
def q_streaming_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING twin of tumbling_window_counts: update-mode windowed
    aggregation through a real streaming query (availableNow), per-batch
    upsert into the storage-backed snapshot sink, same oracle as batch —
    single-pass ingest ≡ batch semantics."""
    import os as _os

    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_tumbling_counts,
    )

    out = run_streaming_tumbling_counts(
        spark, _os.path.join(sf_dir, "events.parquet")
    )
    return out.select("bucket_ms", "n_events", "sum_value", "avg_value")


@retired_query(
    "streaming_sliding_counts",
    subsumed_by="streaming_tumbling_counts (same streaming runner/sink "
    "machinery) + sliding_window_counts (batch overlap semantics)",
    oracle="""
    SELECT epoch_ms(time_bucket(INTERVAL '6 hours', ts) - k * INTERVAL '6 hours') AS window_start_ms,
           epoch_ms(time_bucket(INTERVAL '6 hours', ts) - k * INTERVAL '6 hours' + INTERVAL '1 day') AS window_end_ms,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events, range(4) t(k)
    GROUP BY 1, 2
    """,
)
def q_streaming_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING twin of sliding_window_counts: update-mode overlapping
    windows through a real streaming query (availableNow), per-batch upsert
    into the storage-backed snapshot sink keyed by window start, same
    oracle as batch — single-pass ingest ≡ batch semantics."""
    import os as _os

    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_sliding_counts,
    )

    out = run_streaming_sliding_counts(
        spark, _os.path.join(sf_dir, "events.parquet")
    )
    return out.select("window_start_ms", "window_end_ms", "n_events", "sum_value")


@query(
    "streaming_dedup_events",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def q_streaming_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING twin of dedup_exact: dropDuplicatesWithinWatermark
    through a real streaming query (availableNow) into an append parquet
    sink.  State per key expires at watermark + delay — bounded state on an
    unbounded stream, vs batch DISTINCT's full live key set.  Only key
    columns are emitted (first-arrival payload is a shuffle race), so
    single-pass ingest ≡ batch DISTINCT and the oracle is exact."""
    import os as _os

    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_dedup,
    )

    return run_streaming_dedup(spark, _os.path.join(sf_dir, "events.parquet"))


@query(
    "event_type_pivot",
    oracle="""
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click') AS n_click,
           count(*) FILTER (WHERE event_type = 'view') AS n_view,
           count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
           count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
           count(*) FILTER (WHERE event_type = 'error') AS n_error,
           round(coalesce(sum(value) FILTER (WHERE event_type = 'purchase'), 0), 2)
               AS purchase_value
    FROM events GROUP BY user_id
    """,
)
def q_event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT surface: per-user event-type matrix via groupBy().pivot() with
    an explicit value list (deterministic schema; avoids the extra
    distinct-values job).  Spark pivots in two exchanges: a compact
    (key, pivot-value) pre-aggregate, then pivotfirst on the key — the
    second shuffle moves ~|values| rows per key, not raw events."""
    ev = _t(spark, sf_dir, "events")
    types = ["click", "view", "purchase", "signup", "error"]
    piv = (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("v"),
        )
    )
    return piv.select(
        "user_id",
        *[
            F.coalesce(F.col(f"{t}_n"), F.lit(0)).alias(f"n_{t}")
            for t in types
        ],
        F.coalesce(F.col("purchase_v"), F.lit(0.0)).alias("purchase_value"),
    )


@query(
    "streaming_session_windows",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       < INTERVAL '30 minutes' THEN 0 ELSE 1 END AS new_session
      FROM events),
    numbered AS (
      SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked)
    SELECT user_id,
           epoch_ms(min(ts)) AS session_start_ms,
           epoch_ms(max(ts) + INTERVAL '30 minutes') AS session_end_ms,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM numbered GROUP BY user_id, session_no
    """,
)
def q_streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING twin of session_windows: complete-mode session_window
    aggregation through a real streaming query (availableNow) — Spark's
    required mode for mergeable session state without a watermark — into a
    latest-batch snapshot sink, same oracle as batch."""
    import os as _os

    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_session_windows,
    )

    out = run_streaming_session_windows(
        spark, _os.path.join(sf_dir, "events.parquet")
    )
    return out.select(
        "user_id", "session_start_ms", "session_end_ms", "n_events", "sum_value"
    )


@query(
    "streaming_session_windows_append",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       < INTERVAL '30 minutes' THEN 0 ELSE 1 END AS new_session
      FROM events),
    numbered AS (
      SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked),
    sess AS (
      SELECT user_id,
             min(ts) AS s,
             max(ts) + INTERVAL '30 minutes' AS e,
             count(*) AS n_events,
             round(sum(value), 2) AS sum_value
      FROM numbered GROUP BY user_id, session_no),
    wm AS (SELECT max(ts) - INTERVAL '1 hour' AS w FROM events)
    SELECT user_id,
           epoch_ms(s) AS session_start_ms,
           epoch_ms(e) AS session_end_ms,
           n_events, sum_value
    FROM sess, wm WHERE e < w
    """,
)
def q_streaming_session_windows_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPEND-mode watermarked session windows — the bounded-state scale
    path (complete mode re-emits and retains everything forever).  Exact
    contract: emits precisely the batch sessions whose end (last event +
    gap) falls before the final watermark (max event time − 1 h); open
    sessions are withheld, and state for emitted sessions is evicted.
    The oracle is the batch session query restricted to those finalized
    sessions."""
    import os as _os

    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_session_windows_append,
    )

    out = run_streaming_session_windows_append(
        spark, _os.path.join(sf_dir, "events.parquet")
    )
    return out.select(
        "user_id", "session_start_ms", "session_end_ms", "n_events", "sum_value"
    )


@query(
    "streaming_event_pairs",
    oracle="""
    SELECT a.user_id AS user_id, a.event_id AS id_a, b.event_id AS id_b,
           abs(epoch_ms(a.ts) - epoch_ms(b.ts)) AS gap_ms
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'click' AND b.event_type = 'purchase'
     AND abs(epoch_ms(a.ts) - epoch_ms(b.ts)) <= 600000
    """,
)
def q_streaming_event_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM join, the canonical two-firehose form: clicks joined
    to same-user purchases within 10 minutes — inner join with an
    event-time range condition + watermarks on both inputs (the
    state-bounding shape), pre-stateful event_type filters cutting join
    state, append-mode parquet sink.  Exact DuckDB oracle."""
    import os as _os

    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_event_pairs,
    )

    return run_streaming_event_pairs(
        spark,
        _os.path.join(sf_dir, "events.parquet"),
        left_type="click",
        right_type="purchase",
    ).select("user_id", "id_a", "id_b", "gap_ms")


@query(
    "streaming_event_pairs_left",
    oracle="""
    WITH a AS (SELECT * FROM events WHERE event_type = 'click'),
         b AS (SELECT * FROM events WHERE event_type = 'purchase'),
         wm AS (SELECT least((SELECT max(ts) FROM a),
                             (SELECT max(ts) FROM b)) AS w)
    SELECT a.user_id AS user_id, a.event_id AS id_a, b.event_id AS id_b,
           CASE WHEN b.event_id IS NULL THEN NULL
                ELSE abs(epoch_ms(a.ts) - epoch_ms(b.ts)) END AS gap_ms
    FROM a LEFT JOIN b
      ON a.user_id = b.user_id
     AND b.ts BETWEEN a.ts - INTERVAL 10 MINUTE AND a.ts + INTERVAL 10 MINUTE
    WHERE b.event_id IS NOT NULL
       OR a.ts + INTERVAL 10 MINUTE < (SELECT w FROM wm)
    """,
)
def q_streaming_event_pairs_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream join: clicks with their same-user
    purchases within 10 minutes, plus null-matched rows for clicks that
    provably can't match anymore.  The oracle encodes Spark's outer-row
    release rule — an unmatched left row emits only once the global
    watermark (min over both sides' max event time, delay 0) passes
    ts + tolerance — so the partial-emission semantics of watermarked
    outer joins is itself the verified contract (horizon-boundary
    collisions checked absent at every test SF)."""
    import os as _os

    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_event_pairs_left,
    )

    return run_streaming_event_pairs_left(
        spark, _os.path.join(sf_dir, "events.parquet")
    ).select("user_id", "id_a", "id_b", "gap_ms")


@query(
    "streaming_enriched_counts",
    oracle="""
    SELECT c.c_mktsegment AS c_mktsegment, e.event_type AS event_type,
           count(*) AS n_events, round(sum(e.value), 2) AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
)
def q_streaming_enriched_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STATIC join twin: the event stream enriched with the
    broadcast customer dimension, aggregated by (segment, event_type) in
    update mode — the firehose × slowly-changing-dim shape.  Exact DuckDB
    oracle (single-pass ingest ≡ batch join+group)."""
    import os as _os

    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_enriched_counts,
    )

    out = run_streaming_enriched_counts(
        spark,
        _os.path.join(sf_dir, "events.parquet"),
        dim=_t(spark, sf_dir, "customer"),
    )
    return out.select("c_mktsegment", "event_type", "n_events", "sum_value")


@query(
    "sliding_window_counts",
    oracle="""
    SELECT epoch_ms(time_bucket(INTERVAL '6 hours', ts) - k * INTERVAL '6 hours') AS window_start_ms,
           epoch_ms(time_bucket(INTERVAL '6 hours', ts) - k * INTERVAL '6 hours' + INTERVAL '1 day') AS window_end_ms,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events, range(4) t(k)
    GROUP BY 1, 2
    """,
)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return WIN.sliding_counts(_t(spark, sf_dir, "events"))


@query(
    "session_windows",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       < INTERVAL '30 minutes' THEN 0 ELSE 1 END AS new_session
      FROM events),
    numbered AS (
      SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked)
    SELECT user_id,
           epoch_ms(min(ts)) AS session_start_ms,
           epoch_ms(max(ts) + INTERVAL '30 minutes') AS session_end_ms,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM numbered GROUP BY user_id, session_no
    """,
)
def q_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return WIN.session_windows(_t(spark, sf_dir, "events"))


@query(
    "bucket_rollup",
    oracle="""
    SELECT epoch_ms(time_bucket(INTERVAL '6 hours', ts)) AS bucket_ms,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events GROUP BY ROLLUP (1, event_type)
    """,
)
def q_bucket_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return WIN.bucket_rollup(_t(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# Geometry (SURVEY §2.5: projector G1, point construct S4, null-out P3)
# --------------------------------------------------------------------------
from stateful_spark_streaming_spark.operators import geometry as GEO  # noqa: E402


@query(
    "web_mercator_projection",
    oracle="""
    SELECT event_id,
           round(lon, 6) AS lon, round(lat, 6) AS lat,
           round(6378137.0 * radians(lon), 2) AS mercator_x,
           round(6378137.0 * ln(tan(pi()/4 + radians(lat)/2)), 2) AS mercator_y
    FROM (
      SELECT event_id,
             (event_id % 360) - 180 + 0.25 AS lon,
             (event_id % 170) - 85 + 0.5 AS lat
      FROM events)
    """,
)
def q_web_mercator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1: WGS84 → Web Mercator as native column math (no geo library).
    lon/lat synthesized deterministically from event ids (the test tables
    carry no coordinates).  Reference: Projector tool call at
    StreamWithStates.scala:209-220."""
    ev = _t(spark, sf_dir, "events")
    pts = ev.select(
        "event_id",
        ((F.col("event_id") % 360) - 180 + 0.25).alias("lon"),
        ((F.col("event_id") % 170) - 85 + 0.5).alias("lat"),
    )
    proj = GEO.project_web_mercator(pts, "lon", "lat")
    return proj.select(
        "event_id",
        F.round("lon", 6).alias("lon"),
        F.round("lat", 6).alias("lat"),
        F.round(F.col("geometry.x"), 2).alias("mercator_x"),
        F.round(F.col("geometry.y"), 2).alias("mercator_y"),
    )


@retired_query(
    "web_mercator_roundtrip",
    subsumed_by="web_mercator_projection (the reference-surface G1 item; the "
    "inverse direction keeps its full oracle in the retired-pin test)",
    oracle="""
    SELECT event_id,
           round(lon, 6) AS lon, round(lat, 6) AS lat,
           round(degrees((6378137.0 * radians(lon)) / 6378137.0), 6) AS lon_back,
           round(degrees(2 * atan(exp((6378137.0 * ln(tan(pi()/4 + radians(lat)/2)))
                 / 6378137.0)) - pi()/2), 6) AS lat_back
    FROM (
      SELECT event_id,
             (event_id % 360) - 180 + 0.25 AS lon,
             (event_id % 170) - 85 + 0.5 AS lat
      FROM events)
    """,
)
def q_web_mercator_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1 inverse: project → unproject recovers (lon, lat) to 6 dp — the
    round-trip proves both directions of the projector."""
    ev = _t(spark, sf_dir, "events")
    pts = ev.select(
        "event_id",
        ((F.col("event_id") % 360) - 180 + 0.25).alias("lon"),
        ((F.col("event_id") % 170) - 85 + 0.5).alias("lat"),
    )
    back = GEO.unproject_web_mercator(GEO.project_web_mercator(pts, "lon", "lat"))
    return back.select(
        "event_id",
        F.round("lon", 6).alias("lon"),
        F.round("lat", 6).alias("lat"),
        F.round("lon_back", 6).alias("lon_back"),
        F.round("lat_back", 6).alias("lat_back"),
    )


@query(
    "geometry_construct_null",
    oracle="""
    SELECT event_id,
           round((event_id % 360) - 180 + 0.25, 6) AS x,
           round((event_id % 170) - 85 + 0.5, 6) AS y,
           (event_id % 2 = 0) AS geom_is_null
    FROM events
    """,
)
def q_geometry_construct_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 + P3: build point structs, null half of them (the reference's
    null-geometry branch), emit flattened x/y + null flag."""
    ev = _t(spark, sf_dir, "events")
    pts = GEO.make_point(
        ev.select(
            "event_id",
            ((F.col("event_id") % 360) - 180 + 0.25).alias("longitude"),
            ((F.col("event_id") % 170) - 85 + 0.5).alias("latitude"),
        )
    )
    nulled = pts.withColumn(
        "geometry",
        F.when(F.col("event_id") % 2 == 0, F.lit(None).cast(pts.schema["geometry"].dataType))
        .otherwise(F.col("geometry")),
    )
    return nulled.select(
        "event_id",
        F.round(F.coalesce(F.col("geometry.x"), F.col("longitude")), 6).alias("x"),
        F.round(F.coalesce(F.col("geometry.y"), F.col("latitude")), 6).alias("y"),
        F.col("geometry").isNull().alias("geom_is_null"),
    )


# --------------------------------------------------------------------------
# Text analysis (north star: token counting, quality, language-ID, fingerprint)
# --------------------------------------------------------------------------
from stateful_spark_streaming_spark.operators import text as TXT  # noqa: E402

_NORM_SQL = "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"
_TOKS_SQL = f"string_split({_NORM_SQL}, ' ')"


@query(
    "token_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(len({_TOKS_SQL}) AS INT) AS n_tokens,
           CAST(length(text) AS INT) AS n_chars_raw,
           length({_NORM_SQL}) / 4.0 AS bpe_token_estimate,
           CAST(len(list_distinct({_TOKS_SQL})) AS INT) AS n_unique_tokens
    FROM documents
    """,
)
def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TXT.token_stats(_t(spark, sf_dir, "documents"))


@query(
    "quality_score",
    oracle=f"""
    WITH base AS (
      SELECT doc_id,
             {_TOKS_SQL} AS toks,
             {_NORM_SQL} AS norm,
             CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS INT) AS n_punct,
             CAST(length(text) AS INT) AS n_char
      FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS INT) AS n_tokens,
           n_punct,
           CAST(len(list_intersect(list_distinct(toks),
                ['the','and','of','to','in','is','that','for'])) AS INT) AS stopword_hits,
           round(length(replace(norm, ' ', '')) / greatest(len(toks), 1), 4) AS mean_word_len,
           round(len(list_distinct(toks)) / CAST(greatest(len(toks), 1) AS DOUBLE), 4) AS type_token_ratio,
           round(least(len(toks) / 64.0, 1.0) * 0.4
                 + (1.0 - least(n_punct / CAST(greatest(n_char, 1) AS DOUBLE), 1.0)) * 0.2
                 + least(len(list_intersect(list_distinct(toks),
                       ['the','and','of','to','in','is','that','for'])) / 4.0, 1.0) * 0.2
                 + round(len(list_distinct(toks)) / CAST(greatest(len(toks), 1) AS DOUBLE), 4) * 0.2,
                 4) AS quality_score
    FROM base
    """,
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TXT.quality_score(_t(spark, sf_dir, "documents"))


@query(
    "language_id",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, lang,
        CAST(len(regexp_extract_all({_NORM_SQL}, '\\b(the|and|of|to|in|is|that|for)\\b')) AS INT) AS score_en,
        CAST(len(regexp_extract_all({_NORM_SQL}, '\\b(el|la|de|que|y|en|los|por)\\b')) AS INT) AS score_es,
        CAST(len(regexp_extract_all({_NORM_SQL}, '\\b(der|die|und|das|nicht|ist|von|mit)\\b')) AS INT) AS score_de,
        CAST(len(regexp_extract_all({_NORM_SQL}, '\\b(le|la|les|des|est|dans|pour|une)\\b')) AS INT) AS score_fr,
        CAST(len(regexp_extract_all(text, '[\\x{{4e00}}-\\x{{9fff}}]')) AS INT) AS cjk
      FROM documents)
    SELECT doc_id, lang, score_en, score_es, score_de, score_fr,
           CASE WHEN cjk > greatest(score_en, score_es, score_de, score_fr) THEN 'zh'
                WHEN greatest(score_en, score_es, score_de, score_fr) = 0 THEN 'und'
                WHEN score_en = greatest(score_en, score_es, score_de, score_fr) THEN 'en'
                WHEN score_es = greatest(score_en, score_es, score_de, score_fr) THEN 'es'
                WHEN score_de = greatest(score_en, score_es, score_de, score_fr) THEN 'de'
                ELSE 'fr' END AS lang_pred
    FROM s
    """,
)
def q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TXT.language_id(_t(spark, sf_dir, "documents"))


@query(
    "fingerprint",
    oracle=f"""
    SELECT doc_id,
           md5({_NORM_SQL}) AS content_fp,
           md5(list_aggregate(list_sort(list_distinct({_TOKS_SQL})), 'string_agg', ' ')) AS bag_fp
    FROM documents
    """,
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TXT.fingerprint(_t(spark, sf_dir, "documents"))


@query(
    "chunk_documents",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, {_TOKS_SQL} AS toks,
             CAST(len({_TOKS_SQL}) AS INT) AS n
      FROM documents),
    st AS (
      SELECT doc_id, toks, n,
             CAST(unnest(generate_series(1, greatest(n, 1), 48)) AS INT) AS start
      FROM base)
    SELECT doc_id,
           CAST((start - 1) / 48 AS INT) AS chunk_id,
           start,
           n AS n_tokens,
           array_to_string(list_slice(toks, start, least(start + 63, n)), ' ')
               AS chunk_text,
           CAST(least(64, n - start + 1) AS INT) AS chunk_len
    FROM st WHERE start = 1 OR start + 16 <= n
    """,
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM chunker: 64-token windows, 16-token overlap — map-only slice
    algebra, no shuffle."""
    out = TXT.chunk_documents(
        _t(spark, sf_dir, "documents"), chunk_tokens=64, overlap=16
    )
    return out.select(
        "doc_id", "chunk_id", "start", "n_tokens", "chunk_text", "chunk_len"
    )


@query(
    "redact_pii",
    oracle=f"""
    WITH s1 AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS INT) AS n_email,
             regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '<EMAIL>', 'g') AS t1
      FROM documents),
    s2 AS (
      SELECT doc_id, n_email,
             CAST(len(regexp_extract_all(t1, '\\+?[0-9][0-9()\\- ]{{7,}}[0-9]')) AS INT) AS n_phone,
             regexp_replace(t1, '\\+?[0-9][0-9()\\- ]{{7,}}[0-9]', '<PHONE>', 'g') AS t2
      FROM s1),
    s3 AS (
      SELECT doc_id, n_email, n_phone,
             CAST(len(regexp_extract_all(t2, '\\b(?:[0-9]{{1,3}}\\.){{3}}[0-9]{{1,3}}\\b')) AS INT) AS n_ipv4,
             regexp_replace(t2, '\\b(?:[0-9]{{1,3}}\\.){{3}}[0-9]{{1,3}}\\b', '<IPV4>', 'g') AS t3
      FROM s2)
    SELECT doc_id, t3 AS redacted_text, n_email, n_phone, n_ipv4 FROM s3
    """,
)
def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub (emails/phones/IPv4 → typed placeholders) + per-doc
    redaction counts — the first pass of every training-data pipeline."""
    return TXT.redact_pii(_t(spark, sf_dir, "documents"))


@query(
    "hash_split",
    oracle=f"""
    SELECT doc_id,
           ('0x' || substring(md5({_NORM_SQL}), 1, 8))::BIGINT % 100 AS bucket,
           CASE WHEN ('0x' || substring(md5({_NORM_SQL}), 1, 8))::BIGINT % 100 < 90
                THEN 'train' ELSE 'eval' END AS split
    FROM documents
    """,
)
def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-hash train/eval split (90/10): duplicates land
    in the same split — no train/eval leakage through dups."""
    return TXT.hash_split(_t(spark, sf_dir, "documents"), train_pct=90)


@query(
    "repetition_stats",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
    bi AS (SELECT doc_id,
                  CASE WHEN len(t) >= 2
                       THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
                       ELSE [] END AS b
           FROM toks),
    ex AS (SELECT doc_id, unnest(b) AS bg FROM bi),
    cnt AS (SELECT doc_id, bg, count(*) AS c FROM ex GROUP BY 1, 2),
    agg AS (SELECT doc_id, CAST(sum(c) AS INT) AS n_bigrams,
                   CAST(count(*) AS INT) AS n_unique_bigrams,
                   CAST(max(c) AS INT) AS top_c
            FROM cnt GROUP BY 1),
    idx AS (SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS i FROM toks),
    wt AS (SELECT doc_id, t[i] AS tok, i FROM idx),
    runs AS (SELECT doc_id, tok,
                    i - row_number() OVER (PARTITION BY doc_id, tok ORDER BY i) AS grp
             FROM wt),
    runlen AS (SELECT doc_id, CAST(count(*) AS INT) AS rl
               FROM runs GROUP BY doc_id, tok, grp),
    mwr AS (SELECT doc_id, max(rl) AS max_word_run FROM runlen GROUP BY 1)
    SELECT d.doc_id,
           coalesce(a.n_bigrams, 0) AS n_bigrams,
           coalesce(a.n_unique_bigrams, 0) AS n_unique_bigrams,
           round((coalesce(a.n_bigrams, 0) - coalesce(a.n_unique_bigrams, 0))::DOUBLE
                 / greatest(coalesce(a.n_bigrams, 0), 1), 4) AS dup_bigram_frac,
           coalesce(a.top_c, 0) AS top_bigram_count,
           round(coalesce(a.top_c, 0)::DOUBLE
                 / greatest(coalesce(a.n_bigrams, 0), 1), 4) AS top_bigram_frac,
           coalesce(m.max_word_run, 0) AS max_word_run
    FROM documents d
    LEFT JOIN agg a USING (doc_id)
    LEFT JOIN mwr m USING (doc_id)
    """,
)
def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style repetition quality signals: duplicate-bigram
    fraction, top-bigram share, longest same-word run — all per-row column
    expressions (map-only, no explode shuffle)."""
    return TXT.repetition_stats(_t(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# Sampling / sharding (training-data pipeline: stratify, shuffle, shard)
# --------------------------------------------------------------------------
from stateful_spark_streaming_spark.operators import sampling as SMP  # noqa: E402


@query(
    "stratified_sample",
    oracle="""
    SELECT doc_id, lang
    FROM documents
    WHERE ('0x' || substring(md5('strat1' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
          < CASE WHEN lang = 'en' THEN 25 ELSE 100 END
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language rebalancing: downsample English to 25%,
    keep everything else — the standard corpus-mix step, hash-keyed so the
    sample is identical on every run/retry.  Map-only, no rand()."""
    out = SMP.stratified_sample(
        _t(spark, sf_dir, "documents"),
        strata_col="lang",
        rates={"en": 0.25},
        default_rate=1.0,
    )
    return out.select("doc_id", "lang")


@query(
    "shuffle_shard",
    oracle="""
    SELECT doc_id,
           CAST(('0x' || substring(md5('shuf1' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8 AS INT) AS shard,
           CAST(row_number() OVER (
               PARTITION BY ('0x' || substring(md5('shuf1' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8
               ORDER BY md5('shuf1' || CAST(doc_id AS VARCHAR)), doc_id) AS INT) AS pos
    FROM documents
    """,
)
def q_shuffle_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + shard assignment — the final step of
    a training dataset build: a stable pseudo-random permutation as
    (shard, pos), one shuffle."""
    out = SMP.shuffle_shard(_t(spark, sf_dir, "documents"), n_shards=8)
    return out.select("doc_id", "shard", F.col("pos").cast("int").alias("pos"))


@query(
    "sample_n_per_group",
    oracle="""
    SELECT doc_id, source, CAST(sample_rank AS INT) AS sample_rank
    FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5('grpN1' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS sample_rank
      FROM documents)
    WHERE sample_rank <= 40
    """,
)
def q_sample_n_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group fixed-size sample (reservoir-equivalent):
    exactly min(40, group size) docs per source, stable across re-runs."""
    out = SMP.sample_n_per_group(
        _t(spark, sf_dir, "documents"), group_col="source", n=40
    )
    return out.select(
        "doc_id", "source", F.col("sample_rank").cast("int").alias("sample_rank")
    )


@retired_query(
    "pack_sequences",
    subsumed_by="pack_sequences_emit (calls pack_sequences for its layout, so "
    "the gate still executes the manifest machinery every round)",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             CAST(len({_TOKS_SQL}) AS INT) AS n_tokens,
             md5('pack1' || CAST(doc_id AS VARCHAR)) AS hkey
      FROM documents
    ), placed AS (
      SELECT doc_id, n_tokens, hkey,
             CAST(('0x' || substring(hkey, 1, 8))::BIGINT % 8 AS INT) AS stream
      FROM toks
    ), offs AS (
      SELECT doc_id, stream, n_tokens,
             CAST(coalesce(sum(n_tokens) OVER (
                 PARTITION BY stream ORDER BY hkey, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS start_offset
      FROM placed
    )
    SELECT doc_id, stream, n_tokens, start_offset,
           CAST(floor(start_offset / 2048) AS BIGINT) AS pack_id,
           CAST(start_offset % 2048 AS INT) AS pack_offset
    FROM offs
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing layout: concat streams cut every 2048
    tokens; per doc its (stream, start_offset, pack_id, pack_offset)."""
    from stateful_spark_streaming_spark.operators import text as _TXT

    docs = _t(spark, sf_dir, "documents").withColumn(
        "n_tokens", F.size(_TXT.tokens(F.col("text")))
    )
    out = SMP.pack_sequences(docs, tokens_col="n_tokens", seq_len=2048, n_streams=8)
    return out.select(
        "doc_id", "stream", "n_tokens", "start_offset", "pack_id", "pack_offset"
    )


@query(
    "pack_sequences_emit",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_SQL} AS t,
             CAST(len({_TOKS_SQL}) AS INT) AS n_tokens,
             md5('pack1' || CAST(doc_id AS VARCHAR)) AS hkey
      FROM documents
    ), placed AS (
      SELECT *, CAST(('0x' || substring(hkey, 1, 8))::BIGINT % 8 AS INT) AS stream
      FROM toks
    ), offs AS (
      SELECT doc_id, t, n_tokens, stream,
             CAST(coalesce(sum(n_tokens) OVER (
                 PARTITION BY stream ORDER BY hkey, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS start_offset
      FROM placed
    ), pk AS (
      SELECT *, unnest(generate_series(start_offset // 512,
                                       (start_offset + n_tokens - 1) // 512)) AS p
      FROM offs
    ), pieces AS (
      SELECT stream, p AS pack_id,
             greatest(start_offset - p * 512, 0) AS pos,
             list_slice(t, CAST(greatest(p * 512 - start_offset, 0) + 1 AS BIGINT),
                        CAST(least(n_tokens, (p + 1) * 512 - start_offset) AS BIGINT))
               AS piece
      FROM pk
    )
    SELECT stream, pack_id, count(*) AS n_docs,
           CAST(len(flatten(list(piece ORDER BY pos))) AS INT) AS seq_filled,
           array_to_string(flatten(list(piece ORDER BY pos)), ' ') AS seq_text
    FROM pieces GROUP BY stream, pack_id
    """,
)
def q_pack_sequences_emit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MATERIALIZE path of sequence packing: actual (stream, pack_id)
    token windows cut at 512 tokens — what the trainer reads, not just the
    layout manifest (which pack_sequences emits and shares an oracle with)."""
    from stateful_spark_streaming_spark.operators import text as _TXT

    docs = _t(spark, sf_dir, "documents").withColumn(
        "__toks", _TXT.tokens(F.col("text"))
    )
    return SMP.pack_sequences_emit(
        docs, tokens_array_col="__toks", seq_len=512, n_streams=8
    )


# --------------------------------------------------------------------------
# Deduplication (north star: exact, n-gram Jaccard, MinHash+LSH, SimHash)
# --------------------------------------------------------------------------
from stateful_spark_streaming_spark.operators import dedup as DD  # noqa: E402

_SHINGLES_SQL = (
    "list_distinct([t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] FOR i IN range(len(t)-2)])"
)


@query(
    "dedup_exact",
    oracle=f"""
    SELECT md5({_NORM_SQL}) AS content_fp,
           min(doc_id) AS survivor_doc_id,
           count(*) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return DD.exact_dedup(_t(spark, sf_dir, "documents"))


@query(
    "dedup_jaccard_pairs",
    oracle=f"""
    WITH grp AS (SELECT text AS gtext, min(doc_id) AS rep,
                        list(doc_id ORDER BY doc_id) AS gids
                 FROM documents GROUP BY text),
    toks AS (SELECT rep AS doc_id, {_TOKS_SQL} AS t
             FROM (SELECT rep, gtext AS text FROM grp)),
    sh0 AS (SELECT doc_id, {_SHINGLES_SQL} AS s FROM toks WHERE len(t) >= 3),
    ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh0),
    hot AS (SELECT shingle FROM ex GROUP BY shingle HAVING count(*) > 1000),
    sh AS (SELECT doc_id, list(shingle) AS s
           FROM (SELECT * FROM ex ANTI JOIN hot USING (shingle))
           GROUP BY doc_id),
    rp AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS n_common,
           round(len(list_intersect(a.s, b.s))::DOUBLE
                 / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE round(len(list_intersect(a.s, b.s))::DOUBLE
                / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4) >= 0.6
      AND len(list_intersect(a.s, b.s)) > 0)
    SELECT least(ta.ia, tb.ib) AS doc_a, greatest(ta.ia, tb.ib) AS doc_b,
           r.n_common, r.jaccard
    FROM rp r
    JOIN grp ga ON ga.rep = r.doc_a
    JOIN grp gb ON gb.rep = r.doc_b,
         LATERAL unnest(ga.gids) AS ta(ia), LATERAL unnest(gb.gids) AS tb(ib)
    WHERE ta.ia <> tb.ib
    UNION ALL
    SELECT ta.ia AS doc_a, tb.ib AS doc_b,
           CAST(len(s.s) AS BIGINT) AS n_common,
           round(CAST(1.0 AS DOUBLE), 4) AS jaccard
    FROM grp g JOIN sh s ON s.doc_id = g.rep,
         LATERAL unnest(g.gids) AS ta(ia), LATERAL unnest(g.gids) AS tb(ib)
    WHERE ta.ia < tb.ib AND len(s.s) > 0
    """,
)
def q_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale form: shingles shared by >1000 DISTINCT contents are dropped
    from both the intersections and the set sizes (self-consistent — see
    jaccard_pairs), exact-duplicate mass expands in-group (r13), and the
    oracle mirrors both exactly, so the oracle-checked query IS the
    100 TB-shaped one, not a small-data variant."""
    return DD.jaccard_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.6, max_shingle_df=1000
    )


# MinHash/SimHash oracles: the signatures are md5-derived, so DuckDB
# re-derives the ENTIRE pipeline — signatures, band hashes, candidate
# enumeration, verification — and the two LSH queries are hash-matched,
# not rows-only.  MinHash uses Kirsch-Mitzenmacher double hashing (one md5
# per shingle → h1/h2 substrings → family i = h1 + i*h2); the SQL mirrors
# the operator constants exactly (32 hashes × 8 bands of 4; 60 bits × 4
# chunks of 15).
_MH_SIG_COLS = ",\n           ".join(
    f"min(h1 + {i} * h2) AS h{i}" for i in range(32)
)
_MH_BAND_LIST = ",\n             ".join(
    f"md5('{b}|' || "
    + " || '|' || ".join(f"CAST(h{b * 4 + r} AS VARCHAR)" for r in range(4))
    + ")"
    for b in range(8)
)
_MH_JACCARD = (
    "round(len(list_intersect(sa.s, sb.s))::DOUBLE"
    " / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))), 4)"
)


#: ONE source-level definition of the verified MinHash+LSH pair set as a
#: CTE chain ending in ``mhp(doc_a, doc_b, n_common, jaccard)`` —
#: `dedup_minhash_lsh` selects it verbatim and `split_leakage` composes
#: it with the hash-split, so the two oracles can never desynchronize.
#: Mirrors the r13 distinct-text decomposition: the LSH chain (shingle →
#: signature → bands → bucket cap → Jaccard verify) runs over ONE
#: representative per distinct text; identical-text pairs are jaccard 1.0
#: in-group, and a rep pair expands to every copy pair verbatim.
_MH_PAIRS_CTES = f"""grp AS (SELECT text AS gtext, min(doc_id) AS rep,
                 list(doc_id ORDER BY doc_id) AS gids
          FROM documents GROUP BY text),
    toks AS (SELECT rep AS doc_id, {_TOKS_SQL} AS t
             FROM (SELECT rep, gtext AS text FROM grp)),
    sh AS (SELECT doc_id, {_SHINGLES_SQL} AS s FROM toks WHERE len(t) >= 3),
    ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
    hx AS (SELECT doc_id,
           ('0x' || substring(md5(shingle), 1, 15))::BIGINT AS h1,
           ('0x' || substring(md5(shingle), 16, 14))::BIGINT AS h2
           FROM ex),
    sig AS (SELECT doc_id,
           {_MH_SIG_COLS}
           FROM hx GROUP BY doc_id),
    bands AS (SELECT doc_id,
             unnest([{_MH_BAND_LIST}]) AS bh
             FROM sig),
    -- mirror the operator's hot-bucket guard (banded_candidate_pairs
    -- max_bucket_size=2000): buckets outside [2, 2000] DISTINCT texts
    -- emit no pairs (duplicate copies no longer occupy buckets)
    okb AS (SELECT bh FROM bands GROUP BY bh
            HAVING count(*) BETWEEN 2 AND 2000),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bands a JOIN bands b ON a.bh = b.bh AND a.doc_id < b.doc_id
             WHERE a.bh IN (SELECT bh FROM okb)),
    mhr AS (SELECT c.doc_a, c.doc_b,
           CAST(len(list_intersect(sa.s, sb.s)) AS INT) AS n_common,
           {_MH_JACCARD} AS jaccard
    FROM cand c
    JOIN sh sa ON sa.doc_id = c.doc_a
    JOIN sh sb ON sb.doc_id = c.doc_b
    WHERE {_MH_JACCARD} >= 0.6),
    mhp AS (
    SELECT least(ta.ia, tb.ib) AS doc_a, greatest(ta.ia, tb.ib) AS doc_b,
           m.n_common, m.jaccard
    FROM mhr m
    JOIN grp ga ON ga.rep = m.doc_a
    JOIN grp gb ON gb.rep = m.doc_b,
         LATERAL unnest(ga.gids) AS ta(ia), LATERAL unnest(gb.gids) AS tb(ib)
    WHERE ta.ia <> tb.ib
    UNION ALL
    SELECT ta.ia AS doc_a, tb.ib AS doc_b,
           CAST(len(s.s) AS INT) AS n_common, CAST(1.0 AS DOUBLE) AS jaccard
    FROM grp g JOIN sh s ON s.doc_id = g.rep,
         LATERAL unnest(g.gids) AS ta(ia), LATERAL unnest(g.gids) AS tb(ib)
    WHERE ta.ia < tb.ib AND len(s.s) > 0)"""


@query(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_MH_PAIRS_CTES},
    e AS (SELECT doc_a AS a, doc_b AS b FROM mhp
          UNION SELECT doc_b, doc_a FROM mhp),
    r AS (SELECT a AS node, a AS m FROM e
          UNION
          SELECT r.node, e.b FROM r JOIN e ON r.m = e.a)
    SELECT node AS doc_id, min(m) AS cluster_rep FROM r GROUP BY node
    """,
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup PAIRS → duplicate CLUSTERS: connected components over the
    near-dup pair graph by min-label propagation (the step that turns
    pairwise similarity into actual dedup decisions).  The pair source is
    the MinHash+LSH candidate generator — the at-scale form the sf1 probe
    validated (5.8x wall at 10x data, 0 dropped buckets) — NOT the exact
    df-capped Jaccard join, whose per-shingle pair expansion measured
    O(df^2) (231M candidate pairs at sf1, 28x wall; SCALE.md).  The exact
    generator survives as a bench-scale containment cross-check pytest
    (tests/test_dedup.py::test_lsh_pairs_contained_in_exact).  Oracle:
    the shared _MH_PAIRS_CTES pair set (same CTEs that power the
    dedup_minhash_lsh and split_leakage oracles, so the three cannot
    desynchronize) + recursive transitive closure in DuckDB."""
    pairs = _lsh_pairs_fixture(spark, sf_dir)
    return DD.dup_clusters(pairs)


@query(
    "dedup_keep_best",
    oracle=f"""
    WITH RECURSIVE {_MH_PAIRS_CTES},
    e AS (SELECT doc_a AS a, doc_b AS b FROM mhp
          UNION SELECT doc_b, doc_a FROM mhp),
    r AS (SELECT a AS node, a AS m FROM e
          UNION
          SELECT r.node, e.b FROM r JOIN e ON r.m = e.a),
    cl AS (SELECT node AS doc_id, min(m) AS rep FROM r GROUP BY node),
    qb AS (
      SELECT doc_id, {_TOKS_SQL} AS toks,
             CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS INT) AS n_punct,
             CAST(length(text) AS INT) AS n_char
      FROM documents),
    q AS (
      SELECT doc_id,
             CAST(round(round(least(len(toks) / 64.0, 1.0) * 0.4
                 + (1.0 - least(n_punct / CAST(greatest(n_char, 1) AS DOUBLE), 1.0)) * 0.2
                 + least(len(list_intersect(list_distinct(toks),
                       ['the','and','of','to','in','is','that','for'])) / 4.0, 1.0) * 0.2
                 + round(len(list_distinct(toks))
                         / CAST(greatest(len(toks), 1) AS DOUBLE), 4) * 0.2,
                 4) * 10000) AS BIGINT) AS qbp
      FROM qb),
    mq AS (SELECT cl.doc_id, cl.rep, q.qbp FROM cl JOIN q USING (doc_id)),
    win AS (SELECT rep, doc_id,
                   count(*) OVER (PARTITION BY rep) AS cs,
                   row_number() OVER (PARTITION BY rep
                                      ORDER BY qbp DESC, doc_id ASC) AS rn
            FROM mq)
    SELECT doc_id, CAST(1 AS INT) AS cluster_size, 'unique' AS reason
    FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM cl)
    UNION ALL
    SELECT doc_id, CAST(cs AS INT) AS cluster_size, 'best_of_cluster' AS reason
    FROM win WHERE rn = 1
    """,
)
def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical selection: near-dup clusters → keep the BEST-quality member
    per cluster (tie → lowest id) plus every unclustered doc — the decision
    rule that turns pairwise similarity into the cleaned corpus, retaining
    the best copy of each content rather than the earliest-crawled one.
    Pair source: the MinHash+LSH candidate generator (at-scale form —
    see q_dedup_clusters for the measured O(df^2) story of the exact
    generator it replaced).  Oracle: the shared _MH_PAIRS_CTES pair set +
    recursive-CTE clustering + the quality_score expression + a
    per-cluster rank (oracle-side windows are fine; the Spark side uses a
    partial-aggregatable max(struct) — no window, AQE-skew-safe)."""
    docs = _t(spark, sf_dir, "documents")
    pairs = _lsh_pairs_fixture(spark, sf_dir)
    q = TXT.quality_score(docs).select("doc_id", "quality_score")
    return DD.keep_best(docs, pairs, q)




@query(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH {_MH_PAIRS_CTES}
    SELECT doc_a, doc_b, n_common, jaccard FROM mhp
    """,
)
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the PRODUCER query: runs the live pipeline (shingle → minhash →
    # band → verify) so the gate and bench keep measuring pair
    # GENERATION; the three consumers below read _lsh_pairs_fixture
    return DD.minhash_lsh_pairs(_t(spark, sf_dir, "documents"), threshold=0.6)


def _materialized_fixture(spark: SparkSession, sf_dir: str, table: str,
                          prefix: str, build):
    """ONE materialize-once protocol for per-corpus derived fixtures (the
    LSH pair set, the synthetic image corpus): cache path keyed by the
    source parquet's (path, mtime, size) fingerprint via _fixture_tag —
    regenerated source data invalidates the fixture — PLUS a caller
    version salt folded into ``prefix``, so a pipeline/parameter change
    invalidates it too (without the salt, a /tmp fixture from an older
    operator version would keep serving stale derived rows to every
    consumer until someone cleared /tmp by hand).  ``build`` returns the
    DataFrame to persist; a missing _SUCCESS (torn write) rebuilds.

    CROSS-PROCESS ATOMIC (ADVICE r11): the fixture is shared by several
    queries plus the bench prebuild, and concurrent pytest/gate/bench
    processes may race here — so the build lands in a process-unique
    temp dir and is os.rename'd into place (atomic on one filesystem;
    /tmp).  A reader therefore only ever sees a COMPLETE fixture or
    none; a racing builder whose rename loses just discards its copy.
    Never ``overwrite`` the live path — that deletes it first and tears
    concurrent reads."""
    import shutil
    import tempfile

    key = _fixture_tag(sf_dir, table)
    path = os.path.join(tempfile.gettempdir(), f"{prefix}_{key}.parquet")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        tmp = tempfile.mkdtemp(
            prefix=f"{prefix}_{key}.build_", dir=tempfile.gettempdir()
        )
        staging = os.path.join(tmp, "data.parquet")
        build().write.mode("overwrite").parquet(staging)
        try:
            os.rename(staging, path)
        except OSError:
            # lost the race: another process renamed a complete fixture
            # in (keep theirs), OR a legacy torn dir (no _SUCCESS — never
            # valid, safe to clear) blocks the slot: clear and retry once
            if not os.path.exists(os.path.join(path, "_SUCCESS")):
                shutil.rmtree(path, ignore_errors=True)
                try:
                    os.rename(staging, path)
                except OSError:
                    pass  # raced again — winner's fixture is complete
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.read.parquet(path)


#: bump when minhash_lsh_pairs' pipeline or the pinned threshold changes —
#: part of the fixture cache key (see _materialized_fixture)
_LSH_PAIRS_SALT = "mh060v2"  # r13: distinct-text decomposition

#: bump when synthesize_image_table's pixel/layout recipe changes — same
#: stale-fixture protocol as _LSH_PAIRS_SALT
_IMAGES_SALT = "synth1"


def _lsh_pairs_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The verified MinHash+LSH pair set, materialized ONCE per corpus
    fingerprint and shared by its three consumers (dedup_clusters,
    dedup_keep_best, split_leakage) — at 100 TB pair GENERATION is the
    dominant stage of all three, and before r11 each rebuilt the full
    chain from raw text (r10 verdict #3).  In production this is a
    bucketed corpus-fingerprint table (ensure_bucketed_table,
    layout.py); at test SF a plain parquet materialization shows the same
    plan shape — consumers SCAN pairs, they don't re-mine them.  The
    oracles are unchanged: materialized pairs ≡ the live chain's output,
    so all three still hash-match the shared _MH_PAIRS_CTES."""
    return _materialized_fixture(
        spark, sf_dir, "documents", f"ssss_lsh_pairs_{_LSH_PAIRS_SALT}",
        lambda: DD.minhash_lsh_pairs(_t(spark, sf_dir, "documents"), threshold=0.6),
    )


_SPLIT_SQL = (
    f"CASE WHEN ('0x' || substring(md5({_NORM_SQL}), 1, 8))::BIGINT % 100 < 90"
    " THEN 'train' ELSE 'eval' END"
)


@query(
    "split_leakage",
    oracle=f"""
    WITH {_MH_PAIRS_CTES},
    sp AS (SELECT doc_id, {_SPLIT_SQL} AS s FROM documents),
    x AS (SELECT CASE WHEN pa.s = 'eval' THEN m.doc_a ELSE m.doc_b END AS doc_id,
                 m.jaccard
          FROM mhp m
          JOIN sp pa ON pa.doc_id = m.doc_a
          JOIN sp pb ON pb.doc_id = m.doc_b
          WHERE (pa.s = 'eval') <> (pb.s = 'eval'))
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_train_dups,
           max(jaccard) AS max_jaccard
    FROM x GROUP BY doc_id
    """,
)
def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval NEAR-dup leakage audit: content-hash splitting pins exact
    duplicates to one split, but near-duplicates hash differently and can
    straddle the boundary — the leak that silently inflates eval scores.
    Composes the verified MinHash+LSH pair set with the 90/10 hash split;
    returns each leaky eval doc with its train-side dup count and max
    Jaccard.  Oracle: the shared LSH pair CTEs + the hash-split CASE."""
    docs = _t(spark, sf_dir, "documents")
    pairs = _lsh_pairs_fixture(spark, sf_dir)
    split = TXT.hash_split(docs, train_pct=90)
    return DD.split_leakage(pairs, split)


@query(
    "streaming_dedup_minhash",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
    sh AS (SELECT doc_id, {_SHINGLES_SQL} AS s FROM toks WHERE len(t) >= 3),
    ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
    hx AS (SELECT doc_id,
           ('0x' || substring(md5(shingle), 1, 15))::BIGINT AS h1,
           ('0x' || substring(md5(shingle), 16, 14))::BIGINT AS h2
           FROM ex),
    sig AS (SELECT doc_id,
           {_MH_SIG_COLS}
           FROM hx GROUP BY doc_id),
    bands AS (SELECT doc_id,
             unnest([{_MH_BAND_LIST}]) AS bh
             FROM sig),
    cl AS (SELECT bh, min(doc_id) AS claimant FROM bands GROUP BY bh),
    kept AS (SELECT b.doc_id
             FROM bands b JOIN cl USING (bh)
             GROUP BY b.doc_id
             HAVING max(CASE WHEN cl.claimant <> b.doc_id THEN 1 ELSE 0 END) = 0)
    SELECT doc_id FROM kept
    UNION ALL
    -- sentinel-band branch: <k-token docs are always admitted, and NULL
    -- text means a NULL token array — len(NULL) < 3 is NULL, so the null
    -- check must be explicit or null-text docs vanish from the oracle
    -- while the operator admits them via their sentinel
    SELECT doc_id FROM toks WHERE t IS NULL OR len(t) < 3
    """,
)
def q_streaming_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming near-dup ingest: incremental MinHash+LSH admission filter
    — a doc is admitted iff it claims all 8 of its band hashes first
    (min-doc_id tie-break), i.e. no LSH collision with anything already
    ingested.  Single-pass replay ≡ the oracle: per band the min doc_id
    claims it, a doc survives iff it is the claimant of every band; docs
    with < 3 tokens (no shingles) get a unique sentinel band and always
    pass."""
    import os as _os

    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_dedup_minhash,
    )

    out = run_streaming_dedup_minhash(
        spark, _os.path.join(sf_dir, "documents.parquet")
    )
    return out.select("doc_id")


_SH_SUM_COLS = ",\n           ".join(
    f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
    for b in range(60)
)
_SH_FP_EXPR = "\n             + ".join(
    f"(CASE WHEN s{b} > 0 THEN (1::BIGINT << {b}) ELSE 0 END)" for b in range(60)
)
@query(
    "dedup_simhash",
    oracle=f"""
    WITH tk AS (SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS tok
                FROM documents),
    th AS (SELECT doc_id, ('0x' || substring(md5(tok), 1, 15))::BIGINT AS h FROM tk),
    bits AS (SELECT doc_id,
           {_SH_SUM_COLS}
           FROM th GROUP BY doc_id),
    fp AS (SELECT doc_id,
             {_SH_FP_EXPR}
           AS f FROM bits)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.f, b.f)) AS INT) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.f, b.f)) <= 3
    """,
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup text pairs (Hamming ≤ 3 over 60-bit fingerprints)
    via distinct-fingerprint banding + popcount verify — since r13 the
    operator is COMPLETE and cap-free (the image-family distinct-hash
    decomposition generalized to text: duplicate mass expands in-group,
    buckets hold distinct fingerprints only), so the oracle is the
    all-pairs brute force over the re-derived fingerprints: hash equality
    proves the fingerprint kernel AND the banding's losslessness, exactly
    like image_near_dups."""
    return DD.simhash_near_pairs(_t(spark, sf_dir, "documents"), max_hamming=3)


#: ONE source-level definition of the decontamination oracle — the exact
#: operator and the bloom-pruned variant share it (the bloom has no false
#: negatives and its false positives die in the exact verify join, so its
#: output is defined to be row-for-row identical; dedup.py
#: decontaminate_bloom docstring).
_DECON_ORACLE = f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
    g AS (SELECT doc_id,
                 CASE WHEN len(t) >= 5
                      THEN list_transform(range(1, len(t) - 3), i ->
                           t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
                           || ' ' || t[i+4])
                      ELSE [] END AS s
          FROM toks),
    ev AS (SELECT DISTINCT unnest(s) AS shingle FROM g WHERE doc_id % 97 = 0),
    tr AS (SELECT doc_id, s FROM g WHERE doc_id % 97 <> 0),
    hit AS (SELECT DISTINCT t.doc_id
            FROM (SELECT doc_id, unnest(s) AS shingle FROM tr) t
            JOIN ev USING (shingle))
    SELECT tr.doc_id, (hit.doc_id IS NOT NULL) AS contaminated
    FROM tr LEFT JOIN hit ON tr.doc_id = hit.doc_id
    """


@query("decontaminate", oracle=_DECON_ORACLE)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training docs sharing any 5-token shingle
    with the (synthetic) eval slice are flagged (5 is the small-vocab
    analog of the 8-13-gram windows real decontamination uses; the
    operator default is 8).  Eval side broadcast as a distinct shingle
    set; train side probed with a broadcast semi-join — no shuffle of
    training data."""
    docs = _t(spark, sf_dir, "documents")
    eval_df = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    return DD.decontaminate(train, eval_df, k=5)


@query("decontaminate_bloom", oracle=_DECON_ORACLE)
def q_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """decontaminate with the eval side compressed into a fixed 32 KiB
    Bloom bitmap instead of a broadcast shingle dictionary — the shape
    for decontaminating against a LARGE held-out corpus.  Bloom FPs die
    in the exact verify semi-join (no false negatives), so the output —
    and the oracle — is exactly decontaminate's."""
    docs = _t(spark, sf_dir, "documents")
    eval_df = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    return DD.decontaminate_bloom(train, eval_df, k=5)


@query(
    "streaming_decontaminate",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
    g AS (SELECT doc_id,
                 CASE WHEN len(t) >= 5
                      THEN list_transform(range(1, len(t) - 3), i ->
                           t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
                           || ' ' || t[i+4])
                      ELSE [] END AS s
          FROM toks),
    ev AS (SELECT DISTINCT unnest(s) AS shingle FROM g WHERE doc_id % 97 = 0),
    tr AS (SELECT doc_id, s FROM g WHERE doc_id % 97 <> 0)
    SELECT DISTINCT t.doc_id
    FROM (SELECT doc_id, unnest(s) AS shingle FROM tr) t
    JOIN ev USING (shingle)
    """,
)
def q_streaming_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming decontamination — ingest-time form of ``decontaminate``:
    training docs stream in, the eval suite's distinct 5-gram shingles are
    a static broadcast side, and any stream doc sharing a shingle is
    emitted as contaminated.  Stateless stream-static semi join: the
    training firehose never shuffles."""
    import os as _os

    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_decontaminate,
    )

    docs = _t(spark, sf_dir, "documents")
    out = run_streaming_decontaminate(
        spark,
        _os.path.join(sf_dir, "documents.parquet"),
        eval_df=docs.filter(F.col("doc_id") % 97 == 0),
        k=5,
        train_filter=F.col("doc_id") % 97 != 0,
    )
    return out.select("doc_id")


@query(
    "token_budget_mix",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, source, {_TOKS_SQL} AS toks,
             CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS INT) AS n_punct,
             CAST(length(text) AS INT) AS n_char
      FROM documents),
    scored AS (
      SELECT doc_id, source, CAST(len(toks) AS INT) AS n_tokens,
             round(least(len(toks) / 64.0, 1.0) * 0.4
            + (1.0 - least(n_punct / CAST(greatest(n_char, 1) AS DOUBLE), 1.0)) * 0.2
            + least(len(list_intersect(list_distinct(toks),
                  ['the','and','of','to','in','is','that','for'])) / 4.0, 1.0) * 0.2
            + round(len(list_distinct(toks))
                    / CAST(greatest(len(toks), 1) AS DOUBLE), 4) * 0.2,
            4) AS q
      FROM base),
    m AS (SELECT doc_id, source, n_tokens, q,
                 sum(n_tokens) OVER (PARTITION BY source ORDER BY q DESC, doc_id
                                     ROWS UNBOUNDED PRECEDING) AS cum
          FROM scored)
    SELECT doc_id, source, n_tokens, q AS quality, CAST(cum AS BIGINT) AS cum_tokens
    FROM m WHERE cum <= 1000
    """,
)
def q_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture selection: per source, keep best-quality docs while the
    cumulative token count stays within a 1000-token budget — one window
    (single shuffle on source), deterministic tie-breaks."""
    docs = _t(spark, sf_dir, "documents")
    q = TXT.quality_score(docs, keep_cols=("source",)).select(
        "doc_id", "source", "n_tokens", "quality_score"
    )
    return SMP.token_budget_mix(
        q,
        quality_col=F.col("quality_score"),
        tokens_col=F.col("n_tokens"),
        budget_tokens=1000,
        group_col="source",
    )


def _tp_base_sql(where: str = "") -> str:
    """Shared flagship-oracle head: base docs (+ optional WHERE), quality
    scoring, and the lang/quality filter — ONE definition for
    training_pipeline and training_pipeline_full so the quality weights
    can never desynchronize between the two."""
    return f"""base AS (
      SELECT doc_id, text, lang, {_TOKS_SQL} AS toks, {_NORM_SQL} AS norm,
             CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS INT) AS n_punct,
             CAST(length(text) AS INT) AS n_char
      FROM documents{where}),
    scored AS (
      SELECT *, round(least(len(toks) / 64.0, 1.0) * 0.4
            + (1.0 - least(n_punct / CAST(greatest(n_char, 1) AS DOUBLE), 1.0)) * 0.2
            + least(len(list_intersect(list_distinct(toks),
                  ['the','and','of','to','in','is','that','for'])) / 4.0, 1.0) * 0.2
            + round(len(list_distinct(toks))
                    / CAST(greatest(len(toks), 1) AS DOUBLE), 4) * 0.2,
            4) AS q
      FROM base),
    filtered AS (SELECT * FROM scored WHERE lang <> 'zh' AND q >= 0.55)"""


def _tp_tail_sql(src: str) -> str:
    """Shared flagship-oracle tail from a filtered-docs CTE ``src``: exact
    dedup, Jaccard clustering with min-rep retention, 64/16 chunking and
    the content-hash split — identical across both flagship variants."""
    return f"""surv AS (SELECT min(doc_id) AS doc_id FROM {src} GROUP BY md5(norm)),
    d2 AS (SELECT x.* FROM {src} x JOIN surv USING (doc_id)),
    tk AS (SELECT doc_id, toks AS t FROM d2),
    sh0 AS (SELECT doc_id, {_SHINGLES_SQL} AS s FROM tk WHERE len(t) >= 3),
    p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM sh0 a JOIN sh0 b ON a.doc_id < b.doc_id
          WHERE len(list_intersect(a.s, b.s)) > 0
            AND round(len(list_intersect(a.s, b.s))::DOUBLE
                / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4) >= 0.6),
    e AS (SELECT doc_a AS a, doc_b AS b FROM p
          UNION SELECT doc_b, doc_a FROM p),
    r AS (SELECT a AS node, a AS m FROM e
          UNION
          SELECT r.node, e.b FROM r JOIN e ON r.m = e.a),
    reps AS (SELECT node, min(m) AS rep FROM r GROUP BY node),
    keep AS (SELECT d2.* FROM d2 LEFT JOIN reps ON d2.doc_id = reps.node
             WHERE reps.node IS NULL OR reps.rep = d2.doc_id),
    st AS (SELECT doc_id, norm, CAST(len(toks) AS INT) AS n,
                  CAST(unnest(generate_series(1, greatest(CAST(len(toks) AS INT), 1), 48)) AS INT) AS start
           FROM keep)
    SELECT doc_id,
           CAST((start - 1) / 48 AS INT) AS chunk_id,
           CAST(least(64, n - start + 1) AS INT) AS chunk_len,
           CASE WHEN ('0x' || substring(md5(norm), 1, 8))::BIGINT % 100 < 90
                THEN 'train' ELSE 'eval' END AS split
    FROM st WHERE start = 1 OR start + 16 <= n"""


_TP_DECON_SQL = f"""evg AS (SELECT {_TOKS_SQL} AS t FROM documents WHERE doc_id % 97 = 0),
    evs AS (SELECT DISTINCT unnest(
              CASE WHEN len(t) >= 5
                   THEN list_transform(range(1, len(t) - 3), i ->
                        t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
                        || ' ' || t[i+4])
                   ELSE [] END) AS shingle FROM evg),
    trg AS (SELECT doc_id,
                   CASE WHEN len(toks) >= 5
                        THEN list_transform(range(1, len(toks) - 3), i ->
                             toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                             || ' ' || toks[i+3] || ' ' || toks[i+4])
                        ELSE [] END AS s
            FROM filtered),
    cont AS (SELECT DISTINCT t.doc_id
             FROM (SELECT doc_id, unnest(s) AS shingle FROM trg) t
             JOIN evs USING (shingle)),
    clean AS (SELECT f.* FROM filtered f ANTI JOIN cont USING (doc_id))"""


@query(
    "training_pipeline",
    oracle="WITH RECURSIVE " + _tp_base_sql() + ",\n    " + _tp_tail_sql("filtered"),
)
def q_training_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP COMPOSITION: the end-to-end training-data build, chaining
    the operator library the way a real corpus pipeline does —

      quality/lang filter → exact dedup (content fp, min-id survivor)
      → near-dup clustering (Jaccard ≥ 0.6, keep cluster reps)
      → 64/16 token chunking → content-hash 90/10 train/eval split

    Every stage is an operator with its own oracle elsewhere in this
    catalog; this query proves they compose (one lazy plan end to end, no
    intermediate rematerialization) and the full-chain oracle re-derives
    the same rows in DuckDB.

    Tokenize-once (the ``unigram_logprob`` lesson, audited chain-wide per
    VERDICT r4 #5): quality scoring, exact-dedup fingerprint, Jaccard
    shingling, chunking and the hash split all consume ONE ``__toks``
    token-array column threaded via ``tokens_col``.  The AUDIT RESULT
    differs from unigram_logprob's: there the tokenized frame collapses
    to a compact (doc, token, c) aggregate whose cache is nearly free;
    here it would have to cache full token ARRAYS, and that persist
    measured a consistent sf0.1 PESSIMIZATION (5.5–6.8 s vs 4.1–4.4 s —
    block-manager serialization of the arrays outweighs the ~5 saved
    tokenizer passes at this text volume).  So ``persist_tokens``
    defaults False; at 100 TB — where each avoided pass is a full-corpus
    text scan — flip it on, or better, write the tokenized frame to
    storage and read it back."""
    return _training_pipeline_chain(_t(spark, sf_dir, "documents"))


def _training_pipeline_chain(
    docs: DataFrame,
    eval_df: DataFrame | None = None,
    decon_k: int = 5,
    persist_tokens: bool = False,
    persist_quality: bool = True,
) -> DataFrame:
    """Shared corpus-build chain: quality/lang filter → [decontaminate] →
    exact dedup → near-dup cluster reps → 64/16 chunking → 90/10 split.
    ``__toks`` is computed once on the base frame and threaded through
    every token-consuming stage via ``tokens_col``; ``persist_tokens``
    additionally caches the tokenized base so each stage reads the cache
    instead of re-deriving — profitable only when the raw-text scan +
    tokenizer dominate the cache round-trip (100 TB yes, sf0.1 no; see
    q_training_pipeline).

    ``persist_quality`` (r14, default ON) caches the NARROW
    (doc_id, quality_score) frame instead: the ``filtered`` subtree is
    re-expanded by every downstream branch (decon shingles + anti-join,
    exact-dedup, the jaccard pair side, chunking, hash split), and
    without the cache EACH branch carries a pushed
    ``quality_score >= 0.55`` filter that re-derives the whole scoring
    regex tree below its projection — the r14 plan audit counted the
    expression in 4 Filter conditions for ``training_pipeline`` and 12
    for ``training_pipeline_full`` (each paired with a Project
    re-computation).  Unlike the token-array persist this cache is 16
    bytes/row, the guide-§8 "decide with small rows" shape — at 100 TB
    stage it to storage instead.  Same track_persist lifetime contract."""
    base = docs.select(
        "doc_id", "lang", "text", TXT.tokens(F.col("text")).alias("__toks")
    )
    # the Arrow kernels read pre-tokenized arrays ONLY off a persisted
    # frame: un-persisted, shipping list<string> through Arrow measured
    # ~12% slower than letting the kernel re-tokenize the text batch
    # (interleaved A/B at sf0.1: 1.37 s vs 1.22 s per jaccard_pairs run)
    kt = "__toks" if persist_tokens else None
    if persist_tokens:
        from stateful_spark_streaming_spark.caching import track_persist

        base = track_persist(base)
    q = TXT.quality_score(base, tokens_col="__toks").select(
        "doc_id", "quality_score"
    )
    if persist_quality:
        from stateful_spark_streaming_spark.caching import track_persist

        q = track_persist(q)
    filtered = base.join(q, "doc_id").filter(
        (F.col("lang") != "zh") & (F.col("quality_score") >= 0.55)
    )
    if eval_df is not None:
        cont = (
            DD.decontaminate(filtered, eval_df, k=decon_k, tokens_col=kt)
            .filter("contaminated")
            .select("doc_id")
        )
        filtered = filtered.join(cont, "doc_id", "left_anti")
    surv = DD.exact_dedup(filtered, tokens_col="__toks").select(
        F.col("survivor_doc_id").alias("doc_id")
    )
    d2 = filtered.join(surv, "doc_id")
    # content_distinct: exact_dedup immediately above guarantees one row
    # per distinct token array, so jaccard's r13 duplicate-mass grouping
    # would be the identity — skip its extra stages (the flag's contract)
    pairs = DD.jaccard_pairs(
        d2, threshold=0.6, tokens_col=kt, content_distinct=True
    )
    clusters = DD.dup_clusters(pairs)
    dupes = clusters.filter(F.col("doc_id") != F.col("cluster_rep")).select("doc_id")
    keep = d2.join(dupes, "doc_id", "left_anti")
    chunks = TXT.chunk_documents(
        keep, chunk_tokens=64, overlap=16, tokens_col="__toks"
    )
    split = TXT.hash_split(keep, tokens_col="__toks").select("doc_id", "split")
    return chunks.join(split, "doc_id").select(
        "doc_id", "chunk_id", "chunk_len", "split"
    )


# --------------------------------------------------------------------------
# Similarity search (north star: brute-force cosine top-k + IVF/LSH paths)
# --------------------------------------------------------------------------
from stateful_spark_streaming_spark.operators import similarity as SIM  # noqa: E402


@query(
    "cosine_topk",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 20),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             round(list_cosine_similarity(q.qv, e.embedding::DOUBLE[]), 6) AS cosine
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> q.query_id)
    SELECT query_id, rank, neighbor_id, cosine FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id ASC) AS rank
      FROM scored)
    WHERE rank <= 5
    """,
)
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 20)
    return SIM.cosine_topk_bruteforce(emb, queries_df, k=5)


@query(
    "hard_negatives",
    oracle="""
    WITH q AS (SELECT vec_id AS anchor_id, embedding::DOUBLE[] AS qv,
                      label AS anchor_label
               FROM embeddings WHERE vec_id < 20),
    scored AS (
      SELECT q.anchor_id, e.vec_id AS negative_id, e.label AS neg_label,
             round(list_cosine_similarity(q.qv, e.embedding::DOUBLE[]), 6)
                 AS cosine
      FROM embeddings e CROSS JOIN q
      WHERE e.label <> q.anchor_label)
    SELECT anchor_id, rank, negative_id, neg_label, cosine FROM (
      SELECT *, row_number() OVER (PARTITION BY anchor_id
                                   ORDER BY cosine DESC, negative_id ASC)
                AS rank
      FROM scored)
    WHERE rank <= 5
    """,
)
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining: per anchor, the top-5 most-similar vectors
    with a DIFFERENT label — the contrastive-training pair generator.
    Label inequality filters BEFORE the per-anchor window, so ranking
    state never holds positives."""
    emb = _t(spark, sf_dir, "embeddings")
    return SIM.hard_negatives(emb, emb.filter(F.col("vec_id") < 20), k=5)


@query(
    "label_centroids",
    oracle="""
    WITH u AS (SELECT label, embedding::DOUBLE[] AS e,
                      unnest(range(1, len(embedding) + 1)) AS dim
               FROM embeddings)
    SELECT label, CAST(dim AS INT) AS dim, round(avg(e[dim]), 6) AS mean_v
    FROM u GROUP BY label, dim
    """,
)
def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids as (label, dim, mean_v) — class
    prototypes for semantic bucketing; one (label, dim)-keyed shuffle with
    map-side partial averages."""
    return SIM.label_centroids(_t(spark, sf_dir, "embeddings"))


@query(
    "embedding_norm_stats",
    oracle="""
    SELECT label,
           count(*) AS n,
           round(avg(nrm), 6) AS mean_norm,
           round(min(nrm), 6) AS min_norm,
           round(max(nrm), 6) AS max_norm
    FROM (SELECT label,
                 sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
          FROM embeddings)
    GROUP BY label
    """,
)
def q_embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-table health check: per-label L2-norm distribution (in-row
    fold + one label-keyed aggregate)."""
    return SIM.embedding_norm_stats(_t(spark, sf_dir, "embeddings"))


@query(
    "cosine_near_pairs",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.4
    """,
)
def q_cosine_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SIM.cosine_near_pairs(_t(spark, sf_dir, "embeddings"), threshold=0.4)


@query(
    "embedding_dup_clusters",
    oracle="""
    WITH RECURSIVE p AS (
      SELECT a.vec_id AS ida, b.vec_id AS idb
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
                                         b.embedding::DOUBLE[]), 6) >= 0.4),
    e AS (SELECT ida AS a, idb AS b FROM p
          UNION SELECT idb, ida FROM p),
    r AS (SELECT a AS node, a AS m FROM e
          UNION
          SELECT r.node, e.b FROM r JOIN e ON r.m = e.a)
    SELECT node AS vec_id, min(m) AS cluster_rep FROM r GROUP BY node
    """,
)
def q_embedding_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC dedup: embedding-cosine near-pairs composed into duplicate
    clusters (connected components, min-id representative) — the
    embedding-space twin of dedup_clusters, i.e. the decision layer a
    semantic dedup pipeline actually acts on.  Exact pair stage at test SF
    (size-guarded); at 100 TB swap in cosine_near_pairs_lsh for candidate
    generation — dup_clusters consumes either.  Oracle: recursive
    transitive closure over the same pair predicate."""
    pairs = SIM.cosine_near_pairs(_t(spark, sf_dir, "embeddings"), threshold=0.4)
    return DD.dup_clusters(pairs, id_a="id_a", id_b="id_b").select(
        F.col("doc_id").alias("vec_id"), "cluster_rep"
    )


@query("cosine_topk_ivf")  # approximate by construction → rows-only check
def q_cosine_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index built ONCE per corpus (persisted: cell-partitioned parquet
    + centroid sidecar), probe-only at query time — the index lifecycle an
    ANN system actually has, instead of retraining per query."""
    import tempfile

    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 20)
    tag = _fixture_tag(sf_dir, "embeddings")
    idx_path = os.path.join(tempfile.gettempdir(), f"sss_ivf_idx_{tag}_c8")
    index = SIM.ivf_build_or_load(emb, idx_path, n_centroids=8)
    return SIM.ivf_topk(emb, queries_df, k=5, n_centroids=8, nprobe=2, index=index)


#: ONE source-level definition of the vocabulary oracle — the batch and
#: streaming twins share it (and text.vocab_rank shares the code-side tail)
_VOCAB_ORACLE = f"""
    WITH tk AS (SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS token
                FROM documents),
     per AS (SELECT token, doc_id, count(*) AS c FROM tk
             WHERE token <> '' GROUP BY token, doc_id),
     v AS (SELECT token, CAST(sum(c) AS BIGINT) AS term_count,
                  count(*) AS doc_freq
           FROM per GROUP BY token)
    SELECT token, term_count, doc_freq,
           row_number() OVER (ORDER BY term_count DESC, token) AS rank
    FROM v ORDER BY term_count DESC, token LIMIT 100
    """


@query(
    "streaming_vocab_topk",
    oracle=_VOCAB_ORACLE,
)
def q_streaming_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental vocabulary maintenance during ingest — streaming twin
    of vocab_topk (same oracle): per-batch exact partial aggregates
    appended by foreachBatch, merged by summation on read.  Exact because
    a doc's tokens never straddle micro-batches."""
    import os as _os

    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_vocab,
    )

    return run_streaming_vocab(
        spark, _os.path.join(sf_dir, "documents.parquet"), top_n=100
    )


@query(
    "sq8_encode",
    oracle="""
    WITH u AS (SELECT vec_id, embedding::DOUBLE[] AS e,
                      unnest(range(1, len(embedding) + 1)) AS dim
               FROM embeddings),
     st AS (SELECT dim, min(e[dim]) AS mn, max(e[dim]) AS mx FROM u GROUP BY dim),
     q AS (SELECT u.vec_id, u.dim,
                  CAST(CASE WHEN mx > mn
                       THEN round((e[dim] - mn) / (mx - mn) * 255, 0)
                       ELSE 0 END AS INT) AS c
           FROM u JOIN st USING (dim))
    SELECT vec_id,
           array_to_string(list(c ORDER BY dim), ',') AS codes
    FROM q GROUP BY vec_id
    """,
)
def q_sq8_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 embedding compression (4×: float32 → uint8 per dim,
    corpus min/max grid) — the quantizer simple enough to carry a FULL
    DuckDB oracle, complementing the trained-codebook PQ family which is
    rows-only by construction."""
    return SIM.sq8_encode(_t(spark, sf_dir, "embeddings"))


@query("pq_topk")  # approximate by construction → rows-only check
def q_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC top-k (Jégou et al. 2011): vectors
    compressed 32× to m=8 codes, queries probe via per-query lookup
    tables — the memory-bound half of the ANN scale story (IVF prunes
    WHICH vectors are read; PQ shrinks WHAT is held).  Recall vs the
    exact baseline is pytested; rows-only at the gate."""
    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 20)
    return SIM.pq_topk(emb, queries_df, k=5, m=8, ks=64)


@query("ivfpq_topk")  # approximate by construction → rows-only check
def q_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC: the faiss-style composition — IVF probes nprobe cells
    (reads nprobe/C of a cell-partitioned index at scale), PQ-ADC scores
    candidates via lookup tables.  Reuses the same persisted IVF index as
    cosine_topk_ivf; exactness anchored by the full-probe ≡ pq_topk
    pytest, recall pytested vs brute force."""
    import tempfile

    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 20)
    tag = _fixture_tag(sf_dir, "embeddings")
    idx_path = os.path.join(tempfile.gettempdir(), f"sss_ivf_idx_{tag}_c8")
    index = SIM.ivf_build_or_load(emb, idx_path, n_centroids=8)
    return SIM.ivfpq_topk(
        emb, queries_df, k=5, n_centroids=8, nprobe=2, m=8, ks=64, index=index
    )


@query("streaming_ivf_topk")  # approximate by construction → rows-only check
def q_streaming_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Micro-batch ANN serving: the query vectors arrive as a STREAM and
    probe the same persisted IVF index the batch query uses — streaming ≡
    batch for the same query set (asserted by pytest; approximate vs
    brute force by construction, hence rows-only here)."""
    import tempfile

    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_ivf_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    tag = _fixture_tag(sf_dir, "embeddings")
    idx_path = os.path.join(tempfile.gettempdir(), f"sss_ivf_idx_{tag}_c8")
    SIM.ivf_build_or_load(emb, idx_path, n_centroids=8)  # ensure built
    out = run_streaming_ivf_topk(
        spark,
        os.path.join(sf_dir, "embeddings.parquet"),
        idx_path,
        k=5,
        nprobe=2,
        query_filter=F.col("vec_id") < 20,
    )
    return out.select("query_id", "rank", "neighbor_id", "cosine")


# EXACT oracle for hyperplane LSH (r4, self-sizing r11): the planes are
# md5-derived ±1 Rademacher entries, so DuckDB re-derives the ENTIRE
# pipeline — plane-count sizing rule (params CTE, the same
# clamp(4..32, ceil(log2(n/8))) srp_plane_count computes from one corpus
# count(); 8 = the verify-budget default, see srp_plane_count's
# docstring), projections, sign patterns, banding (with the operator's 2000
# hot-bucket cap), candidate enumeration, exact-cosine verification.
# Sign bits are robust to summation-order FP differences because every
# product is EXACTLY ±v[d] (no multiply rounding); a flip would need
# |projection| within ~1e-16 of zero.  ceil(log2(·)) is FP-stable across
# engines: it only changes value at exact powers of two, where IEEE log2
# is exact.
@query(
    "cosine_near_pairs_lsh",
    oracle="""
    WITH grp AS (SELECT embedding, min(vec_id) AS rep,
                        list(vec_id ORDER BY vec_id) AS ids
                 FROM embeddings GROUP BY embedding),
    params AS (
      SELECT least(32, greatest(4,
               CAST(ceil(log2(count(*) / 8.0)) AS INT))) AS np
      FROM grp),
    pw AS (
      SELECT p, d,
             CASE WHEN ('0x' || substring(md5('hp:42:' || CAST(p AS VARCHAR)
                        || ':' || CAST(d AS VARCHAR)), 1, 1))::INT % 2 = 0
                  THEN 1.0 ELSE -1.0 END AS w
      FROM range(256) tp(p) CROSS JOIN range(64) td(d), params
      WHERE p < 8 * params.np),
    planes AS (SELECT p, list(w ORDER BY d) AS wl FROM pw GROUP BY p),
    proj AS (SELECT g.rep AS vec_id, pl.p,
                    list_inner_product(g.embedding::DOUBLE[], pl.wl) AS s
             FROM grp g CROSS JOIN planes pl),
    keys AS (SELECT vec_id, p // params.np AS band_id,
                    CAST(sum(CASE WHEN s > 0
                             THEN CAST(1 AS BIGINT) << (p % params.np)
                             ELSE 0 END) AS BIGINT) AS band_hash
             FROM proj, params GROUP BY vec_id, p // params.np),
    okb AS (SELECT band_id, band_hash FROM keys GROUP BY band_id, band_hash
            HAVING count(*) BETWEEN 2 AND 2000),
    cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
             FROM keys a
             JOIN keys b ON a.band_id = b.band_id
                        AND a.band_hash = b.band_hash
                        AND a.vec_id < b.vec_id
             JOIN okb ON okb.band_id = a.band_id
                     AND okb.band_hash = a.band_hash),
    rp AS (SELECT c.id_a, c.id_b,
           round(list_cosine_similarity(ga.embedding::DOUBLE[],
                                        gb.embedding::DOUBLE[]), 6) AS cosine
    FROM cand c
    JOIN grp ga ON ga.rep = c.id_a
    JOIN grp gb ON gb.rep = c.id_b
    WHERE round(list_cosine_similarity(ga.embedding::DOUBLE[],
                                       gb.embedding::DOUBLE[]), 6) >= 0.4)
    SELECT least(ta.ia, tb.ib) AS id_a, greatest(ta.ia, tb.ib) AS id_b,
           r.cosine
    FROM rp r
    JOIN grp ga ON ga.rep = r.id_a
    JOIN grp gb ON gb.rep = r.id_b,
         LATERAL unnest(ga.ids) AS ta(ia), LATERAL unnest(gb.ids) AS tb(ib)
    WHERE ta.ia <> tb.ib
    UNION ALL
    SELECT ta.ia AS id_a, tb.ib AS id_b,
           round(list_cosine_similarity(g.embedding::DOUBLE[],
                                        g.embedding::DOUBLE[]), 6) AS cosine
    FROM grp g,
         LATERAL unnest(g.ids) AS ta(ia), LATERAL unnest(g.ids) AS tb(ib)
    WHERE ta.ia < tb.ib
      AND list_inner_product(g.embedding::DOUBLE[], g.embedding::DOUBLE[]) > 0
      AND NOT isnan(list_inner_product(g.embedding::DOUBLE[],
                                       g.embedding::DOUBLE[]))
      AND round(list_cosine_similarity(g.embedding::DOUBLE[],
                                       g.embedding::DOUBLE[]), 6) >= 0.4
    """,
)
def q_cosine_near_pairs_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # n_planes deliberately NOT pinned: the operator self-sizes from the
    # corpus count (srp_plane_count — 6 planes at sf0.01, 8 at sf0.1, 18
    # at 2 M vectors, expected verify cost ~n_tables·4/vector at EVERY
    # size), so the gate hash-checks the sizing rule itself and the
    # benched shape can never again be the measured zero-recall-at-100×
    # tuning (r10 verdict) NOR the 128-rows/bucket shape whose ~1 B
    # candidate pairs at 2 M re-create the probe's verify-shuffle spill
    # death.  At τ≈0.4 this query is CANDIDATE GENERATION — exact
    # verification keeps precision at 1.0, recall is the S-curve's
    # (deliberately scale-thinning) tail; weak-similarity mining with
    # controlled recall belongs to IVF/centroid blocking
    # (cosine_topk_ivf), per the operator docstring.
    #
    # n_tables=8 is an EXPLICIT recall/cost trade, its guarantee named
    # by the S-curve (r11 verdict: no bare constant without one):
    # srp_table_recall(8, n_planes, 0.95) ≥ 0.97 at every gate/bench
    # depth (6-8 planes) and ~0.72 at the 2 M-vector depth (18 planes;
    # measured 0.725 empirical vs 0.719 analytic on planted cos-0.95
    # pairs at 2 M — ann_probe near_demo, SCALE.md r12) —
    # pinned by test_srp_table_count_names_the_benched_guarantee, with
    # the empirical planted-near-dup floor in
    # test_lsh_table_sizing_planted_near_duplicate_recall.  The
    # self-sized default (n_tables=None → srp_table_count) would pick
    # recall ≥ 0.9 at the dup similarity instead; this query's τ = 0.4
    # widening makes the capped-cost 8 the right call.
    return SIM.cosine_near_pairs_lsh(
        _t(spark, sf_dir, "embeddings"), threshold=0.4, n_tables=8
    )


# --------------------------------------------------------------------------
# Multimodal plumbing (north star: binary columns + mapInPandas kernels)
# --------------------------------------------------------------------------
from stateful_spark_streaming_spark.operators import multimodal as MM  # noqa: E402


@query(
    "multimodal_features",
    oracle="""
    WITH meta AS (
      SELECT doc_id AS image_id,
             CAST(n_chars % 64 + 32 AS INT) AS width,
             CAST(n_chars % 48 + 24 AS INT) AS height
      FROM documents),
     px AS (
      SELECT image_id, width, height,
             (image_id * 7 + 3 * (i % width) + 5 * (i // width)) % 256 AS r
      FROM meta, LATERAL unnest(range(0, width * height)) AS t(i))
    SELECT image_id, width, height,
           CAST(3 + length(CAST(width AS VARCHAR)) + 1
                  + length(CAST(height AS VARCHAR)) + 5
                  + 3 * width * height AS BIGINT) AS n_bytes,
           CAST(sum(r) AS BIGINT) AS r_sum,
           CAST(sum((r + 11) % 256) AS BIGINT) AS g_sum,
           CAST(sum((r + 22) % 256) AS BIGINT) AS b_sum
    FROM px GROUP BY image_id, width, height
    """,
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode a stored binary-column image table into EXACT per-image
    pixel statistics.  The synthetic PPM corpus is materialized to parquet
    once per (process, sf_dir) — the production shape: binaries live in
    storage and the decode kernel reads them from a scan, one Python
    stage, not a chained synth→decode pipeline (each mapInPandas tier
    spawns its own Python-worker pool; chaining two paid ~15 s of spin-up
    at sf0.1 for zero semantic value).

    FULL oracle since r5 (was rows-only): the outputs are integer pixel
    sums from the REAL decode, and the deterministic synth pattern
    ((id·7 + 3x + 5y + 11c) mod 256) lets DuckDB re-derive them exactly —
    so the gate now verifies the decode kernel's actual pixel arithmetic,
    not just its row count.  Float feature means stay pytest-pinned
    (golden checksum) since they can't cross engines bit-stably."""
    return MM.image_stats(_image_fixture(spark, sf_dir))


def _image_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthetic PPM corpus, materialized to parquet once per
    (process, sf_dir) — binaries live in storage and decode kernels read
    them from a scan (one Python stage, not a chained synth→decode
    pipeline).  Small fixture files bin-pack into one 128 MB scan split —
    re-spread so decode kernels run wide (a real 100 TB table has many
    splits)."""
    return _materialized_fixture(
        spark, sf_dir, "documents", f"ssss_images_{_IMAGES_SALT}",
        lambda: MM.synthesize_image_table(spark, _t(spark, sf_dir, "documents")),
    ).repartition(spark.sparkContext.defaultParallelism)


#: bump when synthesize_audio_table's sample formula or clip sizing changes
_AUDIO_SALT = "wav1"


def _audio_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthetic WAV-PCM16 corpus, materialized once per (process,
    sf_dir) — same production shape as ``_image_fixture``: binaries live
    in storage, decode kernels read them from a scan."""
    return _materialized_fixture(
        spark, sf_dir, "documents", f"ssss_audio_{_AUDIO_SALT}",
        lambda: MM.synthesize_audio_table(spark, _t(spark, sf_dir, "documents")),
    ).repartition(spark.sparkContext.defaultParallelism)


# Shared sample-model CTEs: clip n = n_chars % 2000 + 400 samples at
# 8 kHz; sample s(t) = (id·7 + t·13) mod 4096 − 2048 (int16-ranged).
# The previous sample s(t−1) is re-derived arithmetically instead of a
# lag window — cheaper, and keeps the oracle window-free.
_AUDIO_SAMPLE_CTES = """
    meta AS (
      SELECT doc_id AS audio_id,
             CAST(n_chars % 2000 + 400 AS BIGINT) AS n
      FROM documents),
    samp AS (
      SELECT audio_id, n, t,
             (audio_id*7 + t*13) % 4096 - 2048 AS s,
             CASE WHEN t > 0
                  THEN (audio_id*7 + (t-1)*13) % 4096 - 2048 END AS sp
      FROM meta, LATERAL unnest(range(0, n)) AS ts(t))
"""


#: bump when the JSONL fixture's corruption rule or row shape changes
_JSONL_SALT = "jl1"


def _jsonl_docs_fixture(spark: SparkSession, sf_dir: str) -> str:
    """A JSON-lines rendering of the documents table with a DETERMINISTIC
    ~5% of lines corrupted (closing brace dropped when the doc's md5
    lands in residue 0 mod 20) — the feed-rot shape `read_jsonl` exists
    to measure.  Same atomic materialize-once protocol as
    `_materialized_fixture` (build in a unique dir, rename into place),
    but a TEXT dataset, so this returns the PATH for the JSON reader."""
    import shutil
    import tempfile

    key = _fixture_tag(sf_dir, "documents")
    path = os.path.join(tempfile.gettempdir(), f"ssss_jsonl_{_JSONL_SALT}_{key}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        line = F.to_json(F.struct("doc_id", "source", "n_chars"))
        corrupt = (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("long") % 20 == 0
        )
        df = (
            _t(spark, sf_dir, "documents")
            .withColumn("l", line)
            .select(
                F.when(corrupt, F.expr("substring(l, 1, length(l) - 1)"))
                .otherwise(F.col("l"))
                .alias("value")
            )
        )
        tmp = tempfile.mkdtemp(prefix=f"ssss_jsonl_{key}.build_")
        staging = os.path.join(tmp, "data")
        df.write.mode("overwrite").text(staging)
        try:
            os.rename(staging, path)
        except OSError:
            if not os.path.exists(os.path.join(path, "_SUCCESS")):
                shutil.rmtree(path, ignore_errors=True)
                try:
                    os.rename(staging, path)
                except OSError:
                    pass  # raced — winner's fixture is complete
        shutil.rmtree(tmp, ignore_errors=True)
    return path


@query(
    "jsonl_ingest_stats",
    oracle="""
    WITH d AS (
      SELECT source, n_chars,
             ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               % 20 = 0 AS corrupt
      FROM documents)
    SELECT CASE WHEN corrupt THEN NULL ELSE source END AS source,
           COUNT(*) AS n_rows,
           CAST(COALESCE(SUM(CASE WHEN corrupt THEN NULL ELSE n_chars END),
                         0) AS BIGINT) AS sum_n_chars
    FROM d GROUP BY 1
    """,
)
def q_jsonl_ingest_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-tolerant JSONL ingestion (`sources.read_jsonl`): explicit
    schema (never inference — an extra 100 TB pass to guess what the
    caller knows), PERMISSIVE corrupt capture, and per-source row/char
    accounting where the parse failures surface as the NULL-source
    bucket — feed rot measured, not fatal and not silently dropped.
    FULL oracle: the fixture corrupts a deterministic md5-residue slice
    of the documents table, so DuckDB re-derives exactly which rows the
    Spark JSON parser must reject."""
    from stateful_spark_streaming_spark.sources.tables import read_jsonl

    df = read_jsonl(
        spark,
        _jsonl_docs_fixture(spark, sf_dir),
        "doc_id long, source string, n_chars long",
    )
    return df.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.coalesce(F.sum("n_chars"), F.lit(0)).alias("sum_n_chars"),
    )


#: bump when synthesize_video_table's frame formula or sizing changes
_VIDEO_SALT = "vid1"


def _video_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthetic concatenated-PPM video corpus, materialized once per
    (process, sf_dir) — completes the image/audio/video binary-column
    triple with the same storage shape."""
    return _materialized_fixture(
        spark, sf_dir, "documents", f"ssss_video_{_VIDEO_SALT}",
        lambda: MM.synthesize_video_table(spark, _t(spark, sf_dir, "documents")),
    ).repartition(spark.sparkContext.defaultParallelism)


@query(
    "video_frame_stats",
    oracle="""
    WITH meta AS (
      SELECT doc_id AS video_id, CAST(n_chars % 8 + 2 AS BIGINT) AS nf
      FROM documents),
    fr AS (
      SELECT video_id, CAST(t AS INT) AS frame_idx
      FROM meta, LATERAL unnest(range(0, nf)) AS ts(t)
      WHERE t % 2 = 0),
    px AS (
      SELECT video_id, frame_idx,
             ((video_id*7 + frame_idx*13 + (i % 16)*3 + (i // 16)*5) % 256
            + (video_id*7 + frame_idx*13 + (i % 16)*3 + (i // 16)*5 + 11) % 256
            + (video_id*7 + frame_idx*13 + (i % 16)*3 + (i // 16)*5 + 22) % 256)
               AS s
      FROM fr, LATERAL unnest(range(0, 192)) AS t2(i))
    SELECT video_id, frame_idx,
           CAST(16 AS INT) AS width, CAST(12 AS INT) AS height,
           CAST(sum(s) AS BIGINT) AS rgb_sum
    FROM px GROUP BY video_id, frame_idx
    """,
)
def q_video_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sample a stored binary VIDEO column (concatenated-PPM
    stream) and emit EXACT integer per-sampled-frame statistics — the
    last leg of the image/audio/video multimodal triple, now
    catalog-gated like its siblings.  Parse + every-2nd-frame sampling +
    pixel sums run in ONE Arrow kernel (chained mapInPandas tiers each
    spawn a worker pool; the single stage avoids that and the
    frame-blob Arrow transfer).  FULL oracle: DuckDB re-derives the
    sampled frames and their channel sums from the synthetic pixel
    formula."""
    return MM.video_frame_stats(_video_fixture(spark, sf_dir), every_n=2)


@query(
    "audio_stats",
    oracle=f"""
    WITH {_AUDIO_SAMPLE_CTES}
    SELECT audio_id,
           CAST(8000 AS INT) AS sample_rate,
           CAST(max(n) AS BIGINT) AS n_samples,
           CAST(44 + 2*max(n) AS BIGINT) AS n_bytes,
           CAST(sum(s) AS BIGINT) AS sum_samples,
           CAST(sum(abs(s)) AS BIGINT) AS sum_abs,
           CAST(max(abs(s)) AS BIGINT) AS peak_abs,
           CAST(count(*) FILTER (WHERE sp IS NOT NULL
                                   AND (s < 0) <> (sp < 0)) AS BIGINT)
               AS n_zero_cross
    FROM samp GROUP BY audio_id
    """,
)
def q_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode a stored binary-column AUDIO table (WAV-PCM16) into EXACT
    integer per-clip statistics — sample/byte counts, int64 sample and
    |sample| sums, peak amplitude, zero-crossing count.  Completes the
    multimodal column story (r11 verdict #7): image had the PPM decode
    path at full-oracle strength; this is the audio sibling, same design
    (real RIFF/WAVE parse in an Arrow kernel, loud NotImplementedError at
    the codec boundary where ffmpeg/torchaudio would slot in, blob column
    projected only into the decode stage).  FULL oracle: every output is
    integer arithmetic over the synthetic sample formula, so DuckDB
    re-derives the decode exactly."""
    return MM.audio_stats(_audio_fixture(spark, sf_dir))


@query(
    "audio_frame_energy",
    oracle=f"""
    WITH {_AUDIO_SAMPLE_CTES}
    SELECT audio_id,
           t // 256 AS frame_idx,
           CAST(sum(s*s) AS BIGINT) AS energy,
           CAST(max(abs(s)) AS BIGINT) AS peak_abs
    FROM samp
    WHERE t < (n // 256) * 256
    GROUP BY audio_id, t // 256
    """,
)
def q_audio_frame_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-length frame windowing over decoded audio: non-overlapping
    256-sample frames with int64 energy (sum of squares) and peak — the
    primitive under VAD / silence trimming / loudness normalization, and
    the fixed-shape-rows-out-of-variable-blobs pattern
    (``sample_video_frames``'s audio analog).  Trailing partial frames
    are dropped so energies are comparable.  FULL oracle: integer frame
    aggregates re-derived from the sample formula."""
    return MM.audio_frame_energy(_audio_fixture(spark, sf_dir), frame_len=256)


@query(
    "track_membership",
    oracle="""
    WITH probe AS (SELECT min(ts) AS p FROM events)
    SELECT user_id,
           bool_or(ts = (SELECT p FROM probe)) AS contains_probe,
           CAST(count(*) FILTER (WHERE ts <> (SELECT p FROM probe)) AS BIGINT)
               AS n_after_remove,
           (count(*) FILTER (WHERE ts <> (SELECT p FROM probe)) = 0)
               AS is_empty_after_remove
    FROM events GROUP BY user_id
    """,
)
def q_track_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7 membership algebra: contains / remove / isEmpty composed in one
    result — probe = the table's earliest event time, so at least one track
    answers true.  Reference: FeatureTrack.scala:23-49."""
    ev = _t(spark, sf_dir, "events")
    probe = ev.agg(F.min("ts").alias("__probe"))
    evp = ev.crossJoin(F.broadcast(probe))  # scalar broadcast, no driver collect
    contains = TR.track_contains(evp, "user_id", "ts", F.col("__probe")).select(
        "user_id", F.col("contains_at").alias("contains_probe")
    )
    removed = TR.track_remove(evp, "ts", F.col("__probe"))
    counts = TR.track_counts(removed, "user_id")
    empty = TR.track_is_empty(removed, "user_id", ev)
    return (
        contains.join(counts, "user_id", "left")
        .join(empty, "user_id")
        .select(
            "user_id",
            "contains_probe",
            F.coalesce("track_count", F.lit(0)).alias("n_after_remove"),
            F.col("is_empty").alias("is_empty_after_remove"),
        )
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


@query(
    "training_pipeline_full",
    oracle="WITH RECURSIVE "
    + _tp_base_sql(" WHERE doc_id % 97 <> 0")
    + ",\n    " + _TP_DECON_SQL
    + ",\n    " + _tp_tail_sql("clean"),
)
def q_training_pipeline_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship chain WITH benchmark decontamination in line — the
    complete corpus build a pretraining run actually performs:

      quality/lang filter → DECONTAMINATE (drop any train doc sharing a
      5-gram with the eval suite, broadcast semi probe) → exact dedup
      → near-dup clustering (keep reps) → 64/16 chunking → 90/10 split

    Same contract and tokenize-once shape as ``training_pipeline`` (the
    shared ``_training_pipeline_chain``); the full-chain oracle re-derives
    every stage including the contamination set."""
    docs = _t(spark, sf_dir, "documents")
    eval_df = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    return _training_pipeline_chain(train, eval_df=eval_df, decon_k=5)


from stateful_spark_streaming_spark.operators import layout as LAY  # noqa: E402


def _quant_sql(col: str, lo: float, hi: float, bits: int) -> str:
    cells = 1 << bits
    return (
        f"CAST(least({cells - 1}, greatest(0, CAST(floor((({col}) - {lo}) "
        f"/ {hi - lo} * {cells}) AS BIGINT))) AS BIGINT)"
    )


def _zorder_sql(c1: str, c2: str, bits: int) -> str:
    terms = []
    for b in range(bits):
        terms.append(f"((({c1} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({c2} >> {b}) & 1) << {2 * b + 1})")
    return " | ".join(terms)


@query(
    "zorder_key",
    oracle=f"""
    WITH q AS (SELECT event_id,
                      {_quant_sql('user_id', 0, 2048, 10)} AS q_user,
                      {_quant_sql('value', 0, 512, 10)} AS q_val
               FROM events)
    SELECT event_id, q_user, q_val,
           {_zorder_sql('q_user', 'q_val', 10)} AS zkey
    FROM q
    """,
)
def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton/Z-order clustering key over (user_id, value) — the
    write-side layout primitive that makes BOTH columns' parquet footer
    stats tight (Delta/Iceberg OPTIMIZE ZORDER BY, as plain column
    algebra).  Deterministic integer bit interleaving → exact oracle;
    the pruning dominance itself is asserted from footer stats in
    pytest."""
    ev = _t(spark, sf_dir, "events")
    q = ev.select(
        "event_id",
        LAY.quantize(F.col("user_id"), 0, 2048, 10).alias("q_user"),
        LAY.quantize(F.col("value"), 0, 512, 10).alias("q_val"),
    )
    return q.select(
        "event_id",
        "q_user",
        "q_val",
        LAY.zorder_key(F.col("q_user"), F.col("q_val"), 10).alias("zkey"),
    )


@query(
    "bucketed_join_revenue",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c_custkey, c_mktsegment
    """,
)
def q_bucketed_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHUFFLE-FREE big-big join via bucketed layout: orders and customer
    are materialized once as co-bucketed parquet tables on the join key
    (`ensure_bucketed_table`, cached per corpus fingerprint like the IVF
    index), then joined + aggregated with ZERO exchanges — both scans
    report HashPartitioning, the sort-merge join runs on co-located
    buckets, and the custkey-grouped aggregate reuses the same
    partitioning (plan-audited: 0 Exchange, SMJ present).  The `merge`
    hint pins the 100×-scale plan: at test SF Spark would broadcast
    customer, which is exactly the plan that DOESN'T survive a 100×
    scale-up of the dim side."""
    from stateful_spark_streaming_spark.operators.layout import (
        ensure_bucketed_table,
    )

    tag_o = _fixture_tag(sf_dir, "orders")
    tag_c = _fixture_tag(sf_dir, "customer")
    ot = ensure_bucketed_table(
        spark, _t(spark, sf_dir, "orders"), f"sss_bkt_orders_{tag_o}",
        "o_custkey", 8, f"/tmp/sss_bkt_{tag_o}/orders",
    )
    ct = ensure_bucketed_table(
        spark, _t(spark, sf_dir, "customer"), f"sss_bkt_customer_{tag_c}",
        "c_custkey", 8, f"/tmp/sss_bkt_{tag_c}/customer",
    )
    o, c = spark.table(ot), spark.table(ct)
    return (
        o.hint("merge")
        .join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


@query(
    "track_rolling_stats",
    oracle="""
    SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, value,
           round(avg(value) OVER w, 4) AS roll_avg,
           round(max(value) OVER w, 4) AS roll_max,
           count(*) OVER w AS roll_n
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """,
)
def q_track_rolling_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key rolling mean/max/count over the last 5 events — the moving-
    average feature-engineering shape on the reference's track key (one
    exchange, one sorted window pass)."""
    return TR.track_rolling_stats(_t(spark, sf_dir, "events"), frame=4)


@query(
    "funnel_steps",
    oracle="""
    WITH t1 AS (SELECT user_id, min(ts) FILTER (WHERE event_type = 'view') AS tv
                FROM events GROUP BY user_id),
     t2 AS (SELECT e.user_id, min(e.ts) AS tc FROM events e JOIN t1 USING (user_id)
            WHERE e.event_type = 'click' AND e.ts > t1.tv GROUP BY e.user_id),
     t3 AS (SELECT e.user_id, min(e.ts) AS tp FROM events e JOIN t2 USING (user_id)
            WHERE e.event_type = 'purchase' AND e.ts > t2.tc GROUP BY e.user_id)
    SELECT t1.user_id,
           epoch_ms(tv) AS t_view_ms, epoch_ms(tc) AS t_click_ms,
           epoch_ms(tp) AS t_purchase_ms,
           CASE WHEN tp IS NOT NULL THEN 3 WHEN tc IS NOT NULL THEN 2
                WHEN tv IS NOT NULL THEN 1 ELSE 0 END AS steps_completed
    FROM t1 LEFT JOIN t2 USING (user_id) LEFT JOIN t3 USING (user_id)
    """,
)
def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential conversion funnel view→click→purchase: step N counts
    only if strictly after step N-1 — chained conditional window minima
    over ONE key exchange (the join formulation re-shuffles the event
    table once per step; the oracle uses it, the operator doesn't)."""
    from stateful_spark_streaming_spark.operators import temporal as TMP

    return TMP.funnel_steps(_t(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# Corpus-statistics / keyword / span-dedup operators (round-4 additions)
# --------------------------------------------------------------------------


@query(
    "vocab_topk",
    oracle=_VOCAB_ORACLE,
)
def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-100 tokens by occurrence count with document
    frequency and deterministic rank — the tokenizer-training precursor."""
    return TXT.vocab_topk(_t(spark, sf_dir, "documents"), top_n=100)


#: ONE source-level definition of each LM-scoring oracle — the batch and
#: streaming-ingest twins share them (and the ``*_score_from_counts``
#: tails share the code side), mirroring the _VOCAB_ORACLE pattern
_UNIGRAM_ORACLE = f"""
    WITH tk AS (SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS token
                FROM documents),
     occ AS (SELECT doc_id, token FROM tk WHERE token <> ''),
     v AS (SELECT token, count(*) AS term_count FROM occ GROUP BY token),
     tot AS (SELECT sum(term_count) AS corpus_tokens FROM v),
     s AS (SELECT occ.doc_id, ln(v.term_count::DOUBLE / tot.corpus_tokens) AS lp
           FROM occ JOIN v USING (token) CROSS JOIN tot)
    SELECT doc_id, count(*) AS n_tokens,
           round(avg(lp), 4) AS mean_logprob,
           round(min(lp), 4) AS min_logprob
    FROM s GROUP BY doc_id
    """

_BIGRAM_ORACLE = f"""
    WITH tk AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
     occ AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
             FROM tk, unnest(range(1, len(toks))) AS r(i)
             WHERE len(toks) >= 2),
     vb AS (SELECT w1, w2, count(*) AS cb FROM occ GROUP BY w1, w2),
     vh AS (SELECT w1, CAST(sum(cb) AS BIGINT) AS ch FROM vb GROUP BY w1),
     s AS (SELECT occ.doc_id, ln(vb.cb::DOUBLE / vh.ch) AS lp
           FROM occ JOIN vb USING (w1, w2) JOIN vh USING (w1))
    SELECT doc_id, count(*) AS n_bigrams,
           round(avg(lp), 4) AS mean_logprob,
           round(min(lp), 4) AS min_logprob
    FROM s GROUP BY doc_id
    """


@query("unigram_logprob", oracle=_UNIGRAM_ORACLE)
def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality scoring: per-doc mean/min log-probability under
    the corpus's own unigram MLE (classifier-free perplexity filtering at
    unigram order)."""
    return TXT.unigram_logprob(_t(spark, sf_dir, "documents"))


@query("bigram_logprob", oracle=_BIGRAM_ORACLE)
def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-2 LM quality scoring: per-doc mean/min log P(w|prev) under
    the corpus's own bigram MLE — flags rare TRANSITIONS (templated or
    shuffled text) that the unigram profile misses."""
    return TXT.bigram_logprob(_t(spark, sf_dir, "documents"))


@retired_query(
    "streaming_unigram_logprob",
    oracle=_UNIGRAM_ORACLE,
    subsumed_by="streaming_bigram_logprob (same run_streaming_lm_logprob "
    "partial-fold machinery, order=2) + unigram_logprob (batch oracle)",
)
def q_streaming_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time unigram-LM scoring — streaming twin of unigram_logprob
    (same oracle): per-batch (doc, token, c) count partials appended by
    foreachBatch, scored on read through the shared counts tail.  Exact
    because a doc's tokens never straddle micro-batches."""
    import os as _os

    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_lm_logprob,
    )

    return run_streaming_lm_logprob(
        spark, _os.path.join(sf_dir, "documents.parquet"), order=1
    )


@query("streaming_bigram_logprob", oracle=_BIGRAM_ORACLE)
def q_streaming_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time bigram-LM scoring — streaming twin of bigram_logprob
    (same oracle): per-batch (doc, w1, w2, c) count partials appended by
    foreachBatch, scored on read through the shared counts tail."""
    import os as _os

    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_lm_logprob,
    )

    return run_streaming_lm_logprob(
        spark, _os.path.join(sf_dir, "documents.parquet"), order=2
    )


#: single source of truth for the catalog's Gopher thresholds — fed to
#: BOTH the operator call and the oracle f-string below, and the stop-word
#: list interpolates from the operator module, so neither can go stale
_GOPHER = dict(
    min_words=30, max_words=100_000, min_mean_word_len=3.0,
    max_mean_word_len=10.0, max_symbol_ratio=0.1, min_alpha_frac=0.8,
    min_stop_hits=1,
)
_GOPHER_STOPS_SQL = "[" + ",".join(f"'{w}'" for w in TXT.GOPHER_STOPWORDS) + "]"
_GOPHER_KEEP_SQL = (
    f"(n_words BETWEEN {_GOPHER['min_words']} AND {_GOPHER['max_words']})"
    f" AND (mean_word_len BETWEEN {_GOPHER['min_mean_word_len']}"
    f" AND {_GOPHER['max_mean_word_len']})"
    f" AND (symbol_ratio <= {_GOPHER['max_symbol_ratio']})"
    f" AND (alpha_frac >= {_GOPHER['min_alpha_frac']})"
    f" AND (stop_hits >= {_GOPHER['min_stop_hits']})"
)


@query(
    "gopher_quality_filter",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, {_TOKS_SQL} AS toks, {_NORM_SQL} AS norm, text
      FROM documents),
     sig AS (
      SELECT doc_id,
             CAST(len(toks) AS INT) AS n_words,
             round(length(replace(norm, ' ', ''))
                   / greatest(len(toks), 1), 4) AS mean_word_len,
             round(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))
                   / CAST(greatest(length(text), 1) AS DOUBLE), 4)
                 AS symbol_ratio,
             round(len(list_filter(toks, w -> regexp_matches(w, '[a-z]')))
                   / CAST(greatest(len(toks), 1) AS DOUBLE), 4) AS alpha_frac,
             CAST(len(list_intersect(list_distinct(toks),
                  {_GOPHER_STOPS_SQL})) AS INT)
                 AS stop_hits
      FROM base)
    SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_frac,
           stop_hits,
           (n_words BETWEEN {_GOPHER['min_words']} AND {_GOPHER['max_words']})
               AS ok_words,
           (mean_word_len BETWEEN {_GOPHER['min_mean_word_len']}
               AND {_GOPHER['max_mean_word_len']}) AS ok_word_len,
           (symbol_ratio <= {_GOPHER['max_symbol_ratio']}) AS ok_symbols,
           (alpha_frac >= {_GOPHER['min_alpha_frac']}) AS ok_alpha,
           (stop_hits >= {_GOPHER['min_stop_hits']}) AS ok_stopwords,
           ({_GOPHER_KEEP_SQL}) AS keep
    FROM sig
    """,
)
def q_gopher_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher rule-based document filter (Rae et al. 2021 §A1.1):
    word-count and mean-word-length bands, symbol-ratio cap, alphabetic
    fraction floor, stop-word containment — per-rule verdicts plus the
    composed keep, map-only."""
    return TXT.gopher_quality_filter(_t(spark, sf_dir, "documents"), **_GOPHER)


@query(
    "tfidf_topterms",
    oracle=f"""
    WITH tk AS (SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS token
                FROM documents),
     per AS (SELECT doc_id, token, count(*) AS tf FROM tk
             WHERE token <> '' GROUP BY doc_id, token),
     wdf AS (SELECT *, count(*) OVER (PARTITION BY token) AS df FROM per),
     n AS (SELECT count(*) AS n_docs FROM documents),
     sc AS (SELECT doc_id, token, tf, df,
                   round(tf::DOUBLE * n_docs / df, 4) AS tfidf
            FROM wdf CROSS JOIN n
            WHERE df <= 0.8 * n_docs)
    SELECT doc_id, token, tf, df, tfidf, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, token) AS rank
      FROM sc) WHERE rank <= 3
    """,
)
def q_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc keyword extraction: top-3 terms by raw-IDF TF-IDF
    (tf * N / df, no log — exact cross-engine rational arithmetic).
    max_df_frac=0.8 because the synthetic corpus's vocabulary is ~30
    near-universal tokens (df ≈ 0.77·N) — the real-world 0.5 default
    would leave almost every document keyword-less here."""
    return TXT.tfidf_topterms(
        _t(spark, sf_dir, "documents"), top_k=3, max_df_frac=0.8
    )


#: ONE source-level definition of the data-card oracle — the batch and
#: streaming-ingest twins share it
_CORPUS_REPORT_ORACLE = f"""
    WITH base AS (
      SELECT doc_id, source, lang,
             {_TOKS_SQL} AS toks, {_NORM_SQL} AS norm,
             CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS INT) AS n_punct,
             CAST(length(text) AS INT) AS n_char
      FROM documents),
     scored AS (
      SELECT doc_id, source, lang, CAST(len(toks) AS INT) AS n_tokens,
             round(least(len(toks) / 64.0, 1.0) * 0.4
                 + (1.0 - least(n_punct / CAST(greatest(n_char, 1) AS DOUBLE), 1.0)) * 0.2
                 + least(len(list_intersect(list_distinct(toks),
                       ['the','and','of','to','in','is','that','for'])) / 4.0, 1.0) * 0.2
                 + round(len(list_distinct(toks))
                         / CAST(greatest(len(toks), 1) AS DOUBLE), 4) * 0.2,
                 4) AS q,
             md5(norm) AS fp
      FROM base),
     dup AS (SELECT doc_id,
                    CASE WHEN doc_id <> min(doc_id) OVER (PARTITION BY fp)
                         THEN 1 ELSE 0 END AS is_dup
             FROM scored)
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           round(avg(q), 4) AS avg_quality,
           CAST(sum(is_dup) AS BIGINT) AS n_exact_dup,
           CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en
    FROM scored JOIN dup USING (doc_id)
    GROUP BY source
    """


@query("corpus_report", oracle=_CORPUS_REPORT_ORACLE)
def q_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus data card: volume, mean quality, exact-dup count
    (corpus-wide content groups), language mix — the dataset-release
    summary, composed from the per-doc signal operators."""
    return TXT.corpus_report(_t(spark, sf_dir, "documents"))


@query("streaming_corpus_report", oracle=_CORPUS_REPORT_ORACLE)
def q_streaming_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental data card at INGEST — streaming twin of corpus_report
    (same oracle): per-batch additive scalar partials plus compact
    content-fp partials; the cross-batch exact-dup count derives on read
    from the corpus-wide min-doc per fingerprint."""
    import os as _os

    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_corpus_report,
    )

    return run_streaming_corpus_report(
        spark, _os.path.join(sf_dir, "documents.parquet")
    )


#: Per-doc quality score as one SQL CTE chain — lifted verbatim from the
#: quality_score oracle so the histogram family binning sits on the exact
#: same double in both engines.
_SCORED_Q_CTES = f"""
    WITH base AS (
      SELECT doc_id, source,
             {_TOKS_SQL} AS toks,
             CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS INT) AS n_punct,
             CAST(length(text) AS INT) AS n_char
      FROM documents),
     scored AS (
      SELECT doc_id, source,
             round(least(len(toks) / 64.0, 1.0) * 0.4
                 + (1.0 - least(n_punct / CAST(greatest(n_char, 1) AS DOUBLE), 1.0)) * 0.2
                 + least(len(list_intersect(list_distinct(toks),
                       ['the','and','of','to','in','is','that','for'])) / 4.0, 1.0) * 0.2
                 + round(len(list_distinct(toks))
                         / CAST(greatest(len(toks), 1) AS DOUBLE), 4) * 0.2,
                 4) AS q
      FROM base),
     hist AS (
      SELECT source,
             least(CAST((CAST(round(q * 10000) AS BIGINT) * 20) // 10000 AS INT), 19) AS bin,
             CAST(count(*) AS BIGINT) AS n
      FROM scored WHERE q IS NOT NULL
      GROUP BY source, bin)
"""

#: ONE source-level definition of the quality-histogram oracle — the
#: batch operator and the streaming-ingest twin share it.  Binning and
#: edges mirror stats.scaled_bin / stats.histogram_finalize in pure
#: integer arithmetic: bp = round(q·10⁴); bin = bp·n_bins div 10⁴ capped
#: at n_bins−1; lower edge = ceil(bin·10⁴ / n_bins).
_QUALITY_HIST_ORACLE = (
    _SCORED_Q_CTES
    + """
    SELECT source, bin,
           CAST((bin * 10000 + 19) // 20 AS INT) AS bin_lo_bp,
           ((bin * 10000 + 19) // 20) / 10000.0 AS bin_lo,
           n
    FROM hist
    """
)


@query("quality_histogram", oracle=_QUALITY_HIST_ORACLE)
def q_quality_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality-score distribution as an exact fixed-width
    histogram (20 bins over [0,1], scaled-integer binning — the
    mergeable, cross-engine-deterministic replacement for exact
    percentiles at corpus scale; see operators/stats.py module doc).
    Partial-aggregatable: the shuffle carries ≤ sources×20 rows per task
    regardless of document volume."""
    from stateful_spark_streaming_spark.operators import stats as ST

    scored = TXT.quality_score(
        _t(spark, sf_dir, "documents"), keep_cols=("source",)
    )
    return ST.fixed_width_histogram(
        scored, F.col("quality_score"), ("source",), n_bins=20
    )


@query("streaming_quality_histogram", oracle=_QUALITY_HIST_ORACLE)
def q_streaming_quality_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-distribution tracking at INGEST — streaming twin of
    quality_histogram (same oracle): per-batch exact bin counts append as
    batch-stamped additive partials; the read side dedupes replays, sums,
    and runs the same histogram_finalize tail."""
    import os as _os

    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_quality_histogram,
    )

    return run_streaming_quality_histogram(
        spark, _os.path.join(sf_dir, "documents.parquet")
    )


@query(
    "quality_quantiles",
    oracle=_SCORED_Q_CTES
    + """,
     cum AS (
      SELECT source, bin,
             CAST((bin * 10000 + 19) // 20 AS INT) AS bin_lo_bp,
             sum(n) OVER (PARTITION BY source ORDER BY bin) AS cum,
             sum(n) OVER (PARTITION BY source) AS total
      FROM hist)
    SELECT source,
           CAST(max(total) AS BIGINT) AS total,
           min(CASE WHEN cum >= (total * 2500 + 9999) // 10000 THEN bin_lo_bp END) / 10000.0 AS p25,
           min(CASE WHEN cum >= (total * 5000 + 9999) // 10000 THEN bin_lo_bp END) / 10000.0 AS p50,
           min(CASE WHEN cum >= (total * 7500 + 9999) // 10000 THEN bin_lo_bp END) / 10000.0 AS p75,
           min(CASE WHEN cum >= (total * 9500 + 9999) // 10000 THEN bin_lo_bp END) / 10000.0 AS p95
    FROM cum GROUP BY source
    """,
)
def q_quality_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality quantiles (p25/p50/p75/p95) answered FROM the
    histogram with integer-rank arithmetic — the scale-safe shape of
    value_percentiles' exact-percentile answer: no global sort, the only
    window runs over ≤ n_bins aggregated rows per group, and resolution
    (one bin width) is stated up front instead of a sketch's
    data-dependent error."""
    from stateful_spark_streaming_spark.operators import stats as ST

    scored = TXT.quality_score(
        _t(spark, sf_dir, "documents"), keep_cols=("source",)
    )
    hist = ST.fixed_width_histogram(
        scored, F.col("quality_score"), ("source",), n_bins=20
    )
    return ST.histogram_quantiles(hist, ("source",))


@retired_query(
    "streaming_quality_quantiles",
    oracle=ORACLES["quality_quantiles"],
    subsumed_by="streaming_quality_histogram (the ONLY stream state it "
    "maintains) + quality_quantiles (the histogram_quantiles read tail)",
)
def q_streaming_quality_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time quantile tracking — streaming twin of quality_quantiles
    (same oracle): the mergeable histogram is the ONLY state the stream
    maintains (additive bin-count partials), and the quantiles derive on
    read by running the same histogram_quantiles tail over the merged
    log.  This is the whole point of the histogram family: exact
    percentiles don't compose across micro-batches, exact bin counts do."""
    import os as _os

    from stateful_spark_streaming_spark.operators import stats as ST
    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_quality_histogram,
    )

    hist = run_streaming_quality_histogram(
        spark, _os.path.join(sf_dir, "documents.parquet")
    )
    return ST.histogram_quantiles(hist, ("source",))


#: ONE source-level definition of the count-min heavy-hitter oracle —
#: batch and streaming-ingest twins share it.  The md5-derived bucket
#: hash makes every counter and estimate EXACTLY reproducible in DuckDB
#: (the MinHash/SimHash trick applied to a frequency sketch).
_CMS_ORACLE = f"""
    WITH tk AS (SELECT unnest(string_split({_NORM_SQL}, ' ')) AS token
                FROM documents),
     o AS (SELECT token FROM tk WHERE token <> ''),
     pr AS (SELECT token, r,
                   CAST(('0x' || substring(md5('cms' || CAST(r AS VARCHAR) || ':' || token), 1, 15))::BIGINT % 1024 AS INT) AS b
            FROM o CROSS JOIN (SELECT unnest(range(4)) AS r) rr),
     counters AS (SELECT r, b, count(*) AS n FROM pr GROUP BY r, b),
     cand AS (SELECT DISTINCT token FROM o),
     cpr AS (SELECT token, r,
                    CAST(('0x' || substring(md5('cms' || CAST(r AS VARCHAR) || ':' || token), 1, 15))::BIGINT % 1024 AS INT) AS b
             FROM cand CROSS JOIN (SELECT unnest(range(4)) AS r) rr),
     est AS (SELECT cpr.token, CAST(min(counters.n) AS BIGINT) AS est_count
             FROM cpr JOIN counters USING (r, b) GROUP BY cpr.token)
    SELECT token, est_count FROM est ORDER BY est_count DESC, token LIMIT 20
    """


@query("heavy_hitters_cms", oracle=_CMS_ORACLE)
def q_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 tokens by count-min-sketch estimate — bounded-memory
    frequency tracking (the aggregated state is a fixed 4×1024 counter
    table no matter the vocabulary; vs vocab_topk's one-row-per-token
    shuffle).  md5-derived bucket hashes give the SKETCH itself an
    exact DuckDB oracle: every counter and every min-estimate matches
    cross-engine, including the over-count bias."""
    from stateful_spark_streaming_spark.operators import stats as ST

    return ST.heavy_hitters_cms(_t(spark, sf_dir, "documents"), k=20)


@query("streaming_heavy_hitters_cms", oracle=_CMS_ORACLE)
def q_streaming_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters at INGEST — streaming twin of heavy_hitters_cms
    (same oracle): per-batch CMS counter partials append batch-stamped
    (counters are sums — the textbook mergeable stream summary); the
    read side dedupes replays, sums, and runs the same cms_topk tail."""
    import os as _os

    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_heavy_hitters,
    )

    return run_streaming_heavy_hitters(
        spark, _os.path.join(sf_dir, "documents.parquet"), k=20
    )


@query(
    "quality_trim",
    oracle=_SCORED_Q_CTES
    + """,
     cum AS (
      SELECT source, bin,
             CAST((bin * 10000 + 19) // 20 AS INT) AS bin_lo_bp,
             sum(n) OVER (PARTITION BY source ORDER BY bin) AS cum,
             sum(n) OVER (PARTITION BY source) AS total
      FROM hist),
     thr AS (
      SELECT source,
             min(CASE WHEN cum >= (total * 2500 + 9999) // 10000
                      THEN bin_lo_bp END) / 10000.0 AS t
      FROM cum GROUP BY source)
    SELECT s.doc_id, s.source, s.q AS quality_score
    FROM scored s JOIN thr USING (source)
    WHERE s.q >= thr.t
    """,
)
def q_quality_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality floor: drop each source's bottom quartile of
    quality scores — the mixture-build trim the histogram family exists
    to drive.  Threshold = the p25 bin edge from the summary-sized
    histogram (no global sort), broadcast to a map-only filter."""
    from stateful_spark_streaming_spark.operators import stats as ST

    scored = TXT.quality_score(
        _t(spark, sf_dir, "documents"), keep_cols=("source",)
    ).select("doc_id", "source", "quality_score")
    return ST.trim_by_quantile(scored, "quality_score", ("source",), q_bp=2_500)


from stateful_spark_streaming_spark.operators import merge as MG  # noqa: E402

#: ONE source-level definition of the MERGE oracle — the one-shot batch
#: merge and the incremental streaming twin share it (and the
#: change-set derivation is deterministic from orders: +1.5/+2.25 price
#: deltas are binary-exact, no cross-engine rounding surface).
_MERGE_ORACLE = """
    WITH base AS (SELECT * FROM orders WHERE o_orderkey % 7 <> 0),
    ch AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             o_totalprice + 1.5 AS o_totalprice, o_orderdate,
             '9-UPDATED' AS o_orderpriority, 1 AS seq, 'U' AS op
      FROM orders WHERE o_orderkey % 3 = 0
      UNION ALL
      SELECT o_orderkey, o_custkey, o_orderstatus,
             o_totalprice + 2.25, o_orderdate, o_orderpriority, 2,
             CASE WHEN o_orderkey % 12 = 0 THEN 'D' ELSE 'U' END
      FROM orders WHERE o_orderkey % 6 = 0),
    latest AS (SELECT * FROM ch
               QUALIFY row_number() OVER (PARTITION BY o_orderkey ORDER BY seq DESC) = 1)
    SELECT b.o_orderkey, b.o_custkey, b.o_orderstatus, b.o_totalprice,
           b.o_orderdate, b.o_orderpriority
    FROM base b ANTI JOIN latest l ON b.o_orderkey = l.o_orderkey
    UNION ALL
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           o_orderdate, o_orderpriority
    FROM latest WHERE op <> 'D'
    """


#: shared by the one-shot and streaming incremental-MV queries: the FULL
#: recompute of the monthly aggregate over the merged table — hash
#: equality proves the affected-partition refresh strategy exact.  The
#: change feed is TIME-LOCALIZED (r9): a real CDC stream touches recent,
#: open months — closed history is immutable — so the maintenance path
#: exercises its partition-scoped rewrite (~2 affected months of ~80)
#: instead of degenerating to a backfill.
_INC_MV_ORACLE = """
    WITH bound AS (SELECT date_trunc('month', max(o_orderdate))
                          - INTERVAL 1 MONTH AS lo FROM orders),
    base AS (SELECT * FROM orders WHERE o_orderkey % 7 <> 0),
    ch AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             o_totalprice + 1.5 AS o_totalprice, o_orderdate,
             '9-UPDATED' AS o_orderpriority, 1 AS seq, 'U' AS op
      FROM orders, bound WHERE o_orderkey % 3 = 0 AND o_orderdate >= lo
      UNION ALL
      SELECT o_orderkey, o_custkey, o_orderstatus,
             o_totalprice + 2.25, o_orderdate, o_orderpriority, 2,
             CASE WHEN o_orderkey % 12 = 0 THEN 'D' ELSE 'U' END
      FROM orders, bound WHERE o_orderkey % 6 = 0 AND o_orderdate >= lo),
    latest AS (SELECT * FROM ch
               QUALIFY row_number() OVER (PARTITION BY o_orderkey ORDER BY seq DESC) = 1),
    merged AS (
      SELECT b.o_orderkey, b.o_custkey, b.o_totalprice, b.o_orderdate
      FROM base b ANTI JOIN latest l ON b.o_orderkey = l.o_orderkey
      UNION ALL
      SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
      FROM latest WHERE op <> 'D')
    SELECT date_trunc('month', o_orderdate)::DATE AS month,
           round(sum(o_totalprice), 2) AS revenue,
           count(*) AS n_orders,
           count(DISTINCT o_custkey) AS n_customers
    FROM merged GROUP BY 1
    """


def _monthly_agg_fn(detail: DataFrame) -> DataFrame:
    month = F.date_trunc("month", F.col("o_orderdate")).cast("date")
    return detail.groupBy(month.alias("month")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


def _order_change_sets(spark: SparkSession, sf_dir: str):
    """Two deterministic CDC batches over orders: seq-1 updates every
    key ≡0 (mod 3) — keys ≡0 (mod 21) are INSERTS, absent from the
    %7-filtered base — and seq-2 re-updates every key ≡0 (mod 6),
    deleting those ≡0 (mod 12).  Price deltas are exact binary adds."""
    o = _t(spark, sf_dir, "orders")
    s1 = (
        o.filter(F.col("o_orderkey") % 3 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + 1.5)
        .withColumn("o_orderpriority", F.lit("9-UPDATED"))
        .withColumn("seq", F.lit(1).cast("int"))
        .withColumn("op", F.lit("U"))
    )
    s2 = (
        o.filter(F.col("o_orderkey") % 6 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + 2.25)
        .withColumn("seq", F.lit(2).cast("int"))
        .withColumn(
            "op",
            F.when(F.col("o_orderkey") % 12 == 0, F.lit("D")).otherwise(F.lit("U")),
        )
    )
    return s1, s2


def _order_change_sets_recent(spark: SparkSession, sf_dir: str):
    """Time-localized CDC batches for the incremental-MV queries: the
    same %3/%6 update/delete/insert structure as
    :func:`_order_change_sets`, restricted to the newest TWO months of
    orders — a real change feed touches recent open months while closed
    history is immutable, which is exactly the shape the
    partition-scoped MV maintenance exists for (~2 affected partitions
    of ~80).  The month boundary is data-derived (max o_orderdate), so
    Spark and the DuckDB oracle compute the identical window."""
    o = _t(spark, sf_dir, "orders")
    lo = o.agg(
        F.add_months(F.date_trunc("month", F.max("o_orderdate")).cast("date"), -1)
    ).collect()[0][0]  # scalar bound: one tiny driver value, not row data
    recent = o.filter(F.col("o_orderdate") >= F.lit(lo))
    s1 = (
        recent.filter(F.col("o_orderkey") % 3 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + 1.5)
        .withColumn("o_orderpriority", F.lit("9-UPDATED"))
        .withColumn("seq", F.lit(1).cast("int"))
        .withColumn("op", F.lit("U"))
    )
    s2 = (
        recent.filter(F.col("o_orderkey") % 6 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + 2.25)
        .withColumn("seq", F.lit(2).cast("int"))
        .withColumn(
            "op",
            F.when(F.col("o_orderkey") % 12 == 0, F.lit("D")).otherwise(F.lit("U")),
        )
    )
    return s1, s2


@query(
    "quality_deciles",
    oracle=_SCORED_Q_CTES
    + """,
     cum AS (
      SELECT source, bin, CAST((bin * 10000 + 19) // 20 AS INT) AS bin_lo_bp,
             sum(n) OVER (PARTITION BY source ORDER BY bin) AS cum,
             sum(n) OVER (PARTITION BY source) AS total
      FROM hist),
     thr AS (
      SELECT source,
             min(CASE WHEN cum >= (total * 1000 + 9999) // 10000 THEN bin_lo_bp END) / 10000.0 AS p10,
             min(CASE WHEN cum >= (total * 2000 + 9999) // 10000 THEN bin_lo_bp END) / 10000.0 AS p20,
             min(CASE WHEN cum >= (total * 3000 + 9999) // 10000 THEN bin_lo_bp END) / 10000.0 AS p30,
             min(CASE WHEN cum >= (total * 4000 + 9999) // 10000 THEN bin_lo_bp END) / 10000.0 AS p40,
             min(CASE WHEN cum >= (total * 5000 + 9999) // 10000 THEN bin_lo_bp END) / 10000.0 AS p50,
             min(CASE WHEN cum >= (total * 6000 + 9999) // 10000 THEN bin_lo_bp END) / 10000.0 AS p60,
             min(CASE WHEN cum >= (total * 7000 + 9999) // 10000 THEN bin_lo_bp END) / 10000.0 AS p70,
             min(CASE WHEN cum >= (total * 8000 + 9999) // 10000 THEN bin_lo_bp END) / 10000.0 AS p80,
             min(CASE WHEN cum >= (total * 9000 + 9999) // 10000 THEN bin_lo_bp END) / 10000.0 AS p90
      FROM cum GROUP BY source)
    SELECT s.doc_id, s.source, s.q AS quality_score,
           CAST(CASE WHEN s.q >= t.p10 THEN 1 ELSE 0 END
             + CASE WHEN s.q >= t.p20 THEN 1 ELSE 0 END
             + CASE WHEN s.q >= t.p30 THEN 1 ELSE 0 END
             + CASE WHEN s.q >= t.p40 THEN 1 ELSE 0 END
             + CASE WHEN s.q >= t.p50 THEN 1 ELSE 0 END
             + CASE WHEN s.q >= t.p60 THEN 1 ELSE 0 END
             + CASE WHEN s.q >= t.p70 THEN 1 ELSE 0 END
             + CASE WHEN s.q >= t.p80 THEN 1 ELSE 0 END
             + CASE WHEN s.q >= t.p90 THEN 1 ELSE 0 END AS INT) AS bucket
    FROM scored s JOIN thr t USING (source)
    """,
)
def q_quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-height quality deciles per source WITHOUT a global sort:
    thresholds derive from the <= n_bins histogram (integer-rank
    arithmetic), broadcast, and assign map-side -- the NTILE replacement
    that survives 100 TB.  Completes the histogram family: histogram ->
    quantiles -> trim -> bucketize."""
    from stateful_spark_streaming_spark.operators import stats as ST

    scored = TXT.quality_score(
        _t(spark, sf_dir, "documents"), keep_cols=("source",)
    ).select("doc_id", "source", "quality_score")
    return ST.bucketize_by_quantile(
        scored, "quality_score", ("source",), n_buckets=10
    )


@query("merge_upsert", oracle=_MERGE_ORACLE)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-shot MERGE INTO (the lakehouse CDC-apply shape): a change set
    with per-key sequence numbers and insert/update/delete ops folds
    into the standing orders table — latest-wins via one
    partial-aggregatable max(struct), untouched rows via LEFT ANTI join
    (AQE broadcasts the change keys), union of survivors + upserts."""
    base = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 != 0)
    s1, s2 = _order_change_sets(spark, sf_dir)
    return MG.merge_upsert(
        base, s1.unionByName(s2), ("o_orderkey",), seq_col="seq", op_col="op"
    )


@query("streaming_merge_upsert", oracle=_MERGE_ORACLE)
def q_streaming_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MERGE at INGEST — streaming twin of merge_upsert
    (same oracle): the two CDC batches arrive as separate micro-batches
    and fold into a generation-managed table; per-row seq watermarks +
    tombstones make replay and out-of-order application converge (see
    run_streaming_merge_upsert)."""
    import os as _os
    import tempfile as _tf

    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_merge_upsert,
    )

    base = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 != 0)
    s1, s2 = _order_change_sets(spark, sf_dir)
    work = _tf.mkdtemp(prefix="sss_merge_q_")
    base_path = _os.path.join(work, "base")
    ch_dir = _os.path.join(work, "changes")
    base.write.parquet(base_path)
    _os.makedirs(ch_dir)
    for i, s in enumerate((s1, s2)):
        bdir = _os.path.join(work, f"b{i}")
        s.coalesce(1).write.parquet(bdir)
        part = [f for f in _os.listdir(bdir) if f.endswith(".parquet")][0]
        dst = _os.path.join(ch_dir, f"batch-{i}.parquet")
        _os.rename(_os.path.join(bdir, part), dst)
        _os.utime(dst, (1_000_000_000 + i * 100, 1_000_000_000 + i * 100))
    return run_streaming_merge_upsert(
        spark, base_path, ch_dir, ("o_orderkey",), seq_col="seq", op_col="op"
    )


@query("streaming_merge_upsert_bucketed", oracle=_MERGE_ORACLE)
def q_streaming_merge_upsert_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The key-hash BUCKETED merge layout (round 9's 100 TB knob), now
    oracle-gated instead of pytest-only (VERDICT r9 #4).  Same oracle as
    streaming_merge_upsert: the standing table lives partitioned by
    __bucket = pmod(xxhash64(key), n_buckets) and the feed replays the
    two full change batches plus a third batch that re-sends a small
    slice of batch 2 (o_orderkey % 600 == 0) — a NO-OP on the final
    state by the per-row seq watermark (idempotent application), which
    is exactly why the oracle can be shared verbatim: the bucketed run
    must converge to the same merged image the single-image form
    produces.

    n_buckets="auto" (r15, VERDICT r14 #3): the layout SELF-SIZES from
    the base table's bytes via merge_bucket_count — the same
    scale-adaptive rule production would use (64 MB/bucket, floor 8) —
    instead of the r14 constant 128 that was held only so batch 3 would
    exercise the scoped bucket-swap path inside this gate query
    (measured ~2× the runtime at test SF on 128-dir writes/renames).
    That mechanism coverage moved to
    tests/test_merge.py::test_streaming_merge_bucketed_gate_shape_scoped_swap,
    which pins the gate feed's exact 3-batch shape at n_buckets=128 with
    inode-level untouched-bucket assertions (plus the pre-existing
    scoped-swap/crash/skew pins there).  At the resolved floor (8
    buckets at a ~2.5 MB base) every batch legitimately takes the
    full-image fallback in the bucketed layout — the layout, the swap
    protocol and the oracle parity stay exercised here."""
    import os as _os
    import tempfile as _tf

    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_merge_upsert,
    )

    base = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 != 0)
    s1, s2 = _order_change_sets(spark, sf_dir)
    s3 = s2.filter(F.col("o_orderkey") % 600 == 0)
    work = _tf.mkdtemp(prefix="sss_merge_qb_")
    base_path = _os.path.join(work, "base")
    ch_dir = _os.path.join(work, "changes")
    base.write.parquet(base_path)
    _os.makedirs(ch_dir)
    for i, s in enumerate((s1, s2, s3)):
        bdir = _os.path.join(work, f"b{i}")
        s.coalesce(1).write.parquet(bdir)
        part = [f for f in _os.listdir(bdir) if f.endswith(".parquet")][0]
        dst = _os.path.join(ch_dir, f"batch-{i}.parquet")
        _os.rename(_os.path.join(bdir, part), dst)
        _os.utime(dst, (1_000_000_000 + i * 100, 1_000_000_000 + i * 100))
    return run_streaming_merge_upsert(
        spark, base_path, ch_dir, ("o_orderkey",), seq_col="seq", op_col="op",
        n_buckets="auto",
    )


@query("streaming_incremental_monthly_revenue", oracle=_INC_MV_ORACLE)
def q_streaming_incremental_monthly_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming MATERIALIZED-VIEW maintenance — the two CDC batches
    arrive as micro-batches, the standing table folds them in, and the
    monthly aggregate refreshes ONLY the touched months per trigger
    (run_streaming_incremental_agg).  Same oracle as the one-shot
    incremental_monthly_revenue: the full recompute over the final
    merged table."""
    import os as _os
    import tempfile as _tf

    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_incremental_agg,
    )

    base = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 != 0)
    s1, s2 = _order_change_sets_recent(spark, sf_dir)
    work = _tf.mkdtemp(prefix="sss_incmv_q_")
    base_path = _os.path.join(work, "base")
    ch_dir = _os.path.join(work, "changes")
    base.write.parquet(base_path)
    _os.makedirs(ch_dir)
    for i, s in enumerate((s1, s2)):
        bdir = _os.path.join(work, f"b{i}")
        s.coalesce(1).write.parquet(bdir)
        part = [f for f in _os.listdir(bdir) if f.endswith(".parquet")][0]
        dst = _os.path.join(ch_dir, f"batch-{i}.parquet")
        _os.rename(_os.path.join(bdir, part), dst)
        _os.utime(dst, (1_000_000_000 + i * 100, 1_000_000_000 + i * 100))

    month = F.date_trunc("month", F.col("o_orderdate")).cast("date")
    return run_streaming_incremental_agg(
        spark,
        base_path,
        ch_dir,
        ("o_orderkey",),
        ("month",),
        lambda df: df.withColumn("month", month),
        _monthly_agg_fn,
        seq_col="seq",
        op_col="op",
        # an order's month derives from o_orderdate, which the CDC feed
        # never rewrites for a key — the declaration that removes the
        # per-batch full-table key scan (O(batch) affected derivation)
        groups_immutable=True,
    )


@query("incremental_monthly_revenue", oracle=_INC_MV_ORACLE)
def q_incremental_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MATERIALIZED-VIEW maintenance: the monthly revenue
    aggregate is refreshed after the CDC merge by recomputing ONLY the
    months the change set touched (affected_groups → broadcast anti/semi
    joins), keeping every untouched month's row from the standing
    aggregate verbatim.  The oracle is the FULL recompute over the merged
    table — hash equality proves the affected-partition strategy is
    exact, including under deletes and count-distinct (where delta
    maintenance isn't).  At 100 TB with the detail table partitioned by
    month, the semi join prunes the recompute to the affected partitions'
    files."""
    month = F.date_trunc("month", F.col("o_orderdate")).cast("date")
    agg_fn = _monthly_agg_fn
    base = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 != 0)
    s1, s2 = _order_change_sets_recent(spark, sf_dir)
    changes = s1.unionByName(s2)
    materialized = agg_fn(base)
    merged = MG.merge_upsert(base, changes, ("o_orderkey",), seq_col="seq")
    affected = MG.affected_groups(
        base.withColumn("month", month),
        changes.withColumn("month", month),
        ("o_orderkey",),
        ("month",),
    )
    return MG.refresh_groups(
        materialized,
        merged.withColumn("month", month),
        affected,
        ("month",),
        agg_fn,
    )


@query(
    "corpus_diff",
    oracle="""
    WITH o AS (SELECT doc_id, md5(coalesce(text, '')) AS fp
               FROM documents WHERE doc_id % 29 <> 0),
    n AS (SELECT doc_id,
                 md5(coalesce(CASE WHEN doc_id % 13 = 0
                                   THEN text || ' [rev2]' ELSE text END,
                              '')) AS fp
          FROM documents WHERE doc_id % 23 <> 0)
    SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                WHEN o.fp <> n.fp THEN 'changed' END AS status
    FROM o FULL JOIN n ON o.doc_id = n.doc_id
    WHERE o.doc_id IS NULL OR n.doc_id IS NULL OR o.fp <> n.fp
    """,
)
def q_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Release diff between two corpus snapshots (dataset versioning):
    added / removed / content-changed doc ids, computed on content
    fingerprints projected BEFORE the full-outer join — the shuffle
    carries (id, fp), never document payloads.  Snapshots derived
    deterministically from documents (membership by modulus, content
    revision marker on every 13th doc)."""
    docs = _t(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 29 != 0)
    new = docs.filter(F.col("doc_id") % 23 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 13 == 0, F.concat(F.col("text"), F.lit(" [rev2]"))
        ).otherwise(F.col("text")),
    )
    return MG.snapshot_diff(
        old, new, "doc_id", F.md5(F.coalesce(F.col("text"), F.lit("")))
    )


#: ONE source-level definition of the dup-span oracle — the batch and
#: streaming-ingest twins share it (code side shares dup_spans_from_index)
_DUP_SPANS_ORACLE = f"""
    WITH tk AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks
                FROM documents),
     g AS (SELECT doc_id, CAST(i - 1 AS INT) AS pos,
                  array_to_string(toks[i:i+4], ' ') AS gram
           FROM tk, unnest(range(1, len(toks) - 3)) AS r(i)
           WHERE len(toks) >= 5),
     shared AS (SELECT gram FROM g GROUP BY gram
                HAVING count(DISTINCT doc_id) >= 2),
     hit AS (SELECT g.doc_id, g.pos FROM g JOIN shared USING (gram)),
     isl AS (SELECT doc_id, pos,
                    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
             FROM hit)
    SELECT doc_id, CAST(min(pos) AS INT) AS span_start,
           CAST(max(pos) + 4 AS INT) AS span_end,
           CAST(max(pos) - min(pos) + 5 AS INT) AS span_len,
           count(*) AS n_dup_grams
    FROM isl GROUP BY doc_id, grp
    """


@query(
    "dup_ngram_spans",
    oracle=_DUP_SPANS_ORACLE,
)
def q_dup_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level duplicate detection: maximal 5-gram-covered token ranges
    shared across documents (suffix-array substring dedup re-expressed as
    distributed k-gram position merging — Lee et al. 2022 family)."""
    return DD.dup_ngram_spans(_t(spark, sf_dir, "documents"), k=5, min_docs=2)


@query(
    "streaming_dup_spans",
    oracle=_DUP_SPANS_ORACLE,
)
def q_streaming_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level dedup at INGEST — streaming twin of dup_ngram_spans
    (same oracle): the gram-position kernel runs per micro-batch and
    appends a hashed (doc, pos, gram) index; the cross-doc span merge is
    derived on read via the shared dup_spans_from_index tail."""
    import os as _os

    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_dup_spans,
    )

    return run_streaming_dup_spans(
        spark, _os.path.join(sf_dir, "documents.parquet"), k=5, min_docs=2
    )


@query(
    "remove_dup_spans",
    oracle=f"""
    WITH tk AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks
                FROM documents),
     g AS (SELECT doc_id, CAST(i - 1 AS INT) AS pos,
                  array_to_string(toks[i:i+4], ' ') AS gram
           FROM tk, unnest(range(1, len(toks) - 3)) AS r(i)
           WHERE len(toks) >= 5),
     shared AS (SELECT gram FROM g GROUP BY gram
                HAVING count(DISTINCT doc_id) >= 2),
     hit AS (SELECT g.doc_id, g.pos FROM g JOIN shared USING (gram)),
     isl AS (SELECT doc_id, pos,
                    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
             FROM hit),
     spans AS (SELECT doc_id, CAST(min(pos) AS INT) AS span_start,
                      CAST(max(pos) + 4 AS INT) AS span_end
               FROM isl GROUP BY doc_id, grp),
     sptext AS (SELECT s.doc_id, s.span_start, s.span_end,
                       array_to_string(t.toks[s.span_start + 1 : s.span_end + 1],
                                       ' ') AS span_text
                FROM spans s JOIN tk t USING (doc_id)),
     own AS (SELECT *, row_number() OVER (PARTITION BY span_text
                                          ORDER BY doc_id, span_start) AS rn
             FROM sptext),
     cutd AS (SELECT DISTINCT doc_id, CAST(pos AS INT) AS pos FROM
              (SELECT doc_id, unnest(range(span_start, span_end + 1)) AS pos
               FROM own WHERE rn > 1)),
     tp AS (SELECT doc_id, CAST(i - 1 AS INT) AS pos, toks[i] AS tok
            FROM tk, unnest(range(1, len(toks) + 1)) AS r(i)),
     keep AS (SELECT tp.* FROM tp ANTI JOIN cutd USING (doc_id, pos)),
     reb AS (SELECT doc_id,
                    array_to_string(list(tok ORDER BY pos), ' ') AS clean_text,
                    count(*) AS kept
             FROM keep GROUP BY doc_id),
     alln AS (SELECT doc_id, count(*) AS n FROM tp GROUP BY doc_id)
    SELECT d.doc_id,
           coalesce(reb.clean_text, '') AS clean_text,
           CAST(coalesce(alln.n, 0) - coalesce(reb.kept, 0) AS INT) AS n_removed
    FROM documents d LEFT JOIN reb USING (doc_id) LEFT JOIN alln USING (doc_id)
    """,
)
def q_remove_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The span-dedup ACTION: cut every cross-doc duplicated 5-gram span
    except the first occurrence of its exact text (Lee et al.
    remove-all-but-one at token granularity); every doc rides through
    with its rebuilt text and removed-token count."""
    return DD.remove_dup_spans(_t(spark, sf_dir, "documents"), k=5, min_docs=2)


@query(
    "containment_pairs",
    oracle=f"""
    WITH grp AS (SELECT text AS gtext, min(doc_id) AS rep,
                        list(doc_id ORDER BY doc_id) AS gids
                 FROM documents GROUP BY text),
    toks AS (SELECT rep AS doc_id, {_TOKS_SQL} AS t
             FROM (SELECT rep, gtext AS text FROM grp)),
    sh0 AS (SELECT doc_id, {_SHINGLES_SQL} AS s FROM toks WHERE len(t) >= 3),
    ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh0),
    hot AS (SELECT shingle FROM ex GROUP BY shingle HAVING count(*) > 1000),
    sh AS (SELECT doc_id, list(shingle) AS s
           FROM (SELECT * FROM ex ANTI JOIN hot USING (shingle))
           GROUP BY doc_id),
    rp AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(len(a.s) AS BIGINT) AS size_a, CAST(len(b.s) AS BIGINT) AS size_b,
           CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS n_common,
           round(len(list_intersect(a.s, b.s))::DOUBLE
                 / least(len(a.s), len(b.s)), 4) AS containment
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE round(len(list_intersect(a.s, b.s))::DOUBLE
                / least(len(a.s), len(b.s)), 4) >= 0.9
      AND len(list_intersect(a.s, b.s)) > 0)
    SELECT least(ta.ia, tb.ib) AS doc_a, greatest(ta.ia, tb.ib) AS doc_b,
           CASE WHEN ta.ia > tb.ib THEN r.size_b ELSE r.size_a END AS size_a,
           CASE WHEN ta.ia > tb.ib THEN r.size_a ELSE r.size_b END AS size_b,
           r.n_common, r.containment
    FROM rp r
    JOIN grp ga ON ga.rep = r.doc_a
    JOIN grp gb ON gb.rep = r.doc_b,
         LATERAL unnest(ga.gids) AS ta(ia), LATERAL unnest(gb.gids) AS tb(ib)
    WHERE ta.ia <> tb.ib
    UNION ALL
    SELECT ta.ia AS doc_a, tb.ib AS doc_b,
           CAST(len(s.s) AS BIGINT) AS size_a,
           CAST(len(s.s) AS BIGINT) AS size_b,
           CAST(len(s.s) AS BIGINT) AS n_common,
           round(CAST(1.0 AS DOUBLE), 4) AS containment
    FROM grp g JOIN sh s ON s.doc_id = g.rep,
         LATERAL unnest(g.gids) AS ta(ia), LATERAL unnest(g.gids) AS tb(ib)
    WHERE ta.ia < tb.ib AND len(s.s) > 0
    """,
)
def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub/superset dedup: containment |A∩B|/min(|A|,|B|) ≥ 0.9 — catches
    short-doc-inside-long-doc duplication that symmetric Jaccard misses.
    Same hot-shingle cap (1000) as the capped jaccard form, mirrored in
    the oracle's anti-join."""
    return DD.containment_pairs(
        _t(spark, sf_dir, "documents"), k=3, threshold=0.9, max_shingle_df=1000
    )


@query(
    "temperature_mix",
    oracle="""
    WITH n AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
    w AS (SELECT source, n_docs, CAST(floor(sqrt(n_docs)) AS BIGINT) AS wv FROM n),
    t AS (SELECT sum(wv) AS wsum FROM w),
    r AS (SELECT source,
                 least(10000, (10000::HUGEINT * 500 * wv) // (wsum::HUGEINT * n_docs)) AS rate_bp
          FROM w, t)
    SELECT d.doc_id, d.source, CAST(r.rate_bp AS INT) AS rate_bp
    FROM documents d JOIN r USING (source)
    WHERE ('0x' || substring(md5('temp1' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
          % 10000 < r.rate_bp
    """,
)
def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted (alpha = 0.5) source mixing targeting 500 kept
    docs: kept mass per source proportional to sqrt(source size).  Exact
    cross-engine because sqrt is the one correctly-rounded IEEE power and
    everything after floor(sqrt) is integer arithmetic; the keep decision
    is the seeded md5 draw.  Map-only over the corpus — only the
    per-source count aggregate shuffles."""
    return SMP.temperature_mix(_t(spark, sf_dir, "documents"), target_total=500)


@query(
    "ngram_overlap",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
    g AS (SELECT doc_id,
                 CASE WHEN len(t) >= 5
                      THEN list_distinct(list_transform(range(1, len(t) - 3), i ->
                           t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
                           || ' ' || t[i+4]))
                      ELSE [] END AS s
          FROM toks),
    ev AS (SELECT doc_id, len(s) AS n_sh, unnest(s) AS shingle
           FROM g WHERE doc_id % 97 = 0 AND len(s) > 0),
    tr AS (SELECT DISTINCT unnest(s) AS shingle FROM g WHERE doc_id % 97 <> 0)
    SELECT ev.doc_id,
           CAST(max(ev.n_sh) AS INT) AS n_shingles,
           CAST(count(tr.shingle) AS BIGINT) AS n_hit,
           CAST((10000 * count(tr.shingle)) // max(ev.n_sh) AS INT) AS overlap_bp
    FROM ev LEFT JOIN tr USING (shingle)
    GROUP BY ev.doc_id
    """,
)
def q_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded contamination scoring: per eval doc (the %97 split used by
    the decontaminate family), the basis-point fraction of its distinct
    5-gram shingles found anywhere in the training corpus.  The train
    side is probed map-only against the broadcast eval dictionary —
    the corpus never shuffles."""
    docs = _t(spark, sf_dir, "documents")
    return DD.ngram_overlap_score(
        docs.filter(F.col("doc_id") % 97 != 0),
        docs.filter(F.col("doc_id") % 97 == 0),
        k=5,
    )


_DRIFT_ORACLE = f"""
    WITH occ AS (SELECT source, unnest({_TOKS_SQL}) AS token FROM documents),
    c AS (SELECT source, token, count(*) AS c
          FROM occ WHERE token <> '' GROUP BY source, token),
    tots AS (SELECT source, sum(c) AS tot_s FROM c GROUP BY source),
    g AS (SELECT token, sum(c) AS cg FROM c GROUP BY token),
    tot AS (SELECT sum(cg) AS tot FROM g),
    gp AS (SELECT token, (100000000 * cg) // tot AS pg FROM g, tot),
    s2 AS (SELECT sum(pg) AS s2 FROM gp),
    per AS (SELECT c.source, max(tots.tot_s) AS total_tokens,
                   count(*) AS n_tokens_distinct,
                   sum(abs((100000000 * c.c) // tots.tot_s - gp.pg) - gp.pg) AS s1
            FROM c JOIN tots USING (source) JOIN gp USING (token)
            GROUP BY c.source)
    SELECT source, CAST(total_tokens AS BIGINT) AS total_tokens,
           CAST(n_tokens_distinct AS BIGINT) AS n_tokens_distinct,
           CAST((s1 + s2.s2) // 2 AS BIGINT) AS tv_scaled,
           CAST(((s1 + s2.s2) // 2) // 10000 AS INT) AS tv_bp
    FROM per, s2
    """


@query(
    "bpe_pair_counts",
    oracle=f"""
    WITH occ AS (SELECT unnest({_TOKS_SQL}) AS token FROM documents),
    wf AS (SELECT token, count(*) AS n FROM occ WHERE token <> '' GROUP BY token),
    p AS (SELECT token, n,
                 unnest(list_transform(range(1, length(token)),
                                       i -> substr(token, i, 2))) AS pair
          FROM wf WHERE length(token) >= 2),
    agg AS (SELECT pair, CAST(sum(n) AS BIGINT) AS pair_count,
                   CAST(count(DISTINCT token) AS BIGINT) AS n_words
            FROM p GROUP BY pair)
    SELECT pair, pair_count, n_words,
           CAST(row_number() OVER (ORDER BY pair_count DESC, pair) AS INT) AS rank
    FROM agg ORDER BY pair_count DESC, pair LIMIT 50
    """,
)
def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer-training candidate scores: top-50 adjacent character
    pairs over the distinct-word table, weighted by word frequency
    (Sennrich et al. 2016 counting — every occurrence position counts).
    The corpus is touched once by the word-frequency shuffle; the pair
    explosion runs over the vocabulary."""
    return TXT.bpe_pair_counts(_t(spark, sf_dir, "documents"), top_n=50)


@query("bpe_encode_stats")
def q_bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train 50 BPE merges on the corpus, apply them, and report per-doc
    tokenization stats (word count, subword count, fertility in bp) —
    the train → apply closure.  Rows-only by construction: the greedy
    merge loop is iterative, not SQL-expressible; exactness is pytested
    against a pure-Python reference (`tests/test_bpe.py`)."""
    from stateful_spark_streaming_spark.operators import text as TXT2

    docs = _t(spark, sf_dir, "documents")
    merges = TXT2.bpe_train(docs, n_merges=50)
    return TXT2.bpe_encode(docs, merges)


@query("compression_stats")
def q_compression_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc zlib compression ratio (Gopher-family repetitiveness /
    quality signal; low ratio_bp = boilerplate or generated spam).
    Rows-only by construction: no deflate in the oracle engine; the
    Arrow kernel is pytested byte-exact against direct zlib."""
    from stateful_spark_streaming_spark.operators import text as TXT2

    return TXT2.compression_stats(_t(spark, sf_dir, "documents"))


@query("source_drift", oracle=_DRIFT_ORACLE)
def q_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition audit: per-source total-variation distance from
    the blended corpus token distribution, in exact scaled-integer basis
    points (no float logs, no summation-order sensitivity).  Everything
    past the one (source, token) count shuffle is vocabulary-sized."""
    from stateful_spark_streaming_spark.operators import stats as ST

    return ST.source_drift(_t(spark, sf_dir, "documents"))


@query("streaming_source_drift", oracle=_DRIFT_ORACLE)
def q_streaming_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time drift tracking — streaming twin of ``source_drift``
    (same oracle): batch-stamped additive (source, token, count) partials
    staged per micro-batch, replay-deduped and summed on read, finished
    through the same ``source_drift_from_counts`` tail."""
    import os as _os

    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_source_drift,
    )

    return run_streaming_source_drift(
        spark, _os.path.join(sf_dir, "documents.parquet")
    )


# --------------------------------------------------------------------------
# Round 8 (second half): TPC-H Q4/Q15/Q18 shapes + partition-pruned scans
# --------------------------------------------------------------------------


@query(
    "order_priority_checking",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_late_orders
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def q_order_priority_checking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shape: orders with a line shipped >60 days after the order
    date, counted per priority — EXISTS as a LEFT SEMI join whose condition
    mixes the equi-key with a cross-table inequality (evaluated inside the
    sort-merge join, one shuffle per side, 2-column lineitem scan)."""
    return REL.order_priority_checking(
        _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "lineitem"), late_days=60
    )


@query(
    "large_volume_customers",
    oracle="""
    WITH qualified AS (
      SELECT l_orderkey, round(sum(l_quantity), 2) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING round(sum(l_quantity), 2) >= 250.0
    )
    SELECT c_custkey, c_name, o_orderkey,
           o_orderdate::DATE AS o_orderdate, o_totalprice, sum_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN qualified ON o_orderkey = l_orderkey
    """,
)
def q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shape: customers whose order's total line quantity reaches
    the tail threshold — ONE shuffle (the per-order agg); the tail-sized
    qualifying set broadcasts into orders, the enriched result broadcasts
    into customer, so neither big table re-shuffles."""
    return REL.large_volume_customers(
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
        min_qty=250.0,
    )


@query(
    "top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_rev
    FROM rev JOIN supplier ON l_suppkey = s_suppkey
    WHERE total_rev = (SELECT max(total_rev) FROM rev)
    """,
)
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shape: the max-revenue supplier(s) for a quarter — the
    agg-then-argmax-join pattern.  The revenue aggregate is pinned
    (track_persist) because the plan consumes it twice; the max is a
    single-row broadcast; ties surface in both engines identically because
    the comparison happens on already-rounded revenue."""
    return REL.top_supplier(
        _t(spark, sf_dir, "supplier"), _t(spark, sf_dir, "lineitem")
    )


@query(
    "partitioned_events_scan",
    oracle="""
    SELECT CAST(ts AS DATE) AS event_date, event_type,
           count(*) AS n_events, round(sum(value), 2) AS sum_value
    FROM events
    WHERE CAST(ts AS DATE) >= DATE '2024-01-05'
      AND CAST(ts AS DATE) <= DATE '2024-01-09'
    GROUP BY CAST(ts AS DATE), event_type
    """,
)
def q_partitioned_events_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-pruned time-range scan: the events table is materialized
    ONCE as a directory-partitioned dataset (`event_date=…/`, cached per
    corpus fingerprint like the bucketed tables), after which a 5-day
    predicate resolves to 5 directories in the partition index — the scan
    reports PartitionFilters and opens no file outside the range.  At
    100 TB this is the difference between touching 5/3650ths of an events
    corpus and all of it (plan-audited: PartitionFilters required)."""
    from stateful_spark_streaming_spark.operators.layout import (
        ensure_partitioned_dataset,
    )

    tag = _fixture_tag(sf_dir, "events")
    loc = ensure_partitioned_dataset(
        _t(spark, sf_dir, "events").withColumn("event_date", F.to_date("ts")),
        "event_date",
        f"/tmp/sss_part_{tag}/events",
    )
    ev = spark.read.parquet(loc)
    return (
        ev.filter(
            (F.col("event_date") >= F.lit("2024-01-05"))
            & (F.col("event_date") <= F.lit("2024-01-09"))
        )
        .groupBy("event_date", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


@query(
    "similar_part_names",
    oracle="""
    WITH n AS (SELECT DISTINCT p_name AS name FROM part)
    SELECT a.name AS name_a, b.name AS name_b,
           CAST(levenshtein(a.name, b.name) AS BIGINT) AS lev
    FROM n a JOIN n b ON a.name < b.name
    WHERE levenshtein(a.name, b.name) <= 2
    """,
)
def q_similar_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity self-join without the all-pairs product: FastSS
    ≤2-deletion-neighborhood candidate generation (complete by the
    deletion-variant theorem), equi-join on the 8-byte variant hash,
    exact Levenshtein verify.  The oracle is the brute-force all-pairs
    join — identical rows prove the blocking loses nothing."""
    return REL.fuzzy_name_pairs(_t(spark, sf_dir, "part"), "p_name", max_dist=2)


@query(
    "important_parts",
    oracle="""
    WITH value AS (
      SELECT l_partkey,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS part_value
      FROM lineitem GROUP BY l_partkey)
    SELECT l_partkey, part_value
    FROM value
    WHERE part_value > (SELECT avg(part_value) * 1.25 FROM value)
    """,
)
def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-shape share-of-total HAVING: parts whose line value
    exceeds 1.25× the mean part value (scale-invariant where Q11's fixed
    fraction empties out as the part count grows) — the twice-consumed
    value aggregate is pinned, the threshold a single-row broadcast."""
    return REL.important_parts(_t(spark, sf_dir, "lineitem"), mean_multiple=1.25)


@query(
    "parts_supplier_counts",
    oracle="""
    WITH bridge AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
      WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0))
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM bridge JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand, p_type, p_size
    """,
)
def q_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-shape: distinct suppliers per (brand, type, size) with a
    NOT-IN blocklist as a broadcast anti join; the part↔supplier bridge
    deduplicates before the attribute join so the shuffle carries pairs,
    not line items."""
    return REL.parts_supplier_counts(
        _t(spark, sf_dir, "part"),
        _t(spark, sf_dir, "supplier"),
        _t(spark, sf_dir, "lineitem"),
    )


@query(
    "idle_rich_customers",
    oracle="""
    SELECT c_nationkey, count(*) AS n_customers,
           round(sum(c_acctbal), 2) AS total_bal
    FROM customer c
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000)
    GROUP BY c_nationkey
    """,
)
def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shape: above-average-balance customers with no big
    orders, per nation — scalar aggregate broadcast + anti join on the
    pre-filtered order key set."""
    return REL.idle_rich_customers(
        _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    )


@query(
    "orders_expectations",
    oracle="""
    WITH w AS (
      SELECT count(*) AS n_rows,
             CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS v0,
             CAST(sum(CASE WHEN NOT (o_totalprice > 0)
                             OR o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS v1,
             CAST(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                             OR o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS v2,
             CAST(sum(CASE WHEN NOT (o_orderdate >= TIMESTAMP '1992-01-01'
                                 AND o_orderdate < TIMESTAMP '1999-01-01')
                             OR o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS v3,
             CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS v4
      FROM orders)
    SELECT t.chk AS "check", w.n_rows, t.n_violations,
           t.n_violations = 0 AS passed
    FROM w, LATERAL (VALUES
      ('custkey_not_null', v0), ('totalprice_positive', v1),
      ('status_in_domain', v2), ('orderdate_in_range', v3),
      ('unique(o_orderkey)', v4)) AS t(chk, n_violations)
    """,
)
def q_orders_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate over orders: five expectations
    (non-null FK, positive amount, status domain, date range, key
    uniqueness) evaluated in ONE full-scan aggregate — never a job per
    check, never a self-join for uniqueness.  The pre-ingest audit every
    100 TB pipeline runs before accepting a drop."""
    o = _t(spark, sf_dir, "orders")
    return REL.expectations_report(
        o,
        [
            ("custkey_not_null", F.col("o_custkey").isNotNull()),
            ("totalprice_positive", F.col("o_totalprice") > 0),
            ("status_in_domain", F.col("o_orderstatus").isin("O", "F", "P")),
            (
                "orderdate_in_range",
                (F.col("o_orderdate") >= F.lit("1992-01-01"))
                & (F.col("o_orderdate") < F.lit("1999-01-01")),
            ),
        ],
        key_col="o_orderkey",
    )


@query(
    "image_ahash",
    oracle="""
    WITH meta AS (
      SELECT doc_id AS image_id,
             CAST(n_chars % 64 + 32 AS BIGINT) AS w,
             CAST(n_chars % 48 + 24 AS BIGINT) AS h
      FROM documents),
    cell AS (
      SELECT image_id, j, i,
             ((image_id*7 + 3*((i*w)//8) + 5*((j*h)//8)) % 256
            + (image_id*7 + 3*((i*w)//8) + 5*((j*h)//8) + 11) % 256
            + (image_id*7 + 3*((i*w)//8) + 5*((j*h)//8) + 22) % 256) // 3
               AS luma
      FROM meta,
           LATERAL unnest(range(0, 8)) AS t1(i),
           LATERAL unnest(range(0, 8)) AS t2(j)),
    mu AS (SELECT image_id, sum(luma) // 64 AS m FROM cell GROUP BY image_id)
    SELECT c.image_id,
           string_agg(CASE WHEN luma > m THEN '1' ELSE '0' END, ''
                      ORDER BY j*8 + i) AS ahash_bits,
           CAST(count(*) FILTER (WHERE luma > m) AS BIGINT) AS n_set
    FROM cell c JOIN mu USING (image_id)
    GROUP BY c.image_id
    """,
)
def q_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual average-hash per image over the REAL decoded binary
    corpus — the near-duplicate image fingerprint (hash-equal or
    Hamming-close images are visual dups).  FULL oracle: the hash is pure
    integer arithmetic (luma=(r+g+b)//3, nearest 8×8 downsample,
    strict-greater-than-integer-mean threshold, row-major bit string), so
    DuckDB re-derives all 64 bits per image from the synthetic pixel
    formula — the gate verifies the decode + resample + threshold kernel
    bit-for-bit.  Map-only Arrow kernel, no shuffle; exact-dup grouping /
    banded Hamming join downstream are the standard dedup compositions."""
    return MM.image_ahash(_image_fixture(spark, sf_dir))


@query(
    "image_near_dups",
    oracle="""
    WITH meta AS (
      SELECT doc_id AS image_id,
             CAST(n_chars % 64 + 32 AS BIGINT) AS w,
             CAST(n_chars % 48 + 24 AS BIGINT) AS h
      FROM documents),
    cell AS (
      SELECT image_id, j, i,
             ((image_id*7 + 3*((i*w)//8) + 5*((j*h)//8)) % 256
            + (image_id*7 + 3*((i*w)//8) + 5*((j*h)//8) + 11) % 256
            + (image_id*7 + 3*((i*w)//8) + 5*((j*h)//8) + 22) % 256) // 3
               AS luma
      FROM meta,
           LATERAL unnest(range(0, 8)) AS t1(i),
           LATERAL unnest(range(0, 8)) AS t2(j)),
    mu AS (SELECT image_id, sum(luma) // 64 AS m FROM cell GROUP BY image_id),
    hashes AS (
      SELECT c.image_id,
             string_agg(CASE WHEN luma > m THEN '1' ELSE '0' END, ''
                        ORDER BY j*8 + i) AS bits
      FROM cell c JOIN mu USING (image_id) GROUP BY c.image_id)
    SELECT a.image_id AS id_a, b.image_id AS id_b,
           CAST((SELECT count(*) FROM unnest(range(1, 65)) t(p)
                 WHERE substring(a.bits, p::INT, 1)
                    <> substring(b.bits, p::INT, 1)) AS BIGINT) AS hamming
    FROM hashes a JOIN hashes b ON a.image_id < b.image_id
    WHERE (SELECT count(*) FROM unnest(range(1, 65)) t(p)
           WHERE substring(a.bits, p::INT, 1)
              <> substring(b.bits, p::INT, 1)) <= 4
    """,
)
def q_image_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate IMAGE pairs: perceptual hashes within Hamming ≤ 4,
    found via banded LSH (5 bands — pigeonhole-complete for t=4) + exact
    verify, never an all-pairs product.  The oracle IS the all-pairs
    brute force over the re-derived hashes, so hash equality proves both
    the perceptual hash bits and the banding's losslessness.  The visual
    dedup layer a multimodal training corpus needs next to the text
    MinHash family."""
    from stateful_spark_streaming_spark.operators.dedup import (
        hamming_near_pairs,
    )

    hashed = MM.image_ahash(_image_fixture(spark, sf_dir))
    return hamming_near_pairs(
        hashed, "image_id", "ahash_bits", max_ham=4, n_bands=5
    )


@query(
    "image_dedup_keep_best",
    oracle="""
    WITH RECURSIVE meta AS (
      SELECT doc_id AS image_id,
             CAST(n_chars % 64 + 32 AS BIGINT) AS w,
             CAST(n_chars % 48 + 24 AS BIGINT) AS h
      FROM documents),
    cell AS (
      SELECT image_id, j, i,
             ((image_id*7 + 3*((i*w)//8) + 5*((j*h)//8)) % 256
            + (image_id*7 + 3*((i*w)//8) + 5*((j*h)//8) + 11) % 256
            + (image_id*7 + 3*((i*w)//8) + 5*((j*h)//8) + 22) % 256) // 3
               AS luma
      FROM meta,
           LATERAL unnest(range(0, 8)) AS t1(i),
           LATERAL unnest(range(0, 8)) AS t2(j)),
    mu AS (SELECT image_id, sum(luma) // 64 AS m FROM cell GROUP BY image_id),
    hashes AS (
      SELECT c.image_id,
             string_agg(CASE WHEN luma > m THEN '1' ELSE '0' END, ''
                        ORDER BY j*8 + i) AS bits
      FROM cell c JOIN mu USING (image_id) GROUP BY c.image_id),
    hq AS (
      SELECT h.image_id, h.bits, CAST(m.w * m.h * 10000 AS BIGINT) AS qbp
      FROM hashes h JOIN meta m USING (image_id)),
    grp AS (
      SELECT bits, count(*) AS n, max(qbp) AS gq FROM hq GROUP BY bits),
    gbest AS (
      SELECT h.bits, min(h.image_id) AS gid
      FROM hq h JOIN grp g ON h.bits = g.bits AND h.qbp = g.gq
      GROUP BY h.bits),
    dh AS (SELECT bits FROM grp),
    edge AS (
      SELECT a.bits AS ba, b.bits AS bb
      FROM dh a JOIN dh b ON a.bits < b.bits
      WHERE (SELECT count(*) FROM unnest(range(1, 65)) t(p)
             WHERE substring(a.bits, p::INT, 1)
                <> substring(b.bits, p::INT, 1)) <= 1),
    sym AS (SELECT ba AS n1, bb AS n2 FROM edge
            UNION ALL SELECT bb, ba FROM edge),
    reach AS (
      SELECT bits AS node, bits AS lbl FROM dh
      UNION
      SELECT s.n1 AS node, r.lbl
      FROM sym s JOIN reach r ON r.node = s.n2),
    rep AS (SELECT node AS bits, min(lbl) AS rep FROM reach GROUP BY node),
    full_g AS (
      SELECT g.bits, g.n, g.gq, gb.gid, r.rep
      FROM grp g JOIN gbest gb USING (bits) JOIN rep r USING (bits)),
    csum AS (
      SELECT rep, sum(n) AS cluster_size, max(gq) AS cq
      FROM full_g GROUP BY rep),
    winner AS (
      SELECT f.rep, c.cluster_size, min(f.gid) AS image_id
      FROM full_g f JOIN csum c ON f.rep = c.rep AND f.gq = c.cq
      GROUP BY f.rep, c.cluster_size)
    SELECT image_id,
           CAST(cluster_size AS BIGINT) AS cluster_size,
           CASE WHEN cluster_size = 1 THEN 'unique'
                ELSE 'best_of_cluster' END AS reason
    FROM winner
    """,
)
def q_image_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical IMAGE selection (r12 verdict #3): perceptual-hash
    neighborhoods collapse to one retained representative each — the
    highest-resolution copy (pixel count, tie → lowest id) — without
    materializing the near-dup pair table ``image_near_dups`` emits for
    audit.  RADIUS 1, not the pair table's 4: connected components
    COMPOUND the radius (A~B~C chains at 2·max_ham), and the r13 probe
    measured percolation on this corpus at wider radii — max_ham=4
    collapses all 2 860 distinct sf0.1 hashes into ONE cluster (a single
    "representative" for 5 000 images), max_ham=2 into a 2 704-hash
    giant; radius 1 keeps the closure where clusters are plausibly one
    content item (hamming_keep_best's docstring names the probe rule).
    FULL oracle: DuckDB re-derives the ahash bits, brute-forces the
    distinct-hash Hamming graph, runs connected components as a
    recursive min-label closure, and applies the same (quality, id)
    lexicographic winner rule in scaled-integer arithmetic."""
    from stateful_spark_streaming_spark.operators.dedup import (
        hamming_keep_best,
    )

    img = _image_fixture(spark, sf_dir)
    hashed = MM.image_ahash(img)
    quality = img.select(
        "image_id",
        (F.col("width").cast("double") * F.col("height")).alias("pixels"),
    )
    # max_cluster_frac=0.5 (r14, VERDICT r13 #2): the percolation guard is
    # ON in the pipeline entry points — the r13 sf10 probe measured the
    # 64-bit hash silently collapsing 98.5% of a 500 k corpus into one
    # "representative"; a raise with the widen-the-hash escape beats
    # publishing fiction.  Healthy at every gate/bench SF (largest radius-1
    # cluster at sf0.1: 115 of 5 000 members ≈ 2.3%), so gate rows are
    # unchanged; None is the explicit opt-out for audit/probe runs.
    return hamming_keep_best(
        hashed, "image_id", "ahash_bits", quality, "pixels",
        max_ham=1, n_bands=2, max_cluster_frac=0.5,
    )


@query(
    "streaming_partitioned_ingest",
    oracle="""
    SELECT CAST(ts AS DATE) AS event_date, event_type,
           count(*) AS n_events, round(sum(value), 2) AS sum_value
    FROM events
    WHERE CAST(ts AS DATE) >= DATE '2024-01-05'
      AND CAST(ts AS DATE) <= DATE '2024-01-09'
    GROUP BY CAST(ts AS DATE), event_type
    """,
)
def q_streaming_partitioned_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``partitioned_events_scan`` (same oracle): the
    event stream lands APPEND-mode under ``event_date=…/`` directories
    per micro-batch, then the same 5-day slice is read back partition-
    pruned with the standard key dedupe (replay idempotency).  Layout
    built offline by ensure_partitioned_dataset, maintained online here."""
    import os as _os
    import tempfile as _tf

    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_partitioned_ingest,
    )

    loc = run_streaming_partitioned_ingest(
        spark,
        _os.path.join(sf_dir, "events.parquet"),
        checkpoint_dir=_tf.mkdtemp(prefix="sss_ckpt_ping_"),
    )
    ev = spark.read.parquet(loc)
    return (
        ev.filter(
            (F.col("event_date") >= F.lit("2024-01-05"))
            & (F.col("event_date") <= F.lit("2024-01-09"))
        )
        .dropDuplicates(["event_id"])
        .groupBy("event_date", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


@query(
    "campaign_attribution",
    oracle="""
    WITH cal AS (
      SELECT i AS campaign_id,
             TIMESTAMP '2024-01-01' + to_days((5 * i)::INT) AS cs,
             TIMESTAMP '2024-01-01' + to_days((5 * i + 5)::INT) AS ce
      FROM range(0, 6) t(i))
    SELECT campaign_id, event_type,
           count(*) AS n_events, round(sum(value), 2) AS sum_value
    FROM events JOIN cal ON ts >= cs AND ts < ce
    GROUP BY campaign_id, event_type
    """,
)
def q_campaign_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join against a SMALL interval dimension (a 6-window campaign
    calendar): the correct plan here is the broadcast nested loop —
    kilobyte dim × fact with a pure range condition — NOT the bin
    blocking ``interval_overlap`` uses for big×big interval joins.  Both
    shapes are plan-audited; picking per side-size is the point.  The
    fact side never shuffles until the tiny per-campaign aggregate."""
    cal = spark.range(6).select(
        F.col("id").alias("campaign_id"),
        F.expr(
            "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,cast(5*id as int),0,0,0)"
        ).alias("cs"),
        F.expr(
            "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,cast(5*id+5 as int),0,0,0)"
        ).alias("ce"),
    )
    ev = _t(spark, sf_dir, "events")
    return (
        ev.join(
            F.broadcast(cal),
            (ev["ts"] >= F.col("cs")) & (ev["ts"] < F.col("ce")),
        )
        .groupBy("campaign_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


@query(
    "interval_overlap",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, epoch_ms(ts) AS s, epoch_ms(ts) + 1800000 AS e
      FROM events WHERE event_type = 'purchase'
    )
    SELECT a.event_id AS id_a, b.event_id AS id_b,
           a.user_id AS user_a, b.user_id AS user_b,
           least(a.e, b.e) - greatest(a.s, b.s) AS overlap_ms
    FROM p a JOIN p b
      ON a.event_id < b.event_id AND a.s < b.e AND b.s < a.e
    """,
)
def q_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval overlap self-join (purchases as 30 min half-open intervals
    — pair volume is density-quadratic, so the window sizes the output):
    bin-blocked equi-join with exactly-once pair emission at the bin
    containing the overlap start — never a range sort-merge or cartesian.
    The oracle is the brute-force range join; identical rows prove the
    blocking is lossless."""
    from stateful_spark_streaming_spark.operators.temporal import (
        interval_overlap_pairs,
    )

    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    iv = ev.select(
        "event_id",
        "user_id",
        F.unix_millis("ts").alias("start_ms"),
        (F.unix_millis("ts") + F.lit(1_800_000)).alias("end_ms"),
    )
    return interval_overlap_pairs(
        iv, id_col="event_id", bin_ms=1_800_000, carry_cols=("user_id",)
    ).select(
        "id_a",
        "id_b",
        F.col("user_id_a").alias("user_a"),
        F.col("user_id_b").alias("user_b"),
        "overlap_ms",
    )


# --------------------------------------------------------------------------
# Catalog ordering: the driver's correctness gate records exactly the
# FIRST 50 catalog entries per round (r2 cut 50 in declaration order, r3
# cut 50 in cheapest-first order — same count under two orderings means an
# entry-count cap, not a wall-clock budget; VERDICT r3 #1).  Which 50 lead
# is therefore a per-round ROTATION decision, and since round 9 it is NOT
# hand-maintained here: `python tools/window_audit.py --plan [--pin ...]`
# computes the next window from the recorded CORRECTNESS_r*.json evidence
# (stalest entries first, changed-this-round pins next, oldest-green fill)
# and writes `window_plan.json`, which `_reorder_catalog` loads as the
# leading block.  The audit's default mode verifies the catalog's first-50
# matches the plan and that the plan is for the upcoming round — the
# round-6/round-8 provenance-comment drift class is structurally gone.
# `_CHEAP_FIRST` below remains only as the TAIL order (bench-measured
# cheapest-first within cohorts) and as the fallback if the plan file is
# missing.
# --------------------------------------------------------------------------
_CHEAP_FIRST = [
    "cosine_near_pairs_lsh", "streaming_session_windows_append",
    "streaming_dedup_minhash", "streaming_ivf_topk",
    "streaming_track_snapshot", "state_store_snapshot",
    "streaming_event_pairs",
    "quality_histogram", "quality_quantiles",
    "streaming_quality_histogram",
    "decontaminate_bloom",
    "merge_upsert", "streaming_merge_upsert", "corpus_diff",
    "quality_trim", "heavy_hitters_cms", "streaming_heavy_hitters_cms",
    "temperature_mix", "ngram_overlap",
    "source_drift", "streaming_source_drift", "bpe_pair_counts",
    "bpe_encode_stats", "compression_stats",
    "split_leakage", "dedup_keep_best", "bucketed_join_revenue",
    "order_priority_checking", "large_volume_customers", "top_supplier",
    "partitioned_events_scan", "similar_part_names", "interval_overlap",
    "image_ahash", "streaming_event_pairs_left", "incremental_monthly_revenue",
    "image_near_dups", "image_dedup_keep_best",
    "streaming_incremental_monthly_revenue",
    "important_parts", "parts_supplier_counts", "idle_rich_customers",
    "orders_expectations", "campaign_attribution", "hard_negatives",
    "quality_deciles", "streaming_partitioned_ingest",
    "customers_without_recent_orders", "forecast_revenue",
    "geometry_construct_null",
    "hash_split",
    "sample_n_per_group",
    "token_stats",
    "embedding_norm_stats", "label_centroids",
    "order_stats_conditional", "shuffle_shard",
    "dedup_exact",
    "fingerprint",
    "web_mercator_projection",
    "track_last_n", "profile_columns",
    "monthly_running_revenue",
    "revenue_cube", "events_json_extract",
    "sliding_window_counts", "track_oldest",
    "bucket_rollup", "track_dedup", "tumbling_window_counts",
    "event_type_pivot", "pricing_summary", "priority_top_orders",
    "track_counts", "track_latest", "track_neighbors", "chunk_documents",
    "language_id", "returns_rollup", "quality_score",
    "redact_pii", "sq8_encode", "track_snapshot", "segment_set_ops",
    "value_percentiles", "multimodal_features", "gopher_quality_filter",
    "vocab_topk", "corpus_report", "streaming_vocab_topk",
    "training_pipeline", "training_pipeline_full",
    "session_windows", "pack_sequences_emit", "event_pairs_within_10min",
    "monthly_revenue", "token_budget_mix",
    "dup_ngram_spans", "remove_dup_spans", "streaming_dup_spans",
    "streaming_bigram_logprob",
    "unigram_logprob", "bigram_logprob", "streaming_corpus_report",
    "distinct_sketch_stats", "streaming_distinct_stats",
    "track_range", "part_text_functions", "stratified_sample",
    "customer_value_distribution",
    "repetition_stats",
    "track_rolling_stats", "zorder_key", "asof_clicks_purchases",
    "funnel_steps", "cosine_near_pairs", "track_membership",
    "shipping_priority", "tfidf_topterms", "cosine_topk", "decontaminate",
    "dedup_simhash", "pq_topk", "local_supplier_volume",
    "dedup_minhash_lsh", "containment_pairs", "ivfpq_topk",
    "market_share", "dedup_jaccard_pairs", "cosine_topk_ivf",
    "dedup_clusters", "embedding_dup_clusters",
    "streaming_tumbling_counts", "streaming_decontaminate",
    "streaming_dedup_events", "streaming_session_windows",
    "streaming_enriched_counts",
]


def _window_plan() -> list[str]:
    """The tool-emitted gate window (window_plan.json) — the first-50
    block.  Generated, never hand-edited; see tools/window_audit.py."""
    import json

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "window_plan.json")
    try:
        return list(json.load(open(path))["window"])
    except (OSError, KeyError, ValueError):
        return []  # fall back to _CHEAP_FIRST order alone


def _reorder_catalog() -> None:
    global QUERIES, ORACLES
    lead = [n for n in _window_plan() if n in QUERIES]
    order = lead + [n for n in _CHEAP_FIRST if n in QUERIES and n not in lead]
    order += [n for n in QUERIES if n not in order]  # new queries: tail
    QUERIES = {n: QUERIES[n] for n in order}
    ORACLES = {n: ORACLES[n] for n in order if n in ORACLES}


_reorder_catalog()
