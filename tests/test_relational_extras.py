"""TPC-H Q4/Q15/Q18 shapes + partition-pruned dataset layout.

Semantics are pinned on crafted frames (thresholds at the boundary, ties
at the max, late-vs-on-time lines); the layout test asserts the pruning
AND the write-once reuse contract (files untouched on re-ensure).
"""

from __future__ import annotations

import datetime
import glob
import os

from pyspark.sql import functions as F

from stateful_spark_streaming_spark.operators import relational as REL
from stateful_spark_streaming_spark.operators.layout import (
    ensure_partitioned_dataset,
)


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _ts(s: str):
    return datetime.datetime.fromisoformat(s)


def test_order_priority_checking_late_boundary(spark):
    orders = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:00"), "1-URGENT"),
            (2, _ts("2024-01-01 00:00:00"), "1-URGENT"),
            (3, _ts("2024-01-01 00:00:00"), "2-HIGH"),
        ],
        "o_orderkey long, o_orderdate timestamp, o_orderpriority string",
    )
    lineitem = spark.createDataFrame(
        [
            # order 1: one line EXACTLY at +60d (not late: strict >), one at +60d+1s
            (1, _ts("2024-03-01 00:00:00")),
            (1, _ts("2024-03-01 00:00:01")),
            # order 2: all lines on time
            (2, _ts("2024-01-15 00:00:00")),
            # order 3: two late lines — order still counted ONCE (semi join)
            (3, _ts("2024-06-01 00:00:00")),
            (3, _ts("2024-07-01 00:00:00")),
        ],
        "l_orderkey long, l_shipdate timestamp",
    )
    out = {
        r["o_orderpriority"]: r["n_late_orders"]
        for r in REL.order_priority_checking(orders, lineitem, late_days=60).collect()
    }
    assert out == {"1-URGENT": 1, "2-HIGH": 1}


def test_large_volume_customers_threshold_inclusive(spark):
    customer = spark.createDataFrame(
        [(10, "alice"), (20, "bob")], "c_custkey long, c_name string"
    )
    orders = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 00:00:00"), 100.0),
            (2, 20, _ts("2024-02-01 00:00:00"), 200.0),
        ],
        "o_orderkey long, o_custkey long, o_orderdate timestamp, o_totalprice double",
    )
    lineitem = spark.createDataFrame(
        [(1, 30.0), (1, 20.0), (2, 49.9)],  # order 1 sums to exactly 50.0
        "l_orderkey long, l_quantity double",
    )
    rows = REL.large_volume_customers(
        customer, orders, lineitem, min_qty=50.0
    ).collect()
    assert [(r["c_custkey"], r["o_orderkey"], r["sum_qty"]) for r in rows] == [
        (10, 1, 50.0)
    ]


def test_top_supplier_ties_and_single_lineitem_scan(spark):
    supplier = spark.createDataFrame(
        [(1, "s1"), (2, "s2"), (3, "s3")], "s_suppkey long, s_name string"
    )
    lineitem = spark.createDataFrame(
        [
            # suppliers 1 and 2 tie at revenue 100.00 (after rounding);
            # supplier 3 trails; one row outside the window is excluded
            (1, _ts("1996-02-01 00:00:00"), 100.0, 0.0),
            (2, _ts("1996-02-01 00:00:00"), 200.0, 0.5),
            (3, _ts("1996-02-01 00:00:00"), 99.0, 0.0),
            (3, _ts("1997-01-01 00:00:00"), 1000.0, 0.0),
        ],
        "l_suppkey long, l_shipdate timestamp, l_extendedprice double, l_discount double",
    )
    out = REL.top_supplier(supplier, lineitem)
    rows = sorted((r["s_suppkey"], r["total_rev"]) for r in out.collect())
    assert rows == [(1, 100.0), (2, 100.0)]
    # the pinned revenue agg means lineitem's parquet/scan subtree is
    # materialized once: the physical plan reuses an InMemory scan
    assert "InMemoryTableScan" in _plan(out)


def test_partitioned_dataset_prunes_and_reuses(spark, tmp_path):
    loc = str(tmp_path / "ev")
    df = spark.createDataFrame(
        [
            (i, datetime.date(2024, 1, 1 + (i % 10)), float(i))
            for i in range(100)
        ],
        "event_id long, event_date date, value double",
    )
    ensure_partitioned_dataset(spark, df, "event_date", loc)
    files = sorted(glob.glob(os.path.join(loc, "event_date=*", "*.parquet")))
    assert len({os.path.dirname(f) for f in files}) == 10  # one dir per day
    mtimes = {f: os.stat(f).st_mtime_ns for f in files}

    # re-ensure: the _SUCCESS guard must reuse files byte-identical
    ensure_partitioned_dataset(spark, df, "event_date", loc)
    assert {f: os.stat(f).st_mtime_ns for f in files} == mtimes

    back = spark.read.parquet(loc)
    sliced = back.filter(
        (F.col("event_date") >= F.lit("2024-01-03"))
        & (F.col("event_date") <= F.lit("2024-01-04"))
    )
    plan = _plan(sliced)
    assert "PartitionFilters: [isnotnull(event_date" in plan
    # pruning is real: only the 2 matching directories' rows come back,
    # and the data filter list is EMPTY (the predicate never reaches rows)
    assert sliced.count() == 20
    assert "PushedFilters: []" in plan or "PushedFilters" not in plan
