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
    ensure_partitioned_dataset(df, "event_date", loc)
    files = sorted(glob.glob(os.path.join(loc, "event_date=*", "*.parquet")))
    assert len({os.path.dirname(f) for f in files}) == 10  # one dir per day
    mtimes = {f: os.stat(f).st_mtime_ns for f in files}

    # re-ensure: the _SUCCESS guard must reuse files byte-identical
    ensure_partitioned_dataset(df, "event_date", loc)
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


def test_important_parts_threshold_strict(spark):
    lineitem = spark.createDataFrame(
        [(1, 100.0, 0.0), (2, 100.0, 0.0), (3, 400.0, 0.0)],
        "l_partkey long, l_extendedprice double, l_discount double",
    )
    # mean part value = 200; threshold 1.25x = 250 -> only part 3 (strict >)
    rows = REL.important_parts(lineitem, mean_multiple=1.25).collect()
    assert [(r["l_partkey"], r["part_value"]) for r in rows] == [(3, 400.0)]


def test_parts_supplier_counts_blocklist_and_dedup(spark):
    part = spark.createDataFrame(
        [(1, "b1", "t1", 5), (2, "b1", "t1", 5)],
        "p_partkey long, p_brand string, p_type string, p_size int",
    )
    supplier = spark.createDataFrame(
        [(10, 5.0), (11, -1.0), (12, 0.0)], "s_suppkey long, s_acctbal double"
    )
    lineitem = spark.createDataFrame(
        # part 1: suppliers 10 (twice -> dedup), 11 (blocked); part 2: 10, 12
        [(1, 10), (1, 10), (1, 11), (2, 10), (2, 12)],
        "l_partkey long, l_suppkey long",
    )
    rows = REL.parts_supplier_counts(part, supplier, lineitem).collect()
    # both parts share (b1, t1, 5): distinct unblocked suppliers = {10, 12}
    assert [(r["p_brand"], r["p_type"], r["p_size"], r["supplier_cnt"]) for r in rows] == [
        ("b1", "t1", 5, 2)
    ]


def test_idle_rich_customers_avg_and_anti(spark):
    customer = spark.createDataFrame(
        [(1, 1, 100.0), (2, 1, 300.0), (3, 2, 300.0), (4, 2, -50.0)],
        "c_custkey long, c_nationkey int, c_acctbal double",
    )
    orders = spark.createDataFrame(
        [(3, 500_000.0), (2, 10.0)], "o_custkey long, o_totalprice double"
    )
    # positive-balance avg = (100+300+300)/3 = 233.33; rich = {2, 3};
    # 3 has a big order -> excluded; 2's order is small -> kept
    rows = REL.idle_rich_customers(customer, orders).collect()
    assert [(r["c_nationkey"], r["n_customers"], r["total_bal"]) for r in rows] == [
        (1, 1, 300.0)
    ]


def test_expectations_report_null_predicate_counts_as_violation(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, -1.0), (3, 2.0)],
        "k long, v double",
    )
    rows = {
        r["check"]: (r["n_rows"], r["n_violations"], r["passed"])
        for r in REL.expectations_report(
            df, [("v_positive", F.col("v") > 0)], key_col="k"
        ).collect()
    }
    # NULL predicate result = violation (unknown != satisfied); dup key 3
    assert rows == {
        "v_positive": (4, 2, False),
        "unique(k)": (4, 1, False),
    }
    # single-pass claim: exactly one aggregate, no join in the plan
    plan = _plan(
        REL.expectations_report(df, [("p", F.col("v") > 0)], key_col="k")
    )
    assert "Join" not in plan


def test_read_jsonl_corrupt_capture_and_failfast(spark, tmp_path):
    """The malformed-tolerant JSONL reader: PERMISSIVE lands broken lines
    in the corrupt column with data fields NULL (counted, not dropped,
    not fatal); FAILFAST refuses the same feed loudly; a clean feed
    parses fully under both modes."""
    import os

    import pytest
    from py4j.protocol import Py4JJavaError

    from stateful_spark_streaming_spark.sources.tables import read_jsonl

    dirty = str(tmp_path / "dirty")
    os.makedirs(dirty)
    with open(os.path.join(dirty, "part-0.jsonl"), "w") as fh:
        fh.write('{"doc_id": 1, "source": "web", "n_chars": 10}\n')
        fh.write('{"doc_id": 2, "source": "web", "n_chars": 20\n')   # truncated
        fh.write('not json at all\n')
        fh.write('{"doc_id": 3, "source": "books", "n_chars": 30}\n')

    df = read_jsonl(spark, dirty, "doc_id long, source string, n_chars long")
    rows = df.collect()
    assert len(rows) == 4
    good = {r.doc_id: (r.source, r.n_chars) for r in rows if r._corrupt is None}
    assert good == {1: ("web", 10), 3: ("books", 30)}
    bad = [r for r in rows if r._corrupt is not None]
    assert len(bad) == 2
    assert all(r.doc_id is None and r.source is None for r in bad)
    assert {r._corrupt.strip()[:12] for r in bad} == {'{"doc_id": 2', "not json at "}

    with pytest.raises(Py4JJavaError):
        read_jsonl(
            spark, dirty, "doc_id long, source string, n_chars long",
            mode="FAILFAST",
        ).collect()

    clean = str(tmp_path / "clean")
    os.makedirs(clean)
    with open(os.path.join(clean, "part-0.jsonl"), "w") as fh:
        fh.write('{"doc_id": 1, "source": "web", "n_chars": 10}\n')
    got = read_jsonl(
        spark, clean, "doc_id long, source string, n_chars long",
        mode="FAILFAST",
    ).collect()
    assert [(r.doc_id, r.source, r.n_chars) for r in got] == [(1, "web", 10)]
