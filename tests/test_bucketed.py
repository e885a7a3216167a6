"""ensure_bucketed_table: the shuffle-free co-located join layout.

Asserts the three claims the operator makes: (1) joins + key-grouped
aggregates over co-bucketed tables plan with ZERO exchanges; (2) results
are identical to the plain non-bucketed join; (3) the on-disk data is
reusable across sessions — dropping the catalog entry and re-ensuring
re-registers the existing files (DDL branch) without rewriting, and the
plan is still bucketed."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from stateful_spark_streaming_spark.operators.layout import ensure_bucketed_table


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _mk(spark, tmp_path, n_buckets=4):
    left = spark.createDataFrame(
        [(i % 10, i, float(i)) for i in range(200)], "k long, oid long, v double"
    )
    right = spark.createDataFrame(
        [(i, f"name{i}") for i in range(10)], "k long, name string"
    )
    lt = ensure_bucketed_table(
        spark, left, "tbkt_left", "k", n_buckets, str(tmp_path / "left")
    )
    rt = ensure_bucketed_table(
        spark, right, "tbkt_right", "k", n_buckets, str(tmp_path / "right")
    )
    return left, right, lt, rt


def _join(spark, lt, rt):
    lo, ro = spark.table(lt), spark.table(rt)
    return (
        lo.hint("merge")
        .join(ro, lo["k"] == ro["k"])
        .groupBy(lo["k"], "name")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("v"), 2).alias("sv"))
    )


def test_bucketed_join_zero_exchange_and_parity(spark, tmp_path):
    left, right, lt, rt = _mk(spark, tmp_path)
    try:
        res = _join(spark, lt, rt)
        plan = _plan(res)
        assert "Exchange" not in plan
        assert "SortMergeJoin" in plan
        assert plan.count("Bucketed: true") == 2
        plain = (
            left.join(right, "k")
            .groupBy("k", "name")
            .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("v"), 2).alias("sv"))
        )
        assert {tuple(r) for r in res.collect()} == {
            tuple(r) for r in plain.collect()
        }
    finally:
        spark.sql("DROP TABLE IF EXISTS tbkt_left")
        spark.sql("DROP TABLE IF EXISTS tbkt_right")


def test_bucketed_one_file_per_bucket(spark, tmp_path):
    # the repartition-before-write guarantees AT MOST one file per bucket
    # (an empty bucket writes no file): every file's bucket suffix unique
    _mk(spark, tmp_path, n_buckets=4)
    try:
        files = glob.glob(str(tmp_path / "left" / "part-*"))
        assert files
        buckets = [f.rsplit("_", 1)[1].split(".")[0] for f in files]
        assert len(buckets) == len(set(buckets)) <= 4
    finally:
        spark.sql("DROP TABLE IF EXISTS tbkt_left")
        spark.sql("DROP TABLE IF EXISTS tbkt_right")


def test_bucketed_reregisters_existing_files_without_rewrite(spark, tmp_path):
    left, right, lt, rt = _mk(spark, tmp_path)
    try:
        before = {tuple(r) for r in _join(spark, lt, rt).collect()}
        files = sorted(glob.glob(str(tmp_path / "left" / "part-*")))
        mtimes = [os.path.getmtime(f) for f in files]
        # simulate a fresh session: catalog entry gone, files remain
        spark.sql("DROP TABLE tbkt_left")
        lt2 = ensure_bucketed_table(
            spark, left, "tbkt_left", "k", 4, str(tmp_path / "left")
        )
        assert [os.path.getmtime(f) for f in files] == mtimes  # no rewrite
        res = _join(spark, lt2, rt)
        assert "Bucketed: true" in _plan(res)
        assert "Exchange" not in _plan(res)
        assert {tuple(r) for r in res.collect()} == before
    finally:
        spark.sql("DROP TABLE IF EXISTS tbkt_left")
        spark.sql("DROP TABLE IF EXISTS tbkt_right")


def test_bucketed_ensure_is_session_idempotent(spark, tmp_path):
    left, _, lt, _ = _mk(spark, tmp_path)
    try:
        assert (
            ensure_bucketed_table(
                spark, left, "tbkt_left", "k", 4, str(tmp_path / "left")
            )
            == lt
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS tbkt_left")
        spark.sql("DROP TABLE IF EXISTS tbkt_right")


def test_reregister_rejects_mismatched_bucket_spec(spark, tmp_path):
    """On-disk bucketed data written with one (key, n_buckets) must not
    re-register under another: Spark would trust a HashPartitioning the
    files don't have and the exchange-free SMJ would silently drop
    matches.  The spec sidecar turns that into a loud error."""
    import pytest

    df = spark.createDataFrame(
        [(i % 5, i) for i in range(50)], "k long, v long"
    )
    loc = str(tmp_path / "t")
    ensure_bucketed_table(spark, df, "tbkt_spec", "k", 4, loc)
    spark.sql("DROP TABLE tbkt_spec")
    with pytest.raises(ValueError, match="was written with"):
        ensure_bucketed_table(spark, df, "tbkt_spec", "k", 8, loc)
    with pytest.raises(ValueError, match="was written with"):
        ensure_bucketed_table(spark, df, "tbkt_spec", "v", 4, loc)
    # the matching spec still re-registers without rewriting
    assert ensure_bucketed_table(spark, df, "tbkt_spec", "k", 4, loc) == "tbkt_spec"
    spark.sql("DROP TABLE tbkt_spec")
