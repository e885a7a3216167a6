"""Time-travel over the parquet upsert log: snapshot as of batch N equals
what the merged view showed when batch N was the head."""

from __future__ import annotations

from pyspark.sql import functions as F

from stateful_spark_streaming_spark.streaming.pipeline import ParquetSnapshotSink


def test_snapshot_time_travel(spark, tmp_path):
    sink = ParquetSnapshotSink(spark, "TT", "k", path=str(tmp_path / "snap"))
    b0 = spark.createDataFrame([(1, "a0"), (2, "b0")], ["k", "v"])
    b1 = spark.createDataFrame([(2, "b1"), (3, "c1")], ["k", "v"])
    b2 = spark.createDataFrame([(1, "a2")], ["k", "v"])
    sink(b0, 0)
    sink(b1, 1)
    sink(b2, 2)

    def rows(df):
        return sorted((r["k"], r["v"]) for r in df.select("k", "v").collect())

    assert rows(sink.snapshot_as_of(0)) == [(1, "a0"), (2, "b0")]
    assert rows(sink.snapshot_as_of(1)) == [(1, "a0"), (2, "b1"), (3, "c1")]
    assert rows(sink.snapshot_as_of(2)) == [(1, "a2"), (2, "b1"), (3, "c1")]
    assert rows(sink.query()) == rows(sink.snapshot_as_of(2))


def test_complete_mode_snapshot_time_travel(spark, tmp_path):
    """CompleteSnapshotSink: every batch is a FULL result, so the snapshot
    as of batch N is the entire newest batch ≤ N — not a per-key upsert
    (the override regression ADVICE r2 flagged: snapshot_as_of used to
    TypeError because _merged dropped the as_of_batch parameter)."""
    from stateful_spark_streaming_spark.streaming.pipeline import (
        CompleteSnapshotSink,
    )

    sink = CompleteSnapshotSink(spark, "TTC", "k", path=str(tmp_path / "snapc"))
    sink(spark.createDataFrame([(1, "a0"), (2, "b0")], ["k", "v"]), 0)
    sink(spark.createDataFrame([(1, "a1"), (3, "c1")], ["k", "v"]), 1)

    def rows(df):
        return sorted((r["k"], r["v"]) for r in df.select("k", "v").collect())

    assert rows(sink.snapshot_as_of(0)) == [(1, "a0"), (2, "b0")]
    # batch 1 SUPERSEDES batch 0 wholesale: key 2 is gone, not carried over
    assert rows(sink.snapshot_as_of(1)) == [(1, "a1"), (3, "c1")]
    assert rows(sink.query()) == rows(sink.snapshot_as_of(1))
