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
