"""Parquet table loaders for the synthetic test tables (TESTDATA.md).

At 100 TB these would be partitioned/bucketed external tables; the loader
keeps the read declarative (``spark.read.parquet``) so Catalyst retains
predicate pushdown, column pruning, and partition pruning on every scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        return _load_events(spark, path)
    return spark.read.parquet(path)


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    """events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 refuses to map to
    TimestampType.  Read nanos as long (legacy conf) and rebuild a proper
    microsecond timestamp — lossless here (no sub-microsecond components in
    the data), and the cast is a codegen'd column op, not a UDF."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    ts_field = df.schema["ts"]
    if isinstance(ts_field.dataType, LongType):
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df.select("event_id", "ts", "user_id", "event_type", "value", "props")


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> dict[str, DataFrame]:
    """Register each table as a temp view so arbitrary ``spark.sql`` works —
    the reference's snapshot-view + "any SQL you want" surface
    (StreamWithStates.scala:46-49) generalized to the whole catalog."""
    out = {}
    for name in tables:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: pre-shuffles rows into ``n_buckets`` files by
    ``bucket_col`` hash, recording the layout in the catalog.  Joins and
    aggregations on the bucket column then read co-located data and Catalyst
    PLANS NO EXCHANGE — the shuffle is paid once at write time instead of
    per query, the core technique for repeated fact-fact joins at 100 TB.
    (Bucketing requires saveAsTable: the bucket spec lives in the table
    catalog, not in bare parquet files.)"""
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket column —
    exchange-free when the bucket specs line up (asserted in pytest via the
    physical plan).  The merge hint keeps the plan on SortMergeJoin even
    when one side is small enough to broadcast: at test SF a broadcast
    would win, but the point here is the layout that works when BOTH sides
    are 100 TB facts."""
    return (
        spark.table(left_table)
        .hint("merge")
        .join(spark.table(right_table), key)
    )
