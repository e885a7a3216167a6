"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship track-snapshot query at sf0.001 (smoke).
``queries()`` — one callable per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent SQL for each query key.

Column names are aliased identically on both sides; the driver sorts columns
by name before hashing values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from stateful_spark_streaming_spark import queries_catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return queries_catalog.QUERIES["track_snapshot"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(queries_catalog.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(queries_catalog.ORACLES)
