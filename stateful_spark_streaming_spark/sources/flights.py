"""Flight CSV decode — the reference's adaptFlight parser, declaratively.

Reference behavior (StreamWithStates.scala:167-188):
  strip double quotes → split on ',' → trim → per-column casts →
  Joda "MM/dd/yyyy hh:mm:ss a" → epoch ms → Point(lon, lat) geometry.

Here the whole parse is built-in column expressions (``from_csv``,
``to_timestamp``, ``struct``) so it stays inside WholeStageCodegen — no
Python in the hot path.  Unparseable timestamps become epoch 0, matching the
Simple variant's swallow-ParseException-to-0 policy (SimpleTime.scala:29-38);
we deliberately do NOT replicate its 12-hour AM/PM skew bug (SURVEY §2 S3b).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from stateful_spark_streaming_spark.schema import (
    FLIGHT_CSV_COLUMNS,
    FLIGHT_TIME_FORMAT,
    geometry_col,
)

_RAW_CSV_SCHEMA = ", ".join(
    f"{c} STRING" if c != "longitude" and c != "latitude" and c != "altitude" else f"{c} STRING"
    for c in FLIGHT_CSV_COLUMNS
)


def parse_flight_lines(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """DataFrame of raw CSV lines → typed flight features.

    Works identically on a batch DataFrame and a streaming DataFrame (socket /
    file source), since it is pure column algebra.
    """
    clean: Column = F.regexp_replace(F.col(value_col), '"', "")  # P7 quote strip
    parsed = lines.select(F.from_csv(clean, _RAW_CSV_SCHEMA).alias("r")).select("r.*")
    return _typed(parsed)


def _typed(df: DataFrame) -> DataFrame:
    # try_to_timestamp: unparseable → NULL (plain to_timestamp THROWS under
    # Spark 4 ANSI mode, which would kill the stream on one bad line)
    ts = F.try_to_timestamp(F.trim(F.col("flightTime")), F.lit(FLIGHT_TIME_FORMAT))
    return df.select(
        F.trim(F.col("flightId")).alias("flightId"),
        # parse-failure → epoch 0 (Simple-variant parity, SimpleTime.scala:32-37)
        F.coalesce(ts, F.lit("1970-01-01 00:00:00").cast("timestamp")).alias("ts"),
        F.col("longitude").cast("double").alias("longitude"),
        F.col("latitude").cast("double").alias("latitude"),
        F.trim(F.col("origin")).alias("origin"),
        F.trim(F.col("destination")).alias("destination"),
        F.trim(F.col("aircraft")).alias("aircraft"),
        F.col("altitude").cast("long").alias("altitude"),
    ).withColumn("geometry", geometry_col("longitude", "latitude"))


def read_flight_csv(spark: SparkSession, path: str) -> DataFrame:
    """Batch flight CSV reader (FlightSim.csv fixture shape)."""
    raw = spark.read.text(path)
    return parse_flight_lines(raw, "value")
