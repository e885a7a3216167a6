"""Query the streaming state store directly — true ``stateSnapshots()``.

The reference's ``stateSnapshots()`` (StreamWithStates.scala:74-77) emits
EVERY key's state each batch.  Structured Streaming's state data source
(``spark.read.format("statestore")``) reads the checkpointed state store
itself — RocksDB files, distributed scan, no driver materialization — so
the all-keys view needs no sink at all: it is a plain DataFrame over the
same bytes the processor maintains, available at every batch boundary and
even while the stream is down.

Two views over a track-state checkpoint (state schema from
``TrackStateConfig.state_schema``: sorted parallel arrays per key):

- ``state_snapshot_view``: one row per key — the exact emit contract of the
  processor (track_count / latest / oldest / latest values), derived with
  pure column expressions (`size` / `element_at`) from the state arrays.
- ``state_track_rows``: the FULL track contents — one row per retained
  feature per key (``arrays_zip`` + ``posexplode``), i.e. the reference's
  per-key TreeSet, readable as a table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stateful_spark_streaming_spark.streaming.track_state import TrackStateConfig


def read_state(spark: SparkSession, checkpoint_dir: str) -> DataFrame:
    """Raw state rows: (key struct, value struct, partition_id)."""
    return spark.read.format("statestore").load(checkpoint_dir)


def state_snapshot_view(
    spark: SparkSession, checkpoint_dir: str, cfg: TrackStateConfig | None = None
) -> DataFrame:
    """All-keys snapshot straight from the state store — column-identical to
    the processor's per-key emit (and therefore to the batch
    ``track_snapshot`` operator)."""
    cfg = cfg or TrackStateConfig()
    st = read_state(spark, checkpoint_dir)
    # applyInPandasWithState nests the user state struct under `groupState`
    v = F.col("value.groupState")
    return st.select(
        F.col(f"key.{cfg.key}").alias(cfg.key),
        F.size(v.getField("ts_ms")).cast("long").alias("track_count"),
        F.element_at(v.getField("ts_ms"), -1).alias("latest_ts_ms"),
        F.element_at(v.getField("ts_ms"), 1).alias("oldest_ts_ms"),
        *[
            F.element_at(v.getField(f"v_{c}"), -1).alias(f"latest_{c}")
            for c in cfg.value_cols
        ],
    )


def state_track_rows(
    spark: SparkSession, checkpoint_dir: str, cfg: TrackStateConfig | None = None
) -> DataFrame:
    """The full per-key track contents from the state store: one row per
    retained feature, in chronological order (pos = index in the sorted
    track)."""
    cfg = cfg or TrackStateConfig()
    st = read_state(spark, checkpoint_dir)
    # applyInPandasWithState nests the user state struct under `groupState`
    v = F.col("value.groupState")
    zipped = F.arrays_zip(
        v.getField("ts_ms").alias("ts_ms"),
        v.getField("arrival").alias("arrival"),
        *[v.getField(f"v_{c}").alias(c) for c in cfg.value_cols],
    )
    return st.select(
        F.col(f"key.{cfg.key}").alias(cfg.key),
        F.posexplode(zipped).alias("pos", "f"),
    ).select(
        cfg.key,
        "pos",
        F.col("f.ts_ms").alias("ts_ms"),
        F.col("f.arrival").alias("arrival"),
        *[F.col(f"f.{c}").alias(c) for c in cfg.value_cols],
    )
