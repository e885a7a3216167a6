"""Streaming pipelines: sources → track state → snapshot views + SQL.

Reproduces the reference's end-to-end graphs (SURVEY §3):
- socket text → CSV parse → keyed track state → per-batch snapshot temp view
  → arbitrary SQL → console (StreamWithStates.scala:190-260);
- the multiple-states variant: one source, N independent stateful branches
  (StatefulStreamingWithMultipleStates.scala:64-135);
- checkpoint/restart that actually works (the reference's raison d'être is
  demonstrating DStream recovery FAILING; Structured Streaming's offset +
  state checkpoints make restart a non-event — test_streaming asserts the
  positive outcome).

Snapshot-parity decision (SURVEY §7 risk #1, decided here):
``stateSnapshots()`` in the reference emits ALL keys every batch;
``applyInPandasWithState`` invokes only keys with new data.  We emit
per-key snapshot rows on update and maintain the full table in the sink
(``SnapshotView``) by upserting into a keyed dict registered as a temp view
each batch.  Driver memory is O(#keys × row width) — fine for the
snapshot-table use case (it is shown with ``.show()`` in the reference,
i.e. inherently driver-sized).  At 100 TB-of-keys scale the same sink logic
targets a key-partitioned Delta/Iceberg table with MERGE, and reads become
``max_by(ts)`` per key; the processor emit contract is unchanged.
"""

from __future__ import annotations

import os
import tempfile
import threading
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from stateful_spark_streaming_spark.sources.flights import parse_flight_lines
from stateful_spark_streaming_spark.streaming.track_state import (
    TrackStateConfig,
    track_state_stream,
)


class SnapshotView:
    """foreachBatch sink: upsert each micro-batch's per-key snapshot rows
    into a full snapshot table, register it as a SQL temp view, and
    optionally run/print a query — the reference's showTempView
    (StreamWithStates.scala:36-53) with working all-keys semantics."""

    def __init__(
        self,
        spark: SparkSession,
        view_name: str,
        key: str,
        sql: str | None = None,
        show: bool = False,
    ):
        self.spark = spark
        self.view_name = view_name
        self.key = key
        self.sql = sql or f"select * from {view_name}"  # Q1 default
        self.show = show
        self._rows: dict = {}
        self._schema = None
        self._lock = threading.Lock()
        self.batches_seen = 0

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        rows = batch_df.collect()  # snapshot rows only: O(updated keys)
        with self._lock:
            self._schema = batch_df.schema
            for r in rows:
                self._rows[r[self.key]] = r
            self.batches_seen += 1
            self._register()
            if self.show:
                import datetime

                print(f"========= {self.view_name} {datetime.datetime.now()} =========")
                self.spark.sql(self.sql).show()

    def _register(self) -> None:
        if self._schema is None:
            return  # no batch processed yet (e.g. just restarted)
        df = self.spark.createDataFrame(list(self._rows.values()), self._schema)
        df.createOrReplaceTempView(self.view_name)

    def query(self, sql: str | None = None) -> DataFrame:
        with self._lock:
            if self._schema is None:
                return self.spark.range(0)  # empty: nothing snapshotted yet
            self._register()
        return self.spark.sql(sql or self.sql)


@dataclass
class StreamHandle:
    query: "pyspark.sql.streaming.StreamingQuery"  # noqa: F821
    sink: SnapshotView

    def stop(self) -> None:
        """S9 graceful shutdown."""
        self.query.stop()


def socket_flight_source(spark: SparkSession, host: str = "localhost", port: int = 7777) -> DataFrame:
    """S1: the reference's TCP text source (Defaults.scala:9-10), parsed to
    typed flight features (S2/S3/S4)."""
    raw = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )
    return parse_flight_lines(raw, "value")


def file_flight_source(spark: SparkSession, path: str) -> DataFrame:
    """Production analog of S1: file source replay (one CSV per micro-batch
    with maxFilesPerTrigger=1 — the FlightSim_batch1..9.csv drip)."""
    raw = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", "1")
        .load(path)
    )
    return parse_flight_lines(raw, "value")


FLIGHT_TRACK_CONFIG = TrackStateConfig(
    key="flightId",
    ts="ts",
    arrival="arrival",
    value_cols=("longitude", "latitude", "origin", "destination", "aircraft", "altitude"),
    value_types=("double", "double", "string", "string", "string", "long"),
    max_per_track=10,
    key_type="string",
)


def flight_socket_pipeline(
    spark: SparkSession,
    source: DataFrame,
    checkpoint_dir: str,
    view_name: str = "Flights",
    cfg: TrackStateConfig = FLIGHT_TRACK_CONFIG,
    sql: str | None = None,
    trigger_seconds: float = 1.0,
    show: bool = False,
) -> StreamHandle:
    """The full reference graph: parse → key → state → snapshot view → SQL.

    Micro-batch default 1 s (T8, Duration(1000) parity); checkpointing is
    Structured Streaming's offset+state log (S7/S8) — resumable."""
    from pyspark.sql import functions as F

    # arrival tiebreak for equal-ts dedup: streaming sources expose no row
    # order (and monotonically_increasing_id is not allowed on streams), so
    # the "first arrival wins" contest among equal-timestamp rows uses a
    # stable content hash — deterministic across replays, which the
    # reference's physical arrival order is not.
    with_arrival = source.withColumn(
        "arrival", F.xxhash64(*[F.col(c) for c in source.columns if c != "geometry"])
    )
    snap = track_state_stream(with_arrival, cfg)
    sink = SnapshotView(spark, view_name, cfg.key, sql=sql, show=show)
    q = (
        snap.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )
    return StreamHandle(query=q, sink=sink)


def multi_state_pipeline(
    spark: SparkSession,
    source: DataFrame,
    checkpoint_root: str,
    configs: dict[str, TrackStateConfig],
    trigger_seconds: float = 1.0,
) -> dict[str, StreamHandle]:
    """T6: N independent stateful branches over one source — each branch is
    its own streaming query with its own checkpoint + state store, exactly
    the two-views topology of StatefulStreamingWithMultipleStates."""
    handles = {}
    for name, cfg in configs.items():
        handles[name] = flight_socket_pipeline(
            spark,
            source,
            checkpoint_dir=f"{checkpoint_root}/{name}",
            view_name=name,
            cfg=cfg,
            trigger_seconds=trigger_seconds,
        )
    return handles


def run_snapshot_query(
    spark: SparkSession,
    events_path: str,
    cfg: TrackStateConfig | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Batch-equivalent streaming run: availableNow over a parquet path,
    returning the final all-keys snapshot as a DataFrame.

    This is the driver-facing 'streaming_track_snapshot' query: one trigger
    consumes the whole table through the REAL stateful processor, so its
    result must equal the batch track_snapshot operator (same oracle)."""
    import tempfile

    from pyspark.sql import functions as F

    cfg = cfg or TrackStateConfig()
    checkpoint_dir = checkpoint_dir or tempfile.mkdtemp(prefix="sss_ckpt_")

    # file source needs an explicit schema AND a directory; symlink the
    # single parquet file into a temp dir, and read the footer schema with
    # the nanos-as-long conf active, then rebuild a timestamp in-stream
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(events_path).schema
    src_dir = events_path
    if os.path.isfile(events_path):
        src_dir = tempfile.mkdtemp(prefix="sss_stream_src_")
        os.symlink(os.path.abspath(events_path), os.path.join(src_dir, "part-0.parquet"))
    stream_df = spark.readStream.schema(raw_schema).format("parquet").load(src_dir)
    if dict(stream_df.dtypes).get("ts") == "bigint":
        stream_df = stream_df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    keyed = stream_df.withColumn("arrival", F.col(cfg.arrival))
    snap = track_state_stream(keyed, cfg)
    sink = SnapshotView(spark, "StreamingTracks", cfg.key)
    q = (
        snap.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return sink.query()
