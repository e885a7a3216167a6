"""Keyed stateful track maintenance — Structured Streaming form.

The reference's core (SURVEY §2.3): ``mapWithState`` folds each arriving
feature into a per-key FeatureState holding a chronologically sorted,
timestamp-deduplicated, count-bounded TreeSet (StreamWithStates.scala:58-81;
FeatureTrack.scala:17-138; FeatureTrackPurger.scala:7-12).

Spark-first realization: ``applyInPandasWithState`` over ``groupBy(key)``.
The fold function receives Arrow batches per key and maintains the track as
parallel arrays in the state store (RocksDB-backed via session config for
state that outgrows executor heap).  Semantics implemented exactly:

- T1 keyed update: fold new rows into per-key state
- T2 init: first record creates an empty track (cap = max_per_track)
- T3 temporal dedup: a row whose event time equals one already in the track
  is dropped; within a batch, first arrival (lowest arrival id) wins
- T4 bounded retention: keep the max_per_track most-recent by event time
- T5 snapshot emit: each invoked key emits its full current track summary
  every trigger (the all-keys view is maintained by the sink — see
  pipeline.SnapshotView for the decision record on stateSnapshots parity)
- T7 (upgrade): optional processing-time TTL — the reference *claims* a
  30-minute session timeout in comments but never implements it
  (StreamWithStates.scala:63); here it is real and off by default.

The emitted row per key matches the batch operator
``operators.tracks.track_snapshot`` exactly, so the DuckDB oracle for the
batch query doubles as the oracle for a single-batch (availableNow) stream.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_SPARK_TO_PY_DEFAULT = {"string": None, "double": None, "long": None}


@dataclass
class TrackStateConfig:
    key: str = "user_id"
    ts: str = "ts"  # event-time column (TimestampType)
    arrival: str = "event_id"  # deterministic arrival tiebreak (monotonic id)
    value_cols: tuple[str, ...] = ("event_type", "value")
    value_types: tuple[str, ...] = ("string", "double")  # spark simpleString types
    max_per_track: int = 10
    key_type: str = "long"
    ttl_minutes: int | None = None  # T7: None = reference parity (no timeout)

    def output_schema(self) -> StructType:
        fields = [
            StructField(self.key, _SIMPLE[self.key_type], False),
            StructField("track_count", LongType()),
            StructField("latest_ts_ms", LongType()),
            StructField("oldest_ts_ms", LongType()),
        ]
        for c, t in zip(self.value_cols, self.value_types):
            fields.append(StructField(f"latest_{c}", _SIMPLE[t]))
        return StructType(fields)

    def state_schema(self) -> StructType:
        fields = [
            StructField("ts_ms", ArrayType(LongType())),
            StructField("arrival", ArrayType(LongType())),
        ]
        for c, t in zip(self.value_cols, self.value_types):
            fields.append(StructField(f"v_{c}", ArrayType(_SIMPLE[t])))
        return StructType(fields)


_SIMPLE = {"string": StringType(), "double": DoubleType(), "long": LongType()}


def _make_fold(cfg: TrackStateConfig):
    """Build the per-key fold closure (the StateSpec.function equivalent,
    StreamWithStates.scala:64-71)."""
    n_vals = len(cfg.value_cols)

    def fold(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            st = state.get
            ts_ms = list(st[0])
            arrival = list(st[1])
            vals = [list(st[2 + i]) for i in range(n_vals)]
        else:  # T2: first record for this key → empty track
            ts_ms, arrival, vals = [], [], [[] for _ in range(n_vals)]

        known = dict(zip(ts_ms, range(len(ts_ms))))  # event-time → slot
        rows = []
        for pdf in pdf_iter:
            for tup in pdf.itertuples(index=False):
                d = tup._asdict()
                t = d[cfg.ts]
                t_ms = int(pd.Timestamp(t).value // 1_000_000) if t is not None else 0
                rows.append((t_ms, int(d[cfg.arrival]), [d[c] for c in cfg.value_cols]))
        # batch-order determinism: process by (ts, arrival) so the first
        # arrival wins equal-ts contests exactly as in sequential ingest
        rows.sort(key=lambda r: (r[0], r[1]))
        for t_ms, arr, vs in rows:
            if t_ms in known:  # T3: equal event time → reject later arrival
                continue
            known[t_ms] = len(ts_ms)
            ts_ms.append(t_ms)
            arrival.append(arr)
            for i in range(n_vals):
                vals[i].append(vs[i])
        # T4: purge oldest beyond cap (sort slots chronologically, keep tail)
        order = sorted(range(len(ts_ms)), key=lambda i: ts_ms[i])
        if cfg.max_per_track and len(order) > cfg.max_per_track:
            order = order[-cfg.max_per_track :]
        ts_ms = [ts_ms[i] for i in order]
        arrival = [arrival[i] for i in order]
        vals = [[v[i] for i in order] for v in vals]

        state.update((ts_ms, arrival, *vals))
        if cfg.ttl_minutes is not None:
            state.setTimeoutDuration(cfg.ttl_minutes * 60 * 1000)

        # T5: emit this key's full snapshot row (batch-operator-identical)
        out = {
            cfg.key: [key[0]],
            "track_count": [len(ts_ms)],
            "latest_ts_ms": [ts_ms[-1] if ts_ms else None],
            "oldest_ts_ms": [ts_ms[0] if ts_ms else None],
        }
        for i, c in enumerate(cfg.value_cols):
            out[f"latest_{c}"] = [vals[i][-1] if vals[i] else None]
        yield pd.DataFrame(out)

    return fold


def track_state_stream(keyed: DataFrame, cfg: TrackStateConfig) -> DataFrame:
    """Wire the fold into the stream: ``groupBy(key).applyInPandasWithState``.

    The shuffle on ``key`` is the same exchange the reference's mapWithState
    implies; state lives in the state store (RocksDB at scale), checkpointed
    with source offsets — restart-safe, which the reference's DStream
    checkpointing famously is not (README.md:24-108)."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if cfg.ttl_minutes is not None
        else GroupStateTimeout.NoTimeout
    )
    return keyed.groupBy(cfg.key).applyInPandasWithState(
        _make_fold(cfg),
        outputStructType=cfg.output_schema(),
        stateStructType=cfg.state_schema(),
        outputMode="update",
        timeoutConf=timeout,
    )
