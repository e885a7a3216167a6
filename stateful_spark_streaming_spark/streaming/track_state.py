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
    # T7: None = reference parity (no timeout); float so tests can use a
    # seconds-scale TTL (the reference claims 30 min, i.e. ttl_minutes=30)
    ttl_minutes: float | None = None

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


def _fold_core(cfg: TrackStateConfig, ts_ms, arrival, vals, new: pd.DataFrame):
    """The pure per-key fold (T2/T3/T4): merge new rows into the sorted,
    ts-deduped, count-bounded track arrays.  Shared verbatim by BOTH
    stateful APIs (applyInPandasWithState and the transformWithState shim)
    so their semantics cannot drift.

    Vectorized: concat batches → (ts, is_new, arrival) sort → dedup.
    Existing state rows sort with _is_new=0 so they always win equal-ts
    contests (TreeSet add-reject semantics) regardless of the arrival id
    domain — arrival ids from xxhash64 span the full int64 range, so no
    numeric sentinel can dominate them."""
    n_vals = len(cfg.value_cols)
    if len(new):
        t = pd.to_datetime(new[cfg.ts])
        if getattr(t.dt, "tz", None) is not None:
            t = t.dt.tz_convert("UTC").dt.tz_localize(None)
        new_ts = t.astype("datetime64[ms]").astype("int64")
        new_ts = new_ts.where(~t.isna(), 0)  # null time → epoch 0 policy
        cur = pd.DataFrame(
            {
                "_ts": ts_ms + new_ts.tolist(),
                "_is_new": [0] * len(ts_ms) + [1] * len(new),
                "_arr": arrival + new[cfg.arrival].astype("int64").tolist(),
                **{
                    f"_v{i}": vals[i] + new[c].tolist()
                    for i, c in enumerate(cfg.value_cols)
                },
            }
        )
        # T3: state-first, then lowest arrival id, per ts; keep the first
        cur = cur.sort_values(["_ts", "_is_new", "_arr"], kind="stable")
        cur = cur[~cur["_ts"].duplicated(keep="first")]
        # T4: purge oldest beyond cap — keep the max_per_track newest
        if cfg.max_per_track:
            cur = cur.tail(cfg.max_per_track)
        ts_ms = cur["_ts"].tolist()
        arrival = cur["_arr"].tolist()
        vals = [cur[f"_v{i}"].tolist() for i in range(n_vals)]
    return ts_ms, arrival, vals


def _snapshot_row(cfg: TrackStateConfig, key_val, ts_ms, vals) -> pd.DataFrame:
    """T5: one full snapshot row for this key (batch-operator-identical)."""
    out = {
        cfg.key: [key_val],
        "track_count": [len(ts_ms)],
        "latest_ts_ms": [ts_ms[-1] if ts_ms else None],
        "oldest_ts_ms": [ts_ms[0] if ts_ms else None],
    }
    for i, c in enumerate(cfg.value_cols):
        out[f"latest_{c}"] = [vals[i][-1] if vals[i] else None]
    return pd.DataFrame(out)


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

        batches = [p for p in pdf_iter if len(p)]
        new = pd.concat(batches, ignore_index=True) if batches else pd.DataFrame()
        ts_ms, arrival, vals = _fold_core(cfg, ts_ms, arrival, vals, new)

        state.update((ts_ms, arrival, *vals))
        if cfg.ttl_minutes is not None:
            state.setTimeoutDuration(int(cfg.ttl_minutes * 60 * 1000))

        yield _snapshot_row(cfg, key[0], ts_ms, vals)

    return fold


def transform_with_state_available() -> tuple[bool, str]:
    """Capability probe for ``transformWithStateInPandas`` (the Spark 4
    stateful API).  Checked, not assumed: the tWS Python worker imports
    google.protobuf (state serialization), which plain PySpark installs
    don't ship — this container among them — and the API itself only
    exists on Spark ≥ 3.5/4.x builds."""
    try:
        import google.protobuf  # noqa: F401  (tWS worker dependency)
    except ImportError:
        return False, "google.protobuf not installed (tWS state-server dependency)"
    try:
        from pyspark.sql.streaming.stateful_processor import (  # noqa: F401
            StatefulProcessor,
        )
    except ImportError:
        return False, "pyspark.sql.streaming.stateful_processor missing"
    from pyspark.sql import GroupedData

    if not hasattr(GroupedData, "transformWithStateInPandas"):
        return False, "GroupedData.transformWithStateInPandas absent"
    return True, "available"


def _transform_with_state_stream(keyed: DataFrame, cfg: TrackStateConfig) -> DataFrame:
    """The SAME track semantics through ``transformWithStateInPandas``:
    a StatefulProcessor whose ValueState holds the identical
    arrays-struct state and whose handleInputRows delegates to the shared
    ``_fold_core`` — so golden replay tests pass unchanged wherever the
    API is usable.  Guarded by ``transform_with_state_available``."""
    ok, why = transform_with_state_available()
    if not ok:
        raise RuntimeError(
            f"transformWithStateInPandas unavailable: {why}; "
            "use track_state_stream(impl='applyInPandas') (the default)"
        )
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    state_schema = cfg.state_schema()
    n_vals = len(cfg.value_cols)

    class TrackProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._track = handle.getValueState("track", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            if self._track.exists():
                st = self._track.get()
                ts_ms, arrival = list(st[0]), list(st[1])
                vals = [list(st[2 + i]) for i in range(n_vals)]
            else:
                ts_ms, arrival, vals = [], [], [[] for _ in range(n_vals)]
            batches = [p for p in rows if len(p)]
            new = (
                pd.concat(batches, ignore_index=True) if batches else pd.DataFrame()
            )
            ts_ms, arrival, vals = _fold_core(cfg, ts_ms, arrival, vals, new)
            self._track.update((ts_ms, arrival, *vals))
            yield _snapshot_row(cfg, key[0], ts_ms, vals)

        def close(self) -> None:
            pass

    return keyed.groupBy(cfg.key).transformWithStateInPandas(
        statefulProcessor=TrackProcessor(),
        outputStructType=cfg.output_schema(),
        outputMode="Update",
        timeMode="None",
    )


def track_state_stream(
    keyed: DataFrame, cfg: TrackStateConfig, impl: str = "applyInPandas"
) -> DataFrame:
    """Wire the fold into the stream: ``groupBy(key).applyInPandasWithState``
    by default, or the ``transformWithStateInPandas`` shim with
    ``impl='transformWithState'`` (capability-checked — raises with the
    reason where the Spark 4 API or its protobuf worker dependency is
    absent).  Both paths share ``_fold_core``, so semantics are identical.

    The shuffle on ``key`` is the same exchange the reference's mapWithState
    implies; state lives in the state store (RocksDB at scale), checkpointed
    with source offsets — restart-safe, which the reference's DStream
    checkpointing famously is not (README.md:24-108)."""
    if impl == "transformWithState":
        return _transform_with_state_stream(keyed, cfg)
    if impl != "applyInPandas":
        raise ValueError(
            f"unknown impl {impl!r} (applyInPandas|transformWithState)"
        )
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
