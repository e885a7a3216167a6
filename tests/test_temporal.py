"""As-of join and banded range join semantics on crafted fixtures."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from stateful_spark_streaming_spark.operators import temporal as TMP


def _ts(m: int, s: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, m, s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            Row(k=1, ts=_ts(0), tag="before-any"),
            Row(k=1, ts=_ts(5), tag="equal-ts"),
            Row(k=1, ts=_ts(9), tag="between"),
            Row(k=2, ts=_ts(7), tag="other-key"),
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k=1, ts=_ts(5), v=10.0),
            Row(k=1, ts=_ts(8), v=None),   # a legitimately-null value
            Row(k=2, ts=_ts(6), v=30.0),
        ]
    )
    out = {r.tag: r for r in TMP.asof_join(
        left, right, key="k", right_cols=("v",)).collect()}
    assert out["before-any"].asof_ts is None, "no right row at or before"
    assert out["equal-ts"].asof_ts == _ts(5), "ts equality matches (>=)"
    assert out["equal-ts"].asof_v == 10.0
    # the 00:08 right row has v=NULL; the match must be that row (null v),
    # NOT skip back to the 00:05 row — the struct-packing property
    assert out["between"].asof_ts == _ts(8)
    assert out["between"].asof_v is None
    assert out["other-key"].asof_ts == _ts(6)
    assert out["other-key"].asof_v == 30.0


def test_range_join_band_boundaries(spark):
    ev = spark.createDataFrame(
        [
            Row(user_id=1, event_id=1, ts=_ts(0, 0)),
            Row(user_id=1, event_id=2, ts=_ts(1, 0)),    # 60s from #1: inside
            Row(user_id=1, event_id=3, ts=_ts(2, 1)),    # 61s from #2: outside
            Row(user_id=2, event_id=4, ts=_ts(0, 30)),   # other key: never pairs
        ]
    )
    got = {(r.id_a, r.id_b): r.gap_ms for r in TMP.range_join_pairs(
        ev, key="user_id", tolerance_seconds=60).collect()}
    assert got == {(1, 2): 60000}, f"exact-tolerance pair kept, 61s dropped: {got}"

    # wider band: pairs span bucket boundaries (the 3-cell replication)
    got2 = {(r.id_a, r.id_b) for r in TMP.range_join_pairs(
        ev, key="user_id", tolerance_seconds=121).collect()}
    assert got2 == {(1, 2), (2, 3), (1, 3)}
