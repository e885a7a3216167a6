"""Track algebra semantics — crafted fixtures that exercise the behaviors the
reference pins down: first-arrival dedup on equal timestamps, oldest-first
eviction at the cap, latest/oldest/neighbor lookups."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row

from stateful_spark_streaming_spark.operators import tracks as TR


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, 0, s)


@pytest.fixture()
def flights(spark):
    rows = [
        # key A: 12 distinct timestamps (cap 10 must evict the 2 oldest)
        *[Row(arrival=i, key="A", ts=_ts(i), val=float(i)) for i in range(12)],
        # key B: duplicate timestamp — arrival 100 first, 101 must be dropped
        Row(arrival=100, key="B", ts=_ts(5), val=1.0),
        Row(arrival=101, key="B", ts=_ts(5), val=2.0),
        Row(arrival=102, key="B", ts=_ts(7), val=3.0),
    ]
    return spark.createDataFrame(rows)


def test_dedup_keeps_first_arrival(flights):
    out = TR.dedup_first_arrival(flights, "key", "ts", "arrival")
    b = {r.arrival: r for r in out.filter("key = 'B'").collect()}
    assert set(b) == {100, 102}, "later-arriving equal-ts row must be rejected"
    assert b[100].val == 1.0


def test_bound_last_n_evicts_oldest(flights):
    out = TR.build_tracks(flights, "key", "ts", "arrival", max_per_track=10)
    a = sorted(r.ts for r in out.filter("key = 'A'").collect())
    assert len(a) == 10
    assert a[0] == _ts(2), "two oldest rows evicted"
    assert a[-1] == _ts(11)


def test_track_counts_and_latest_oldest(flights):
    tracks = TR.build_tracks(flights, "key", "ts", "arrival", max_per_track=10)
    counts = {r.key: r.track_count for r in TR.track_counts(tracks, "key").collect()}
    assert counts == {"A": 10, "B": 2}

    latest = {r.key: r for r in TR.track_latest(tracks, "key", "ts", ["val"]).collect()}
    assert latest["A"].latest_val == 11.0
    assert latest["B"].latest_val == 3.0

    oldest = {r.key: r for r in TR.track_oldest(tracks, "key", "ts", ["val"]).collect()}
    assert oldest["A"].oldest_val == 2.0
    assert oldest["B"].oldest_val == 1.0  # the first-arrival survivor


def test_track_neighbors(flights):
    deduped = TR.dedup_first_arrival(flights, "key", "ts", "arrival")
    out = TR.track_neighbors(deduped, "key", "ts", ["val"], n=1)
    b = {r.ts: r for r in out.filter("key = 'B'").collect()}
    assert b[_ts(5)].prev1_val is None
    assert b[_ts(5)].next1_val == 3.0
    assert b[_ts(7)].prev1_val == 1.0


def test_track_range_strict_bounds(flights):
    out = TR.track_range(flights.filter("key = 'A'"), "ts", start=_ts(3), end=_ts(6))
    got = sorted(r.ts.second for r in out.collect())
    assert got == [4, 5], "bounds are strict (reference before/after semantics)"


def test_snapshot_shape(spark, sf_dir):
    from stateful_spark_streaming_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    snap = TR.track_snapshot(ev, "user_id", "ts", "event_id", ["event_type", "value"])
    rows = snap.collect()
    assert len(rows) == ev.select("user_id").distinct().count()
    assert all(r.track_count <= 10 for r in rows)
    cols = set(snap.columns)
    assert {"user_id", "track_count", "latest_ts_ms", "oldest_ts_ms",
            "latest_event_type", "latest_value"} == cols


def test_track_membership_ops(flights):
    """W7: contains / remove / clear / isEmpty (FeatureTrack.scala:23-49)."""
    # contains: A has a feature at t=5, B has one at t=5, neither at t=30
    c5 = {r.key: r.contains_at for r in TR.track_contains(
        flights, "key", "ts", _ts(5)).collect()}
    assert c5 == {"A": True, "B": True}
    c30 = {r.key: r.contains_at for r in TR.track_contains(
        flights, "key", "ts", _ts(30)).collect()}
    assert c30 == {"A": False, "B": False}

    # remove: dropping t=5 removes one A row and both equal-ts B rows
    removed = TR.track_remove(flights, "ts", _ts(5))
    assert removed.filter("ts = timestamp '2024-01-01 00:00:05'").count() == 0
    assert removed.count() == flights.count() - 3

    # clear selected keys / all keys
    only_a = TR.track_clear(flights, "key", keys=["B"])
    assert {r.key for r in only_a.select("key").distinct().collect()} == {"A"}
    assert TR.track_clear(flights, "key").count() == 0

    # isEmpty relative to the original key universe
    emptied = TR.track_clear(flights, "key", keys=["B"])
    empt = {r.key: r.is_empty for r in TR.track_is_empty(
        emptied, "key", flights).collect()}
    assert empt == {"A": False, "B": True}
