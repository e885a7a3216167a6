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


def test_funnel_steps_sequential_semantics(spark):
    import datetime as dt

    def t(m):
        return dt.datetime(2024, 1, 1, 10, m)

    rows = [
        # user 1: full funnel in order
        (1, t(0), "view"), (1, t(5), "click"), (1, t(9), "purchase"),
        # user 2: purchase BEFORE click -> only 2 steps count
        (2, t(0), "view"), (2, t(3), "purchase"), (2, t(6), "click"),
        # user 3: view only
        (3, t(1), "view"),
        # user 4: click with no prior view -> 0 steps
        (4, t(2), "click"), (4, t(4), "purchase"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    out = {r.user_id: r for r in TMP.funnel_steps(df).collect()}
    assert out[1].steps_completed == 3
    assert out[1].t_purchase_ms is not None
    assert out[2].steps_completed == 2, "purchase before click must not count"
    assert out[2].t_purchase_ms is None
    assert out[3].steps_completed == 1 and out[3].t_click_ms is None
    assert out[4].steps_completed == 0 and out[4].t_view_ms is None


def test_track_rolling_stats_hand_computed(spark):
    import datetime as dt

    from stateful_spark_streaming_spark.operators import tracks as TR

    rows = [
        (i, dt.datetime(2024, 1, 1, 10, i), 7, float(v))
        for i, v in enumerate([1.0, 3.0, 5.0, 7.0, 9.0, 11.0])
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "value"])
    out = {r.event_id: r for r in TR.track_rolling_stats(df, frame=2).collect()}
    assert out[0].roll_n == 1 and out[0].roll_avg == 1.0
    assert out[2].roll_n == 3 and out[2].roll_avg == 3.0  # (1+3+5)/3
    assert out[5].roll_n == 3 and out[5].roll_avg == 9.0  # (7+9+11)/3
    assert out[5].roll_max == 11.0


def test_range_join_randomized_pre_epoch_timestamps(spark):
    """Seeded randomized brute-force cross-check for the 3-cell banded
    range join on PRE-EPOCH timestamps: negative epoch-millis make the
    cell id come from toward-zero truncation, not floor (the cell
    containing zero is double-width).  Completeness still holds — a
    tolerance-length jump crosses at most one multiple-of-tol boundary,
    and the zero merge only removes boundaries — and exactly-once holds
    because one side's cell is fixed while the other replicates into 3
    DISTINCT cells.  List-vs-set compare catches duplicates."""
    import itertools
    import random

    from pyspark.sql import functions as F

    rng = random.Random(7)
    rows = [
        (i % 3, i, rng.randint(-5_000_000, 5_000_000)) for i in range(120)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ms long"
    ).select("user_id", "event_id", F.expr("timestamp_millis(ms)").alias("ts"))
    for tol_s in (600, 37):
        got = [
            (r.id_a, r.id_b, r.gap_ms)
            for r in TMP.range_join_pairs(
                df, key="user_id", tolerance_seconds=tol_s
            ).collect()
        ]
        want = {
            (ia, ib, abs(ma - mb))
            for (ka, ia, ma), (kb, ib, mb) in itertools.combinations(rows, 2)
            if ka == kb and ia < ib and abs(ma - mb) <= tol_s * 1000
        }
        assert len(got) == len(want), f"tol={tol_s}: duplicate/dropped pairs"
        assert set(got) == want, f"tol={tol_s}"


def test_asof_join_randomized_against_reference(spark):
    """Seeded randomized cross-check of the union-window as-of join
    against the straight-line definition (per left row: the right row of
    the same key with the greatest right_ts <= left_ts).  Random data
    exercises what the crafted cases can't enumerate: dense ts ties
    BETWEEN the sides, left rows before any right row, keys with no
    right rows at all, and NULL right values that must not be skipped
    past (the struct-packing property).  Right side unique per (key, ts)
    — the operator's documented precondition for determinism."""
    import random

    rng = random.Random(11)
    lefts = [(i, rng.randint(0, 4), rng.randint(0, 400)) for i in range(150)]
    rights = {}
    for _ in range(120):
        k, t = rng.randint(0, 4), rng.randint(0, 400)
        if k < 4:  # key 4 never gets right rows
            rights[(k, t)] = (
                None if rng.random() < 0.2 else round(rng.random(), 6)
            )
    left = spark.createDataFrame(
        [(i, k, t) for i, k, t in lefts], "lid long, k long, ts long"
    )
    right = spark.createDataFrame(
        [(k, t, v) for (k, t), v in rights.items()], "k long, ts long, v double"
    )
    got = {
        r["lid"]: (r["asof_ts"], r["asof_v"])
        for r in TMP.asof_join(left, right, key="k", right_cols=("v",)).collect()
    }
    assert len(got) == len(lefts), "one output row per left row, no fan-out"
    for i, k, t in lefts:
        cands = [rt for (rk, rt) in rights if rk == k and rt <= t]
        want = (
            (max(cands), rights[(k, max(cands))]) if cands else (None, None)
        )
        assert got[i] == want, f"lid={i} key={k} ts={t}: {got[i]} != {want}"


def test_funnel_steps_randomized_against_reference(spark):
    """Seeded randomized cross-check of the chained conditional-min
    funnel against the sequential definition: step N's time is the min
    event time of its type STRICTLY after step N-1's resolved time.
    Random data hits the tie cases the crafted test can't enumerate —
    same-ts view+click (click must NOT count), multiple candidates per
    step, keys stalling at every depth."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(13)
    steps = ("view", "click", "purchase")
    rows = [
        (rng.randint(0, 19), rng.choice(steps), rng.randint(0, 30))
        for _ in range(400)
    ]
    df = spark.createDataFrame(
        [(k, s, t * 1000) for k, s, t in rows],
        "user_id long, event_type string, ms long",
    ).select(
        "user_id", "event_type", F.expr("timestamp_millis(ms)").alias("ts")
    )
    got = {
        r["user_id"]: (
            r["t_view_ms"], r["t_click_ms"], r["t_purchase_ms"],
            r["steps_completed"],
        )
        for r in TMP.funnel_steps(df, key="user_id").collect()
    }
    bykey: dict = {}
    for k, s, t in rows:
        bykey.setdefault(k, []).append((s, t * 1000))
    for k, evs in bykey.items():
        prev, times, done = None, [], 0
        for step in steps:
            cands = [
                t for s, t in evs
                if s == step and (prev is None or t > prev)
            ]
            if not cands:
                # once a step is missed, deeper steps cannot complete
                times.extend([None] * (len(steps) - len(times)))
                break
            prev = min(cands)
            times.append(prev)
            done += 1
        assert got[k] == (*times[:3], done), f"user {k}: {got[k]} vs {(*times[:3], done)}"
