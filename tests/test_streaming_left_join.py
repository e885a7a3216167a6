"""run_streaming_event_pairs_left: the watermarked LEFT OUTER stream-stream
join and its outer-row release rule.

The crafted replay forces every contract branch across a batch boundary:
a match that spans micro-batches, an unmatched left row released by the
advancing watermark (null-emitted), and a tail unmatched left row younger
than the horizon that must be WITHHELD (it could still match if the
stream resumed)."""

from __future__ import annotations

import datetime

from tests.conftest import land_batches

from stateful_spark_streaming_spark.streaming.pipeline import (
    run_streaming_event_pairs_left,
)

COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def _ts(s: str):
    return datetime.datetime.fromisoformat(s)


def test_left_outer_release_and_withhold(spark, tmp_path):
    b0 = [
        (1, _ts("2024-01-01 10:00:00"), 1, "click", 1.0, "{}"),
        (2, _ts("2024-01-01 10:00:00"), 2, "click", 1.0, "{}"),
    ]
    b1 = [
        # u1's purchase arrives one batch later: the match must cross the
        # state store
        (3, _ts("2024-01-01 10:05:00"), 1, "purchase", 1.0, "{}"),
        (4, _ts("2024-01-01 12:00:00"), 3, "click", 1.0, "{}"),
        (5, _ts("2024-01-01 12:00:00"), 4, "purchase", 1.0, "{}"),
    ]
    land_batches(spark, tmp_path, "ev", [b0, b1], COLS)
    out = run_streaming_event_pairs_left(
        spark,
        str(tmp_path / "ev"),
        max_files_per_trigger=1,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    rows = {(r["user_id"], r["id_a"], r["id_b"], r["gap_ms"]) for r in out.collect()}
    # u1: matched across batches.  u2: unmatched, horizon (12:00) passed
    # 10:10 -> released with nulls.  u3's click at 12:00: +10min is past
    # the final watermark -> WITHHELD entirely.
    assert rows == {(1, 1, 3, 300_000), (2, 2, None, None)}


def test_left_outer_restart_is_idempotent(spark, tmp_path):
    """Re-running over the SAME checkpoint with no new files must not
    re-emit anything — the released null row stays released exactly
    once (append-mode sink + file-source offsets)."""
    b0 = [
        (1, _ts("2024-01-01 10:00:00"), 1, "click", 1.0, "{}"),
        # both sides advance the global watermark (it is the MIN of the
        # two): the 12:00 click is itself withheld, the 12:00 purchase
        # matches nothing, and together they release u1's null row
        (2, _ts("2024-01-01 12:00:00"), 2, "purchase", 1.0, "{}"),
        (3, _ts("2024-01-01 12:00:00"), 3, "click", 1.0, "{}"),
    ]
    land_batches(spark, tmp_path, "ev2", [b0], COLS)
    kw = dict(max_files_per_trigger=1, checkpoint_dir=str(tmp_path / "ck2"))
    r1 = sorted(map(tuple, run_streaming_event_pairs_left(
        spark, str(tmp_path / "ev2"), **kw).collect()))
    r2 = sorted(map(tuple, run_streaming_event_pairs_left(
        spark, str(tmp_path / "ev2"), **kw).collect()))
    assert r1 == r2 == [(1, 1, None, None)]
