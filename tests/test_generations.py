"""Crash-state recovery for directory-generation swaps: every kill point
of the compact/retrain swap protocol must leave a state the next call
repairs — never a half-deleted live directory (silent row loss) and
never an unrecoverable missing path."""

from __future__ import annotations

import os

import pytest

from stateful_spark_streaming_spark.generations import (
    recover_generation,
    swap_generation,
)


def _mk(d: str, tag: str, complete: bool = True) -> None:
    os.makedirs(d, exist_ok=True)
    open(os.path.join(d, f"{tag}.parquet"), "w").write(tag)
    if complete:
        open(os.path.join(d, "_SUCCESS"), "w").close()


def _tag(d: str) -> str:
    return [f[:-8] for f in os.listdir(d) if f.endswith(".parquet")][0]


def test_swap_promotes_and_cleans(tmp_path):
    p = str(tmp_path / "t")
    _mk(p, "old_gen")
    _mk(p + ".tmp", "new_gen")
    swap_generation(p)
    assert _tag(p) == "new_gen"
    assert not os.path.exists(p + ".tmp") and not os.path.exists(p + ".old")


def test_swap_refuses_incomplete_tmp(tmp_path):
    p = str(tmp_path / "t")
    _mk(p, "old_gen")
    _mk(p + ".tmp", "partial", complete=False)
    with pytest.raises(ValueError, match="incomplete generation"):
        swap_generation(p)
    assert _tag(p) == "old_gen", "live generation must be untouched"


def test_recover_rolls_forward_after_mid_swap_crash(tmp_path):
    """Killed between `rename(path, .old)` and `rename(.tmp, path)`: the
    new generation is complete, so recovery finishes the swap forward."""
    p = str(tmp_path / "t")
    _mk(p + ".old", "old_gen")
    _mk(p + ".tmp", "new_gen")
    recover_generation(p)
    assert _tag(p) == "new_gen"
    assert not os.path.exists(p + ".tmp") and not os.path.exists(p + ".old")


def test_recover_rolls_back_when_tmp_incomplete(tmp_path):
    """Killed during the tmp write after a (hypothetical) early move: an
    uncommitted tmp is never promoted — the old generation comes back."""
    p = str(tmp_path / "t")
    _mk(p + ".old", "old_gen")
    _mk(p + ".tmp", "partial", complete=False)
    recover_generation(p)
    assert _tag(p) == "old_gen"
    assert not os.path.exists(p + ".tmp") and not os.path.exists(p + ".old")


def test_recover_cleans_leftovers_beside_live_dir(tmp_path):
    """Killed after the new generation went live but before cleanup: the
    live dir wins, stale .tmp/.old are removed."""
    p = str(tmp_path / "t")
    _mk(p, "live_gen")
    _mk(p + ".old", "old_gen")
    _mk(p + ".tmp", "stale", complete=False)
    recover_generation(p)
    assert _tag(p) == "live_gen"
    assert not os.path.exists(p + ".tmp") and not os.path.exists(p + ".old")


def test_recover_noop_on_clean_or_absent(tmp_path):
    recover_generation(str(tmp_path / "never_existed"))
    p = str(tmp_path / "clean")
    _mk(p, "gen")
    recover_generation(p)
    assert _tag(p) == "gen"


def test_zorder_compact_recovers_from_simulated_crash(spark, tmp_path):
    """End to end: simulate the kill between the two renames of a
    previous zorder_compact, then call it again — the table must come
    back (forward to the complete new generation) and compact cleanly."""
    import shutil

    from pyspark.sql import functions as F

    from stateful_spark_streaming_spark.operators import layout as LAY

    p = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, i % 7, float(i % 13)) for i in range(500)],
        ["event_id", "user_id", "value"],
    )
    df.write.parquet(p)
    # simulate: a prior compact wrote a complete .tmp, moved live to .old,
    # then died before promoting
    df.write.parquet(p + ".tmp")
    os.rename(p, p + ".old")
    assert not os.path.exists(p)
    LAY.zorder_compact(spark, p, "user_id", "value")
    out = spark.read.parquet(p)
    assert out.count() == 500
    assert out.agg(F.sum("event_id")).first()[0] == sum(range(500))
    assert not os.path.exists(p + ".tmp") and not os.path.exists(p + ".old")
    shutil.rmtree(p)


def test_read_recovery_never_deletes_writer_tmp(tmp_path):
    """clean=False (the READ paths): beside a LIVE dir, recovery must not
    touch a sibling .tmp — it may belong to a concurrent compact/retrain
    whose write job is still running (review finding: destructive reads)."""
    p = str(tmp_path / "t")
    _mk(p, "live_gen")
    _mk(p + ".tmp", "in_progress", complete=False)
    recover_generation(p, clean=False)
    assert os.path.exists(p + ".tmp"), "reader deleted a writer's tmp"
    assert _tag(p) == "live_gen"
    # missing live dir is still repaired (the read would otherwise fail)
    p2 = str(tmp_path / "t2")
    _mk(p2 + ".old", "old_gen")
    recover_generation(p2, clean=False)
    assert _tag(p2) == "old_gen"


def test_swap_survives_reader_rollforward_race(tmp_path, monkeypatch):
    """ADVICE r6: a reader's recover_generation(clean=False) can win the
    race between the writer's two renames — it sees no live dir + a
    complete tmp and promotes tmp itself; the writer's own final rename
    then hits FileNotFoundError.  The promotion the writer wanted HAS
    happened, so the swap must treat that as success (and still clean
    .old), not die mid-protocol."""
    import stateful_spark_streaming_spark.generations as gen

    p = str(tmp_path / "t")
    _mk(p, "old_gen")
    _mk(p + ".tmp", "new_gen")

    real_rename = os.rename
    fired = []

    def racing_rename(src, dst):
        if src == p + ".tmp" and dst == p and not fired:
            # deterministic interleave: the reader fires exactly between
            # the writer's two renames (live dir just moved to .old)
            fired.append(True)
            recover_generation(p, clean=False)
        real_rename(src, dst)  # now raises FileNotFoundError for the writer

    monkeypatch.setattr(gen.os, "rename", racing_rename)
    swap_generation(p)  # must not raise
    assert _tag(p) == "new_gen"
    assert not os.path.exists(p + ".tmp") and not os.path.exists(p + ".old")


def test_swap_still_raises_on_genuinely_lost_tmp(tmp_path):
    """The FileNotFoundError swallow is scoped to the won-race state: a
    tmp that vanished WITHOUT the live dir being promoted (external
    deletion) is a real lost generation and must still raise."""
    import shutil

    import stateful_spark_streaming_spark.generations as gen

    p = str(tmp_path / "t")
    _mk(p + ".tmp", "new_gen")

    real_rename = os.rename

    def vanishing_rename(src, dst):
        if src == p + ".tmp" and dst == p:
            shutil.rmtree(p + ".tmp")  # external actor deletes, no promote
        real_rename(src, dst)

    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(gen.os, "rename", vanishing_rename)
        with pytest.raises(FileNotFoundError):
            swap_generation(p)


def test_partition_retire_and_percent_escape(tmp_path):
    """Round 10: (a) `retire` removes a live partition the batch left
    empty via the hidden-rename protocol, and a crash mid-retire is
    resurrected WHOLE by recover_partitions (replay re-applies);
    (b) _enc_part escapes '%' first, so a Hive-escaped value containing
    a literal %2F (an escaped '/') survives a crash round-trip instead
    of being recovered into a bogus nested path."""
    import shutil

    from stateful_spark_streaming_spark.generations import (
        _dec_part,
        _enc_part,
        recover_partitions,
        swap_partitions,
    )

    def mk(path, content="x"):
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "part-0.parquet"), "w") as fh:
            fh.write(content)

    # --- retire semantics
    table = str(tmp_path / "t")
    staging = str(tmp_path / "s")
    mk(os.path.join(table, "g=keep"))
    mk(os.path.join(table, "g=vacated"))
    mk(os.path.join(staging, "g=keep"), "NEW")
    open(os.path.join(staging, "_SUCCESS"), "w").close()
    swap_partitions(table, staging, ["g=keep"], retire=["g=vacated"])
    assert not os.path.exists(os.path.join(table, "g=vacated"))
    assert open(os.path.join(table, "g=keep", "part-0.parquet")).read() == "NEW"
    assert not [n for n in os.listdir(table) if n.startswith(".")]

    # retire of an already-absent partition is a no-op (replay)
    swap_partitions(table, staging, [], retire=["g=vacated"])

    # a retire-only call with nothing to do at all is still refused
    with pytest.raises(ValueError, match="empty partition list"):
        swap_partitions(table, staging, [], retire=[])

    # promote+retire overlap is a caller bug, refused before any rename
    with pytest.raises(ValueError, match="both promoted and retired"):
        swap_partitions(table, staging, ["g=keep"], retire=["g=keep"])

    # crash mid-retire (after live->.old., before rmtree): recovery
    # resurrects the partition whole — merely stale, converged by replay
    mk(os.path.join(table, "g=crash"), "STALE")
    os.rename(
        os.path.join(table, "g=crash"),
        os.path.join(table, ".old." + _enc_part("g=crash")),
    )
    recover_partitions(table)
    assert (
        open(os.path.join(table, "g=crash", "part-0.parquet")).read() == "STALE"
    )
    shutil.rmtree(os.path.join(table, "g=crash"))

    # --- percent escaping: a Hive-escaped '/' in a partition VALUE
    hive_name = "g=a%2Fb"  # value 'a/b' as Spark writes it on disk
    assert _dec_part(_enc_part(hive_name)) == hive_name
    nested = os.path.join("a=1", hive_name)
    assert _dec_part(_enc_part(nested)) == nested
    # crash round-trip: the hidden name must decode back to the SAME
    # single-level dir, not to the nested path g=a/b
    mk(os.path.join(table, ".old." + _enc_part(hive_name)), "PCT")
    recover_partitions(table)
    assert (
        open(os.path.join(table, hive_name, "part-0.parquet")).read() == "PCT"
    ), "recovered to the literal Hive-escaped dirname"
    assert not os.path.exists(os.path.join(table, "g=a", "b"))

def test_swap_generation_every_crash_point_converges(tmp_path):
    """MECHANICAL crash enumeration for the single-dir generation swap
    (the twin of test_merge's partition-swap enumeration): inject a
    failure after EVERY rename/rmtree a full swap performs.  After each
    crash, recover_generation must leave the live dir holding ONE whole
    generation with its commit marker (old or new, never missing, never
    mixed), and rewriting tmp + re-swapping must converge to the new
    generation."""
    import shutil as _sh

    import stateful_spark_streaming_spark.generations as G

    def build(p):
        _mk(p, "old")
        _mk(p + ".tmp", "new")

    def whole(p):
        files = sorted(os.listdir(p))
        assert "_SUCCESS" in files, f"live dir lost its commit marker: {files}"
        tags = [f[:-8] for f in files if f.endswith(".parquet")]
        assert len(tags) == 1, f"live dir mixes generations: {tags}"
        return tags[0]

    # count mutations in a clean run
    p = str(tmp_path / "clean")
    build(p)
    n_mut = 0
    real_rename, real_rmtree = os.rename, _sh.rmtree

    def count_rename(*a, **k):
        nonlocal n_mut
        n_mut += 1
        return real_rename(*a, **k)

    def count_rmtree(*a, **k):
        nonlocal n_mut
        n_mut += 1
        return real_rmtree(*a, **k)

    os.rename, _sh.rmtree = count_rename, count_rmtree
    try:
        G.swap_generation(p)
    finally:
        os.rename, _sh.rmtree = real_rename, real_rmtree
    assert whole(p) == "new" and not os.path.exists(p + ".old")
    assert n_mut >= 3, f"expected several mutations, counted {n_mut}"

    class Crash(RuntimeError):
        pass

    for crash_at in range(n_mut):
        p = str(tmp_path / f"c{crash_at}")
        build(p)
        left = crash_at

        def fail_rename(*a, **k):
            nonlocal left
            if left == 0:
                raise Crash()
            left -= 1
            return real_rename(*a, **k)

        def fail_rmtree(*a, **k):
            nonlocal left
            if left == 0:
                raise Crash()
            left -= 1
            return real_rmtree(*a, **k)

        os.rename, _sh.rmtree = fail_rename, fail_rmtree
        try:
            G.swap_generation(p)
            crashed = False
        except Crash:
            crashed = True
        finally:
            os.rename, _sh.rmtree = real_rename, real_rmtree
        assert crashed, f"crash point {crash_at} never reached"
        G.recover_generation(p, clean=True)
        assert whole(p) in ("old", "new"), f"crash {crash_at}"
        # replay: rewrite tmp (the job's restart) and swap again
        _sh.rmtree(p + ".tmp", ignore_errors=True)
        _mk(p + ".tmp", "new")
        G.swap_generation(p)
        assert whole(p) == "new", f"crash {crash_at}: replay diverged"
        assert not os.path.exists(p + ".tmp") and not os.path.exists(p + ".old")
