"""CDC merge/upsert semantics: one-shot latest-wins, the incremental
seq-watermark/tombstone machinery that makes batch replay and
out-of-order application converge, the streaming runner's restart
behavior, and snapshot diffing."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from stateful_spark_streaming_spark.operators.merge import (
    merge_apply_batch,
    merge_upsert,
    merged_view,
    snapshot_diff,
    with_merge_meta,
)

BASE_ROWS = [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)]
BASE_SCHEMA = "k long, name string, val double"
CH_SCHEMA = "k long, name string, val double, seq int, op string"


def _base(spark):
    return spark.createDataFrame(BASE_ROWS, BASE_SCHEMA)


def _table(df):
    return sorted(map(tuple, df.collect()))


def test_merge_upsert_latest_wins_and_delete(spark):
    changes = spark.createDataFrame(
        [
            (2, "b2", 21.0, 1, "U"),   # update, superseded below
            (2, "b3", 22.0, 2, "U"),   # latest wins
            (3, "c", 30.0, 1, "D"),    # delete
            (4, "d", 40.0, 1, "U"),    # insert
        ],
        CH_SCHEMA,
    )
    got = _table(merge_upsert(_base(spark), changes, ("k",)))
    assert got == [(1, "a", 10.0), (2, "b3", 22.0), (4, "d", 40.0)]


def test_merge_apply_batch_replay_is_noop(spark):
    cur = with_merge_meta(_base(spark))
    b1 = spark.createDataFrame([(2, "b2", 21.0, 1, "U")], CH_SCHEMA)
    b2 = spark.createDataFrame([(2, "b3", 22.0, 2, "U")], CH_SCHEMA)
    kw = dict(key_cols=("k",), seq_col="seq", op_col="op")

    def apply(cur, b):
        return merge_apply_batch(cur, b.withColumnRenamed("seq", "__seq"),
                                 ("k",), seq_col="__seq", op_col="op")

    after12 = apply(apply(cur, b1), b2)
    want = _table(merged_view(after12))
    assert want == [(1, "a", 10.0), (2, "b3", 22.0), (3, "c", 30.0)]
    # replaying the OLDER batch after the newer one must not regress
    replayed = apply(after12, b1)
    assert _table(merged_view(replayed)) == want
    # replaying the newer batch is likewise a no-op (seq equal, not >)
    assert _table(merged_view(apply(after12, b2))) == want


def test_tombstone_blocks_resurrection_but_not_reinsert(spark):
    cur = with_merge_meta(_base(spark))
    up1 = spark.createDataFrame([(3, "c1", 31.0, 1, "U")], CH_SCHEMA)
    dele = spark.createDataFrame([(3, "c1", 31.0, 2, "D")], CH_SCHEMA)
    up3 = spark.createDataFrame([(3, "c3", 33.0, 3, "U")], CH_SCHEMA)

    def apply(cur, b):
        return merge_apply_batch(cur, b.withColumnRenamed("seq", "__seq"),
                                 ("k",), seq_col="__seq", op_col="op")

    deleted = apply(apply(cur, up1), dele)
    assert _table(merged_view(deleted)) == [(1, "a", 10.0), (2, "b", 20.0)]
    # replaying the PRE-delete upsert cannot resurrect the row: the
    # tombstone carries seq 2 > 1
    assert _table(merged_view(apply(deleted, up1))) == [
        (1, "a", 10.0), (2, "b", 20.0)
    ]
    # but a genuinely newer upsert (seq 3) re-inserts
    assert _table(merged_view(apply(deleted, up3))) == [
        (1, "a", 10.0), (2, "b", 20.0), (3, "c3", 33.0)
    ]


def test_out_of_order_batches_converge(spark):
    cur = with_merge_meta(_base(spark))
    b1 = spark.createDataFrame([(1, "a1", 11.0, 1, "U")], CH_SCHEMA)
    b2 = spark.createDataFrame([(1, "a2", 12.0, 2, "U")], CH_SCHEMA)

    def apply(cur, b):
        return merge_apply_batch(cur, b.withColumnRenamed("seq", "__seq"),
                                 ("k",), seq_col="__seq", op_col="op")

    fwd = _table(merged_view(apply(apply(cur, b1), b2)))
    rev = _table(merged_view(apply(apply(cur, b2), b1)))
    assert fwd == rev
    assert dict((r[0], r[1]) for r in fwd)[1] == "a2"


def _land_change_files(spark, tmp_path, batches):
    ch_dir = str(tmp_path / "changes")
    os.makedirs(ch_dir)
    for i, rows in enumerate(batches):
        bdir = str(tmp_path / f"b{i}")
        spark.createDataFrame(rows, CH_SCHEMA).coalesce(1).write.parquet(bdir)
        part = [f for f in os.listdir(bdir) if f.endswith(".parquet")][0]
        dst = os.path.join(ch_dir, f"batch-{i}.parquet")
        os.rename(os.path.join(bdir, part), dst)
        os.utime(dst, (1_000_000_000 + i * 100,) * 2)
    return ch_dir


def test_streaming_merge_restart_does_not_double_apply(spark, tmp_path):
    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_merge_upsert,
    )

    base_path = str(tmp_path / "base")
    _base(spark).write.parquet(base_path)
    ch_dir = _land_change_files(
        spark,
        tmp_path,
        [
            [(2, "b2", 21.0, 1, "U"), (4, "d", 40.0, 1, "U")],
            [(2, "b3", 22.0, 2, "U"), (3, "c", 30.0, 2, "D")],
        ],
    )
    ck = str(tmp_path / "ck")
    got1 = _table(
        run_streaming_merge_upsert(
            spark, base_path, ch_dir, ("k",), checkpoint_dir=ck
        )
    )
    assert got1 == [(1, "a", 10.0), (2, "b3", 22.0), (4, "d", 40.0)]
    # restart over the SAME checkpoint: no new files -> no re-application;
    # and even a forced replay would be a seq-guard no-op
    got2 = _table(
        run_streaming_merge_upsert(
            spark, base_path, ch_dir, ("k",), checkpoint_dir=ck
        )
    )
    assert got2 == got1
    # a stale incomplete .tmp beside the table (crash mid-write) is
    # cleaned on the next run, not promoted
    table_dir = ck + "_table"
    os.makedirs(table_dir + ".tmp", exist_ok=True)
    with open(os.path.join(table_dir + ".tmp", "part-junk"), "w") as f:
        f.write("junk")
    got3 = _table(
        run_streaming_merge_upsert(
            spark, base_path, ch_dir, ("k",), checkpoint_dir=ck
        )
    )
    assert got3 == got1 and not os.path.exists(table_dir + ".tmp")


def test_streaming_merge_equals_batch_merge(spark, tmp_path):
    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_merge_upsert,
    )

    batches = [
        [(1, "a1", 11.0, 1, "U"), (5, "e", 50.0, 1, "U")],
        [(5, "e", 50.0, 2, "D"), (2, "b9", 29.0, 2, "U")],
        [(6, "f", 60.0, 3, "U"), (1, "a3", 13.0, 3, "U")],
    ]
    base_path = str(tmp_path / "base")
    _base(spark).write.parquet(base_path)
    ch_dir = _land_change_files(spark, tmp_path, batches)
    streaming = _table(
        run_streaming_merge_upsert(
            spark, base_path, ch_dir, ("k",),
            checkpoint_dir=str(tmp_path / "ck"),
        )
    )
    all_changes = spark.createDataFrame(
        [r for b in batches for r in b], CH_SCHEMA
    )
    batch = _table(merge_upsert(_base(spark), all_changes, ("k",)))
    assert streaming == batch and streaming


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "same"), (2, "will change"), (3, "gone")], "id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "changed!"), (4, "fresh")], "id long, text string"
    )
    got = {
        r["id"]: r["status"]
        for r in snapshot_diff(old, new, "id", F.md5(F.col("text"))).collect()
    }
    assert got == {2: "changed", 3: "removed", 4: "added"}  # 1 omitted


def test_refresh_groups_keeps_untouched_rows_verbatim(spark):
    """The incremental refresh must NOT silently recompute everything:
    poison an untouched group's materialized row and assert the poison
    survives (proof the row rode through the anti join), while touched
    groups are recomputed correctly — including a key MOVING between
    groups (both its old and new group refresh) and a delete."""
    from stateful_spark_streaming_spark.operators.merge import (
        affected_groups,
        merge_upsert,
        refresh_groups,
    )

    base = spark.createDataFrame(
        [(1, "g1", 10.0), (2, "g1", 20.0), (3, "g2", 30.0), (4, "g3", 40.0)],
        "k long, g string, v double",
    )
    # key 3 moves g2 -> g1 with a new value; key 4 is deleted; g4 inserted
    changes = spark.createDataFrame(
        [(3, "g1", 35.0, 1, "U"), (4, "g3", 0.0, 1, "D"), (5, "g4", 50.0, 1, "U")],
        "k long, g string, v double, seq int, op string",
    )

    def agg_fn(detail):
        return detail.groupBy("g").agg(
            F.round(F.sum("v"), 2).alias("sv"), F.count(F.lit(1)).alias("n")
        )

    # materialized aggregate with g5 poison row: untouched groups must
    # ride through VERBATIM (g5 isn't derivable from base -- if refresh
    # recomputed everything, the poison would vanish)
    materialized = agg_fn(base).unionByName(
        spark.createDataFrame([("g5", -999.0, 7)], "g string, sv double, n long")
    )
    merged = merge_upsert(base, changes, ("k",), seq_col="seq")
    aff = affected_groups(base, changes, ("k",), ("g",))
    got = {
        r["g"]: (r["sv"], r["n"])
        for r in refresh_groups(materialized, merged, aff, ("g",), agg_fn).collect()
    }
    assert got == {
        "g1": (65.0, 3),   # 10 + 20 + moved-in 35
        # g2 and g3 VANISH: the move emptied g2, the delete emptied g3 —
        # exactly what a full recompute produces (no row for an empty
        # group), the stale aggregate rows dropped by the anti join
        "g4": (50.0, 1),   # inserted group
        "g5": (-999.0, 7), # untouched poison row, verbatim
    }


def test_streaming_incremental_agg_end_to_end_and_crash_window(spark, tmp_path):
    """run_streaming_incremental_agg: (1) the maintained aggregate after a
    2-batch replay equals the full recompute over the final table; (2) the
    two-swap crash window is replay-safe — with the TABLE already at batch
    N but the AGGREGATE still at N-1 (crash between the swaps), re-running
    the refresh against the already-merged table converges to the same
    aggregate (recompute-from-table, not delta application)."""
    import os

    from stateful_spark_streaming_spark.operators.merge import (
        affected_groups,
        merge_apply_batch,
        merged_view,
        refresh_groups,
        with_merge_meta,
    )
    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_incremental_agg,
    )

    def agg_fn(detail):
        return detail.groupBy("g").agg(
            F.round(F.sum("v"), 2).alias("sv"), F.count(F.lit(1)).alias("n")
        )

    base = spark.createDataFrame(
        [(1, "g1", 10.0), (2, "g1", 20.0), (3, "g2", 30.0)],
        "k long, g string, v double",
    )
    b0 = spark.createDataFrame(
        [(3, "g3", 35.0, 1, "U"), (4, "g2", 40.0, 1, "U")],  # move + insert
        "k long, g string, v double, seq int, op string",
    )
    b1 = spark.createDataFrame(
        [(2, "g1", 0.0, 2, "D"), (4, "g2", 44.0, 2, "U")],   # delete + update
        "k long, g string, v double, seq int, op string",
    )
    base_path = str(tmp_path / "base")
    ch_dir = str(tmp_path / "changes")
    base.write.parquet(base_path)
    os.makedirs(ch_dir)
    for i, b in enumerate((b0, b1)):
        seg = str(tmp_path / f"seg{i}")
        b.coalesce(1).write.parquet(seg)
        part = [f for f in os.listdir(seg) if f.endswith(".parquet")][0]
        dst = os.path.join(ch_dir, f"batch-{i}.parquet")
        os.rename(os.path.join(seg, part), dst)
        os.utime(dst, (1_000_000_000 + i * 100,) * 2)

    out = run_streaming_incremental_agg(
        spark, base_path, ch_dir, ("k",), ("g",), lambda df: df, agg_fn,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    got = {r["g"]: (r["sv"], r["n"]) for r in out.collect()}
    assert got == {"g1": (10.0, 1), "g2": (44.0, 1), "g3": (35.0, 1)}
    # each batch's affected set was frozen durably pre-table-swap and
    # cleaned up once its agg swap committed: the sidecar root exists,
    # but no batch dir survives a fully-committed run
    aff_root = str(tmp_path / "ckpt") + "_affected"
    assert os.path.isdir(aff_root)
    assert not [d for d in os.listdir(aff_root) if d.startswith("batch=")]

    # --- the group-move crash window: a batch whose ONLY effect on g2 is
    # moving its sole key OUT.  After the table swap, g2's vacancy is no
    # longer derivable from the table, so a replay that recomputed the
    # affected set post-merge would keep g2's stale aggregate row alive.
    # The runner's contract: use the PRE-swap affected set (the sidecar).
    move_only = spark.createDataFrame(
        [(3, "g9", 30.0, 1, "U")], "k long, g string, v double, seq int, op string"
    )
    t0 = with_merge_meta(base)
    pre_swap_affected = affected_groups(merged_view(t0), move_only, ("k",), ("g",))
    t1 = merge_apply_batch(t0, move_only.withColumnRenamed("seq", "__seq"), ("k",))
    a0 = agg_fn(base)  # crash happened before the agg swap
    # replay of move_only against the already-swapped table: table
    # application is a seq-watermark no-op...
    t1_replay = merge_apply_batch(
        t1, move_only.withColumnRenamed("seq", "__seq"), ("k",)
    )
    # ...and the refresh with the SIDECAR (pre-swap) set converges to the
    # full recompute: g2 vanishes, g9 appears
    a1 = refresh_groups(
        a0, merged_view(t1_replay), pre_swap_affected, ("g",), agg_fn
    )
    want = {r["g"]: (r["sv"], r["n"]) for r in agg_fn(merged_view(t1)).collect()}
    assert {r["g"]: (r["sv"], r["n"]) for r in a1.collect()} == want
    assert "g2" not in want and want["g9"] == (30.0, 1)
    # negative control: the post-merge recompute MISSES the vacated group
    stale = affected_groups(merged_view(t1_replay), move_only, ("k",), ("g",))
    bad = refresh_groups(a0, merged_view(t1_replay), stale, ("g",), agg_fn)
    assert "g2" in {r["g"] for r in bad.collect()}  # the bug the sidecar fixes


def test_null_op_is_upsert_not_silent_delete(spark):
    """A change row with NULL op must apply as an UPSERT in both merge
    forms — the unguarded `!=`/`==` comparisons evaluated NULL and made
    the key silently vanish (one-shot) or tombstone-NULL (incremental)."""
    base = _base(spark)
    ch = spark.createDataFrame([(2, "b2", 21.0, 1, None)], CH_SCHEMA)
    got = _table(merge_upsert(base, ch, ("k",)))
    assert got == [(1, "a", 10.0), (2, "b2", 21.0), (3, "c", 30.0)]

    cur = with_merge_meta(base)
    nxt = merge_apply_batch(
        cur, ch.withColumnRenamed("seq", "__seq"), ("k",), seq_col="__seq"
    )
    assert _table(merged_view(nxt)) == got


def test_snapshot_diff_null_fingerprints(spark):
    """Membership derives from join-key presence, not fp nullity: a
    both-sides row whose text goes NULL->set is 'changed' (not 'added'),
    set->NULL is 'changed' (not 'removed'), NULL->NULL is unchanged."""
    old = spark.createDataFrame(
        [(1, None), (2, "x"), (3, None)], "id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "now set"), (2, None), (3, None)], "id long, text string"
    )
    got = {
        r["id"]: r["status"]
        for r in snapshot_diff(old, new, "id", F.md5(F.col("text"))).collect()
    }
    assert got == {1: "changed", 2: "changed"}  # 3 omitted (NULL==NULL)


def _write_change_batches(tmp_path, batches):
    import os

    ch_dir = str(tmp_path / "changes")
    os.makedirs(ch_dir, exist_ok=True)
    for i, b in enumerate(batches):
        seg = str(tmp_path / f"wseg{i}")
        b.coalesce(1).write.parquet(seg)
        part = [f for f in os.listdir(seg) if f.endswith(".parquet")][0]
        dst = os.path.join(ch_dir, f"batch-{i}.parquet")
        os.rename(os.path.join(seg, part), dst)
        os.utime(dst, (1_000_000_000 + i * 100,) * 2)
    return ch_dir


def test_partition_swap_crash_recovery(tmp_path):
    """swap_partitions/recover_partitions: every crash point of the
    per-partition hidden-rename protocol is repaired on the next entry —
    no visible half state, no spurious partition values (r9 layout)."""
    import os

    from stateful_spark_streaming_spark.generations import (
        recover_partitions,
        swap_partitions,
    )

    def mk(path, marker=None):
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, marker or "part-0.parquet"), "w") as fh:
            fh.write("x")

    # staged without _SUCCESS is refused
    table = str(tmp_path / "t")
    staging = str(tmp_path / "s")
    mk(os.path.join(table, "g=a"))
    mk(os.path.join(staging, "g=a"))
    with pytest.raises(ValueError, match="_SUCCESS"):
        swap_partitions(table, staging, ["g=a"])
    open(os.path.join(staging, "_SUCCESS"), "w").close()

    # a staged-but-missing partition is refused (tombstones make an
    # affected partition always re-materialize; absence is a bug)
    with pytest.raises(ValueError, match="staged partition"):
        swap_partitions(table, staging, ["g=a", "g=zzz"])

    # clean swap: live content replaced, no hidden leftovers
    with open(os.path.join(staging, "g=a", "part-0.parquet"), "w") as fh:
        fh.write("NEW")
    swap_partitions(table, staging, ["g=a"])
    assert open(os.path.join(table, "g=a", "part-0.parquet")).read() == "NEW"
    assert not [n for n in os.listdir(table) if n.startswith(".")]

    # crash between live->old and tmp->live: live dir missing, both
    # hidden dirs present -> recovery rolls the old generation back
    mk(os.path.join(table, ".tmp.g=b"))
    os.makedirs(os.path.join(table, ".old.g=b"))
    with open(os.path.join(table, ".old.g=b", "part-0.parquet"), "w") as fh:
        fh.write("OLD-B")
    recover_partitions(table)
    assert open(os.path.join(table, "g=b", "part-0.parquet")).read() == "OLD-B"
    assert not [n for n in os.listdir(table) if n.startswith(".")]

    # crash after tmp->live but before dropping old: live wins, old dropped
    mk(os.path.join(table, "g=c"))
    mk(os.path.join(table, ".old.g=c"))
    recover_partitions(table)
    assert os.path.isdir(os.path.join(table, "g=c"))
    assert not [n for n in os.listdir(table) if n.startswith(".")]

    # stale .tmp beside a live dir (crash before any rename) is dropped
    mk(os.path.join(table, ".tmp.g=a"))
    recover_partitions(table)
    assert not [n for n in os.listdir(table) if n.startswith(".")]


def test_incremental_agg_tombstone_reinsert_no_key_fork(spark, tmp_path):
    """A key deleted in batch 1 and RE-INSERTED into a different group in
    batch 2 must end as ONE physical row in the partitioned table.  The
    affected set is computed over the raw table (tombstones included), so
    the tombstone's partition joins the merge input and collapses with
    the re-insert — without that, the key forks into two physical rows
    and every later merge double-emits it (r9 partition-scoped layout)."""
    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_incremental_agg,
    )

    def agg_fn(detail):
        return detail.groupBy("g").agg(
            F.round(F.sum("v"), 2).alias("sv"), F.count(F.lit(1)).alias("n")
        )

    base = spark.createDataFrame(
        [(1, "g1", 10.0), (2, "g2", 20.0)], "k long, g string, v double"
    )
    b0 = spark.createDataFrame(
        [(1, "g1", 0.0, 1, "D")], "k long, g string, v double, seq int, op string"
    )
    b1 = spark.createDataFrame(
        [(1, "g3", 99.0, 2, "U")], "k long, g string, v double, seq int, op string"
    )
    base_path = str(tmp_path / "base")
    base.write.parquet(base_path)
    ch_dir = _write_change_batches(tmp_path, (b0, b1))

    out = run_streaming_incremental_agg(
        spark, base_path, ch_dir, ("k",), ("g",), lambda df: df, agg_fn,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    got = {r["g"]: (r["sv"], r["n"]) for r in out.collect()}
    assert got == {"g2": (20.0, 1), "g3": (99.0, 1)}
    # the RAW table: exactly one physical row for the re-inserted key
    raw = spark.read.parquet(str(tmp_path / "ckpt") + "_table")
    k1 = raw.filter(F.col("k") == 1).collect()
    assert len(k1) == 1 and k1[0]["g"] == "g3" and not k1[0]["__deleted"]


def test_incremental_agg_full_rewrite_fallback_same_result(spark, tmp_path):
    """full_rewrite_frac=0 forces every batch onto the full-image swap
    path (the backfill branch); -1 (or 1.0+) keeps the partition-scoped
    path.  Both must produce identical tables and aggregates."""
    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_incremental_agg,
    )

    def agg_fn(detail):
        return detail.groupBy("g").agg(
            F.round(F.sum("v"), 2).alias("sv"), F.count(F.lit(1)).alias("n")
        )

    base = spark.createDataFrame(
        [(1, "g1", 10.0), (2, "g1", 20.0), (3, "g2", 30.0)],
        "k long, g string, v double",
    )
    b0 = spark.createDataFrame(
        [(3, "g3", 35.0, 1, "U"), (4, "g2", 40.0, 1, "U")],
        "k long, g string, v double, seq int, op string",
    )
    b1 = spark.createDataFrame(
        [(2, "g1", 0.0, 2, "D"), (4, "g2", 44.0, 2, "U")],
        "k long, g string, v double, seq int, op string",
    )
    base_path = str(tmp_path / "base")
    base.write.parquet(base_path)
    results = {}
    for tag, frac in (("full", 0.0), ("scoped", 10.0)):
        sub = tmp_path / tag
        sub.mkdir()
        ch_dir = _write_change_batches(sub, (b0, b1))
        out = run_streaming_incremental_agg(
            spark, base_path, ch_dir, ("k",), ("g",), lambda df: df, agg_fn,
            checkpoint_dir=str(sub / "ckpt"), full_rewrite_frac=frac,
        )
        results[tag] = {r["g"]: (r["sv"], r["n"]) for r in out.collect()}
    assert results["full"] == results["scoped"] == {
        "g1": (10.0, 1), "g2": (44.0, 1), "g3": (35.0, 1)
    }


def test_incremental_agg_untouched_partition_files_never_move(spark, tmp_path):
    """The point of the partition-scoped layout: a partition no batch
    touches keeps its exact files (same inode/mtime) across the whole
    run — per-batch IO is O(affected partitions), not O(table)."""
    import os

    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_incremental_agg,
    )

    def agg_fn(detail):
        return detail.groupBy("g").agg(
            F.round(F.sum("v"), 2).alias("sv"), F.count(F.lit(1)).alias("n")
        )

    base = spark.createDataFrame(
        [(1, "g1", 10.0), (2, "g2", 20.0), (3, "g3", 30.0)],
        "k long, g string, v double",
    )
    # both batches touch ONLY g2/g3 — g1 must not be rewritten
    b0 = spark.createDataFrame(
        [(2, "g2", 25.0, 1, "U")], "k long, g string, v double, seq int, op string"
    )
    b1 = spark.createDataFrame(
        [(3, "g3", 0.0, 2, "D")], "k long, g string, v double, seq int, op string"
    )
    base_path = str(tmp_path / "base")
    base.write.parquet(base_path)
    ch_dir = _write_change_batches(tmp_path, (b0, b1))

    # pre-create the bootstrap generations exactly as the runner would,
    # so g1's file identity can be captured before any batch runs
    from stateful_spark_streaming_spark.generations import swap_generation
    from stateful_spark_streaming_spark.operators.merge import with_merge_meta

    table_dir = str(tmp_path / "ckpt") + "_table"
    agg_dir = str(tmp_path / "ckpt") + "_agg"
    with_merge_meta(base).repartition(F.col("g")).write.partitionBy("g").parquet(
        table_dir + ".tmp"
    )
    swap_generation(table_dir)
    agg_fn(base).write.parquet(agg_dir + ".tmp")
    swap_generation(agg_dir)

    g1_dir = os.path.join(table_dir, "g=g1")
    before = {
        f: os.stat(os.path.join(g1_dir, f)).st_ino for f in os.listdir(g1_dir)
    }
    out = run_streaming_incremental_agg(
        spark, base_path, ch_dir, ("k",), ("g",), lambda df: df, agg_fn,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    got = {r["g"]: (r["sv"], r["n"]) for r in out.collect()}
    assert got == {"g1": (10.0, 1), "g2": (25.0, 1)}
    after = {
        f: os.stat(os.path.join(g1_dir, f)).st_ino for f in os.listdir(g1_dir)
    }
    assert after == before, "untouched partition was rewritten"


def test_incremental_agg_groups_immutable_equals_sidecar_mode(spark, tmp_path):
    """groups_immutable=True (affected = the batch's own groups, no table
    scan, no sidecar) must produce the identical table and aggregate as
    the general sidecar mode on a non-group-moving feed."""
    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_incremental_agg,
    )

    def agg_fn(detail):
        return detail.groupBy("g").agg(
            F.round(F.sum("v"), 2).alias("sv"), F.count(F.lit(1)).alias("n")
        )

    base = spark.createDataFrame(
        [(1, "g1", 10.0), (2, "g1", 20.0), (3, "g2", 30.0)],
        "k long, g string, v double",
    )
    b0 = spark.createDataFrame(  # update + insert, groups stay put
        [(3, "g2", 35.0, 1, "U"), (4, "g3", 40.0, 1, "U")],
        "k long, g string, v double, seq int, op string",
    )
    b1 = spark.createDataFrame(  # delete + update, groups stay put
        [(2, "g1", 0.0, 2, "D"), (4, "g3", 44.0, 2, "U")],
        "k long, g string, v double, seq int, op string",
    )
    base_path = str(tmp_path / "base")
    base.write.parquet(base_path)
    results = {}
    for tag, imm in (("sidecar", False), ("immutable", True)):
        sub = tmp_path / tag
        sub.mkdir()
        ch_dir = _write_change_batches(sub, (b0, b1))
        out = run_streaming_incremental_agg(
            spark, base_path, ch_dir, ("k",), ("g",), lambda df: df, agg_fn,
            checkpoint_dir=str(sub / "ckpt"), groups_immutable=imm,
        )
        results[tag] = {r["g"]: (r["sv"], r["n"]) for r in out.collect()}
        if imm:
            # no sidecar directory is ever created in immutable mode
            import os

            assert not os.path.isdir(str(sub / "ckpt") + "_affected")
    assert results["sidecar"] == results["immutable"] == {
        "g1": (10.0, 1), "g2": (35.0, 1), "g3": (44.0, 1)
    }


def test_incremental_agg_groups_immutable_rejects_group_move(spark, tmp_path):
    """A feed that moves a key's group under groups_immutable=True must be
    REFUSED (detectable class: the old row's partition is probed because
    the change image shares it... the guard joins old rows in probed
    partitions against change groups).  Construct the detectable shape:
    key stays referenced in its old group's partition by another change."""
    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_incremental_agg,
    )

    def agg_fn(detail):
        return detail.groupBy("g").agg(
            F.round(F.sum("v"), 2).alias("sv"), F.count(F.lit(1)).alias("n")
        )

    base = spark.createDataFrame(
        [(1, "g1", 10.0), (2, "g1", 20.0)], "k long, g string, v double"
    )
    # key 1 moves g1 -> g1? no: key 1 moves to g2, and key 2's change keeps
    # g1 in the affected set — so key 1's old row IS probed and the guard
    # must fire
    b0 = spark.createDataFrame(
        [(1, "g2", 11.0, 1, "U"), (2, "g1", 22.0, 1, "U")],
        "k long, g string, v double, seq int, op string",
    )
    base_path = str(tmp_path / "base")
    base.write.parquet(base_path)
    ch_dir = _write_change_batches(tmp_path, (b0,))
    with pytest.raises(Exception, match="groups_immutable"):
        run_streaming_incremental_agg(
            spark, base_path, ch_dir, ("k",), ("g",), lambda df: df, agg_fn,
            checkpoint_dir=str(tmp_path / "ckpt"), groups_immutable=True,
        )


def test_streaming_merge_bucketed_equals_default(spark, tmp_path):
    """n_buckets lays the merge table out by key-hash bucket and rewrites
    only touched buckets — the merged view must be identical to the
    default single-image mode on the same feed (updates, inserts,
    deletes, out-of-order seqs)."""
    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_merge_upsert,
    )

    base = spark.createDataFrame(
        [(k, f"v{k}", float(k)) for k in range(40)], "k long, s string, v double"
    )
    b0 = spark.createDataFrame(
        [(3, "u3", 33.0, 2, "U"), (40, "new", 40.0, 2, "U"), (7, "x", 0.0, 2, "D")],
        "k long, s string, v double, seq int, op string",
    )
    b1 = spark.createDataFrame(  # lower seq than b0 for key 3: must lose
        [(3, "stale", -1.0, 1, "U"), (8, "u8", 88.0, 3, "U")],
        "k long, s string, v double, seq int, op string",
    )
    base_path = str(tmp_path / "base")
    base.write.parquet(base_path)
    results = {}
    for tag, nb in (("default", None), ("bucketed", 8)):
        sub = tmp_path / tag
        sub.mkdir()
        ch_dir = _write_change_batches(sub, (b0, b1))
        out = run_streaming_merge_upsert(
            spark, base_path, ch_dir, ("k",),
            checkpoint_dir=str(sub / "ckpt"), n_buckets=nb,
        )
        assert "__bucket" not in out.columns
        results[tag] = {r["k"]: (r["s"], r["v"]) for r in out.collect()}
    assert results["default"] == results["bucketed"]
    want = {k: (f"v{k}", float(k)) for k in range(40) if k != 7}
    want[3] = ("u3", 33.0)   # seq-2 beat the later-arriving seq-1
    want[8] = ("u8", 88.0)
    want[40] = ("new", 40.0)
    assert results["bucketed"] == want


def test_streaming_merge_bucketed_untouched_buckets_never_move(spark, tmp_path):
    """A single-key change batch must rewrite ONLY that key's bucket —
    every other bucket keeps its exact files (same inodes)."""
    import os

    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_merge_upsert,
    )

    base = spark.createDataFrame(
        [(k, float(k)) for k in range(64)], "k long, v double"
    )
    b0 = spark.createDataFrame(
        [(5, 55.0, 1, "U")], "k long, v double, seq int, op string"
    )
    base_path = str(tmp_path / "base")
    base.write.parquet(base_path)
    # bootstrap via an empty-feed... simpler: pre-create with the runner's
    # own bootstrap by running a first single-batch feed, then capture and
    # run a second
    ch_dir = _write_change_batches(tmp_path, (b0,))
    table_dir = str(tmp_path / "ckpt") + "_table"
    out = run_streaming_merge_upsert(
        spark, base_path, ch_dir, ("k",),
        checkpoint_dir=str(tmp_path / "ckpt"), n_buckets=16,
    )
    assert {r["k"]: r["v"] for r in out.collect()}[5] == 55.0
    snap = {}
    for d in os.listdir(table_dir):
        if d.startswith("__bucket="):
            sub = os.path.join(table_dir, d)
            snap[d] = {f: os.stat(os.path.join(sub, f)).st_ino for f in os.listdir(sub)}
    # second batch touches a different single key
    b1 = spark.createDataFrame(
        [(9, 99.0, 2, "U")], "k long, v double, seq int, op string"
    )
    seg = str(tmp_path / "wseg_b1")
    b1.coalesce(1).write.parquet(seg)
    part = [f for f in os.listdir(seg) if f.endswith(".parquet")][0]
    dst = os.path.join(str(tmp_path / "changes"), "batch-9.parquet")
    os.rename(os.path.join(seg, part), dst)
    os.utime(dst, (1_000_000_900,) * 2)
    out2 = run_streaming_merge_upsert(
        spark, base_path, str(tmp_path / "changes"), ("k",),
        checkpoint_dir=str(tmp_path / "ckpt"), n_buckets=16,
    )
    got = {r["k"]: r["v"] for r in out2.collect()}
    assert got[5] == 55.0 and got[9] == 99.0
    from pyspark.sql import functions as F
    bucket9 = spark.createDataFrame([(9,)], "k long").select(
        F.pmod(F.xxhash64("k"), F.lit(16)).alias("b")
    ).collect()[0]["b"]
    moved = []
    for d, files in snap.items():
        sub = os.path.join(table_dir, d)
        now = {f: os.stat(os.path.join(sub, f)).st_ino for f in os.listdir(sub)}
        if now != files:
            moved.append(d)
    assert moved == [f"__bucket={bucket9}"], (
        f"buckets rewritten: {moved}, expected only __bucket={bucket9}"
    )


def test_streaming_merge_bucketed_restart_and_crash_recovery(spark, tmp_path):
    """The restart/crash contract holds under the bucketed layout: a
    restart over the same checkpoint re-applies nothing; a crash
    mid-partition-swap (live bucket missing, hidden .old/.tmp present)
    rolls back on the next run and the replayed batch converges."""
    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_merge_upsert,
    )

    base_path = str(tmp_path / "base")
    _base(spark).write.parquet(base_path)
    ch_dir = _land_change_files(
        spark,
        tmp_path,
        [
            [(2, "b2", 21.0, 1, "U"), (4, "d", 40.0, 1, "U")],
            [(2, "b3", 22.0, 2, "U"), (3, "c", 30.0, 2, "D")],
        ],
    )
    ck = str(tmp_path / "ck")
    got1 = _table(
        run_streaming_merge_upsert(
            spark, base_path, ch_dir, ("k",), checkpoint_dir=ck, n_buckets=4
        )
    )
    assert got1 == [(1, "a", 10.0), (2, "b3", 22.0), (4, "d", 40.0)]
    got2 = _table(
        run_streaming_merge_upsert(
            spark, base_path, ch_dir, ("k",), checkpoint_dir=ck, n_buckets=4
        )
    )
    assert got2 == got1

    # simulate a crash between the two renames of one bucket's swap:
    # live dir moved to hidden .old, a stale hidden .tmp beside it
    import shutil

    table_dir = ck + "_table"
    bucket = next(d for d in sorted(os.listdir(table_dir)) if d.startswith("__bucket="))
    os.rename(
        os.path.join(table_dir, bucket),
        os.path.join(table_dir, ".old." + bucket),
    )
    os.makedirs(os.path.join(table_dir, ".tmp." + bucket), exist_ok=True)
    with open(os.path.join(table_dir, ".tmp." + bucket, "junk"), "w") as f:
        f.write("junk")
    got3 = _table(
        run_streaming_merge_upsert(
            spark, base_path, ch_dir, ("k",), checkpoint_dir=ck, n_buckets=4
        )
    )
    assert got3 == got1
    leftovers = [
        d for d in os.listdir(table_dir) if d.startswith((".old.", ".tmp."))
    ]
    assert not leftovers


# ---------------------------------------------------------------------------
# Round 10: vacating group moves, the predicate-term cap, and layout
# migration at run entry (ADVICE r9 high/low items)
# ---------------------------------------------------------------------------

INC_SCHEMA = "k long, g string, v double"
INC_CH_SCHEMA = "k long, g string, v double, seq int, op string"


def _land_inc_feed(spark, tmp_path, batches, sub="changes"):
    ch_dir = str(tmp_path / sub)
    os.makedirs(ch_dir)
    for i, rows in enumerate(batches):
        bdir = str(tmp_path / f"{sub}_b{i}")
        spark.createDataFrame(rows, INC_CH_SCHEMA).coalesce(1).write.parquet(bdir)
        part = [f for f in os.listdir(bdir) if f.endswith(".parquet")][0]
        dst = os.path.join(ch_dir, f"batch-{i}.parquet")
        os.rename(os.path.join(bdir, part), dst)
        os.utime(dst, (1_000_000_000 + i * 100,) * 2)
    return ch_dir


def _inc_agg(detail):
    return detail.groupBy("g").agg(
        F.round(F.sum("v"), 2).alias("sv"), F.count(F.lit(1)).alias("n")
    )


def test_incremental_agg_vacating_group_move_retires_partition(spark, tmp_path):
    """ADVICE r9 (high): a group-moving update whose key was the ONLY live
    row of its old partition stages no dir for that partition; before the
    retire fix the stale live dir survived the swap, the key existed
    physically in both partitions, and merged_view emitted it twice.
    Scoped path forced (full_rewrite_frac > 1), sidecar mode (the default,
    which ADVERTISES group-move safety)."""
    from stateful_spark_streaming_spark.operators.merge import merged_view
    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_incremental_agg,
    )

    base_path = str(tmp_path / "base")
    spark.createDataFrame(
        [(1, "g1", 10.0), (2, "g2", 20.0)], INC_SCHEMA
    ).write.parquet(base_path)
    ch_dir = _land_inc_feed(spark, tmp_path, [[(2, "g3", 21.0, 1, "U")]])
    ck = str(tmp_path / "ck")
    out = run_streaming_incremental_agg(
        spark, base_path, ch_dir, ("k",), ("g",), lambda df: df, _inc_agg,
        checkpoint_dir=ck, full_rewrite_frac=10.0,
    )
    got = {r["g"]: (r["sv"], r["n"]) for r in out.collect()}
    assert got == {"g1": (10.0, 1), "g3": (21.0, 1)}, "no stale g2 agg row"
    table_dir = ck + "_table"
    assert not os.path.exists(os.path.join(table_dir, "g=g2")), (
        "the vacated partition's live dir must retire"
    )
    rows = merged_view(spark.read.parquet(table_dir)).collect()
    per_key = {}
    for r in rows:
        per_key[r["k"]] = per_key.get(r["k"], 0) + 1
    assert per_key == {1: 1, 2: 1}, f"one physical row per key, got {per_key}"
    # no hidden leftovers from the retire
    assert not [
        n for n in os.listdir(table_dir) if n.startswith((".old.", ".tmp."))
    ]


def test_incremental_agg_pred_term_cap_forces_full_swap(spark, tmp_path):
    """VERDICT r9 #6: past ``max_pred_terms`` affected groups the runner
    must not build the OR-of-ANDs Catalyst predicate at all — it takes the
    full-image swap with broadcast-semi-join filtering.  Observable: the
    scoped path is the only writer of the staging dir, so with the cap at
    0 the staging dir never appears; results stay oracle-equal to the
    default-cap run."""
    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_incremental_agg,
    )

    base_path = str(tmp_path / "base")
    spark.createDataFrame(
        [(i, f"g{i % 7}", float(i)) for i in range(1, 30)], INC_SCHEMA
    ).write.parquet(base_path)
    batches = [
        [(5, "g5", 500.0, 1, "U"), (6, "g6", 600.0, 1, "U"),
         (7, "g0", 7.5, 1, "D")],
        [(30, "gNEW", 300.0, 2, "U"), (5, "g5", 550.0, 2, "U")],
    ]
    results = {}
    for tag, cap in (("capped", 0), ("default", 1000)):
        sub = tmp_path / tag
        os.makedirs(sub)
        ch_dir = _land_inc_feed(spark, sub, batches)
        ck = str(sub / "ck")
        out = run_streaming_incremental_agg(
            spark, base_path, ch_dir, ("k",), ("g",), lambda df: df, _inc_agg,
            checkpoint_dir=ck, full_rewrite_frac=10.0, max_pred_terms=cap,
        )
        results[tag] = {r["g"]: (r["sv"], r["n"]) for r in out.collect()}
        staging_made = os.path.exists(ck + "_staging")
        assert staging_made == (tag == "default"), (
            f"{tag}: scoped path ran={staging_made}, expected the opposite"
        )
    assert results["capped"] == results["default"]


def test_incremental_agg_migrates_pre_partitioned_layout(spark, tmp_path):
    """ADVICE r9 (low): a reused checkpoint whose _table was written by
    the pre-r9 UNPARTITIONED layout must be detected at run entry and
    migrated with one full-image partitioned rewrite — otherwise
    swap_partitions adds group dirs beside root-level parquet files (a
    mixed layout Spark rejects, or duplicated rows)."""
    from stateful_spark_streaming_spark.operators.merge import with_merge_meta
    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_incremental_agg,
    )

    base_path = str(tmp_path / "base")
    base = spark.createDataFrame(
        [(1, "g1", 10.0), (2, "g2", 20.0)], INC_SCHEMA
    )
    base.write.parquet(base_path)
    ck = str(tmp_path / "ck")
    # fabricate the r8 shape: merge-meta'd rows, group col as a DATA
    # column, no partition dirs
    with_merge_meta(base).write.parquet(ck + "_table")
    ch_dir = _land_inc_feed(spark, tmp_path, [[(2, "g2", 25.0, 1, "U")]])
    out = run_streaming_incremental_agg(
        spark, base_path, ch_dir, ("k",), ("g",), lambda df: df, _inc_agg,
        checkpoint_dir=ck, full_rewrite_frac=10.0,
    )
    got = {r["g"]: (r["sv"], r["n"]) for r in out.collect()}
    assert got == {"g1": (10.0, 1), "g2": (25.0, 1)}
    table_dir = ck + "_table"
    assert not [n for n in os.listdir(table_dir) if n.endswith(".parquet")], (
        "root-level data files must be gone after migration"
    )
    assert os.path.isdir(os.path.join(table_dir, "g=g1"))


def test_streaming_merge_layout_mismatch_migrates(spark, tmp_path):
    """ADVICE r9 (low): reusing a merge checkpoint with a DIFFERENT
    n_buckets setting (including None<->N) must migrate the standing
    table instead of mixing layouts.  Three runs over one checkpoint:
    single -> bucketed(8) -> single; each sees the same converged rows."""
    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_merge_upsert,
    )

    base_path = str(tmp_path / "base")
    _base(spark).write.parquet(base_path)
    ch_dir = _land_change_files(
        spark, tmp_path, [[(2, "b2", 21.0, 1, "U"), (4, "d", 40.0, 1, "U")]]
    )
    ck = str(tmp_path / "ck")
    want = [(1, "a", 10.0), (2, "b2", 21.0), (3, "c", 30.0), (4, "d", 40.0)]
    got1 = _table(run_streaming_merge_upsert(
        spark, base_path, ch_dir, ("k",), checkpoint_dir=ck
    ))
    assert got1 == want
    table_dir = ck + "_table"
    # run 2: same checkpoint, now bucketed — migrates, marker stamped
    got2 = _table(run_streaming_merge_upsert(
        spark, base_path, ch_dir, ("k",), checkpoint_dir=ck, n_buckets=8
    ))
    assert got2 == want
    assert [n for n in os.listdir(table_dir) if n.startswith("__bucket=")]
    assert not [n for n in os.listdir(table_dir) if n.endswith(".parquet")]
    import json as _json

    assert _json.load(open(table_dir + ".layout"))["n_buckets"] == 8
    # run 3: back to the single-image form
    got3 = _table(run_streaming_merge_upsert(
        spark, base_path, ch_dir, ("k",), checkpoint_dir=ck
    ))
    assert got3 == want
    assert not [n for n in os.listdir(table_dir) if n.startswith("__bucket=")]
    assert _json.load(open(table_dir + ".layout"))["n_buckets"] is None

def test_incremental_agg_group_move_crash_replay_no_duplicate(spark, tmp_path):
    """A crash mid-partition-swap on a group-MOVING batch leaves the
    table MIXED: the moved key's old row (a retire that crashed between
    its hidden rename and the rmtree — recover_partitions resurrects the
    partition whole; equivalently, a promote that crashed between two
    staged partitions) coexists with its already-promoted new row.  The
    replay's merge input then carries the key TWICE (seq -1 old image +
    seq N new image); before the latest-wins collapse,
    merge_apply_batch's full-outer join emitted the key twice — the old
    row took the change, the tied-seq new row kept current — and both
    copies landed in the new partition, a PERMANENT physical duplicate
    (no later replay heals a committed batch) that also double-counted
    the maintained aggregate."""
    from stateful_spark_streaming_spark.operators.merge import merged_view
    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_incremental_agg,
    )
    import shutil

    base_path = str(tmp_path / "base")
    spark.createDataFrame(
        [(1, "g1", 10.0), (2, "g2", 20.0)], INC_SCHEMA
    ).write.parquet(base_path)
    ck = str(tmp_path / "ck")
    table_dir = ck + "_table"

    def _run(ch_dir):
        return run_streaming_incremental_agg(
            spark, base_path, ch_dir, ("k",), ("g",), lambda df: df,
            _inc_agg, checkpoint_dir=ck, full_rewrite_frac=10.0,
        )

    # batch 0: in-place touch of key 1 (bootstraps the table, commits)
    ch_dir = _land_inc_feed(spark, tmp_path, [[(1, "g1", 11.0, 1, "U")]])
    _run(ch_dir)
    # keep the pre-move g2 content — exactly what a crashed retire's
    # .old. dir holds and recover_partitions restores
    shutil.copytree(os.path.join(table_dir, "g=g2"), str(tmp_path / "g2_saved"))

    # batch 1: the group move vacating g2 (key 2 -> g3)
    bdir = str(tmp_path / "mv")
    spark.createDataFrame(
        [(2, "g3", 21.0, 2, "U")], INC_CH_SCHEMA
    ).coalesce(1).write.parquet(bdir)
    part = [f for f in os.listdir(bdir) if f.endswith(".parquet")][0]
    dst = os.path.join(ch_dir, "batch-1.parquet")
    os.rename(os.path.join(bdir, part), dst)
    os.utime(dst, (1_000_000_100,) * 2)
    _run(ch_dir)

    # simulate the crash window: resurrected old partition + un-committed
    # batch 1 (drop the commit marker AND its checksum sibling)
    shutil.copytree(str(tmp_path / "g2_saved"), os.path.join(table_dir, "g=g2"))
    os.remove(os.path.join(ck, "commits", "1"))
    crc = os.path.join(ck, "commits", ".1.crc")
    if os.path.exists(crc):
        os.remove(crc)

    out = _run(ch_dir)  # replays batch 1 against the mixed table
    raw = spark.read.parquet(table_dir)
    per_key = {r["k"]: r["cnt"] for r in
               raw.groupBy("k").agg(F.count("*").alias("cnt")).collect()}
    assert per_key == {1: 1, 2: 1}, f"one physical row per key, got {per_key}"
    assert sorted((r["k"], r["g"]) for r in merged_view(raw).collect()) == [
        (1, "g1"), (2, "g3")
    ]
    assert {r["g"]: (r["sv"], r["n"]) for r in out.collect()} == {
        "g1": (11.0, 1), "g3": (21.0, 1)
    }, "the maintained aggregate must not double-count the moved key"
    assert not os.path.exists(os.path.join(table_dir, "g=g2")), (
        "the resurrected vacated partition must retire again on replay"
    )

def test_streaming_merge_bucketed_pred_term_cap_semi_join(spark, tmp_path):
    """The bucketed scoped path's touched-bucket filter is a literal IN
    list; past ``max_pred_terms`` it must switch to a broadcast semi-join
    (never a 10^5-literal Catalyst tree at production n_buckets) while
    keeping the WRITE scoped: results equal the default-cap run and
    untouched buckets keep their exact files."""
    import os

    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_merge_upsert,
    )

    base = spark.createDataFrame(
        [(k, float(k)) for k in range(64)], "k long, v double"
    )
    b0 = spark.createDataFrame(
        [(5, 55.0, 1, "U"), (64, 640.0, 1, "U"), (9, 0.0, 1, "D")],
        "k long, v double, seq int, op string",
    )
    results = {}
    for tag, cap in (("default", 1000), ("capped", 0)):
        sub = tmp_path / tag
        sub.mkdir()
        base_path = str(sub / "base")
        base.write.parquet(base_path)
        ch_dir = _write_change_batches(sub, (b0,))
        ck = str(sub / "ckpt")
        table_dir = ck + "_table"
        # bootstrap first (empty processed feed would be simpler, but the
        # runner boots on first call anyway) — snapshot files after run 1
        out = run_streaming_merge_upsert(
            spark, base_path, ch_dir, ("k",),
            checkpoint_dir=ck, n_buckets=16, max_pred_terms=cap,
        )
        results[tag] = sorted(map(tuple, out.collect()))
        assert os.path.exists(ck + "_staging"), (
            f"{tag}: the scoped path (not the full-image fallback) must run"
        )
    assert results["capped"] == results["default"]
    want = {k: float(k) for k in range(64) if k != 9}
    want[5], want[64] = 55.0, 640.0
    assert dict(results["capped"]) == want

def test_partition_swap_every_crash_point_converges(tmp_path):
    """MECHANICAL crash enumeration for the partition-swap protocol: a
    crash is injected after EVERY filesystem mutation (os.rename /
    shutil.rmtree) a full promote+retire swap performs — not just the
    hand-picked windows the other tests cover.  After each injected
    crash: (1) recover_partitions must leave a CONSISTENT table — every
    partition dir holds a whole generation (both of its files), no
    hidden dirs, no partial mixes; (2) regenerating staging and replaying
    the same swap must converge to the clean-run end state (the runner's
    idempotent-replay contract)."""
    import os
    import shutil as _sh

    import stateful_spark_streaming_spark.generations as G

    OLD = {"g=a": "old_a", "g=b": "old_b", "g=c": "old_c"}
    NEW = {"g=a": "new_a", "g=nw": "new_nw"}   # g=b vacated -> retire
    RETIRE = ["g=b"]

    def mk_partition(root, rel, content):
        d = os.path.join(root, rel)
        os.makedirs(d, exist_ok=True)
        # two files that must travel together — catches partial-dir loss
        for f in ("part-0.parquet", "part-1.parquet"):
            with open(os.path.join(d, f), "w") as fh:
                fh.write(content)

    def build(table, staging):
        for rel, c in OLD.items():
            mk_partition(table, rel, c)
        _sh.rmtree(staging, ignore_errors=True)
        for rel, c in NEW.items():
            mk_partition(staging, rel, c)
        open(os.path.join(staging, "_SUCCESS"), "w").close()

    def snapshot(table):
        out = {}
        for rel in sorted(os.listdir(table)):
            assert not rel.startswith((".tmp.", ".old.")), f"hidden leftover {rel}"
            files = sorted(os.listdir(os.path.join(table, rel)))
            assert files == ["part-0.parquet", "part-1.parquet"], (
                f"{rel} lost half its generation: {files}"
            )
            contents = {
                open(os.path.join(table, rel, f)).read() for f in files
            }
            assert len(contents) == 1, f"{rel} mixes generations: {contents}"
            out[rel] = contents.pop()
        return out

    # clean run fixes the expected end state and the mutation count
    table, staging = str(tmp_path / "t_clean"), str(tmp_path / "s_clean")
    build(table, staging)
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
        G.swap_partitions(table, staging, sorted(NEW), retire=RETIRE)
    finally:
        os.rename, _sh.rmtree = real_rename, real_rmtree
    want = snapshot(table)
    assert want == {"g=a": "new_a", "g=c": "old_c", "g=nw": "new_nw"}
    assert n_mut >= 6, f"expected several mutations, counted {n_mut}"

    class Crash(RuntimeError):
        pass

    for crash_at in range(n_mut):
        table = str(tmp_path / f"t_{crash_at}")
        staging = str(tmp_path / f"s_{crash_at}")
        build(table, staging)
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
            G.swap_partitions(table, staging, sorted(NEW), retire=RETIRE)
            crashed = False
        except Crash:
            crashed = True
        finally:
            os.rename, _sh.rmtree = real_rename, real_rmtree
        assert crashed, f"crash point {crash_at} never reached"
        # next entry: recovery must restore consistency...
        G.recover_partitions(table)
        mid = snapshot(table)
        for rel, c in mid.items():
            assert c in (OLD.get(rel), NEW.get(rel)), (
                f"crash {crash_at}: {rel} holds unknown generation {c}"
            )
        # ...and the replay (staging regenerated, same swap) must converge
        _sh.rmtree(staging, ignore_errors=True)
        for rel, c in NEW.items():
            mk_partition(staging, rel, c)
        open(os.path.join(staging, "_SUCCESS"), "w").close()
        G.swap_partitions(table, staging, sorted(NEW), retire=RETIRE)
        assert snapshot(table) == want, f"crash {crash_at}: replay diverged"


# ---------------------------------------------------------------------------
# Schema evolution (merge.evolve_schema + run_streaming_merge_upsert's
# schema_evolution flag): additive widening, full-row-image NULLs for
# absent columns, the bucketed full-image-then-scoped dance, and the
# type-conflict refusal.
# ---------------------------------------------------------------------------

WIDE_CH_SCHEMA = "k long, name string, val double, lang string, seq int, op string"


def _land_hetero_change_files(spark, tmp_path, batches, sub="changes"):
    """Like _land_change_files but each batch brings its OWN schema —
    the drifted-feed shape schema evolution exists for."""
    ch_dir = str(tmp_path / sub)
    os.makedirs(ch_dir, exist_ok=True)
    start = len([f for f in os.listdir(ch_dir) if f.endswith(".parquet")])
    for i, (rows, schema) in enumerate(batches, start=start):
        bdir = str(tmp_path / f"hb{sub}{i}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(bdir)
        part = [f for f in os.listdir(bdir) if f.endswith(".parquet")][0]
        dst = os.path.join(ch_dir, f"batch-{i}.parquet")
        os.rename(os.path.join(bdir, part), dst)
        os.utime(dst, (1_000_000_000 + i * 100,) * 2)
    return ch_dir


def test_evolve_schema_unit_semantics(spark):
    from stateful_spark_streaming_spark.operators.merge import evolve_schema

    cur = with_merge_meta(_base(spark))
    # batch seq already renamed to __seq, as the runner does before evolving
    batch = spark.createDataFrame(
        [(2, 21.0, "en", 1, "U")],  # no `name` column, new `lang` column
        "k long, val double, lang string, __seq long, op string",
    )
    cur2, batch2, widened = evolve_schema(cur, batch, ("k",))
    assert widened
    assert "lang" in cur2.columns and cur2.filter(F.col("lang").isNotNull()).count() == 0
    # absent column in the change image -> NULL (full-row-image contract)
    got = batch2.select("k", "name", "val", "lang").collect()[0]
    assert (got["k"], got["name"], got["val"], got["lang"]) == (2, None, 21.0, "en")
    # replay shape: already-widened table sees nothing new
    _, _, widened2 = evolve_schema(cur2, batch2, ("k",))
    assert not widened2
    # type conflict refuses
    bad = spark.createDataFrame(
        [(2, "oops", 1, "U")], "k long, val string, __seq long, op string"
    )
    with pytest.raises(ValueError, match="type change"):
        evolve_schema(cur, bad, ("k",))
    # missing key column refuses
    nokey = spark.createDataFrame([(21.0, 1, "U")], "val double, __seq long, op string")
    with pytest.raises(ValueError, match="key column"):
        evolve_schema(cur, nokey, ("k",))


def test_streaming_merge_schema_evolution_single_image(spark, tmp_path):
    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_merge_upsert,
    )

    base_path = str(tmp_path / "base")
    _base(spark).write.parquet(base_path)
    ch_dir = _land_hetero_change_files(
        spark,
        tmp_path,
        [
            ([(2, "b2", 21.0, 1, "U")], CH_SCHEMA),           # narrow batch
            ([(4, "d", 40.0, "en", 2, "U")], WIDE_CH_SCHEMA), # widening batch
        ],
    )
    ck = str(tmp_path / "ck")
    out = run_streaming_merge_upsert(
        spark, base_path, ch_dir, ("k",),
        checkpoint_dir=ck, schema_evolution=True,
    )
    got = {r["k"]: (r["name"], r["val"], r["lang"]) for r in out.collect()}
    assert got == {
        1: ("a", 10.0, None),   # untouched base row: NULL backfill
        2: ("b2", 21.0, None),  # narrow change image: NULL lang
        3: ("c", 30.0, None),
        4: ("d", 40.0, "en"),   # the widening upsert
    }
    # restart over the same checkpoint: no re-application, schema stable
    out2 = run_streaming_merge_upsert(
        spark, base_path, ch_dir, ("k",),
        checkpoint_dir=ck, schema_evolution=True,
    )
    assert {r["k"]: (r["name"], r["val"], r["lang"]) for r in out2.collect()} == got


def test_streaming_merge_schema_evolution_bucketed(spark, tmp_path):
    """Bucketed + evolution: a widening batch takes the FULL-IMAGE swap
    (every bucket's files carry the new column afterwards — asserted from
    parquet footers), and a later same-schema batch returns to the scoped
    path (untouched buckets keep their exact files)."""
    import glob

    import pyarrow.parquet as pq

    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_merge_upsert,
    )

    base = spark.createDataFrame(
        [(k, f"v{k}", float(k)) for k in range(40)], "k long, name string, val double"
    )
    base_path = str(tmp_path / "base")
    base.write.parquet(base_path)
    ck = str(tmp_path / "ck")
    table_dir = ck + "_table"
    kw = dict(checkpoint_dir=ck, n_buckets=8, schema_evolution=True)

    # run 1: narrow single-key batch — boots the bucketed table
    ch_dir = _land_hetero_change_files(
        spark, tmp_path, [([(3, "u3", 33.0, 1, "U")], CH_SCHEMA)]
    )
    run_streaming_merge_upsert(spark, base_path, ch_dir, ("k",), **kw)

    # run 2: WIDENING single-key batch — must full-image despite touching
    # one bucket: every bucket's footer gains `lang`
    _land_hetero_change_files(
        spark, tmp_path, [([(8, "u8", 88.0, "fr", 2, "U")], WIDE_CH_SCHEMA)]
    )
    out2 = run_streaming_merge_upsert(spark, base_path, ch_dir, ("k",), **kw)
    for f in glob.glob(os.path.join(table_dir, "__bucket=*", "*.parquet")):
        assert "lang" in pq.read_schema(f).names, f
    got2 = {r["k"]: (r["name"], r["val"], r["lang"]) for r in out2.collect()}
    assert got2[8] == ("u8", 88.0, "fr") and got2[3] == ("u3", 33.0, None)
    assert all(v[2] is None for k, v in got2.items() if k != 8)

    # run 3: same-schema single-key batch — scoped again: every bucket
    # except the touched key's keeps its exact inode
    inodes_before = {
        f: os.stat(f).st_ino
        for f in glob.glob(os.path.join(table_dir, "__bucket=*", "*.parquet"))
    }
    _land_hetero_change_files(
        spark, tmp_path, [([(9, "u9", 99.0, "de", 3, "U")], WIDE_CH_SCHEMA)]
    )
    out3 = run_streaming_merge_upsert(spark, base_path, ch_dir, ("k",), **kw)
    from pyspark.sql import functions as FF
    kb = spark.createDataFrame([(9,)], "k long").select(
        FF.pmod(FF.xxhash64("k"), FF.lit(8)).alias("b")
    ).collect()[0]["b"]
    moved = {
        f for f, ino in inodes_before.items()
        if not os.path.exists(f) or os.stat(f).st_ino != ino
    }
    assert all(f"__bucket={kb}" in f for f in moved), moved
    got3 = {r["k"]: (r["name"], r["val"], r["lang"]) for r in out3.collect()}
    assert got3[9] == ("u9", 99.0, "de")


def test_streaming_merge_schema_evolution_type_conflict_fails(spark, tmp_path):
    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_merge_upsert,
    )

    base_path = str(tmp_path / "base")
    _base(spark).write.parquet(base_path)
    ch_dir = _land_hetero_change_files(
        spark, tmp_path,
        [([(2, "b2", "not-a-double", 1, "U")],
          "k long, name string, val string, seq int, op string")],
    )
    with pytest.raises(Exception, match="type change"):
        run_streaming_merge_upsert(
            spark, base_path, ch_dir, ("k",),
            checkpoint_dir=str(tmp_path / "ck"), schema_evolution=True,
        )


def test_incremental_agg_refuses_widened_feed(spark, tmp_path):
    """The MV runner has no schema evolution: a feed that grew a column
    would be SILENTLY dropped by the merge's table-schema projection —
    it must refuse loudly and point at the merge runner's evolution mode."""
    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_incremental_agg,
    )

    base = spark.createDataFrame(
        [(1, "g1", 10.0), (2, "g2", 20.0)], "k long, g string, v double"
    )
    base_path = str(tmp_path / "base")
    base.write.parquet(base_path)
    ch_dir = str(tmp_path / "changes")
    os.makedirs(ch_dir)
    wide = spark.createDataFrame(
        [(1, "g1", 11.0, "surprise", 1, "U")],
        "k long, g string, v double, extra string, seq int, op string",
    )
    bdir = str(tmp_path / "wb")
    wide.coalesce(1).write.parquet(bdir)
    part = [f for f in os.listdir(bdir) if f.endswith(".parquet")][0]
    os.rename(os.path.join(bdir, part), os.path.join(ch_dir, "batch-0.parquet"))

    with pytest.raises(Exception, match="schema_evolution"):
        run_streaming_incremental_agg(
            spark, base_path, ch_dir, ("k",), ("g",),
            add_group=lambda df: df,
            agg_fn=lambda d: d.groupBy("g").agg(
                F.round(F.sum("v"), 2).alias("sv"), F.count(F.lit(1)).alias("n")
            ),
            checkpoint_dir=str(tmp_path / "ck"),
        )


def test_merge_upsert_refuses_widened_feed_without_evolution(spark, tmp_path):
    """With schema_evolution=False (the default) the merge runner must
    refuse a change batch carrying columns the table lacks — before r11
    merge_apply_batch's table-schema projection dropped them SILENTLY,
    the exact hazard class the MV runner refuses loudly (ADVICE r10: the
    two runners must agree)."""
    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_merge_upsert,
    )

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "k long, s string, v double"
    )
    base_path = str(tmp_path / "tbl")
    base.write.parquet(base_path)
    ch_dir = str(tmp_path / "changes")
    os.makedirs(ch_dir)
    wide = spark.createDataFrame(
        [(1, "a", 11.0, "surprise", 1, "U")],
        "k long, s string, v double, extra string, seq int, op string",
    )
    bdir = str(tmp_path / "wb")
    wide.coalesce(1).write.parquet(bdir)
    part = [f for f in os.listdir(bdir) if f.endswith(".parquet")][0]
    os.rename(os.path.join(bdir, part), os.path.join(ch_dir, "batch-0.parquet"))

    with pytest.raises(Exception, match="schema_evolution"):
        run_streaming_merge_upsert(
            spark, base_path, ch_dir, ("k",),
            checkpoint_dir=str(tmp_path / "ck"),
        )


def test_merge_upsert_refuses_midstream_widened_file(spark, tmp_path):
    """The subtle variant (r11 self-review #1): only the SECOND change
    file carries the extra column.  With merge_schema=False the stream's
    fixed one-footer schema would project the column away AT THE SCAN, so
    the per-batch guard never sees it — the stream-START guard over the
    mergeSchema UNION of all footers must refuse instead."""
    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_merge_upsert,
    )

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "k long, s string, v double"
    )
    base_path = str(tmp_path / "tbl")
    base.write.parquet(base_path)
    ch_dir = str(tmp_path / "changes")
    os.makedirs(ch_dir)

    def _one_file(df, name, mtime):
        bdir = str(tmp_path / ("stage_" + name))
        df.coalesce(1).write.parquet(bdir)
        part = [f for f in os.listdir(bdir) if f.endswith(".parquet")][0]
        dst = os.path.join(ch_dir, name)
        os.rename(os.path.join(bdir, part), dst)
        os.utime(dst, (mtime, mtime))  # deterministic replay order

    narrow = spark.createDataFrame(
        [(1, "a", 11.0, 1, "U")], "k long, s string, v double, seq int, op string"
    )
    wide = spark.createDataFrame(
        [(2, "b", 21.0, "surprise", 2, "U")],
        "k long, s string, v double, extra string, seq int, op string",
    )
    _one_file(narrow, "batch-0.parquet", 1_000_000_000)
    _one_file(wide, "batch-1.parquet", 1_000_000_100)

    with pytest.raises(Exception, match="schema_evolution"):
        run_streaming_merge_upsert(
            spark, base_path, ch_dir, ("k",),
            checkpoint_dir=str(tmp_path / "ck"),
        )


def test_streaming_merge_schema_evolution_widening_crash_replay(spark, tmp_path):
    """The widening batch's crash window: its full-image swap committed
    but the checkpoint did not.  The replay re-delivers the widening
    batch against the ALREADY-widened table — evolve_schema sees nothing
    new (widened=False), so the replay takes the normal scoped path and
    the per-row seq watermark makes it a no-op: same final state, one
    physical row per key, no second widening."""
    import shutil

    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_merge_upsert,
    )

    base = spark.createDataFrame(
        [(k, f"v{k}", float(k)) for k in range(20)], "k long, name string, val double"
    )
    base_path = str(tmp_path / "base")
    base.write.parquet(base_path)
    ck = str(tmp_path / "ck")
    kw = dict(checkpoint_dir=ck, n_buckets=4, schema_evolution=True)
    ch_dir = _land_hetero_change_files(
        spark, tmp_path,
        [
            ([(3, "u3", 33.0, 1, "U")], CH_SCHEMA),            # batch 0
            ([(8, "u8", 88.0, "fr", 2, "U")], WIDE_CH_SCHEMA), # batch 1 widens
        ],
    )
    out1 = run_streaming_merge_upsert(spark, base_path, ch_dir, ("k",), **kw)
    got1 = sorted((r["k"], r["name"], r["val"], r["lang"]) for r in out1.collect())

    # crash window: batch 1's table swap is durable, its commit is not
    os.remove(os.path.join(ck, "commits", "1"))
    crc = os.path.join(ck, "commits", ".1.crc")
    if os.path.exists(crc):
        os.remove(crc)

    out2 = run_streaming_merge_upsert(spark, base_path, ch_dir, ("k",), **kw)
    got2 = sorted((r["k"], r["name"], r["val"], r["lang"]) for r in out2.collect())
    assert got2 == got1
    raw = spark.read.parquet(ck + "_table")
    per_key = {r["k"]: r["cnt"] for r in
               raw.groupBy("k").agg(F.count("*").alias("cnt")).collect()}
    assert set(per_key.values()) == {1}, f"one physical row per key: {per_key}"
    assert [f for f in raw.columns if f == "lang"] == ["lang"]


def test_evolve_schema_refuses_case_drifted_columns(spark):
    """Spark resolves column names case-insensitively, so a feed column
    differing from a table column only in case would slip past a
    case-sensitive new-column check and then withColumn would silently
    REPLACE the existing column with NULLs — standing data destroyed.
    evolve_schema must refuse the drift instead."""
    from stateful_spark_streaming_spark.operators.merge import evolve_schema

    cur = with_merge_meta(_base(spark))  # has `name`
    drifted = spark.createDataFrame(
        [(2, "B2", 21.0, 1, "U")],
        "k long, Name string, val double, __seq long, op string",
    )
    with pytest.raises(ValueError, match="case-drift"):
        evolve_schema(cur, drifted, ("k",))


def test_merge_upsert_diagnoses_type_drifted_feed(spark, tmp_path):
    """ADVICE r11: the stream-start wider-feed guard reads the feed with
    mergeSchema=true; if change files carry the SAME column at different
    parquet types (int32 vs int64 here), Spark's footer-type merge fails
    before the guard's intended ValueError.  The runner must surface
    that as a pointed type-drift diagnosis naming the feed, not a bare
    'Failed to merge fields' stack."""
    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_merge_upsert,
    )

    base = spark.createDataFrame(
        [(1, 10, 1, "U")], "k long, v long, seq int, op string"
    )
    base_path = str(tmp_path / "tbl")
    base.select("k", "v").write.parquet(base_path)
    ch_dir = str(tmp_path / "changes")
    os.makedirs(ch_dir)
    for i, vtype in enumerate(("int", "long")):
        b = spark.createDataFrame(
            [(1, 11, 1 + i, "U")], f"k long, v {vtype}, seq int, op string"
        )
        bdir = str(tmp_path / f"wb{i}")
        b.coalesce(1).write.parquet(bdir)
        part = [f for f in os.listdir(bdir) if f.endswith(".parquet")][0]
        os.rename(
            os.path.join(bdir, part), os.path.join(ch_dir, f"batch-{i}.parquet")
        )

    with pytest.raises(ValueError, match="different parquet types"):
        run_streaming_merge_upsert(
            spark, base_path, ch_dir, ("k",),
            checkpoint_dir=str(tmp_path / "ck"),
        )


def test_streaming_merge_bucketed_hot_entity_skew(spark, tmp_path):
    """The CDC hot-entity shape (r11 verdict #6): EVERY batch's keys hash
    into the SAME bucket.  The scoped path must (a) stay scoped — one
    touched bucket never trips the full_rewrite_frac fallback, (b) keep
    every other bucket's files byte-stable across ALL batches (write
    amplification is bounded by one bucket ≈ table/n_buckets, however
    hot the entity), and (c) produce the exact merged result."""
    import os

    from pyspark.sql import functions as F

    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_merge_upsert,
    )

    nb = 16
    base = spark.createDataFrame(
        [(k, float(k)) for k in range(400)], "k long, v double"
    )
    # keys that all hash into one bucket — the hot entity's co-residents
    hot = [
        r["k"] for r in base.withColumn(
            "b", F.pmod(F.xxhash64("k"), F.lit(nb))
        ).filter("b = 3").select("k").collect()
    ][:6]
    assert len(hot) >= 3
    batches = [
        spark.createDataFrame(
            [(k, 1000.0 * (i + 1) + k, i + 1, "U") for k in hot],
            "k long, v double, seq int, op string",
        )
        for i in range(3)
    ]
    base_path = str(tmp_path / "base")
    base.write.parquet(base_path)

    # bootstrap with batch 0, snapshot untouched buckets, then replay
    # batches 1-2 through the same checkpoint (availableNow resume)
    ch_dir = str(tmp_path / "changes")
    os.makedirs(ch_dir)
    ck = str(tmp_path / "ckpt")
    table_dir = ck + "_table"

    def _land(b, i):
        bdir = str(tmp_path / f"wb{i}")
        b.coalesce(1).write.parquet(bdir)
        part = [f for f in os.listdir(bdir) if f.endswith(".parquet")][0]
        os.rename(os.path.join(bdir, part),
                  os.path.join(ch_dir, f"batch-{i}.parquet"))

    _land(batches[0], 0)
    run_streaming_merge_upsert(
        spark, base_path, ch_dir, ("k",), checkpoint_dir=ck, n_buckets=nb
    )

    def _files():
        snap = {}
        for root, _dirs, files in os.walk(table_dir):
            if "__bucket=3" in root:
                continue  # the hot bucket — allowed to move
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    st = os.stat(p)
                    snap[p] = (st.st_ino, st.st_size, st.st_mtime_ns)
        return snap

    before = _files()
    assert before, "bucketed layout should have cold-bucket files"
    for i in (1, 2):
        _land(batches[i], i)
    out = run_streaming_merge_upsert(
        spark, base_path, ch_dir, ("k",), checkpoint_dir=ck, n_buckets=nb
    )
    assert _files() == before, "a cold bucket moved under a hot-entity feed"
    got = {r["k"]: r["v"] for r in out.collect()}
    want = {k: float(k) for k in range(400)}
    for k in hot:
        want[k] = 3000.0 + k  # last batch (seq 3) wins
    assert got == want


def test_merge_bucket_count_sizing_rule():
    from stateful_spark_streaming_spark.streaming.pipeline import (
        merge_bucket_count,
    )

    assert merge_bucket_count(0) == 8                       # floor
    assert merge_bucket_count(2_500_000) == 8               # sf0.1-ish: floor
    assert merge_bucket_count(250 << 20) == 8               # sf10 probe table: ceil(4) -> floor
    assert merge_bucket_count(100 << 30) == 1600            # 100 GB
    assert merge_bucket_count(1 << 50) == 4096              # cap


def test_streaming_merge_bucketed_gate_shape_scoped_swap(spark, tmp_path):
    """The r14 gate query's 3-batch shape at n_buckets=128 — the coverage
    the bucketed gate query used to force with a hand-held constant, now
    pinned HERE so the query can self-size (r15, VERDICT r14 #3).

    Feed: two full change batches (touch > full_rewrite_frac of the
    buckets → full-image fallback in the bucketed layout), then a third
    batch replaying a small slice of batch 2 — a seq-watermark NO-OP on
    the final state whose keys hash into a strict subset of buckets, so
    the scoped bucket-swap path must run end-to-end.  Pins, at inode
    level: batch 3 rewrites ONLY its keys' buckets; the replay changes
    no rows; and the bucketed result equals the single-image runner's
    on the identical feed."""
    import os

    from pyspark.sql import functions as F

    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_merge_upsert,
    )

    NB, FRAC = 128, 0.9
    base = spark.createDataFrame(
        [(k, float(k)) for k in range(2000)], "k long, v double"
    )
    b0 = spark.createDataFrame(
        [(k, k + 0.5, 1, "U") for k in range(0, 2000, 2)],
        "k long, v double, seq int, op string",
    )
    b1 = spark.createDataFrame(
        [(k, k + 0.25, 2, "U") for k in range(0, 2000, 3)]
        + [(k, 0.0, 2, "D") for k in range(1, 2000, 500)],
        "k long, v double, seq int, op string",
    )
    slice_keys = list(range(0, 2000, 300))  # ⊂ b1's %3 keys, ~7 buckets
    b2 = spark.createDataFrame(
        [(k, k + 0.25, 2, "U") for k in slice_keys],
        "k long, v double, seq int, op string",
    )
    base_path = str(tmp_path / "base")
    base.write.parquet(base_path)

    # single-image reference on the identical feed
    ref_dir = tmp_path / "ref"
    ref_dir.mkdir()
    ref = run_streaming_merge_upsert(
        spark, base_path, _write_change_batches(ref_dir, (b0, b1, b2)),
        ("k",), checkpoint_dir=str(ref_dir / "ck"),
    )
    want = sorted(map(tuple, ref.select("k", "v").collect()))

    # bucketed run in two stages so batch-3's swap is observable: replay
    # b0+b1 first, snapshot every bucket dir's inodes, then land b2 on
    # the SAME checkpoint and re-run
    bk = tmp_path / "bk"
    bk.mkdir()
    ch_dir = _write_change_batches(bk, (b0, b1))
    table_dir = str(bk / "ck") + "_table"
    out1 = run_streaming_merge_upsert(
        spark, base_path, ch_dir, ("k",), checkpoint_dir=str(bk / "ck"),
        n_buckets=NB, full_rewrite_frac=FRAC,
    )
    mid = sorted(map(tuple, out1.select("k", "v").collect()))
    snap = {}
    for d in os.listdir(table_dir):
        if d.startswith("__bucket="):
            sub = os.path.join(table_dir, d)
            snap[d] = {
                f: os.stat(os.path.join(sub, f)).st_ino for f in os.listdir(sub)
            }
    assert len(snap) > 100, "full batches did not materialize the 128-bucket layout"

    seg = str(bk / "wseg_b2")
    b2.coalesce(1).write.parquet(seg)
    part = [f for f in os.listdir(seg) if f.endswith(".parquet")][0]
    dst = os.path.join(ch_dir, "batch-2.parquet")
    os.rename(os.path.join(seg, part), dst)
    os.utime(dst, (1_000_000_300,) * 2)
    out2 = run_streaming_merge_upsert(
        spark, base_path, ch_dir, ("k",), checkpoint_dir=str(bk / "ck"),
        n_buckets=NB, full_rewrite_frac=FRAC,
    )
    got = sorted(map(tuple, out2.select("k", "v").collect()))
    assert got == mid, "seq-watermark replay slice must be a state no-op"
    assert got == want, "bucketed result diverged from the single-image form"

    expect_buckets = {
        f"__bucket={r['b']}"
        for r in spark.createDataFrame([(k,) for k in slice_keys], "k long")
        .select(F.pmod(F.xxhash64("k"), F.lit(NB)).alias("b"))
        .collect()
    }
    assert len(expect_buckets) < FRAC * NB, "slice no longer scoped-swap shaped"
    moved = []
    for d, files in snap.items():
        sub = os.path.join(table_dir, d)
        now = {f: os.stat(os.path.join(sub, f)).st_ino for f in os.listdir(sub)}
        if now != files:
            moved.append(d)
    assert sorted(moved) == sorted(expect_buckets), (
        f"batch 3 took the wrong swap path: rewrote {sorted(moved)}, "
        f"expected exactly the slice's buckets {sorted(expect_buckets)}"
    )


def test_streaming_merge_auto_buckets(spark, tmp_path):
    """n_buckets='auto' resolves from base-table bytes (floor=8 at test
    SF), records the RESOLVED int in the layout marker, and produces the
    same merged result as the explicit count."""
    import json as _json
    import os

    from stateful_spark_streaming_spark.streaming.pipeline import (
        run_streaming_merge_upsert,
    )

    base = spark.createDataFrame(
        [(k, float(k)) for k in range(100)], "k long, v double"
    )
    b0 = spark.createDataFrame(
        [(5, 55.0, 1, "U"), (100, 1.0, 1, "U")],
        "k long, v double, seq int, op string",
    )
    results = {}
    for tag, nb in (("auto", "auto"), ("explicit", 8)):
        sub = tmp_path / tag
        sub.mkdir()
        base_path = str(sub / "base")
        base.write.parquet(base_path)
        ch_dir = str(sub / "changes")
        os.makedirs(ch_dir)
        bdir = str(sub / "wb")
        b0.coalesce(1).write.parquet(bdir)
        part = [f for f in os.listdir(bdir) if f.endswith(".parquet")][0]
        os.rename(os.path.join(bdir, part), os.path.join(ch_dir, "b0.parquet"))
        ck = str(sub / "ck")
        out = run_streaming_merge_upsert(
            spark, base_path, ch_dir, ("k",), checkpoint_dir=ck, n_buckets=nb
        )
        results[tag] = sorted(map(tuple, out.collect()))
        layout = _json.load(open(ck + "_table.layout"))
        assert layout["n_buckets"] == 8, tag  # resolved int, never "auto"
    assert results["auto"] == results["explicit"]

    with pytest.raises(ValueError, match="auto"):
        run_streaming_merge_upsert(
            spark, str(tmp_path / "auto" / "base"), str(tmp_path / "auto" / "changes"),
            ("k",), checkpoint_dir=str(tmp_path / "ck2"), n_buckets="turbo",
        )
