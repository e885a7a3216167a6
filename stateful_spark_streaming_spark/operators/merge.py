"""CDC merge/upsert — the MERGE INTO shape for incremental table and
corpus maintenance, plus snapshot diffing.

A 100 TB training corpus is not rebuilt per refresh; it is MAINTAINED:
a change feed (new crawls, re-scored documents, takedown deletions)
merges into the standing table.  The logical plan every lakehouse MERGE
lowers to is exactly expressible in DataFrame algebra, and that is what
these operators are:

- within the change set, LATEST-WINS per key via one
  ``max(struct(seq, ...))`` aggregate — partial-aggregatable, so the
  map-side combine collapses each task's changes before the single
  key shuffle (never a window over the key: AQE cannot skew-split
  window partitions);
- untouched base rows ride through a LEFT ANTI join on the key (AQE
  broadcasts the key side when the change set is small — the common
  case: daily changes ≪ standing corpus);
- the union of survivors and applied upserts is the new table.

The incremental form (:func:`merge_apply_batch`) adds the two things a
STREAM of change batches needs: a per-row sequence watermark kept IN
the table (``seq_col``), so replaying an already-applied batch is a
no-op (change applies only when ``change.seq > base.seq``), and
tombstones (``tombstone_col``) so a delete leaves a seq-bearing marker
— without it, a replayed pre-delete upsert would resurrect the row.
Reference parity: this generalizes the reference's keyed first-arrival
state semantics (MapWithStateRDD in StreamWithStates.scala) from
per-key memory state to a durable table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_changes(
    changes: DataFrame,
    key_cols: tuple[str, ...],
    seq_col: str = "seq",
) -> DataFrame:
    """Collapse a change set to one row per key — the row with the
    highest ``seq_col`` (ties broken deterministically by the remaining
    columns' field-order struct comparison; give batches unique seqs).
    Shape: ONE partial-aggregatable max(struct) — no window, no join."""
    keys = list(key_cols)
    rest = [c for c in changes.columns if c not in keys]
    packed = changes.groupBy(*keys).agg(
        F.max(F.struct(*[F.col(seq_col)] + [F.col(c) for c in rest if c != seq_col])).alias("__c")
    )
    ordered = [seq_col] + [c for c in rest if c != seq_col]
    return packed.select(
        *keys, *[F.col(f"__c.{c}").alias(c) for c in ordered]
    )


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    key_cols: tuple[str, ...],
    seq_col: str = "seq",
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """One-shot MERGE INTO: apply a change set (rows carry the full new
    row image plus ``seq_col`` and ``op_col``) to ``base``.  Returns the
    merged table with ``base``'s exact schema: untouched rows + the
    latest non-delete image per changed key; keys whose latest change is
    a delete disappear.

    Single-shot semantics need no tombstones or seq watermark in the
    output — all changes are visible at once, so latest-wins within the
    set is total.  For an incremental stream of batches use
    :func:`merge_apply_batch`."""
    keys = list(key_cols)
    latest = latest_changes(changes, key_cols, seq_col)
    untouched = base.join(latest.select(*keys), keys, "left_anti")
    # null-SAFE: a NULL op is an upsert, never a silent delete (a plain
    # `!=` filter evaluates NULL and would drop the row from upserts
    # while its key still anti-joins the base row away — the key would
    # vanish from the merged table on malformed CDC input)
    upserts = latest.filter(
        ~F.col(op_col).eqNullSafe(delete_op)
    ).select(*base.columns)
    return untouched.unionByName(upserts)


def merge_apply_batch(
    cur: DataFrame,
    batch: DataFrame,
    key_cols: tuple[str, ...],
    seq_col: str = "__seq",
    op_col: str = "op",
    delete_op: str = "D",
    tombstone_col: str = "__deleted",
) -> DataFrame:
    """Apply ONE change batch to the current maintained table and return
    the next table generation.  ``cur`` carries ``seq_col`` +
    ``tombstone_col`` metadata columns (a fresh table bootstraps them
    with seq −1 / false via :func:`with_merge_meta`); ``batch`` carries
    the row image + ``seq_col`` + ``op_col``.

    Replay/ordering safety: a change applies ONLY when its seq exceeds
    the row's current seq — re-delivering an old batch (crash replay,
    out-of-order file pickup) is a no-op, and states converge to the
    highest-seq image regardless of batch arrival order.  Deletes write
    a TOMBSTONE (seq-bearing marker row) instead of removing the key, so
    a replayed pre-delete upsert cannot resurrect it; read with
    :func:`merged_view`.  Plan shape: one max(struct) over the batch +
    one full-outer equi-join on the key (batch side summary-sized; AQE
    broadcasts it under the standing table's size)."""
    keys = list(key_cols)
    data_cols = [c for c in cur.columns if c not in (*keys, seq_col, tombstone_col)]
    latest = latest_changes(batch, key_cols, seq_col)
    ch = latest.select(
        *[F.col(k).alias(f"__ch_{k}") for k in keys],
        F.col(seq_col).alias("__ch_seq"),
        # null-safe: NULL op = upsert, not a NULL tombstone flag that
        # merged_view's `~deleted` filter would silently drop
        F.col(op_col).eqNullSafe(delete_op).alias("__ch_del"),
        *[F.col(c).alias(f"__ch_{c}") for c in data_cols],
    )
    cond = [cur[k] == ch[f"__ch_{k}"] for k in keys]
    joined = cur.join(ch, cond, "full_outer")
    take_change = F.col("__ch_seq").isNotNull() & (
        F.col(seq_col).isNull() | (F.col("__ch_seq") > F.col(seq_col))
    )
    out_cols = [
        F.coalesce(cur[k], F.col(f"__ch_{k}")).alias(k) for k in keys
    ]
    out_cols += [
        F.when(take_change, F.col(f"__ch_{c}")).otherwise(cur[c]).alias(c)
        for c in data_cols
    ]
    out_cols.append(
        F.when(take_change, F.col("__ch_seq")).otherwise(F.col(seq_col)).alias(seq_col)
    )
    out_cols.append(
        F.when(take_change, F.col("__ch_del"))
        .otherwise(F.coalesce(F.col(tombstone_col), F.lit(False)))
        .alias(tombstone_col)
    )
    return joined.select(*out_cols)


def evolve_schema(
    cur: DataFrame,
    batch: DataFrame,
    key_cols: tuple[str, ...],
    seq_col: str = "__seq",
    op_col: str = "op",
    tombstone_col: str = "__deleted",
    ignore_cols: tuple[str, ...] = (),
) -> tuple[DataFrame, DataFrame, bool]:
    """ADDITIVE schema evolution for the CDC merge (the Delta/Iceberg
    ``mergeSchema`` shape): align a standing table and a change batch
    whose column sets drifted apart, so maintenance survives the one
    schema change every long-lived 100 TB table eventually sees.

    - a column present in the batch but not the table WIDENS the table:
      existing rows backfill NULL (exactly what a lakehouse ADD COLUMN
      does — no rewrite of history into fake values);
    - a column present in the table but absent from the batch becomes
      NULL in the change images — the full-row-image CDC contract (an
      upsert REPLACES the row; an absent column means "no value"), not
      a partial-update patch;
    - a shared column with a DIFFERENT type raises: silent cross-type
      coercion is how a long-lived table acquires corrupt history.
      (Type widening is a separate, explicit migration.)

    Key columns must exist in both inputs — a key column can never be
    evolved in.  ``ignore_cols`` are left alone on both sides (e.g. a
    runner-managed partition column like ``__bucket`` that is derived,
    not carried).  Returns (cur', batch', widened) where ``widened``
    tells the caller the TABLE gained columns (partition-scoped writers
    must force a full-image rewrite for that batch, or untouched
    partitions would keep old-schema files that a fixed-schema read
    would mask).
    """
    keys = set(key_cols)
    missing_keys = keys - set(batch.columns)
    if missing_keys:
        raise ValueError(f"change batch lacks key column(s): {sorted(missing_keys)}")
    cur_types = {f.name: f.dataType for f in cur.schema.fields}
    batch_types = {f.name: f.dataType for f in batch.schema.fields}
    # CASING DRIFT refuses before anything else: Spark resolves column
    # names case-insensitively by default, so a batch column differing
    # from a table column only in case ("Lang" vs "lang") would pass the
    # case-SENSITIVE new-column check below and then
    # ``withColumn("Lang", NULL)`` would silently REPLACE the existing
    # column with NULLs (verified behavior) — destroying standing data.
    cur_by_lower = {n.lower(): n for n in cur_types}
    batch_by_lower = {n.lower(): n for n in batch_types}
    drift = {
        (cur_by_lower[l], batch_by_lower[l])
        for l in set(cur_by_lower) & set(batch_by_lower)
        if cur_by_lower[l] != batch_by_lower[l]
    }
    if drift:
        raise ValueError(
            f"schema evolution refuses case-drifted column names: {sorted(drift)}"
            " — Spark resolves names case-insensitively, so widening would"
            " silently overwrite the existing column; rename the feed column"
        )
    # meta and runner-managed columns are exempt from the conflict check:
    # e.g. a feed's int seq against the table's long __seq is routine, and
    # the merge's seq comparison coerces numerics safely
    meta = {seq_col, op_col, tombstone_col, *ignore_cols}
    conflicts = {
        n: (str(cur_types[n]), str(batch_types[n]))
        for n in (set(cur_types) & set(batch_types)) - meta
        if cur_types[n] != batch_types[n]
    }
    if conflicts:
        raise ValueError(
            f"schema evolution refuses type changes: {conflicts} — "
            "widen types with an explicit migration, not a change batch"
        )
    skip = set(ignore_cols)
    new_cols = [
        f for f in batch.schema.fields
        if f.name not in cur_types and f.name not in (seq_col, op_col)
        and f.name not in skip
    ]
    for f in new_cols:
        cur = cur.withColumn(f.name, F.lit(None).cast(f.dataType))
    absent = [
        f for f in cur.schema.fields
        if f.name not in batch_types and f.name not in (seq_col, tombstone_col)
        and f.name not in skip
    ]
    for f in absent:
        batch = batch.withColumn(f.name, F.lit(None).cast(f.dataType))
    return cur, batch, bool(new_cols)


def with_merge_meta(
    df: DataFrame, seq_col: str = "__seq", tombstone_col: str = "__deleted"
) -> DataFrame:
    """Bootstrap a plain table for incremental maintenance: every
    existing row gets seq −1 (older than any change) and no tombstone."""
    return df.withColumn(seq_col, F.lit(-1).cast("long")).withColumn(
        tombstone_col, F.lit(False)
    )


def merged_view(
    df: DataFrame, seq_col: str = "__seq", tombstone_col: str = "__deleted"
) -> DataFrame:
    """The user-facing table: tombstones filtered, metadata dropped."""
    return df.filter(~F.col(tombstone_col)).drop(seq_col, tombstone_col)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    fingerprint,
) -> DataFrame:
    """Release diff between two corpus/table snapshots: one row per id
    whose membership or content changed — ``status`` ∈ added / removed /
    changed (identical rows are omitted; at corpus scale "unchanged" is
    the overwhelming bulk and enumerating it is the anti-pattern).

    ``fingerprint`` is a Column expression evaluated against each side
    (e.g. ``F.md5(F.col("text"))``).  Scale shape: both sides project to
    (id, fp) BEFORE the full-outer equi-join — the shuffle carries
    ~40 bytes/row, never the payload.

    Membership comes from explicit per-side presence markers, NOT from
    fingerprint nullity: a nullable fingerprint (``md5(NULL text)``)
    must classify a both-sides row as changed/unchanged, never as
    added/removed — and change detection is null-safe, so NULL→value
    and value→NULL are 'changed', NULL→NULL is unchanged."""
    o = old.select(
        F.col(id_col).alias("id"), fingerprint.alias("old_fp"),
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        F.col(id_col).alias("id"), fingerprint.alias("new_fp"),
        F.lit(True).alias("__in_new"),
    )
    j = o.join(n, "id", "full_outer")
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(
            ~F.col("old_fp").eqNullSafe(F.col("new_fp")), F.lit("changed")
        )
    )
    return (
        j.select(F.col("id").alias(id_col), status.alias("status"))
        .filter(F.col("status").isNotNull())
    )


def affected_groups(
    base: DataFrame,
    changes: DataFrame,
    key_cols: tuple[str, ...],
    group_cols: tuple[str, ...],
) -> DataFrame:
    """The DISTINCT group values a change set can touch: groups of the
    changed keys' OLD rows (a key may move groups, or be deleted out of
    one) unioned with groups of the change images themselves (a key may
    move INTO a group, or be inserted).  Both inputs must already carry
    the group columns.  Output is group-cardinality-sized — at most
    2×|changes| rows before the distinct, usually far fewer."""
    keys = list(key_cols)
    groups = list(group_cols)
    old_side = base.join(
        changes.select(*keys).distinct(), keys, "left_semi"
    ).select(*groups)
    new_side = changes.select(*groups)
    return old_side.union(new_side).distinct()


def refresh_groups(
    materialized: DataFrame,
    merged: DataFrame,
    affected: DataFrame,
    group_cols: tuple[str, ...],
    agg_fn,
) -> DataFrame:
    """Incremental MATERIALIZED-AGGREGATE maintenance: refresh only the
    groups a change set touched, keeping every other group's row from the
    existing aggregate verbatim.

    This is the affected-partition recompute strategy — the one that
    stays EXACT under deletes and non-decomposable aggregates (count
    distinct, percentiles) where delta/retraction maintenance does not.
    Cost is proportional to data in the affected groups, not the table:
    ``affected`` is summary-sized and BROADCAST into both the anti join
    (dropping stale aggregate rows) and the semi join (pruning the
    recompute's scan — with the detail table partitioned by the group
    columns, that semi join prunes at the partition index and the
    recompute touches only the affected partitions' files).

    ``agg_fn(detail) -> DataFrame`` must produce the SAME schema as
    ``materialized`` grouped by ``group_cols`` — the caller's one
    aggregate definition serves initial build and refresh alike."""
    groups = list(group_cols)
    untouched = materialized.join(F.broadcast(affected), groups, "left_anti")
    recomputed = agg_fn(merged.join(F.broadcast(affected), groups, "left_semi"))
    return untouched.unionByName(recomputed)
