"""Crash-safe directory-generation swaps for compaction/retrain jobs.

The naive ``rmtree(path); rename(tmp, path)`` swap has two silent-loss
windows: killed mid-rmtree leaves ``path`` with a SUBSET of its files
(parquet readers happily return fewer rows), and killed between the two
calls leaves no ``path`` at all.  POSIX gives no atomic directory
replace, so this module narrows the window to pure renames and makes
every intermediate state RECOVERABLE:

    write tmp (parquet job; ``_SUCCESS`` marks completion)
    rename path -> path.old     # old generation intact, just moved
    rename tmp  -> path         # new generation live
    rmtree path.old             # cleanup

``recover_generation`` repairs any crash point on the next call:
tmp-with-_SUCCESS and no live dir → finish the swap forward; no live dir
but ``.old`` present → roll back; stale/incomplete tmp or leftover
``.old`` beside a live dir → delete.  Callers run ``recover_generation``
on entry, write tmp, then ``swap_generation``."""

from __future__ import annotations

import os
import shutil


def _tmp(path: str) -> str:
    return path + ".tmp"


def _old(path: str) -> str:
    return path + ".old"


def _complete(d: str) -> bool:
    """A parquet write is complete iff the job committed its _SUCCESS
    marker — a dir without it is a partial write, never promotable."""
    return os.path.exists(os.path.join(d, "_SUCCESS"))


def recover_generation(path: str, clean: bool = True) -> None:
    """Repair the directory-generation state at ``path`` after a crash at
    any point of a previous swap; no-op when the state is clean.

    ``clean=True`` (writers: the compact/retrain jobs themselves, which
    own the swap) also deletes leftover ``.tmp``/``.old`` dirs beside a
    live directory.  READ paths must pass ``clean=False``: a reader that
    rmtree'd siblings would delete a CONCURRENT writer's in-progress
    ``.tmp`` out from under its write job (reads must stay
    side-effect-free beside a live dir).  With ``clean=False`` the only
    mutation is restoring a MISSING live dir — the state where the read
    would otherwise just fail; the residual reader-vs-writer race is the
    microseconds between the writer's two renames, vs the minutes of a
    tmp write, and the single-writer contract (compact between triggers
    / after clean termination) covers it."""
    tmp, old = _tmp(path), _old(path)
    if not os.path.exists(path):
        if os.path.exists(tmp) and _complete(tmp):
            # crashed between the two renames with the new generation
            # fully written: finish the swap forward
            os.rename(tmp, path)
        elif os.path.exists(old):
            # crashed before the new generation went live: roll back
            os.rename(old, path)
    # leftovers beside a live dir (stale tmp from an aborted write, or
    # .old from a crash after the new generation went live) — WRITER-only
    if clean and os.path.exists(path):
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)


def swap_generation(path: str, tmp: str | None = None) -> None:
    """Promote the fully-written generation at ``tmp`` (default
    ``<path>.tmp``) to ``path``.  Refuses an incomplete tmp (no
    ``_SUCCESS``) — promoting a partial write would be the silent-loss
    failure this module exists to prevent."""
    tmp = tmp or _tmp(path)
    if not _complete(tmp):
        raise ValueError(
            f"refusing to promote incomplete generation at {tmp} "
            "(no _SUCCESS marker — the write did not commit)"
        )
    old = _old(path)
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(path):
        os.rename(path, old)
    try:
        os.rename(tmp, path)
    except FileNotFoundError:
        # Reader-side roll-forward (recover_generation(clean=False)) can
        # win the race between our two renames: it sees no live dir + a
        # complete tmp and renames tmp -> path itself.  Our swap then
        # finds tmp gone — but the promotion we wanted HAS happened, so
        # succeed iff the live dir exists and carries the commit marker;
        # anything else is a genuine lost generation and must raise.
        if not (os.path.exists(path) and _complete(path)):
            raise
    shutil.rmtree(old, ignore_errors=True)


# --------------------------------------------------------------------------
# Partition-scoped swaps: promote only the AFFECTED partition subdirs of a
# Hive-partitioned table, leaving untouched partitions' files alone — the
# production refinement of the full-image swap for incrementally-maintained
# tables (a CDC batch touches a handful of months of a 100 TB table; the
# full-image rewrite is O(table) per trigger, this is O(affected)).
#
# In-flight names are HIDDEN (".tmp."/".old." prefixes): Spark's file index
# skips dot-prefixed entries, so a reader racing a swap never sees a
# half-promoted partition as a spurious partition VALUE (a visible
# "month=X.old" dir would parse as the value "X.old").
# --------------------------------------------------------------------------


def _enc_part(rel: str) -> str:
    """Flatten a (possibly nested) partition path for a same-level hidden
    rename: 'a=1/b=2' -> 'a=1%2Fb=2'.  '%' is escaped FIRST ('%25'): Hive
    partition-value escaping already writes a literal '/' in a VALUE as
    %2F in the dirname (g=a%2Fb), so an unescaped '%' would make
    :func:`_dec_part` split that value into a nested path and a crashed
    swap would recover the partition to a wrong location."""
    return rel.replace("%", "%25").replace(os.sep, "%2F")


def _dec_part(flat: str) -> str:
    # inverse order: separators first, then the '%' escape — '%252F'
    # (an original literal '%2F') contains no '%2F' substring, so the
    # first pass cannot misfire on it
    return flat.replace("%2F", os.sep).replace("%25", "%")


def recover_partitions(table_dir: str) -> None:
    """Repair a crashed :func:`swap_partitions` at any point; no-op when
    clean.  Restores any partition whose live dir went missing mid-swap
    (rename its '.old.' back), then deletes every leftover hidden dir —
    after which the table is a consistent mix of pre- and post-swap
    partitions, which the caller's idempotent merge converges from."""
    if not os.path.isdir(table_dir):
        return
    for name in sorted(os.listdir(table_dir)):
        if name.startswith(".old."):
            live = os.path.join(table_dir, _dec_part(name[len(".old."):]))
            if os.path.exists(live):
                shutil.rmtree(os.path.join(table_dir, name), ignore_errors=True)
            else:
                os.makedirs(os.path.dirname(live), exist_ok=True)
                os.rename(os.path.join(table_dir, name), live)
    for name in sorted(os.listdir(table_dir)):
        if name.startswith(".tmp."):
            shutil.rmtree(os.path.join(table_dir, name), ignore_errors=True)


def swap_partitions(
    table_dir: str,
    staging_dir: str,
    partitions: list[str],
    retire: list[str] | None = None,
) -> None:
    """Promote the given partition subdirs (relative paths like
    ``month=2024-01-01`` or nested ``a=1/b=2``) from ``staging_dir`` into
    the live partitioned table at ``table_dir``.

    ``staging_dir`` must carry a root ``_SUCCESS`` marker (the parquet job
    committed).  Per partition: rename staged -> hidden tmp inside the
    table, live -> hidden old, tmp -> live, drop old.  Every crash point
    is repaired by :func:`recover_partitions`, and a replayed batch
    regenerates staging from the (possibly mixed) table idempotently.

    ``retire``: partitions the batch left EMPTY — affected (so their old
    content is superseded) but absent from staging because no surviving
    row carries their value (the vacating group-move: the moved key was
    the partition's only live row, and a move, unlike a delete, writes no
    tombstone into the old partition).  Their live dirs are removed via
    the same hidden-rename protocol (live -> '.old.' -> rmtree).  Crash
    story: a crash mid-retire leaves a hidden '.old.' dir that
    :func:`recover_partitions` RESURRECTS (whole, consistent, merely
    stale) — safe because the retire only runs inside an uncommitted
    batch, so the replay re-derives the empty partition and re-applies
    the retire; a crash after the rmtree is simply done."""
    retire = retire or []
    overlap = set(partitions) & set(retire)
    if overlap:
        raise ValueError(
            f"partition(s) both promoted and retired: {sorted(overlap)}"
        )
    if not partitions and not retire:
        # an empty list silently "succeeding" is how a listing bug turns
        # into a merge that applied nothing (caught by test) — callers
        # always have ≥1 affected partition when they reach a swap
        raise ValueError("swap_partitions called with an empty partition list")
    if partitions and not _complete(staging_dir):
        raise ValueError(
            f"refusing to promote incomplete staging at {staging_dir} "
            "(no _SUCCESS marker — the write did not commit)"
        )
    # validate the WHOLE list before consuming anything: raising
    # mid-loop would leave earlier partitions already renamed away
    missing = [
        rel for rel in partitions
        if not os.path.isdir(os.path.join(staging_dir, rel))
    ]
    if missing:
        raise ValueError(
            f"staged partition(s) missing under {staging_dir}: {missing} — "
            "an affected partition must re-materialize or be listed in "
            "`retire` (deletes leave tombstones; only a vacating group "
            "move empties one)"
        )
    for rel in partitions:
        src = os.path.join(staging_dir, rel)
        flat = _enc_part(rel)
        tmp = os.path.join(table_dir, ".tmp." + flat)
        old = os.path.join(table_dir, ".old." + flat)
        live = os.path.join(table_dir, rel)
        shutil.rmtree(tmp, ignore_errors=True)
        os.rename(src, tmp)
        if os.path.exists(live):
            shutil.rmtree(old, ignore_errors=True)
            os.rename(live, old)
        os.makedirs(os.path.dirname(live), exist_ok=True)
        os.rename(tmp, live)
        shutil.rmtree(old, ignore_errors=True)
    for rel in retire:
        live = os.path.join(table_dir, rel)
        if not os.path.exists(live):
            continue  # replay of an already-applied retire
        old = os.path.join(table_dir, ".old." + _enc_part(rel))
        shutil.rmtree(old, ignore_errors=True)
        os.rename(live, old)
        shutil.rmtree(old, ignore_errors=True)


def list_staged_partitions(staging_dir: str, depth: int) -> list[str]:
    """The partition subdirs a partitioned parquet job wrote under
    ``staging_dir``, as relative paths ``depth`` levels deep (one level
    per partition column).  Hidden/marker entries are skipped by SPARK'S
    OWN rule — dot-prefixed always; underscore-prefixed only when the
    name carries no ``=`` (a partition column named ``__bucket`` writes
    ``__bucket=N`` dirs, which Spark's file index treats as visible —
    filtering them here silently swapped NOTHING, caught by test)."""
    out: list[str] = []

    def walk(cur: str, rel: str, d: int) -> None:
        if d == 0:
            out.append(rel)
            return
        for name in sorted(os.listdir(cur)):
            if "=" not in name or name.startswith("."):
                continue
            walk(os.path.join(cur, name), os.path.join(rel, name) if rel else name, d - 1)

    walk(staging_dir, "", depth)
    return out
