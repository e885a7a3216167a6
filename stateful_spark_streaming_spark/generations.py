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
