"""Session-lifetime registry for operator-internal persists.

Several operators pin small intermediate frames (``MEMORY_AND_DISK``)
because their returned LAZY plan consumes the frame more than once —
e.g. the span-dedup gram index feeds both sides of its semi-join, and
``remove_dup_spans``'s span-text frame feeds the min-struct aggregate
AND the join-back.  The persist must outlive the function call (the
caller evaluates the plan later), so the operator cannot unpersist it —
which, in a long-lived session issuing many such queries, accumulates
cache until someone calls ``spark.catalog.clearCache()`` (ADVICE r6:
``dup_spans_from_index``/``remove_dup_spans``/``unigram_logprob``).

This module is the contract that closes that leak without giving up the
persists: operators route pinning through :func:`track_persist`, and a
long-lived caller drops ALL operator-internal cache — and nothing else
it may have cached itself — with one :func:`release_operator_caches`
call after materializing each query's result.  One-shot sessions can
keep ignoring lifetime entirely (driver/bench ``clearCache()`` between
queries subsumes this).
"""

from __future__ import annotations

import threading
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame

#: Registry is lock-guarded so a release draining it never races a
#: concurrent ``track_persist`` (e.g. from a foreachBatch worker thread)
#: at the list level.  The SINGLE-RELEASER expectation still holds: one
#: long-lived owner calls :func:`release_operator_caches` between
#: queries; a drain concurrent with an operator still *building* a plan
#: can unpersist a frame before it materializes, which only degrades to
#: recompute (never corrupts), but callers should sequence releases
#: after materialization for predictable performance.
_TRACKED: list["DataFrame"] = []
_TRACKED_LOCK = threading.Lock()


def track_persist(df: "DataFrame", level=None) -> "DataFrame":
    """Persist ``df`` (default MEMORY_AND_DISK) and register it for
    :func:`release_operator_caches`.  Returns the persisted frame."""
    from pyspark import StorageLevel

    df = df.persist(level or StorageLevel.MEMORY_AND_DISK)
    with _TRACKED_LOCK:
        _TRACKED.append(df)
    return df


def release_operator_caches() -> int:
    """Unpersist every frame pinned via :func:`track_persist` since the
    last release; returns how many were dropped.  Safe to call anytime —
    unpersisting a frame mid-evaluation only degrades to recompute, it
    never corrupts results — but the intended point is after the caller
    has collected/written the query that needed the cache."""
    with _TRACKED_LOCK:
        drained, _TRACKED[:] = _TRACKED[:], []
    n = 0
    for df in drained:
        try:
            df.unpersist()
            n += 1
        except Exception:  # noqa: BLE001 — session already stopped, etc.
            pass
    return n


#: broadcast variables pinned by operators (e.g. bloom bitmaps) — same
#: lifetime contract as _TRACKED frames
_TRACKED_BC: list = []


def track_broadcast(bc):
    """Register a ``sc.broadcast`` handle for
    :func:`release_operator_caches` — operators that broadcast
    executor-side state (bloom bitmaps) can't destroy it themselves (the
    returned plan is lazy), so without tracking, a long-lived session
    issuing many such queries accumulates dead broadcasts.  Returns the
    handle."""
    with _TRACKED_LOCK:
        _TRACKED_BC.append(bc)
    return bc


def release_operator_broadcasts() -> int:
    """Destroy every broadcast pinned via :func:`track_broadcast`.  Call
    only after materializing the queries that used them — unlike a frame
    unpersist, a destroyed broadcast does NOT recompute: late tasks would
    fail (Spark re-runs them, but sequence releases after actions)."""
    with _TRACKED_LOCK:
        drained, _TRACKED_BC[:] = _TRACKED_BC[:], []
    n = 0
    for bc in drained:
        try:
            bc.destroy()
            n += 1
        except Exception:  # noqa: BLE001
            pass
    return n
