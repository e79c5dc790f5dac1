"""Registry for per-query transient caches (round-15 optimization).

Several operators ``persist()`` an intermediate that is consumed more
than once inside ONE query's plan (prefix scans, the JSONL corrupt-split
parse, the quality expect/split pass). A ``persist()`` is pinned in
Spark's CacheManager until an explicit ``unpersist()`` -- it is NOT
GC-reclaimable like ``localCheckpoint`` blocks -- so a long-lived
session that runs hundreds of queries (the bench, the oracle harness, a
notebook) accumulates dead cached plans and their storage blocks
without bound (guide section 5: "unpersist when done").

The operators cannot unpersist themselves: the cache must stay alive
until the *caller* has executed the returned DataFrame. So they register
here, and batch drivers call :func:`release_transient_caches` after each
query's action completes. Frames NOT registered here (e.g. the bench's
deliberate session-shared pair-graph cache) are untouched.

``unpersist(blocking=False)`` keeps the release itself ~free.

Intended for SINGLE-THREADED batch drivers (bench, oracle harness, CLI):
the registry is one module-level list, so a release issued from one
thread unpersists frames another thread may still be building on. The
lock below makes register/release individually atomic (no lost or
double-released entries), but it cannot give per-thread scoping --
long-lived multi-threaded consumers (e.g. a streaming foreachBatch that
calls expect_split) should simply never call release_transient_caches
and accept the session-lifetime cache, or unpersist their own frames.

Release-then-re-execute is supported: every registered frame's plan
recomputes identically without the cache (frozen in
tests/test_transient_caches.py, including the corrupt-split ``bad``
frame, which needs the coalesce guard in readers.split_corrupt to stay
analyzable against the raw JSON scan).
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_TRANSIENT: list[DataFrame] = []
_LOCK = threading.Lock()


def transient_persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` + register for the next release sweep."""
    df = df.persist()
    with _LOCK:
        _TRANSIENT.append(df)
    return df


def release_transient_caches() -> int:
    """Unpersist every registered frame; returns how many were released.

    Safe to call at any time in the single-threaded drivers this serves:
    a frame whose query is still executing is never registered-and-
    released concurrently there, every registered plan recomputes
    identically after release, and unpersist on a dead context is
    swallowed (the session owning the frame may already be stopped)."""
    with _LOCK:
        frames, _TRANSIENT[:] = list(_TRANSIENT), []
    n = 0
    for df in frames:
        try:
            df.unpersist(blocking=False)
            n += 1
        except Exception:
            pass  # stopped context / already-released frame
    return n
