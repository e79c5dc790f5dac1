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
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRANSIENT: list[DataFrame] = []


def transient_persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` + register for the next release sweep."""
    df = df.persist()
    _TRANSIENT.append(df)
    return df


def release_transient_caches() -> int:
    """Unpersist every registered frame; returns how many were released.

    Safe to call at any time: a frame whose query is still executing is
    never registered-and-released concurrently in the single-threaded
    batch drivers this serves, and unpersist on a dead context is
    swallowed (the session owning the frame may already be stopped)."""
    n = 0
    for df in _TRANSIENT:
        try:
            df.unpersist(blocking=False)
            n += 1
        except Exception:
            pass  # stopped context / already-released frame
    _TRANSIENT.clear()
    return n
