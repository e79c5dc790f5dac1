"""Per-process fixture-staging cache for file-surface queries.

Several declared queries exercise real file surfaces (JSONL ingest, CSV
round-trip, streaming sources), so they must first materialize fixture
files derived from the parquet testdata. Staging is deterministic in
``(kind, sf_dir)``, so within one process (the driver's correctness pass,
pytest, the bench loop) each fixture is built exactly once and reused --
round-1 lesson: per-query re-staging inflated the correctness pass enough
that the driver's budget covered only 50/124 queries.

The cache is process-local on purpose: a fresh process always re-stages,
so the write path under test (text/CSV/parquet/ORC sinks) still executes
at least once per run, and no state leaks across driver rounds.

Streaming checkpoints and sinks are NEVER cached -- only source fixtures.
A checkpoint reused across runs would make the stream a no-op.
"""

from __future__ import annotations

import itertools
import os
import tempfile
from collections.abc import Callable

_CACHE: dict[tuple[str, str], str] = {}
_SEQ = itertools.count()


def _scratch_base() -> str | None:
    """Prefer RAM-backed scratch for probe fixtures and checkpoints.

    Streaming state-store commits are many small fsync'd files; on the
    local harness /tmp is ext4 and those fsyncs dominate the stream-query
    wall time (measured: q53 ~3s steady-state at sf0.01, most of it
    commit I/O). tmpfs removes that. This affects ONLY the correctness/
    bench probe surface -- production pipelines pass their own durable
    checkpoint/output locations through the run_* APIs (a streaming
    checkpoint on tmpfs would not survive a node restart)."""
    base = "/dev/shm"
    if os.path.isdir(base) and os.access(base, os.W_OK):
        return base
    return None  # tempfile default (TMPDIR or /tmp)


def staged_fixture(kind: str, sf_dir: str, build: Callable[[str], None]) -> str:
    """Return a directory containing the ``kind`` fixture for ``sf_dir``,
    building it with ``build(dir)`` on first use in this process."""
    key = (kind, sf_dir)
    if key not in _CACHE:
        d = tempfile.mkdtemp(prefix=f"idp_{kind}_", dir=_scratch_base())
        build(d)
        _CACHE[key] = d
    return _CACHE[key]


def fresh_dir(kind: str) -> str:
    """A unique NON-cached work dir (checkpoints, sinks, outputs)."""
    return tempfile.mkdtemp(prefix=f"idp_{kind}_", dir=_scratch_base())


def unique_name(prefix: str) -> str:
    """Process-unique name for memory-sink queries (must not collide when
    the same query runs twice in one session)."""
    return f"{prefix}_{next(_SEQ)}"
