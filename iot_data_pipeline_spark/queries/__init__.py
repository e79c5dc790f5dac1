"""Declared-query registry (SURVEY.md section 2.3): importing this package
populates REGISTRY with every oracle-checked query."""

from iot_data_pipeline_spark.queries import (  # noqa: F401
    curation,
    extras,
    functions_q,
    ingest_q,
    llm,
    modern,
    pipeline_q,
    relational,
    sampling,
    timeseries,
    tpch_extra,
    windows,
)
from iot_data_pipeline_spark.queries.registry import REGISTRY, DeclaredQuery


def _qkey(name: str) -> tuple[int, str]:
    """Numeric-then-suffix sort key: q01 < q05 < q10 < q10b < q100."""
    import re

    m = re.match(r"q(\d+)([a-z]*)", name)
    return (int(m.group(1)), m.group(2)) if m else (10_000, name)


def _driver_history() -> tuple[dict[str, bool], dict[str, int]]:
    """Scan the driver's CORRECTNESS_r*.json artifacts (repo root) for each
    query's latest verdict.

    Returns ``(green, last_round)``: ``green[name]`` is True iff the query's
    most recent driver row fully matched (rows + schema + value hash, no
    error); ``last_round[name]`` is the latest round that checked it.
    Queries absent from both maps have never been driver-checked.
    """
    import json
    import re
    from pathlib import Path

    root = Path(__file__).resolve().parents[2]
    green: dict[str, bool] = {}
    last_round: dict[str, int] = {}
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", path.name)
        rnd = int(m.group(1)) if m else 0
        try:
            data = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            ok = (
                bool(row.get("rows_match"))
                and bool(row.get("schema_match", True))
                and bool(row.get("hash_match", True))
                and not row.get("err")
            )
            if rnd >= last_round.get(name, -1):
                green[name] = ok
                last_round[name] = rnd
    return green, last_round


# Present the registry in driver-coverage priority order. The driver checks
# ~50 entries per round in dict-iteration order, so a static sort pins the
# same window every round and the tail never earns a CORRECTNESS row
# (round-2 verdict: 55/136 never checked). Rotation, computed from the
# driver's own artifacts at import time:
#   1. queries whose LATEST driver row failed (need re-confirmation);
#   2. queries never driver-checked;
#   3. green queries, least-recently-checked round first (stale greens
#      refresh before fresh ones).
# Numeric order within each group keeps runs deterministic. With no
# CORRECTNESS files present this degrades to plain numeric order.
_green, _last_round = _driver_history()


def _priority(name: str) -> tuple[int, int, tuple[int, str]]:
    if name in _last_round and not _green.get(name, False):
        group = 0
    elif name not in _last_round:
        group = 1
    else:
        group = 2
    return (group, _last_round.get(name, 0), _qkey(name))


_sorted = dict(sorted(REGISTRY.items(), key=lambda kv: _priority(kv[0])))
REGISTRY.clear()
REGISTRY.update(_sorted)

__all__ = ["REGISTRY", "DeclaredQuery"]
