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


# Present the registry in query-number order. The driver iterates this dict
# under a per-round budget (round 1 stopped after the first 50 entries, in
# module-import order -- leaving the SURVEY section-2.3 contract queries
# q01-q22 unchecked). Numeric order puts the contract first.
_sorted = dict(sorted(REGISTRY.items(), key=lambda kv: _qkey(kv[0])))
REGISTRY.clear()
REGISTRY.update(_sorted)

__all__ = ["REGISTRY", "DeclaredQuery"]
