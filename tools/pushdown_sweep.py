"""Registry-wide pushdown-discipline sweep (round-10 verdict task 1).

Round 9 fixed the hostile-layout pushdown gap by hand for 9 hot queries:
a literal range predicate applied ABOVE ``read_table``'s normalization
sits on a conversion expression (``timestamp_micros(raw div 1000)`` on a
nanos-written corpus, ``cast(raw as double)`` on a DECIMAL-written one)
that Catalyst cannot translate into ``PushedFilters`` -- answers stay
correct, but parquet row-group pruning is silently lost. Invisible at
sf0.01; a full-scan at 100 TB. ``read_table(bounds=...)`` is the fix;
this sweep MECHANIZES the discipline so the class of bug cannot
reappear without a red test.

Method: build the composed nanos+DECIMAL corpus (both value-type
hostile axes at once), construct every registry query against it, and
scan the executed plan's Filter nodes for the conversion-marker
comparison shapes:

    timestamp_micros((<ts_col>#N div 1000)) <cmp> <literal>
    cast(<money_col>#N as double) <cmp> <literal>

A match means a column-vs-literal comparison on a canonical
timestamp/money column is evaluated ABOVE the conversion: Catalyst
pushes filters through Projects by alias substitution, so a filter that
reaches the scan shows the conversion expression inline, while a
``bounds``-routed predicate compares the RAW column (no marker) and
DOES reach PushedFilters. A marker alone is not yet a failure, though:
Catalyst also DERIVES residual conjuncts (e.g. the quantity envelope it
extracts from a TPC-H-Q19 OR-of-ANDs) that coexist with an equivalent
pushed raw-domain bound. So the flag condition is the verdict's exact
phrasing: the comparison is present in a Filter AND no pushed filter of
the same comparison class exists on that column anywhere in the plan
(``GreaterThanOrEqual(l_quantity,...)`` absolves a ``>=`` marker on
``l_quantity``). Known imprecision, documented: with two scans of the
same table in one plan, a pushed bound on scan A absolves a same-class
marker above scan B -- the per-query plan pins in
tests/test_plan_shapes.py stay the precise check for the hot queries;
this sweep is the registry-wide discipline gate.

Comparisons whose other side references a column (``#``) are structural
(column-vs-column) residuals and never match -- they are not pushable on
any layout. Function-of-column comparisons (``year(ts) = ...``) never
match the marker either; they are equally non-pushable by shape, not by
layout, and are out of scope.

Usage: python -m tools.pushdown_sweep [src_sf_dir] [query ...]
(default src /root/testdata/sf0.01, all registry queries)

The frozen pytest twin is tests/test_plan_shapes.py::
test_registry_pushdown_discipline_on_composed_corpus.
"""

from __future__ import annotations

import re
import shutil
import sys
import tempfile

from iot_data_pipeline_spark.sources.readers import TIMESTAMP_COLUMNS

#: canonical hot filter columns: every normalized timestamp column, every
#: money/measure column the DECIMAL axis re-types, and every surrogate key
#: the DECIMAL(18,0) axis re-types (read boundary casts those to BIGINT;
#: a literal key filter above that cast loses pushdown identically).
TS_COLS = sorted({c for cols in TIMESTAMP_COLUMNS.values() for c in cols})
_DMS = __import__(
    "tools.decimal_money_sweep", fromlist=["MONEY_COLUMNS", "KEY_COLUMNS"]
)
MONEY_COLS = sorted({c for spec in _DMS.MONEY_COLUMNS.values() for c in spec})
KEY_COLS = sorted({c for cols in _DMS.KEY_COLUMNS.values() for c in cols})

_CMP = r"(>=|<=|=|<|>)"
#: literal side: anything up to the enclosing ')' that does not
#: reference another column attribute (no '#') -- numbers, dates,
#: timestamps, quoted strings.
_LIT = r"[^)#]+"

#: marker comparison op -> the parquet source-filter class that, when
#: present in PushedFilters on the same column, proves an equivalent
#: raw-domain bound reached the scan. Reversed-operand markers
#: (literal CMP expr) flip via _FLIP before lookup.
_OP_CLASS = {
    ">=": "GreaterThanOrEqual",
    ">": "GreaterThan",
    "<": "LessThan",
    "<=": "LessThanOrEqual",
    "=": "EqualTo",
    "IN": "In",
}
_FLIP = {">=": "<=", "<=": ">=", ">": "<", "<": ">", "=": "="}


def _markers() -> list[tuple[str, re.Pattern[str], bool]]:
    """(column, pattern, reversed_operands) triples; group 1 of every
    pattern is the comparison operator (or 'IN')."""
    pats: list[tuple[str, re.Pattern[str], bool]] = []
    for c in TS_COLS:
        expr = rf"timestamp_micros\(\({c}#\d+L? div 1000\)\)"
        pats.append((c, re.compile(rf"{expr} {_CMP} {_LIT}\)"), False))
        pats.append((c, re.compile(rf"\({_LIT} {_CMP} {expr}"), True))
        pats.append((c, re.compile(rf"{expr} (IN) \("), False))
    for c in MONEY_COLS:
        expr = rf"cast\({c}#\d+ as double\)"
        pats.append((c, re.compile(rf"{expr} {_CMP} {_LIT}\)"), False))
        pats.append((c, re.compile(rf"\({_LIT} {_CMP} {expr}"), True))
        pats.append((c, re.compile(rf"{expr} (IN) \("), False))
    for c in KEY_COLS:
        expr = rf"cast\({c}#\d+ as bigint\)"
        pats.append((c, re.compile(rf"{expr} {_CMP} {_LIT}\)"), False))
        pats.append((c, re.compile(rf"\({_LIT} {_CMP} {expr}"), True))
        pats.append((c, re.compile(rf"{expr} (IN) \("), False))
    return pats


_MARKERS = _markers()


def build_fixture(d: str, src: str = "/root/testdata/sf0.01") -> None:
    """nanos timestamps -> DECIMAL money -> DECIMAL(18,0) keys, composed
    (value axes only -- the name/order axes don't affect which
    predicates push)."""
    from tools.decimal_money_sweep import build_fixture as build_decimal
    from tools.tzaware_timestamps_sweep import build_nanos_fixture

    mid = tempfile.mkdtemp(prefix="pushdown_stage_")
    try:
        build_nanos_fixture(mid, src=src)
        build_decimal(d, src=mid, with_keys=True)
    finally:
        shutil.rmtree(mid, ignore_errors=True)


def audit_plan(plan: str) -> list[str]:
    """Return one message per hot-column literal comparison found in a
    Filter node of ``plan`` with no same-class pushed filter on that
    column anywhere in the plan."""
    pushed = "\n".join(
        re.findall(r"PushedFilters: \[([^\n]*)", plan)
    )  # match to EOL: treeString truncates long lists before the ']'
    problems: list[str] = []
    for line in plan.splitlines():
        if not re.search(r"\bFilter\b", line):
            continue
        for col, pat, reversed_ops in _MARKERS:
            m = pat.search(line)
            if not m:
                continue
            op = m.group(1)
            if reversed_ops:
                op = _FLIP[op]
            if f"{_OP_CLASS[op]}({col}," in pushed:
                continue
            problems.append(
                f"literal {op!r} on hot column {col!r} not pushed "
                f"(no {_OP_CLASS[op]}({col},...) in PushedFilters): "
                f"...{m.group(0)[:160]}..."
            )
    return problems


def audit_query(spark, name: str, fixture_dir: str) -> list[str]:
    from iot_data_pipeline_spark.queries import REGISTRY

    df = REGISTRY[name].fn(spark, fixture_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    return audit_plan(plan)


def main() -> int:
    from iot_data_pipeline_spark.queries import REGISTRY
    from iot_data_pipeline_spark.session import build_session

    argv = sys.argv[1:]
    src = argv[0] if argv and not argv[0].startswith("q") else "/root/testdata/sf0.01"
    names = [a for a in argv if a.startswith("q")] or list(REGISTRY)
    d = tempfile.mkdtemp(prefix="pushdown_")
    build_fixture(d, src=src)
    spark = build_session("pushdown-sweep")
    flagged = 0
    for name in sorted(names):
        try:
            problems = audit_query(spark, name, d)
        except Exception as e:  # noqa: BLE001
            problems = [f"EXCEPTION: {type(e).__name__}: {str(e)[:300]}"]
        if problems:
            flagged += 1
            print(f"[FLAG] {name}")
            for p in problems:
                print(f"    {p}")
        else:
            print(f"[ok]   {name}")
    print(f"{len(names) - flagged}/{len(names)} clean  (fixture: {d})")
    shutil.rmtree(d, ignore_errors=True)
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
