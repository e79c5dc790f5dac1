"""Declared-query registry: the t2 correctness contract (SURVEY.md section 2.3).

Each entry pairs a PySpark implementation with the equivalent DuckDB oracle
SQL. The driver runs both at sf0.01 and hash-matches row-count + schema +
order-insensitive values, sorting columns by NAME -- so every computed column
is aliased identically on both sides.

Determinism rules applied throughout (SURVEY.md section 2.3):
- floating aggregates rounded AFTER aggregation; CAVEAT (the q164
  incident): a double SUM's value depends on partial-aggregation order,
  and at large-enough group sizes the ulp drift can cross the ROUND
  boundary -- q164 flipped a cent at sf0.1 while green at sf0.01. All
  remaining double-sum sites are certified at sf0.1 by the full-harness
  sweep; if one flips at a larger scale, convert it to the exact rule:
  ``SUM(CAST(x AS DECIMAL(18,6)))`` on both sides, then
  ``ROUND(CAST(.. AS DOUBLE), n)`` (double->decimal cast parity is
  proven by q179/q184). MECHANIZED (round 7): tests/oracle_harness.py
  lints every compare for ROUND-over-plain-double-SUM; a new query using
  the pattern fails until converted to DECIMAL summation or certified at
  sf0.1 and added to ROUND_SUM_CERTIFIED (test_round_sum_lint.py keeps
  that set exact);
- timestamps compared as strings of date_trunc'd values, UTC both sides;
- no nondeterministic or approximate functions;
- ties broken by explicit keys wherever a ranking cuts off;
- final projections NEVER emit raw DecimalType columns: the driver's
  value-hasher canonicalizes Decimal cells differently between its
  PySpark and DuckDB fetch paths (round-5 q167/q184 false reds), so
  decimals stay exact internally but are cast to STRING on BOTH sides
  at the output boundary (q72's pattern; enforced for every registry
  query by tests/oracle_harness.compare_query, which rejects top-level
  DecimalType output columns -- test_oracle_queries runs it across the
  whole registry).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class DeclaredQuery:
    name: str
    fn: SparkQuery
    oracle: str | None  # DuckDB SQL; None -> driver does a rows-only check
    doc: str


REGISTRY: dict[str, DeclaredQuery] = {}


def portable_round_sql(sql: str) -> str:
    """Rewrite every ``ROUND(expr, n)`` in DuckDB oracle SQL to match Spark's
    rounding semantics exactly.

    Spark's ``round`` on DOUBLE applies HALF_UP to the double's *shortest
    decimal representation* (java BigDecimal.valueOf); DuckDB's native
    ``round`` works on the binary value, so half-way-looking inputs like
    64.445 diverge (Spark 64.45, DuckDB 64.44). DuckDB's VARCHAR cast emits
    the same shortest representation, so
    ``CAST(ROUND(CAST(CAST(x AS VARCHAR) AS DECIMAL(38,18)), n) AS DOUBLE)``
    reproduces Spark bit-for-bit (verified over clean-decimal, full-precision,
    negative, and subnormal inputs).
    """
    out = []
    i = 0
    token = "ROUND("
    while True:
        j = sql.find(token, i)
        if j < 0:
            out.append(sql[i:])
            break
        out.append(sql[i:j])
        depth = 1
        k = j + len(token)
        args_start = k
        top_comma = -1
        while depth > 0:
            c = sql[k]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif c == "," and depth == 1 and top_comma < 0:
                top_comma = k
            k += 1
        expr = portable_round_sql(sql[args_start:top_comma].strip())
        ndig = sql[top_comma + 1 : k - 1].strip()
        # Non-finite guard: NaN/Infinity round to themselves (Spark's
        # round is the identity on them), but DuckDB's VARCHAR->DECIMAL
        # conversion RAISES on 'nan'/'inf' strings -- one NaN sensor
        # reading killed every rounded aggregate oracle (round-7 NaN
        # fixture). NULL also flows through the ELSE branch unchanged.
        # The duplicated {expr} is computed once: DuckDB dedups
        # identical aggregate/scalar expressions within a SELECT.
        out.append(
            f"CASE WHEN isfinite(CAST({expr} AS DOUBLE)) "
            f"THEN CAST(ROUND(CAST(CAST({expr} AS VARCHAR) AS DECIMAL(38,18)), {ndig}) AS DOUBLE) "
            f"ELSE CAST({expr} AS DOUBLE) END"
        )
        i = k
    return "".join(out)


def valid_embeddings_sql(sql: str) -> str:
    """Route every oracle reference to ``embeddings`` through the
    valid-embeddings view (queries/base.EMB_VALID_CTE): NULL arrays,
    arrays with NULL elements, and zero-norm vectors are excluded --
    cosine is undefined for them, DuckDB's list functions RAISE on NULL
    elements, and under Spark's ANSI mode the norm division would kill
    the job (degenerate-embeddings fixture, round 6). The Spark twin is
    ``base.valid_embeddings``, used by every embeddings-reading query,
    so both engines see the identical filtered relation."""
    if "FROM embeddings" not in sql:
        return sql
    from iot_data_pipeline_spark.queries.base import EMB_VALID_CTE

    body = sql.replace("FROM embeddings", "FROM embeddings_valid")
    stripped = body.lstrip()
    lead = body[: len(body) - len(stripped)]
    if stripped.upper().startswith("WITH"):
        rest = stripped[4:]
        return f"{lead}WITH {EMB_VALID_CTE},{rest}"
    return f"{lead}WITH {EMB_VALID_CTE}\n    {stripped}"


def declared(name: str, oracle: str | None = None) -> Callable[[SparkQuery], SparkQuery]:
    """Register a declared query. ``oracle`` is DuckDB SQL over the
    pre-registered testdata views (region nation customer supplier part
    orders lineitem events documents embeddings; ``embeddings``
    references are rewritten through the valid-embeddings guard -- see
    valid_embeddings_sql)."""

    def deco(fn: SparkQuery) -> SparkQuery:
        sql = oracle
        if sql:
            sql = portable_round_sql(sql)
            sql = valid_embeddings_sql(sql)
        REGISTRY[name] = DeclaredQuery(name, fn, sql, (fn.__doc__ or "").strip())
        return fn

    return deco
