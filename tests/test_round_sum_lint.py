"""The ROUND(SUM(<double>)) lint (tests/oracle_harness.round_sum_hazards)
mechanizes the q164 hazard class: a double SUM's value depends on
partial-aggregation order, so rounding one in a final projection can flip
the last digit at a larger scale factor while staying green at sf0.01
(q72 decimals in round 5, q164 cents in round 6 -- the twice-paid lesson
the round-6 verdict asked to mechanize).

Three pins:
- the detector CATCHES a deliberately-broken fixture (both the SQL and
  the DataFrame form), so the lint cannot silently rot;
- the safe DECIMAL-summation pattern passes (no false positive on the
  prescribed fix);
- the registry and ROUND_SUM_CERTIFIED agree exactly: every current
  hazard is a certified entry (measured safe at sf0.1 by the round-6
  full-harness sweep), and no stale certification survives the pattern's
  removal -- so the set stays an honest certification record.
"""

from __future__ import annotations

from dataclasses import dataclass

from tests.oracle_harness import (
    HELPER_ROUND_SUM_CERTIFIED,
    ROUND_SUM_CERTIFIED,
    _spark_round_sum_hazards,
    _sql_round_sum_hazards,
    helper_round_sum_sites,
    round_sum_hazards,
)


@dataclass(frozen=True)
class _FakeQuery:
    oracle: str | None
    fn: object


def _broken_spark_query(spark, sf_dir):
    from pyspark.sql import functions as F

    return (
        spark.range(10)
        .groupBy((F.col("id") % 2).alias("g"))
        .agg(F.round(F.sum(F.col("id") / 7.0), 2).alias("total"))
    )


def test_lint_catches_broken_sql_fixture():
    hits = _sql_round_sum_hazards(
        "SELECT g, ROUND(SUM(x / 7.0), 2) AS total FROM t GROUP BY g"
    )
    assert hits, "deliberately-broken SQL fixture escaped the lint"


def test_lint_catches_broken_dataframe_fixture():
    import inspect

    hits = _spark_round_sum_hazards(inspect.getsource(_broken_spark_query))
    assert hits, "deliberately-broken DataFrame fixture escaped the lint"


def test_lint_catches_broken_declared_query_end_to_end():
    dq = _FakeQuery(
        oracle="SELECT ROUND(SUM(v), 2) AS total FROM t",
        fn=_broken_spark_query,
    )
    hazards = round_sum_hazards(dq)
    assert any(h.startswith("oracle:") for h in hazards)
    assert any(h.startswith("spark:") for h in hazards)


def test_decimal_summation_recipe_is_clean():
    # the registry.py docstring's prescribed fix must NOT be flagged
    assert not _sql_round_sum_hazards(
        "SELECT ROUND(CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE), 2) FROM t"
    )
    # nested-ROUND rewrite artifact (DECIMAL(38,18)) must not mask a
    # genuinely-plain double sum...
    assert _sql_round_sum_hazards(
        "ROUND(SUM(CAST(ROUND(CAST(CAST(x AS VARCHAR) AS DECIMAL(38,18)), 2)"
        " AS DOUBLE)), 2)"
    )
    # ...and SUM inside prose/unbalanced text must not crash or flag
    assert not _sql_round_sum_hazards("docstring mentions ROUND(SUM( only")


def test_registry_hazards_equal_certified_set():
    from iot_data_pipeline_spark.queries import REGISTRY

    flagged = {name for name, dq in REGISTRY.items() if round_sum_hazards(dq)}
    unlisted = flagged - ROUND_SUM_CERTIFIED
    stale = ROUND_SUM_CERTIFIED - flagged
    assert not unlisted, (
        f"uncertified ROUND(SUM(<double>)) sites {sorted(unlisted)}: convert "
        "to DECIMAL summation (registry.py recipe) or certify at sf0.1 and "
        "add to ROUND_SUM_CERTIFIED"
    )
    assert not stale, (
        f"stale ROUND_SUM_CERTIFIED entries {sorted(stale)}: the pattern is "
        "gone, remove the certification so the set stays exact"
    )


def test_helper_modules_hazards_equal_certified_set():
    # The per-query lint reads only the declared fn's own source, so an
    # F.round(F.sum(...)) inside a shared helper (streaming/, operators/,
    # ...) escapes it -- round-7 advice, with windowed_value_counts as
    # the live example. The module sweep closes that hole; same
    # exact-set contract as the registry lint.
    sites = set(helper_round_sum_sites())
    unlisted = sites - HELPER_ROUND_SUM_CERTIFIED
    stale = HELPER_ROUND_SUM_CERTIFIED - sites
    assert not unlisted, (
        f"uncertified helper ROUND(SUM(<double>)) sites {sorted(unlisted)}: "
        "convert to DECIMAL summation or certify every consumer at sf0.1 "
        "and add to HELPER_ROUND_SUM_CERTIFIED"
    )
    assert not stale, (
        f"stale HELPER_ROUND_SUM_CERTIFIED entries {sorted(stale)}: the "
        "pattern is gone, remove the certification so the set stays exact"
    )


def test_helper_sweep_sees_the_known_site():
    # windowed_value_counts is the site that motivated the sweep; if it
    # is ever rewritten to DECIMAL summation, the stale-cert assertion
    # above fires and both it and this pin get updated together.
    assert "streaming/windows.py::windowed_value_counts" in set(
        helper_round_sum_sites()
    )
