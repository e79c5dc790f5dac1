"""Every declared query hash-matches its DuckDB oracle at sf0.001 (the t2
contract, SURVEY.md section 2.3, run at the smoke scale so the suite stays
fast; the driver repeats this at sf0.01)."""

from __future__ import annotations

import pytest

from tests.oracle_harness import compare_query, duck_connection


def _names():
    from iot_data_pipeline_spark.queries import REGISTRY

    return list(REGISTRY)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", _names())
def test_declared_query_matches_oracle(spark, duck, sf_dir, name):
    problems = compare_query(spark, duck, name, sf_dir)
    assert not problems, problems
