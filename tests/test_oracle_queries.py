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


def test_q178_median_equals_min_edge_groups(spark, tmp_path):
    """Regression for the round-4 advisor finding: groups whose lower
    median EQUALS the minimum (constant-valued, or min-duplicated past
    rank k) previously fell out of q178's bisection -- lo was seeded AT
    the min, so the final `value > lo` filter excluded the true median
    (constant groups vanished entirely via the inner join). The fixture
    forces all three shapes; the oracle comparison is the assertion."""
    import duckdb

    d = str(tmp_path)
    duckdb.sql(f"""
    COPY (
      SELECT * FROM (
        SELECT CAST(i AS BIGINT) AS event_id,
               TIMESTAMP '2024-01-01' + INTERVAL (i) SECOND AS ts,
               CAST(i % 7 AS BIGINT) AS user_id, 'const' AS event_type,
               5.0 AS value, '{{}}' AS props
        FROM range(20) t(i)
        UNION ALL
        SELECT CAST(100 + i AS BIGINT), TIMESTAMP '2024-01-01',
               CAST(i AS BIGINT), 'minheavy',
               CASE WHEN i < 12 THEN 1.5 ELSE 1.5 + i END, '{{}}'
        FROM range(20) t(i)
        UNION ALL
        SELECT CAST(200 + i AS BIGINT), TIMESTAMP '2024-01-01',
               CAST(i AS BIGINT), 'normal', CAST(i AS DOUBLE) * 1.1, '{{}}'
        FROM range(21) t(i)
      )
    ) TO '{d}/events.parquet' (FORMAT PARQUET)
    """)
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    con.execute(
        f"CREATE OR REPLACE VIEW events AS SELECT * FROM '{d}/events.parquet'"
    )
    problems = compare_query(spark, con, "q178_scalable_exact_median", d)
    con.close()
    assert not problems, problems
