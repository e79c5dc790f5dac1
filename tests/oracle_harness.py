"""Local replica of the driver's correctness gate: run each declared query
in Spark AND its oracle SQL in DuckDB, compare row count + column names +
order-insensitive values. Used by tests and by the standalone checker
(``python -m tests.oracle_harness [sf_dir] [query ...]``).
"""

from __future__ import annotations

import datetime
import math
import sys
import time
from decimal import Decimal

import duckdb

from iot_data_pipeline_spark.sources.readers import TABLES


def _norm(v):
    """Normalize a cell for cross-engine comparison."""
    if hasattr(v, "item") and type(v).__module__ == "numpy" and getattr(v, "ndim", 0) == 0:
        v = v.item()  # numpy scalar from the pandas fetch path
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # match on repr of the rounded-double bits both engines produce
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_norm(x) for x in v)
    return v


def _sort_key(row):
    # None sorts before everything; values compared as (typename, repr)
    return tuple((v is not None, type(v).__name__, str(v)) for v in row)


def _canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows), key=_sort_key
    )


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def compare_query(spark, con, name: str, sf_dir: str) -> list[str]:
    """Returns a list of mismatch descriptions (empty = pass)."""
    from iot_data_pipeline_spark.queries import REGISTRY

    dq = REGISTRY[name]
    sdf = dq.fn(spark, sf_dir)
    spark_cols = sdf.columns
    # Registry rule (registry.py docstring): final projections never emit
    # raw DecimalType -- the driver's value-hasher canonicalizes Decimal
    # cells differently per engine fetch path (round-5 q167/q184 false
    # reds). Enforced here so every harness run checks the whole registry.
    from pyspark.sql.types import DecimalType

    decimal_cols = [
        f.name for f in sdf.schema.fields if isinstance(f.dataType, DecimalType)
    ]
    if decimal_cols:
        return [
            f"raw DecimalType output columns {decimal_cols}: cast to STRING "
            "on both sides (q72 pattern; registry.py docstring rule)"
        ]
    # Through pandas on BOTH sides, like the driver: NULL doubles render
    # NaN symmetrically, and dtype coercions (int-with-nulls -> float64)
    # hit both engines alike instead of just one.
    spdf = sdf.toPandas()
    spark_rows = [
        tuple(row) for row in spdf.itertuples(index=False, name=None)
    ]

    problems: list[str] = []
    if dq.oracle is None:
        if len(spark_rows) == 0 and not name.startswith("q13"):
            problems.append("rows-only check: query returned 0 rows")
        return problems

    # Fetch the oracle THROUGH pandas, matching the driver's compare path:
    # duckdb's fetchall() hands HUGEINT back as exact Python int, but the
    # driver hashes the pandas rendering, where HUGEINT (COUNT_IF, SUM of
    # BIGINT) becomes float64 ("25.0" != "25"). Fetching via .df() makes
    # the local gate exactly as strict (round-1 lesson: q32/q33/q73 passed
    # here, failed the driver).
    res = con.execute(dq.oracle)
    pdf = res.df()
    duck_cols = list(pdf.columns)
    duck_rows = [
        tuple(None if v is None else v for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]

    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(f"columns differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return problems
    if len(spark_rows) != len(duck_rows):
        problems.append(f"row count differs: spark={len(spark_rows)} duck={len(duck_rows)}")
    s = _canon(spark_rows, spark_cols)
    d = _canon(duck_rows, duck_cols)
    if s != d:
        diffs = [
            (a, b) for a, b in zip(s, d) if a != b
        ][:3]
        only_s = [r for r in s if r not in set(map(tuple, d))][:2]
        only_d = [r for r in d if r not in set(map(tuple, s))][:2]
        problems.append(
            f"values differ; first aligned diffs={diffs}; spark-only={only_s}; duck-only={only_d}"
        )
    return problems


def main() -> int:
    from iot_data_pipeline_spark.queries import REGISTRY
    from iot_data_pipeline_spark.session import build_session

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(REGISTRY)
    spark = build_session("oracle-harness")
    con = duck_connection(sf_dir)
    failed = 0
    timings: list[tuple[float, str]] = []
    for name in names:
        t0 = time.perf_counter()
        try:
            problems = compare_query(spark, con, name, sf_dir)
        except Exception as e:  # noqa: BLE001
            problems = [f"EXCEPTION: {type(e).__name__}: {str(e)[:400]}"]
        dt = time.perf_counter() - t0
        timings.append((dt, name))
        status = "PASS" if not problems else "FAIL"
        if problems:
            failed += 1
        print(f"[{status}] {name} ({dt:.2f}s)")
        for p in problems:
            print(f"    {p}")
    slowest = sorted(timings, reverse=True)[:10]
    print("\nslowest:", ", ".join(f"{n}={t:.2f}s" for t, n in slowest))
    print(f"{len(names) - failed}/{len(names)} passed")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
