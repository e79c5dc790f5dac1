"""One-shot audit: run the FULL registry against a multi-file table
layout and report divergences.

At 100 TB every table is thousands of part files; the driver testdata is
one file per table, so any result that silently depends on single-file
scan order never gets exercised. This sweep rewrites each table as a
directory of part files whose LEXICAL name order is the REVERSE of row
order (Spark lists files independently of both), then re-runs every
declared query against the DuckDB oracle over the same directories.

The hazard class it caught on first run (round 8): q78's plain double
``ROUND(SUM(..))`` flipped a cent because file-boundary partials merge
in a different order than the single-file scan -- the q164 class,
reachable through LAYOUT alone with no config change. Fix: the q164
exact-DECIMAL summation recipe.

Usage: python -m tools.multifile_layout_sweep [src_sf_dir] [query ...]
(default src /root/testdata/sf0.01, all registry queries)
"""

from __future__ import annotations

import os
import sys
import tempfile

import duckdb
import pyarrow.parquet as pq

from iot_data_pipeline_spark.sources.readers import TABLES

#: part files per table (reverse-named so lexical order != row order)
SPLITS = 4


def build_fixture(d: str, src: str = "/root/testdata/sf0.01") -> None:
    """Rewrite each ``{src}/{t}.parquet`` file as a ``{d}/{t}.parquet/``
    DIRECTORY of SPLITS contiguous row slices, named in reverse."""
    for t in TABLES:
        tab = pq.read_table(f"{src}/{t}.parquet")
        os.makedirs(f"{d}/{t}.parquet")
        n = tab.num_rows
        k = SPLITS if n >= SPLITS else 1
        for i in range(k):
            lo = i * n // k
            hi = (i + 1) * n // k
            pq.write_table(
                tab.slice(lo, hi - lo),
                f"{d}/{t}.parquet/part-{k - 1 - i:03d}.parquet",
            )


def duck_connection_glob(d: str) -> duckdb.DuckDBPyConnection:
    """DuckDB cannot scan a bare directory path; glob the part files."""
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{d}/{t}.parquet/*.parquet'"
        )
    return con


def main() -> int:
    from iot_data_pipeline_spark.queries import REGISTRY
    from iot_data_pipeline_spark.session import build_session
    from tests.oracle_harness import compare_query

    argv = sys.argv[1:]
    src = argv[0] if argv and not argv[0].startswith("q") else "/root/testdata/sf0.01"
    names = [a for a in argv if a.startswith("q")] or list(REGISTRY)
    d = tempfile.mkdtemp(prefix="multifile_")
    build_fixture(d, src=src)
    spark = build_session("multifile-layout-sweep")
    con = duck_connection_glob(d)
    failed = 0
    for name in names:
        try:
            problems = compare_query(spark, con, name, d)
        except Exception as e:  # noqa: BLE001
            problems = [f"EXCEPTION: {type(e).__name__}: {str(e)[:400]}"]
        status = "PASS" if not problems else "FAIL"
        if problems:
            failed += 1
        print(f"[{status}] {name}")
        for p in problems:
            print(f"    {p}")
    print(f"{len(names) - failed}/{len(names)} passed  (fixture: {d})")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
