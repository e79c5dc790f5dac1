"""One-shot audit: run the FULL registry against a corpus whose int64
columns are narrowed to int32 wherever the values fit.

Schema-on-read reality: a lake serves whatever physical types its
writers chose, and parquet INT32 keys are routine (Hive/Impala-era
writers, space-conscious exporters). The engine must produce the same
answers; anything that bakes the 8-byte width into staged artifacts or
kernels diverges or crashes only on this corpus.

The hazard it caught on first run (round 8): q177's staged streaming
fixture mixed footers -- the data batch inherited the source's int32
ids while the sentinel batch was built from -1L literals (int64), and
``mergeSchema=false`` reads whichever file it samples first, then fails
on the rest (FAILED_READ_FILE.PARQUET_COLUMN_DATA_TYPE_MISMATCH). Fix:
the staging write normalizes ids to bigint, so sentinel literals always
match.

Usage: python -m tools.narrowed_types_sweep [src_sf_dir] [query ...]
(default src /root/testdata/sf0.01, all registry queries)
"""

from __future__ import annotations

import sys
import tempfile

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from iot_data_pipeline_spark.sources.readers import TABLES


def build_fixture(d: str, src: str = "/root/testdata/sf0.01") -> None:
    """Rewrite each table narrowing every int64 column whose values fit
    int32 (keys, counts). Adversarial fixtures with near-2^63 ids keep
    int64 -- the narrowing is value-driven, like a real writer's."""
    for t in TABLES:
        tab = pq.read_table(f"{src}/{t}.parquet")
        fields, arrays = [], []
        for f, col in zip(tab.schema, tab.columns):
            if pa.types.is_int64(f.type):
                mn = pc.min(col).as_py()
                mx = pc.max(col).as_py()
                if mn is not None and -(2**31) <= mn and mx < 2**31:
                    col = pc.cast(col, pa.int32())
                    f = pa.field(f.name, pa.int32())
            fields.append(f)
            arrays.append(col)
        pq.write_table(
            pa.table(arrays, schema=pa.schema(fields)), f"{d}/{t}.parquet"
        )


def main() -> int:
    from iot_data_pipeline_spark.queries import REGISTRY
    from iot_data_pipeline_spark.session import build_session
    from tests.oracle_harness import compare_query, duck_connection

    argv = sys.argv[1:]
    src = argv[0] if argv and not argv[0].startswith("q") else "/root/testdata/sf0.01"
    names = [a for a in argv if a.startswith("q")] or list(REGISTRY)
    d = tempfile.mkdtemp(prefix="narrowed_")
    build_fixture(d, src=src)
    spark = build_session("narrowed-types-sweep")
    con = duck_connection(d)
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
