"""One-shot audit: run the FULL registry against a corpus whose parquet
timestamps carry isAdjustedToUTC=true (tz-aware instant semantics).

The driver testdata writes timezone-naive timestamps; a Spark or Flink
writer upstream emits INSTANT timestamps for the same values. The engine
pins the session to UTC, so both encodings decode to the same wall time
-- anything that diverges is a rendering/formatting path that leaks the
logical type through to output.

The hazard it caught on first run (round 8): q172's oracle stringified
its hour bucket with CAST(.. AS VARCHAR), which renders a '+00' suffix
for TIMESTAMPTZ but not for TIMESTAMP; the strftime form renders the
same UTC wall time for either encoding. (Spark-side output already went
through date_format, so only the oracle leaked.)

The --nanos variant writes TIMESTAMP(NANOS) instead (the encoding the
driver's generator originally used for events.ts, here applied to EVERY
timestamp column): under ``spark.sql.legacy.parquet.nanosAsLong=true``
those read as LONG nanos-since-epoch, so the read boundary must convert
BY NAME from the canonical schema. First run (round 8) caught the
original events.ts-only special case leaving orders/lineitem dates as
bigint -- every date_trunc over a nanos-written corpus crashed; now
``read_table`` normalizes all of TIMESTAMP_COLUMNS.

Usage: python -m tools.tzaware_timestamps_sweep [--nanos] [src_sf_dir] [query ...]
(default src /root/testdata/sf0.01, all registry queries)
"""

from __future__ import annotations

import shutil
import sys
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

from iot_data_pipeline_spark.sources.readers import TABLES


def build_fixture(d: str, src: str = "/root/testdata/sf0.01") -> None:
    """Rewrite every timezone-naive timestamp column as tz-aware UTC
    (same instants, isAdjustedToUTC=true); copy tables with no
    timestamp columns unchanged."""
    for t in TABLES:
        tab = pq.read_table(f"{src}/{t}.parquet")
        fields, arrays = [], []
        changed = False
        for f, col in zip(tab.schema, tab.columns):
            if pa.types.is_timestamp(f.type) and f.type.tz is None:
                newt = pa.timestamp(f.type.unit, tz="UTC")
                col = col.cast(newt)
                f = pa.field(f.name, newt)
                changed = True
            fields.append(f)
            arrays.append(col)
        if changed:
            pq.write_table(
                pa.table(arrays, schema=pa.schema(fields)), f"{d}/{t}.parquet"
            )
        else:
            shutil.copy(f"{src}/{t}.parquet", f"{d}/{t}.parquet")


def build_nanos_fixture(d: str, src: str = "/root/testdata/sf0.01") -> None:
    """Rewrite every timestamp column as parquet TIMESTAMP(NANOS)
    (same instants; ``store_schema=False`` so readers see the parquet
    logical type, not a stored arrow schema)."""
    for t in TABLES:
        tab = pq.read_table(f"{src}/{t}.parquet")
        fields, arrays = [], []
        changed = False
        for f, col in zip(tab.schema, tab.columns):
            if pa.types.is_timestamp(f.type):
                newt = pa.timestamp("ns")
                col = col.cast(newt)
                f = pa.field(f.name, newt)
                changed = True
            fields.append(f)
            arrays.append(col)
        if changed:
            pq.write_table(
                pa.table(arrays, schema=pa.schema(fields)),
                f"{d}/{t}.parquet",
                store_schema=False,
            )
        else:
            shutil.copy(f"{src}/{t}.parquet", f"{d}/{t}.parquet")


def main() -> int:
    from iot_data_pipeline_spark.queries import REGISTRY
    from iot_data_pipeline_spark.session import build_session
    from tests.oracle_harness import compare_query, duck_connection

    argv = sys.argv[1:]
    with_nanos = "--nanos" in argv
    argv = [a for a in argv if a != "--nanos"]
    src = argv[0] if argv and not argv[0].startswith("q") else "/root/testdata/sf0.01"
    names = [a for a in argv if a.startswith("q")] or list(REGISTRY)
    d = tempfile.mkdtemp(prefix="nanots_" if with_nanos else "tzaware_")
    (build_nanos_fixture if with_nanos else build_fixture)(d, src=src)
    spark = build_session("tzaware-timestamps-sweep")
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
