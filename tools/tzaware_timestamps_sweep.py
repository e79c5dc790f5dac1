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

The --date32 variant rewrites the date-SEMANTICS canonical columns
(o_orderdate, l_shipdate -- midnight-only in the corpus) as parquet
DATE32, the Hive/Trino writer default for dates (round-12 probe axis).
read_table normalizes DATE canonical timestamp columns back to
TIMESTAMP at the scan; duck_connection applies the identical view cast.

Usage: python -m tools.tzaware_timestamps_sweep [--nanos|--date32] [src_sf_dir] [query ...]
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


#: Date-SEMANTICS canonical columns (midnight-only by construction in
#: the driver corpus; verified by the builder). ``events.ts`` carries
#: real time-of-day, so the date32 variant is column-selective.
_DATE_SEMANTICS = {"orders": ("o_orderdate",), "lineitem": ("l_shipdate",)}


def build_date32_fixture(d: str, src: str = "/root/testdata/sf0.01") -> None:
    """Rewrite the date-granular canonical columns (o_orderdate,
    l_shipdate) as parquet DATE32 -- the encoding a Hive/Trino writer
    actually chooses for dates (round-12 probe axis, SCALE.md section 7e).
    Lossless: those columns are midnight-only in the corpus."""
    for t in TABLES:
        targets = _DATE_SEMANTICS.get(t, ())
        tab = pq.read_table(f"{src}/{t}.parquet")
        fields, arrays = [], []
        changed = False
        for f, col in zip(tab.schema, tab.columns):
            if f.name in targets and pa.types.is_timestamp(f.type):
                newt = pa.date32()
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
    with_date32 = "--date32" in argv
    argv = [a for a in argv if a not in ("--nanos", "--date32")]
    src = argv[0] if argv and not argv[0].startswith("q") else "/root/testdata/sf0.01"
    names = [a for a in argv if a.startswith("q")] or list(REGISTRY)
    d = tempfile.mkdtemp(
        prefix="date32_" if with_date32 else ("nanots_" if with_nanos else "tzaware_")
    )
    builder = (
        build_date32_fixture
        if with_date32
        else (build_nanos_fixture if with_nanos else build_fixture)
    )
    builder(d, src=src)
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
