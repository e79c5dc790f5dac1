"""One-shot audit: run the FULL registry against a corpus the ENGINE
ITSELF wrote, and report divergences.

Every other sweep hostile-encodes the INPUT; this one probes the OUTPUT
side. At 100 TB the dominant reader of the engine's output IS the
engine — staged zones, backfill targets, incremental rollups are all
written by `write_parquet` on an engine session and read back through
`read_table`. The round-12 INT96 find (the engine's own writer emitted
stats-opaque 12-byte timestamps, defeating its own file pruner) showed
the writer is its own seam class; this sweep generalizes it: rewrite
every testdata table through the engine session's parquet sink (the
values pass through `read_table`'s read-boundary normalization first,
so the rewritten corpus is the CANONICAL logical schema in
engine-written physical form), then re-run all 205 queries on the
rewritten corpus in BOTH engines. Any writer-side type, statistics, or
layout loss surfaces as an oracle divergence on the second pass.

Also asserts the round-12 writer pin structurally: every rewritten
timestamp column must be physical INT64 (not INT96) with usable
min/max statistics in at least one data-bearing row group.

Usage: python -m tools.engine_roundtrip_sweep [--partitioned] [--atomic] [src_sf_dir] [query ...]
(default src /root/testdata/sf0.01, all registry queries)
"""

from __future__ import annotations

import sys
import tempfile

import pyarrow.parquet as pq

from iot_data_pipeline_spark.sources.readers import TABLES, read_table


#: --partitioned mode: hive-partition the big tables on their natural
#: low-cardinality string columns (the layout a processed zone actually
#: has); the partition column round-trips through directory encoding +
#: partition-value inference instead of the data pages.
_PARTITION_BY = {
    "events": ("event_type",),
    "orders": ("o_orderstatus",),
    "lineitem": ("l_returnflag",),
}


def build_fixture(
    spark,
    d: str,
    src: str = "/root/testdata/sf0.01",
    partitioned: bool = False,
    atomic: bool = False,
) -> None:
    """Rewrite each table through the engine's own sink (engine session
    confs apply: TIMESTAMP_MICROS output, snappy, Spark part naming).
    ``atomic`` publishes every table through the round-13 versioned
    write-then-swap path (write_parquet(atomic=True)), so the sweep
    certifies the whole registry over pointer-resolved snapshots in
    BOTH engines."""
    from iot_data_pipeline_spark.sources.sinks import write_parquet

    for t in TABLES:
        df = read_table(spark, src, t)
        part = _PARTITION_BY.get(t, ()) if partitioned else ()
        write_parquet(df, f"{d}/{t}.parquet", partition_by=part, atomic=atomic)


def check_writer_footers(d: str) -> list[str]:
    """Structural pin of the round-12 writer fix: no INT96 anywhere, and
    every timestamp column carries usable min/max statistics in at least
    one data-bearing row group (one file per table suffices)."""
    import glob as g

    import pyarrow as pa

    problems = []
    for t in TABLES:
        files = sorted(
            g.glob(f"{d}/{t}.parquet/*.parquet")
            or g.glob(f"{d}/{t}.parquet/**/*.parquet", recursive=True)
        )
        if not files:
            problems.append(f"{t}: engine sink wrote no part files")
            continue
        pf = pq.ParquetFile(files[0])
        ts_cols = {
            f.name for f in pf.schema_arrow if pa.types.is_timestamp(f.type)
        }
        md = pf.metadata
        stats_seen: set[str] = set()
        for gidx in range(md.num_row_groups):
            rg = md.row_group(gidx)
            if rg.num_rows == 0:
                continue
            for i in range(rg.num_columns):
                c = rg.column(i)
                if c.physical_type == "INT96":
                    problems.append(f"{t}: {c.path_in_schema} is INT96")
                st = c.statistics
                if (
                    c.path_in_schema in ts_cols
                    and st is not None
                    and st.has_min_max
                ):
                    stats_seen.add(c.path_in_schema)
        missing = ts_cols - stats_seen
        if missing and md.num_rows > 0:
            problems.append(f"{t}: timestamp stats missing for {sorted(missing)}")
    return problems


def main() -> int:
    from iot_data_pipeline_spark.queries import REGISTRY
    from iot_data_pipeline_spark.session import build_session
    from tests.oracle_harness import compare_query, duck_connection

    argv = sys.argv[1:]
    partitioned = "--partitioned" in argv
    atomic = "--atomic" in argv
    argv = [a for a in argv if a not in ("--partitioned", "--atomic")]
    src = argv[0] if argv and not argv[0].startswith("q") else "/root/testdata/sf0.01"
    names = [a for a in argv if a.startswith("q")] or list(REGISTRY)
    spark = build_session("engine-roundtrip-sweep")
    d = tempfile.mkdtemp(
        prefix="engrta_" if atomic else ("engrtp_" if partitioned else "engrt_")
    )
    build_fixture(spark, d, src=src, partitioned=partitioned, atomic=atomic)
    problems = check_writer_footers(d)
    for p in problems:
        print(f"[WRITER] {p}")
    con = duck_connection(d)
    failed = len(problems)
    for name in names:
        try:
            probs = compare_query(spark, con, name, d)
        except Exception as e:  # noqa: BLE001
            probs = [f"EXCEPTION: {type(e).__name__}: {str(e)[:400]}"]
        status = "PASS" if not probs else "FAIL"
        if probs:
            failed += 1
        print(f"[{status}] {name}")
        for p in probs:
            print(f"    {p}")
    print(f"{len(names) - failed}/{len(names)} passed  (fixture: {d})")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
