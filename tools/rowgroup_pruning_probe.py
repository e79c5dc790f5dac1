"""Measure which physical layouts ACTUALLY prune parquet scans (round 10).

``PushedFilters`` in the plan is the Catalyst-to-source handshake; the
parquet-level conversion (ParquetFilters.createFilter) happens later and
can silently decline, in which case every row group is read anyway. The
plan looks right, the scan is a full scan -- invisible to every
plan-shape test, visible only in the scan node's ``numOutputRows``
metric. This probe measures that metric for a literal range slice over
each physical encoding of a timestamp and a money column, post-filter
vs ``read_table(bounds=...)``, on a 60-row-group sorted corpus.

Measured matrix (2026-08-15, Spark 4.1.2, sf0.1 lineitem, 600k rows,
10k-row groups sorted by the probed column; numbers = scan rows):

    encoding                      post-filter   bounds       verdict
    timestamp[us] NTZ (driver!)   600,000       600,000      NEVER prunes
    timestamp[us, tz=UTC]          20,000        20,000      prunes
    timestamp[ns] (nanosAsLong)   600,000       600,000      NEVER prunes
    timestamp[ms] (NTZ)           600,000       600,000      NEVER prunes
    double money                   90,000        90,000      prunes
    DECIMAL(12,2) money           600,000        90,000      bounds-only
    int64 key                     130,000 (sanity: machinery works)

Three conclusions, all acted on:
1. DECIMAL money: ``bounds`` delivers REAL row-group pruning (6.7x fewer
   scan rows) where the post-filter form reads everything -- the
   measured vindication of the round-9/10 bounds discipline.
2. Timestamps are only converted to parquet filters for
   ``isAdjustedToUTC=true`` µs/ms columns. The driver corpus's NTZ
   encoding and the NANOS layout are DECLINED -- no session conf changes
   this (the FILE's logical annotation is what is matched; probed:
   inferTimestampNTZ=false re-types the Spark column but the file-side
   annotation still loses). Engine response: FILE-level pruning from
   footer stats for bounded canonical timestamp columns
   (sources/readers._prune_files_for_ts_bounds) -- at 100 TB the table
   is thousands of part files, so the file is the recoverable unit, and
   the footer pass uses the exact stats the row-group filter would have.
3. The pin tests on PushedFilters remain necessary (no handshake, no
   chance of pruning) but are NOT sufficient -- this probe is the
   sufficiency check, frozen as
   tests/test_plan_shapes.py::test_bounds_file_level_pruning_on_unprunable_encodings.

Usage: python -m tools.rowgroup_pruning_probe [src_sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile


def walk_scans(node, out: list) -> None:
    """Collect numOutputRows from every scan leaf, descending through
    AQE query stages (collectLeaves alone stops at QueryStageExec)."""
    cls = node.getClass().getSimpleName()
    if "FileSourceScan" in cls or "BatchScan" in cls:
        m = node.metrics()
        if m.contains("numOutputRows"):
            out.append(m.apply("numOutputRows").value())
        return
    if "QueryStage" in cls:
        walk_scans(node.plan(), out)
        return
    ch = node.children()
    for i in range(ch.size()):
        walk_scans(ch.apply(i), out)


def scan_rows(df) -> int:
    """Rows the parquet scan actually produced for a count() over ``df``
    (post row-group/file pruning, pre any non-pushed filtering)."""
    from pyspark.sql import functions as F

    adf = df.agg(F.count(F.lit(1)))
    adf.collect()
    plan = adf._jdf.queryExecution().executedPlan()
    if plan.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        plan = plan.executedPlan()
    out: list = []
    walk_scans(plan, out)
    return sum(out)


def main() -> int:
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from iot_data_pipeline_spark.session import build_session
    from iot_data_pipeline_spark.sources.readers import read_table

    src_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = build_session("rowgroup-pruning-probe")
    src = pq.read_table(f"{src_dir}/lineitem.parquet")
    total = src.num_rows

    def fixture(col: str, cast_type) -> str:
        t = src.sort_by(col)
        if cast_type is not None:
            i = t.column_names.index(col)
            t = t.set_column(i, col, t.column(col).cast(cast_type))
        d = tempfile.mkdtemp(prefix="rgprobe_")
        pq.write_table(
            t, os.path.join(d, "lineitem.parquet"), row_group_size=10_000
        )
        return d

    lo, hi = "1996-01-01", "1996-02-01"
    print(f"corpus: {total} rows, 10k-row groups, slice [{lo}, {hi})")
    for name, typ in (
        ("ts us_ntz (driver default)", None),
        ("ts us_utc (tz-aware)", pa.timestamp("us", tz="UTC")),
        ("ts nanos", pa.timestamp("ns")),
        ("ts ms", pa.timestamp("ms")),
    ):
        d = fixture("l_shipdate", typ)
        post = read_table(spark, d, "lineitem").filter(
            (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
        )
        bnd = read_table(spark, d, "lineitem", bounds={"l_shipdate": (lo, hi)})
        print(
            f"{name}: post={scan_rows(post)} bounds={scan_rows(bnd)} "
            f"matching={post.count()}"
        )
    for name, typ in (
        ("money double", None),
        ("money decimal(12,2)", pa.decimal128(12, 2)),
    ):
        d = fixture("l_extendedprice", typ)
        post = read_table(spark, d, "lineitem").filter(
            F.col("l_extendedprice") > 90000.0
        )
        bnd = read_table(
            spark, d, "lineitem",
            bounds={"l_extendedprice": ((">", 90000.0),)},
        )
        print(
            f"{name}: post={scan_rows(post)} bounds={scan_rows(bnd)} "
            f"matching={post.count()}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
