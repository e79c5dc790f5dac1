"""Footer-stats absence x file-pruner probe (round-11 verdict task 5).

The round-10 file pruner trusts parquet footer min/max statistics. Two
untested seams after r10:

1. STATS-ABSENT FILES MIXED WITH STATS-BEARING ONES. Writers can
   disable statistics wholesale (``write_statistics=False``) or
   per-column (``write_statistics=[cols...]``); a long-lived table
   mixes such generations freely. The pruner must (a) KEEP every
   stats-less file unconditionally (it cannot prove non-intersection),
   (b) still prune the stats-bearing out-of-range files around them,
   and (c) degrade to no-pruning-at-all (None) when NO file carries
   stats -- never to a wrong answer.

2. PRUNER x SCHEMA EVOLUTION. A bounded timestamp column that changed
   PHYSICAL type across generations (us-UTC -> ns) both (a) breaks
   ``mergeSchema`` (so the bounds must flow through the per-group
   fallback -- round-10 verdict item 3) and (b) needs the nanos-footer
   stats read correctly per generation. Also the composition's one
   SEMANTIC subtlety, pinned deliberately: a MIXED-encoding single
   table (read_table) fails loudly unpruned (r10 probe: Spark refuses
   the schema merge), but when bounds prune it to a HOMOGENEOUS
   surviving subset the read now SUCCEEDS -- correct by construction,
   because pruning only drops files that provably cannot match, so
   every matching row lives in the surviving subset.

Probe result (2026-08-15, round-11 HEAD): all bands PASS -- the
conservative keep-decision was already stats-presence-aware
(``has_min_max`` per row group) and the evolving fallback prunes each
generation independently. No found-bug this round on this axis; frozen
bands: tests/test_reader_seams.py::test_stats_absent_mix_prunes_around,
::test_pruner_all_statsless_degrades, ::test_mixed_encoding_bounded_subset.

Usage: python -m tools.stats_absence_probe [src_sf_dir]
(default /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import sys
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

N_FILES = 8
LO, HI = "1996-01-01", "1996-07-01"


def build_corpus(d: str, src: str, statsless: tuple[int, ...], per_column=None):
    """Date-split lineitem corpus; ``statsless`` file indices get their
    footer statistics disabled (wholesale, or only non-``per_column``
    columns when a list is given)."""
    tab = pq.read_table(f"{src}/lineitem.parquet").sort_by("l_shipdate")
    root = os.path.join(d, "lineitem.parquet")
    os.makedirs(root)
    n = tab.num_rows
    cut = [round(k * n / N_FILES) for k in range(N_FILES + 1)]
    for k in range(N_FILES):
        part = tab.slice(cut[k], cut[k + 1] - cut[k])
        stats = True
        if k in statsless:
            stats = per_column if per_column is not None else False
        pq.write_table(
            part,
            os.path.join(root, f"part-{k:03d}.parquet"),
            write_statistics=stats,
        )
    return root, tab


def probe_stats_mix(spark, src: str) -> list[str]:
    from pyspark.sql import functions as F

    from iot_data_pipeline_spark.sources.readers import (
        _prune_files_for_ts_bounds,
        read_table,
    )

    problems = []
    preds = {"l_shipdate": [(">=", LO), ("<", HI)]}

    # band 1: wholesale stats-less files 2 and 5 among stats-bearing
    d = tempfile.mkdtemp(prefix="statsmix_")
    root, _ = build_corpus(d, src, statsless=(2, 5))
    keep = _prune_files_for_ts_bounds(spark, root, "lineitem", preds)
    if keep is None:
        problems.append("mix: nothing pruned despite stats-bearing files")
    else:
        kept = {os.path.basename(p) for p in keep}
        for k in (2, 5):
            if f"part-{k:03d}.parquet" not in kept:
                problems.append(f"mix: stats-less part-{k:03d} was DROPPED")
    bnd = read_table(spark, d, "lineitem", bounds={"l_shipdate": (LO, HI)})
    post = read_table(spark, d, "lineitem").filter(
        (F.col("l_shipdate") >= LO) & (F.col("l_shipdate") < HI)
    )
    nb, np_ = bnd.count(), post.count()
    if nb != np_:
        problems.append(f"mix: bounded {nb} rows != post-filter {np_}")
    print(f"[mix] kept {len(keep or [])}/{N_FILES} files, {nb} rows (= {np_})")

    # band 2: per-column stats -- the BOUNDED column's stats absent
    d2 = tempfile.mkdtemp(prefix="statscol_")
    root2, _ = build_corpus(
        d2, src, statsless=(2, 5), per_column=["l_orderkey"]
    )
    keep2 = _prune_files_for_ts_bounds(spark, root2, "lineitem", preds)
    kept2 = {os.path.basename(p) for p in (keep2 or [])}
    if keep2 is not None:
        for k in (2, 5):
            if f"part-{k:03d}.parquet" not in kept2:
                problems.append(
                    f"per-column: ts-stats-less part-{k:03d} was DROPPED"
                )
    print(f"[per-column] kept {len(keep2 or [])}/{N_FILES} files")

    # band 3: ALL files stats-less -> pruning degrades to None, read correct
    d3 = tempfile.mkdtemp(prefix="statsnone_")
    root3, _ = build_corpus(d3, src, statsless=tuple(range(N_FILES)))
    keep3 = _prune_files_for_ts_bounds(spark, root3, "lineitem", preds)
    if keep3 is not None:
        problems.append(f"all-statsless: expected None, got {len(keep3)} files")
    bnd3 = read_table(spark, d3, "lineitem", bounds={"l_shipdate": (LO, HI)})
    if bnd3.count() != np_:
        problems.append(f"all-statsless: {bnd3.count()} rows != {np_}")
    print(f"[all-statsless] pruning off, {bnd3.count()} rows (= {np_})")
    return problems


def probe_evolution_composition(spark, src: str) -> list[str]:
    """Bounded ts column whose physical type changed across generations:
    bounds must survive the CANNOT_MERGE_SCHEMAS fallback (pushdown per
    Union branch) and file-prune each generation from its own footers,
    including a stats-less straggler."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from iot_data_pipeline_spark.sources.readers import read_parquet_evolving

    problems = []
    tab = pq.read_table(f"{src}/events.parquet").sort_by("ts")
    n = tab.num_rows
    d = tempfile.mkdtemp(prefix="evoprune_")
    # gen A (first half): us-UTC encoding, 3 files; one stats-less
    # gen B (second half): ns encoding, 3 files
    halves = (tab.slice(0, n // 2), tab.slice(n // 2))
    i = tab.column_names.index("ts")
    for g, (half, unit, tz) in enumerate(
        ((halves[0], "us", "UTC"), (halves[1], "ns", None))
    ):
        half = half.set_column(
            i, "ts", half.column("ts").cast(pa.timestamp(unit, tz=tz))
        )
        m = half.num_rows
        cut = [round(k * m / 3) for k in range(4)]
        for k in range(3):
            pq.write_table(
                half.slice(cut[k], cut[k + 1] - cut[k]),
                os.path.join(d, f"g{g}-part{k}.parquet"),
                write_statistics=not (g == 0 and k == 1),
            )
    contract = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    # slice the middle third of the overall ts range
    import pyarrow.compute as pc

    tmin = pc.min(tab.column("ts")).as_py()
    tmax = pc.max(tab.column("ts")).as_py()
    lo = (tmin + (tmax - tmin) * 4 // 10).strftime("%Y-%m-%d %H:%M:%S")
    hi = (tmin + (tmax - tmin) * 6 // 10).strftime("%Y-%m-%d %H:%M:%S")
    bnd = read_parquet_evolving(spark, d, contract, bounds={"ts": (lo, hi)})
    full = read_parquet_evolving(spark, d, contract)
    exp = full.filter((F.col("ts") >= lo) & (F.col("ts") < hi)).count()
    got = bnd.count()
    if got != exp:
        problems.append(f"evolution: bounded {got} rows != post-filter {exp}")
    read_files = {os.path.basename(p) for p in bnd.inputFiles()}
    if len(read_files) >= 6:
        problems.append(f"evolution: no file pruned ({sorted(read_files)})")
    if "g0-part1.parquet" not in read_files:
        # the stats-less straggler overlaps the middle slice boundary
        # region; it must be KEPT regardless
        problems.append("evolution: stats-less g0-part1 was DROPPED")
    print(
        f"[evolution] {got} rows (= {exp}), read {len(read_files)}/6 files: "
        f"{sorted(read_files)}"
    )
    return problems


def probe_mixed_encoding_bounded_subset(spark, src: str) -> list[str]:
    """MIXED us/ns encodings in ONE read_table directory: unpruned read
    fails loudly (r10 probe band); a bound that prunes to a homogeneous
    subset reads correctly (every matching row is in the subset)."""
    from pyspark.sql import functions as F

    from iot_data_pipeline_spark.sources.readers import read_table

    problems = []
    tab = pq.read_table(f"{src}/events.parquet").sort_by("ts")
    n = tab.num_rows
    d = tempfile.mkdtemp(prefix="mixenc_")
    root = os.path.join(d, "events.parquet")
    os.makedirs(root)
    i = tab.column_names.index("ts")
    halves = (tab.slice(0, n // 2), tab.slice(n // 2))
    for g, (half, unit, tz) in enumerate(
        ((halves[0], "us", "UTC"), (halves[1], "ns", None))
    ):
        half = half.set_column(
            i, "ts", half.column("ts").cast(pa.timestamp(unit, tz=tz))
        )
        m = half.num_rows
        for k in range(2):
            pq.write_table(
                half.slice(k * m // 2, m // 2 + (m % 2) * k),
                os.path.join(root, f"g{g}-part{k}.parquet"),
            )
    # unpruned: loud failure when the mixed column MATERIALIZES
    # (PARQUET_COLUMN_DATA_TYPE_MISMATCH; a bare count() succeeds via the
    # parquet metadata count, which is correct regardless of encoding)
    try:
        read_table(spark, d, "events").agg(F.min("ts")).collect()
        problems.append("mixed: unpruned ts materialization SUCCEEDED")
        loud = False
    except Exception:  # noqa: BLE001
        loud = True
    # bounded to the first quarter: survivors are homogeneous us files
    import pyarrow.compute as pc

    q1 = tab.column("ts")[n // 4].as_py().strftime("%Y-%m-%d %H:%M:%S")
    bnd = read_table(spark, d, "events", bounds={"ts": (None, q1)})
    got = bnd.count()
    exp = pc.sum(
        pc.less(tab.column("ts"), tab.column("ts")[n // 4])
    ).as_py()
    if got != exp:
        problems.append(f"mixed: bounded {got} rows != ground truth {exp}")
    print(
        f"[mixed-encoding] unpruned fails loud: {loud}; bounded subset "
        f"{got} rows (= {exp})"
    )
    return problems


def main() -> int:
    from iot_data_pipeline_spark.session import build_session

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_session("stats-absence-probe")
    problems = []
    problems += probe_stats_mix(spark, src)
    problems += probe_evolution_composition(spark, src)
    problems += probe_mixed_encoding_bounded_subset(spark, src)
    for p in problems:
        print(f"[FAIL] {p}")
    print(f"{'FAIL' if problems else 'PASS'}: stats-absence x pruner probe")
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
