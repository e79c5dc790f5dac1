"""One-shot audit: run the FULL registry against the COMPOSED hostile
corpus -- every single-axis layout perturbation applied at once:

    DATE32 canonical date columns (tzaware_timestamps_sweep --date32, round 12)
 -> TIMESTAMP(NANOS) timestamps  (tzaware_timestamps_sweep --nanos)
 -> DECIMAL-typed money columns  (decimal_money_sweep)
 -> int32-narrowed keys          (narrowed_types_sweep)
 -> trailing unknown column      (probe_fixtures --extracol, round 9)
 -> reversed column order        (probe_fixtures --colorder, round 9)
 -> UPPER-CASED column names     (probe_fixtures --upper, round 9)
 -> 4-part reverse-named multi-file layout (multifile_layout_sweep)

The value-type stages run first (their builders address columns by the
canonical lowercase names); the name/order/extra perturbations follow;
the multifile split runs last (name-agnostic row slicing). DATE32 runs
before NANOS: o_orderdate/l_shipdate become parquet DATE while every
remaining timestamp goes nanos -- a table whose date columns and
instant columns took DIFFERENT writer encodings, the mix a real
warehouse export actually produces (round 12).

The single-axis sweeps prove each read-boundary normalization alone;
this one proves they COMPOSE -- axis interactions (e.g. a nanos column
narrowed to int32 would corrupt silently, mixed footers across part
files, decimal money partial-merged across file boundaries) are
invisible to any single-variant sweep. Round 8 first ran this inline
and passed 205/205; round 9 makes it a re-runnable tool.

Usage: python -m tools.composed_hostile_sweep [src_sf_dir] [query ...]
(default src /root/testdata/sf0.01, all registry queries)
"""

from __future__ import annotations

import shutil
import sys
import tempfile


def build_fixture(d: str, src: str = "/root/testdata/sf0.01") -> None:
    from tools.decimal_money_sweep import build_fixture as build_decimal
    from tools.multifile_layout_sweep import build_fixture as build_multifile
    from tools.narrowed_types_sweep import build_fixture as build_narrowed
    from tools.probe_fixtures import (
        build_colorder_fixture,
        build_extracol_fixture,
        build_upper_fixture,
    )
    from tools.tzaware_timestamps_sweep import (
        build_date32_fixture,
        build_nanos_fixture,
    )

    stages = [
        build_date32_fixture,
        build_nanos_fixture,
        build_decimal,
        build_narrowed,
        build_extracol_fixture,
        build_colorder_fixture,
        build_upper_fixture,
    ]
    cur = src
    tmps: list[str] = []
    try:
        for stage in stages:
            nxt = tempfile.mkdtemp(prefix="hostile_stage_")
            tmps.append(nxt)
            stage(nxt, src=cur)
            cur = nxt
        build_multifile(d, src=cur)
    finally:
        for t in tmps:
            shutil.rmtree(t, ignore_errors=True)


def main() -> int:
    from iot_data_pipeline_spark.queries import REGISTRY
    from iot_data_pipeline_spark.session import build_session
    from tests.oracle_harness import compare_query, duck_connection

    argv = sys.argv[1:]
    src = argv[0] if argv and not argv[0].startswith("q") else "/root/testdata/sf0.01"
    names = [a for a in argv if a.startswith("q")] or list(REGISTRY)
    d = tempfile.mkdtemp(prefix="hostile_")
    build_fixture(d, src=src)
    spark = build_session("composed-hostile-sweep")
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
