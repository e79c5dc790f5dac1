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


#: Queries whose ``ROUND(SUM(<double>), n)`` final projections are certified
#: exact at the driver's scale factors: every entry below was green in the
#: round-6 FULL-registry harness sweep at sf0.1 (10x the driver's volume,
#: BASELINE.md round-6 note), or is scale-invariant by construction (fixed
#: staged fixtures). The q164 incident is the hazard class this pins: a
#: double SUM's value depends on partial-aggregation order, and at large
#: enough group sizes the ulp drift can cross the ROUND boundary -- q164
#: flipped a cent at sf0.1 while green at sf0.01. A query name in this set
#: means "measured safe at current scale"; a NEW query that rounds a plain
#: double SUM fails compare_query until it is either converted to the exact
#: rule (``SUM(CAST(x AS DECIMAL(18,6)))`` both sides, then
#: ``ROUND(CAST(.. AS DOUBLE), n)`` -- registry.py docstring) or certified
#: at sf0.1 and added here. test_round_sum_lint.py keeps this set exact
#: (no stale entries, no unlisted hazards).
ROUND_SUM_CERTIFIED: frozenset[str] = frozenset(
    {
        "q05_revenue_per_nation",
        "q06_left_join_counts",
        "q09_lineitem_agg",
        "q10b_grouping_sets",
        "q10c_cube",
        "q101_volume_shipping",
        "q102_market_share",
        "q103_returned_items",
        "q107_forecast_revenue",
        "q112_kmeans_clusters",
        "q115_paragraph_dedup",
        "q120_char_entropy",
        "q132_ngram_perplexity",
        "q137_bpe_encode",
        "q138_salted_join",
        "q13_corrupt_routing",
        "q14_streaming_ingest",
        "q157_padding_waste",
        "q167_incremental_rollup",
        "q168_backfill_derived_zone",
        "q16_lag_lead_running",
        "q16b_range_frame",
        "q170_custom_datasource",
        "q175_drift_psi",
        "q177_stream_outer_join",
        "q181_contribution_shares",
        "q182_stream_enrichment",
        "q18_hourly_counts",
        "q18b_date_parts",
        "q191_watermark_late_drop",
        "q20_tumbling_window",
        "q20b_sliding_window",
        "q32_map_funcs",
        "q41_pivot",
        "q42_unpivot",
        "q46_shipping_priority",
        "q53_stream_stream_join",
        "q55_salted_agg",
        "q57_filtered_agg",
        "q62_union_by_name",
        "q64_upsert_merge",
        "q74_orc_roundtrip",
        "q79_disjunctive_filter",
        "q80_rich_idle_customers",
        "q81_top_suppliers",
        "q82_small_quantity_parts",
        "q94_weighted_sample",
        "q95_collated_grouping",
        "q97_embedding_standardize",
    }
)


def _call_first_arg(text: str, start: int) -> str:
    """``text[start:]`` begins right after a call's ``(``; return its first
    top-level argument (empty string if the parens never balance -- prose,
    not code)."""
    depth, i, comma = 1, start, -1
    n = len(text)
    while depth:
        if i >= n:
            return ""
        c = text[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "," and depth == 1 and comma < 0:
            comma = i
        i += 1
    return text[start : (comma if comma >= 0 else i - 1)]


def _sql_round_sum_hazards(text: str) -> list[str]:
    """Every ``SUM(...)`` inside a ``ROUND(...)`` first argument whose own
    argument carries no DECIMAL cast (works on both raw and
    portable_round_sql-rewritten oracle SQL: the rewrite keeps the ROUND
    token and the original argument)."""
    hits: list[str] = []
    u = text.upper()
    i = 0
    while True:
        j = u.find("ROUND(", i)
        if j < 0:
            return hits
        arg = _call_first_arg(u, j + 6)
        k = 0
        while True:
            m = arg.find("SUM(", k)
            if m < 0:
                break
            if m > 0 and (arg[m - 1].isalnum() or arg[m - 1] == "_"):
                k = m + 4  # CHECKSUM etc.
                continue
            sarg = _call_first_arg(arg, m + 4)
            # DECIMAL(38,18) is portable_round_sql's VARCHAR-roundtrip
            # artifact on nested ROUNDs, not exact summation -- ignore it
            if sarg and "DECIMAL" not in sarg.replace("DECIMAL(38,18)", ""):
                hits.append(f"ROUND over SUM({sarg.strip()[:50]})")
            k = m + 4
        i = j + 6


def _spark_round_sum_hazards(src: str) -> list[str]:
    """``F.round(F.sum(...))`` in DataFrame code, no decimal cast inside."""
    import re as _re

    s = _re.sub(r"\s+", "", src)
    hits: list[str] = []
    i = 0
    while True:
        j = s.find("F.round(", i)
        if j < 0:
            return hits
        arg = _call_first_arg(s, j + 8)
        k = 0
        while True:
            m = arg.find("F.sum(", k)
            if m < 0:
                break
            sarg = _call_first_arg(arg, m + 6)
            if sarg and "decimal" not in sarg.lower():
                hits.append(f"F.round over F.sum({sarg[:50]})")
            k = m + 6
        i = j + 8


def round_sum_hazards(dq) -> list[str]:
    """The q164 hazard class, mechanized (round-6 verdict task): rounding a
    plain double SUM in a final projection is one scale-up away from a cent
    flip, so every occurrence must be either converted to DECIMAL summation
    or certified at sf0.1 and listed in ROUND_SUM_CERTIFIED.

    Scope: the DataFrame-side scan covers the declared query function's
    OWN source only -- an ``F.round(F.sum(...))`` inside a shared helper
    it calls is invisible here. Those sites are swept separately by
    helper_round_sum_hazards (module-level scan of the helper packages)
    against HELPER_ROUND_SUM_CERTIFIED, so the two linters together
    cover both placements (round-7 advice)."""
    import inspect

    hazards: list[str] = []
    if dq.oracle:
        hazards += [f"oracle: {h}" for h in _sql_round_sum_hazards(dq.oracle)]
    try:
        src = inspect.getsource(dq.fn)
    except (OSError, TypeError):
        src = ""
    hazards += [f"spark: {h}" for h in _spark_round_sum_hazards(src)]
    return hazards


#: Helper functions (``<package-relative path>::<function>``) that round a
#: plain double SUM and are certified safe: every consumer is hash-checked
#: at sf0.1 (q20/q20b via the full-harness sweeps) or sums a tiny fixed
#: fixture whose double sum is exact (q191's 15-value batches).
HELPER_ROUND_SUM_CERTIFIED: frozenset[str] = frozenset(
    {"streaming/windows.py::windowed_value_counts"}
)


def helper_round_sum_sites() -> list[str]:
    """Module-level sweep for the q164 hazard class in SHARED helper code
    -- the placement the per-query lint cannot see (round-7 advice:
    windowed_value_counts' F.round(F.sum(...)) escaped it). Walks every
    function in the non-query packages (streaming/, operators/,
    functions/, sources/, plans/) and returns ALL ``path::function``
    sites containing F.round(F.sum(<no decimal>)) -- certified or not;
    the lint test diffs this against HELPER_ROUND_SUM_CERTIFIED in both
    directions. Query modules are excluded: their declared fns are
    covered per-query by round_sum_hazards + ROUND_SUM_CERTIFIED."""
    import ast
    from pathlib import Path

    import iot_data_pipeline_spark as pkg

    root = Path(pkg.__file__).resolve().parent
    sites: list[str] = []
    for sub in ("streaming", "operators", "functions", "sources", "plans"):
        for path in sorted((root / sub).glob("*.py")):
            src = path.read_text()
            for node in ast.walk(ast.parse(src)):
                if not isinstance(
                    node, (ast.FunctionDef, ast.AsyncFunctionDef)
                ):
                    continue
                seg = ast.get_source_segment(src, node) or ""
                if _spark_round_sum_hazards(seg):
                    sites.append(f"{sub}/{path.name}::{node.name}")
    return sites


def helper_round_sum_hazards() -> list[str]:
    """The uncertified subset of helper_round_sum_sites()."""
    return [
        s for s in helper_round_sum_sites()
        if s not in HELPER_ROUND_SUM_CERTIFIED
    ]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Register the testdata tables as DuckDB views, applying the same
    read-boundary normalization as the engine's ``read_table``: DECIMAL
    physical columns (a routine writer choice for money) cast to DOUBLE
    -- except scale-0 decimals (surrogate keys), which cast to BIGINT
    when they fit (p <= 18; a DECIMAL(18,0) key above 2**53 would lose
    integer precision in a double) and stay DECIMAL otherwise. Both
    engines then compute on identical values regardless of the writer's
    numeric physical type (round-8 decimal-money sweep; round-9 key
    variant)."""
    import re as _re

    from iot_data_pipeline_spark.sources.readers import TIMESTAMP_COLUMNS

    def _dec_cast(table: str, name: str, dtype: str) -> str:
        # alias to lowercase: name-case normalization, mirroring
        # read_table (column-name case is a writer choice; the engine
        # contract's names are lowercase)
        lo = name.lower()
        if dtype == "DATE" and lo in TIMESTAMP_COLUMNS.get(table, ()):
            # DATE32-encoded canonical timestamp column: read_table casts
            # it to TIMESTAMP at the scan (midnight UTC); the view applies
            # the identical cast so both engines compute on the same
            # logical type (round-12 date32 sweep)
            return f'CAST("{name}" AS TIMESTAMP) AS "{lo}"'
        m = _re.match(r"DECIMAL\((\d+),(\d+)\)", dtype)
        if not m:
            return f'"{name}" AS "{lo}"' if name != lo else f'"{name}"'
        p, s = int(m.group(1)), int(m.group(2))
        if s == 0:
            if p <= 18:
                return f'CAST("{name}" AS BIGINT) AS "{lo}"'
            return f'"{name}" AS "{lo}"' if name != lo else f'"{name}"'
        return f'CAST("{name}" AS DOUBLE) AS "{lo}"'

    import os as _os

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    import glob as _glob

    for t in TABLES:
        src = f"{sf_dir}/{t}.parquet"
        # Atomically-published zone (write_parquet(atomic=True)): the
        # `_current` pointer names the published snapshot dir -- resolve
        # it the way the engine's read_table does, so the oracle views
        # read the same immutable snapshot (a recursive glob would
        # otherwise union EVERY version and surface `v` as a column).
        ptr = _os.path.join(src, "_current")
        snapshot = False
        if not _os.path.isfile(ptr) and _os.path.isdir(src):
            # Engine parity (round-14 probe): a zone with v=<N>
            # snapshot dirs but NO pointer is never read as plain --
            # the union would silently mix every version. The engine's
            # resolve_snapshot_dir retries then fails loud; the oracle
            # fails loud immediately (fixtures are not mid-swap).
            import re as _re2

            if any(
                _re2.fullmatch(r"v=\d+", e)
                and _os.path.isdir(_os.path.join(src, e))
                for e in _os.listdir(src)
            ):
                raise IOError(
                    f"oracle view {t!r}: zone {src!r} has snapshot "
                    "directories but no _current pointer -- a plain "
                    "read would union every version (engine fails "
                    "loud here too)"
                )
        if _os.path.isfile(ptr):
            # Mirror matview._parse_pointer exactly (round-14 advisor
            # find): an EMPTY pointer means "not a versioned zone" --
            # the engine reads the plain directory, so the oracle must
            # too (the old f-string resolution built the nonexistent
            # '<zone>/v=' path); garbage content fails LOUD the same
            # way the engine does, never a silent divergence.
            with open(ptr, encoding="utf-8") as fh:
                text = fh.read().strip()
            if text:
                if not text.isdigit():
                    raise ValueError(
                        f"oracle view {t!r}: snapshot pointer at {ptr!r} "
                        f"contains {text[:40]!r}, not a version number "
                        "(engine _parse_pointer fails the same way)"
                    )
                src = f"{src}/v={text}"
                snapshot = True
            else:
                import re as _re3

                if any(
                    _re3.fullmatch(r"v=\d+", e)
                    and _os.path.isdir(_os.path.join(src, e))
                    for e in _os.listdir(src)
                ):
                    raise IOError(
                        f"oracle view {t!r}: EMPTY _current pointer over "
                        f"snapshot directories at {src!r} -- a plain "
                        "read would union every version (engine fails "
                        "loud here too)"
                    )
        rel = f"'{src}'"
        snapshot_hive = False
        if _os.path.isdir(src):
            # Spark-written / multifile-layout table: DuckDB cannot scan
            # a bare directory path, so glob the part files (the
            # composed-hostile and multifile sweep corpora). A
            # hive-PARTITIONED zone nests its part files under
            # key=value dirs (the engine round-trip --partitioned
            # corpus): recurse and restore the partition columns the
            # way Spark's own directory scan does.
            if _glob.glob(f"{src}/*.parquet"):
                if snapshot:
                    # flat snapshot: DuckDB's hive auto-detection would
                    # resurrect the machinery `v=<N>` segment as a
                    # column AND override a genuine data column named
                    # `v` with the path value (measured) -- Spark never
                    # sees either (basePath = the resolved dir). Turn
                    # detection off: no partition columns exist below
                    # a flat snapshot.
                    rel = (
                        f"read_parquet('{src}/*.parquet', "
                        "hive_partitioning=0)"
                    )
                else:
                    rel = f"'{src}/*.parquet'"
            else:
                rel = (
                    f"read_parquet('{src}/**/*.parquet', "
                    "hive_partitioning=1)"
                )
                snapshot_hive = snapshot
        cols = con.execute(f"DESCRIBE SELECT * FROM {rel}").fetchall()
        if snapshot_hive and any(c[0] == "v" for c in cols):
            # partitioned snapshot (hive_partitioning=1 above): `v`
            # here is the machinery segment -- UNLESS the files
            # natively carry a data column named `v`, which DuckDB's
            # detection would have silently overridden with the path
            # value. Distinguish by the file-native schema and refuse
            # loud on the override (Spark-side basePath serves the
            # data column correctly; the oracle cannot).
            native = {
                c[0]
                for c in con.execute(
                    f"DESCRIBE SELECT * FROM read_parquet("
                    f"'{src}/**/*.parquet', hive_partitioning=0)"
                ).fetchall()
            }
            if "v" in native:
                raise ValueError(
                    f"oracle view {t!r}: partitioned snapshot at "
                    f"{src!r} carries a DATA column named 'v'; DuckDB's "
                    "hive detection would override it with the "
                    "machinery version segment -- the oracle cannot "
                    "represent this zone (the engine can: basePath "
                    "scopes detection below the snapshot dir)"
                )
            cols = [c for c in cols if c[0] != "v"]
        select = ", ".join(
            _dec_cast(t, name, dtype) for name, dtype, *_ in cols
        )
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT {select} FROM {rel}"
        )
    return con


def compare_query(spark, con, name: str, sf_dir: str) -> list[str]:
    """Returns a list of mismatch descriptions (empty = pass).

    Releases per-query transient persists on the way out (round-16),
    matching the bench/CLI-harness lifecycle: pytest calls this directly
    for ~1,400 oracle/band tests in ONE session, and without the release
    every transient-persisting query left its CacheManager entry pinned
    -- a later plan-shape test then saw a foreign InMemoryRelation
    substituted into its explain (the q145 plan pin caught exactly
    that), and the session accumulated dead cached plans without bound.
    """
    from iot_data_pipeline_spark.transient import release_transient_caches

    try:
        return _compare_query_inner(spark, con, name, sf_dir)
    finally:
        release_transient_caches()


def _compare_query_inner(spark, con, name: str, sf_dir: str) -> list[str]:
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
    # Sibling lint, same enforcement point (round-6 verdict task 3): a
    # plain double SUM under ROUND is one scale-up away from a cent flip
    # (the q164 incident) -- new queries must use DECIMAL summation or be
    # certified at sf0.1 first.
    if name not in ROUND_SUM_CERTIFIED:
        hazards = round_sum_hazards(dq)
        if hazards:
            return [
                f"ROUND(SUM(<double>)) hazard (q164 class): {hazards[:4]} -- "
                "convert to DECIMAL summation (registry.py docstring recipe) "
                "or certify at sf0.1 and add to ROUND_SUM_CERTIFIED"
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
        # release per-query transient persists (round-15): 205 queries
        # in one session otherwise accumulate pinned CacheManager entries
        from iot_data_pipeline_spark.transient import (
            release_transient_caches,
        )

        release_transient_caches()
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
