"""Batch sources: parquet testdata tables, JSONL (the reference's format), CSV.

Scale notes (100 TB design point):
- Parquet scans rely on Catalyst pushdown: express filters/projections on the
  DataFrame *before* any action so ``PushedFilters``/``ReadSchema`` reach the
  scan; never materialize then filter.
- JSONL ingest declares an explicit schema (no inference pass over the data --
  at 100 TB a schema-inference pre-scan doubles the read) and uses PERMISSIVE
  mode with a corrupt-record column so one dirty line never fails a 1000-task
  stage (reference semantics: log-and-drop, app/app.py:62-65).
"""

from __future__ import annotations

import threading

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Driver testdata tables (TESTDATA.md / FIXTURES.md section 3).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Canonical sensor-record schema (FIXTURES.md section 1; union of the
#: reference's README sample and its embedded dummy data). All nullable:
#: schema-on-read semantics, missing field -> NULL (replaces the reference's
#: ``'temperature' in record`` probe, app/app.py:51).
SENSOR_SCHEMA = T.StructType(
    [
        T.StructField("device_id", T.StringType()),
        T.StructField("location", T.StringType()),
        T.StructField("temperature", T.DoubleType()),
        T.StructField("humidity", T.DoubleType()),
        T.StructField("pressure", T.DoubleType()),
        T.StructField("timestamp", T.TimestampType()),
    ]
)

CORRUPT_COL = "_corrupt_record"

#: Canonical timestamp columns per table (TESTDATA.md). Under
#: ``spark.sql.legacy.parquet.nanosAsLong=true`` a TIMESTAMP(NANOS)
#: parquet column reads as LONG nanos-since-epoch and is
#: indistinguishable from a real bigint in the Spark schema, so the
#: read boundary normalizes BY NAME from the canonical schema -- the
#: round-8 nanos sweep caught the original events.ts-only special case
#: leaving orders/lineitem dates as bigint (every date_trunc downstream
#: crashed on a nanos-written corpus).
TIMESTAMP_COLUMNS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def _nanos_bound_literal(value: str) -> Column:
    """ISO date/timestamp string -> nanos-since-epoch literal expression.

    Built from Spark's own string->timestamp cast so the literal resolves
    in ``spark.sql.session.timeZone`` -- the SAME zone the non-bigint
    bounds branch (``lit(value).cast(dtype)``) uses. A Python-side UTC
    conversion (the round-9 shape) silently diverged from the typed
    branch whenever the session tz wasn't UTC (round-9 ADVICE). The whole
    expression is deterministic over literals, so ConstantFolding
    collapses it to one bigint literal at optimize time and the
    comparison still reaches ``PushedFilters`` as a bare
    attribute-vs-literal predicate (pinned:
    tests/test_plan_shapes.py::test_bounds_push_to_scan_on_hostile_layouts).

    Nanos = micros * 1000: bound literals carry at most microsecond
    precision (ISO strings), so the multiply is exact.
    """
    return F.unix_micros(F.lit(value).cast("timestamp")) * F.lit(1000)


def _stat_to_micros(value) -> int | None:
    """Parquet footer timestamp/date statistic -> epoch microseconds, or
    None if unconvertible (unknown type, overflow). Naive values are the
    engine contract's UTC wall time; tz-aware values convert exactly;
    ``datetime.date`` (a DATE32 column's footer stat -- the Hive/Trino
    writer default for date-granular columns) converts as midnight UTC,
    so file pruning works on date-encoded layouts too (round-12: the
    pruner previously kept ALL files on a DATE32 corpus)."""
    from datetime import date, datetime, timezone

    try:
        if hasattr(value, "to_pydatetime"):  # pandas.Timestamp
            value = value.to_pydatetime()
        if isinstance(value, datetime):
            if value.tzinfo is None:
                value = value.replace(tzinfo=timezone.utc)
            epoch = datetime(1970, 1, 1, tzinfo=timezone.utc)
            delta = value - epoch
            return (delta.days * 86_400 + delta.seconds) * 1_000_000 + (
                delta.microseconds
            )
        if isinstance(value, date):  # datetime checked first (subclass)
            days = (value - date(1970, 1, 1)).days
            return days * 86_400_000_000
    except (OverflowError, ValueError, AttributeError):
        return None
    return None


def _literal_to_micros(value: str) -> int | None:
    from datetime import datetime, timezone

    for fmt in ("%Y-%m-%d %H:%M:%S.%f", "%Y-%m-%d %H:%M:%S", "%Y-%m-%d"):
        try:
            dt = datetime.strptime(value, fmt).replace(tzinfo=timezone.utc)
        except ValueError:
            continue
        epoch = datetime(1970, 1, 1, tzinfo=timezone.utc)
        delta = dt - epoch
        return (delta.days * 86_400 + delta.seconds) * 1_000_000 + (
            delta.microseconds
        )
    return None


def _bound_to_micros(value) -> int | None:
    """Bound LITERAL of any accepted Python type -> epoch microseconds
    (contract semantics: naive values and ISO strings are UTC wall time,
    tz-aware values convert exactly), or None when unparseable here.
    Shared by the nanos-horizon classifier, the date-dtype bound rewrite,
    and the file pruner so that a ``datetime``/``pandas.Timestamp`` bound
    gets the SAME exactness guarantees as its string spelling (round-11
    ADVICE: the str-only gates left the datetime spelling on the old
    silently-lossy paths)."""
    if isinstance(value, str):
        return _literal_to_micros(value)
    return _stat_to_micros(value)


#: Session-timezone spellings equivalent to UTC. The footer-pruning pass
#: parses bound literals as UTC wall time, so it must only run when the
#: session resolves literals the same way -- but gating on the exact
#: string "UTC" (the round-10 shape) silently forfeited ALL file-level
#: pruning for sessions pinned to an equivalent zone ("Etc/UTC", "GMT",
#: "+00:00"), a quiet 100 TB perf cliff (round-10 ADVICE). Explicit
#: aliases plus the fixed-zero-offset pattern; region zones that merely
#: OBSERVE UTC today (Africa/Abidjan) stay conservative -- their rules
#: can carry historical offsets the stats era may straddle.
_UTC_EQUIVALENT = frozenset(
    {
        "UTC",
        "GMT",
        "GMT0",
        "Etc/UTC",
        "Etc/GMT",
        "Etc/GMT0",
        "Etc/GMT+0",
        "Etc/GMT-0",
        "Etc/UCT",
        "Etc/Universal",
        "Etc/Greenwich",
        "Etc/Zulu",
        "UCT",
        "Universal",
        "Greenwich",
        "Zulu",
        "Z",
    }
)


def _session_tz_is_utc(tz: str) -> bool:
    import re

    if tz in _UTC_EQUIVALENT:
        return True
    # fixed zero offsets: "+00:00", "-00", "UTC+0", "GMT+00:00:00"
    return bool(re.fullmatch(r"(?:UTC|GMT)?[+-]0{1,2}(?::?00){0,2}", tz))


#: Hadoop-connector scheme spellings -> the scheme pyarrow's from_uri
#: knows. Spark object-store tables are almost always named ``s3a://``
#: (the Hadoop S3 connector), but the BYTES live in plain S3 -- pyarrow
#: reads the same footers through its own handle. Without the alias the
#: footer passes would conservatively skip exactly the mainstream
#: deployment they were built for.
#: (only aliases whose URI AUTHORITY layout matches the target scheme
#: belong here. Azure ADLS Gen2 spellings need NO alias: pyarrow >= 16
#: resolves ``abfs://``/``abfss://`` natively via AzureFileSystem, so
#: those footer passes run as-is -- round 12 fixed ``_respell`` to keep
#: the ``container@account.host`` authority those URIs carry. The legacy
#: blob-endpoint ``wasb://`` and fsspec-style ``az://`` spellings are
#: NOT resolvable (from_uri raises) and skip footer passes
#: conservatively -- pinned in tests/test_reader_seams.py.)
_SCHEME_ALIASES = {"s3a": "s3", "s3n": "s3"}


def _pafs_for(uri: str):
    """Resolve a table URI/path to ``(pyarrow FileSystem, fs-local path)``,
    or ``(None, None)`` for schemes pyarrow cannot handle (a Spark-only
    scheme like ``viewfs://`` skips footer passes conservatively;
    Hadoop-connector spellings like ``s3a://`` alias to the pyarrow
    scheme first -- same bytes, different client). The returned
    filesystem objects are picklable (pyarrow contract), so distributed
    footer passes ship them to executors directly."""
    from pyarrow import fs as pafs

    if "://" not in uri:
        return pafs.LocalFileSystem(), uri
    scheme, rest = uri.split("://", 1)
    alias = _SCHEME_ALIASES.get(scheme)
    if alias is not None:
        uri = f"{alias}://{rest}"
    try:
        return pafs.FileSystem.from_uri(uri)
    except Exception:  # noqa: BLE001 -- unknown scheme: no footer access
        return None, None


def _respell(uri: str, root: str, fs_path: str) -> str:
    """Map an fs-local path under ``root`` (the fs-local form of ``uri``,
    as returned by :func:`_pafs_for`) back to the caller's URI spelling
    so Spark reads through the same scheme the table was named with.

    Suffix-based: the listed path extends the table root, so the
    respelled URI is the ORIGINAL URI plus the same suffix. Rebuilding
    from ``scheme + fs_path`` (the round-11 shape) silently DROPPED any
    URI authority that is not part of the filesystem path -- an
    ``abfs://container@account.dfs.core.windows.net/tbl`` table listed
    as fs-local ``container/tbl/...``, so every pruned re-read came back
    ``abfs://container/tbl/...`` with the account gone (round-12 probe;
    pinned in tests/test_reader_seams.py)."""
    if "://" not in uri:
        return fs_path
    base = root.rstrip("/")
    if fs_path == base:
        return uri
    if fs_path.startswith(base + "/"):
        return uri.rstrip("/") + fs_path[len(base):]
    # A listing can never escape its own root; reaching here is a logic
    # error upstream. Fail loudly rather than hand Spark a guessed URI.
    raise ValueError(
        f"listed path {fs_path!r} is not under table root {root!r} "
        f"(table URI {uri!r})"
    )


def _list_parquet_files(fs, root: str) -> list[str] | None:
    """Recursive data-file listing under ``root`` (fs-local paths) with
    Spark's OWN listing semantics: every file except those under a path
    segment Spark hides (leading ``_`` or ``.`` -- ``_SUCCESS``,
    ``_temporary``, checksum files). NO extension filter: Spark's
    directory scan reads every visible file regardless of name, and
    Hive-written parquet is classically extensionless (``000000_0``) --
    a ``*.parquet`` glob here silently DROPPED those files' rows from
    every explicit-file re-read (round-11 probe; frozen in
    tests/test_reader_seams.py::test_pruner_keeps_extensionless_files).
    A visible non-parquet stray behaves identically on both paths: the
    footer probe can't read it, so the pruner KEEPS it and Spark fails
    on it exactly as the unpruned directory read would. Returns None
    when ``root`` is not a listable directory."""
    from pyarrow import fs as pafs

    try:
        info = fs.get_file_info(root)
        if info.type == pafs.FileType.File:
            return [root]  # bare-file table: one-element listing
        if info.type != pafs.FileType.Directory:
            return None
        entries = fs.get_file_info(pafs.FileSelector(root, recursive=True))
    except Exception:  # noqa: BLE001 -- unlistable: no pruning
        return None
    base = root.rstrip("/")
    files = []
    for e in entries:
        if e.type != pafs.FileType.File:
            continue
        rel = e.path[len(base) :].lstrip("/")
        if any(seg.startswith(("_", ".")) for seg in rel.split("/")):
            continue
        files.append(e.path)
    return sorted(files)


def _ts_file_survives(
    path: str, ops: list[tuple[str, str, int]], fs=None
) -> bool:
    """One file's keep-decision for :func:`_prune_files_for_ts_bounds`
    (module-level and self-importing so it ships to executors when the
    footer pass is distributed; ``fs`` is a picklable pyarrow filesystem,
    None for plain local paths). Conservative: unreadable footers,
    missing columns, and stats-less row groups all KEEP the file; stats
    are widened 1ms each side against sub-unit truncation."""
    import pyarrow.parquet as pq

    try:
        if fs is not None:
            md = pq.ParquetFile(path, filesystem=fs).metadata
        else:
            md = pq.ParquetFile(path).metadata
    except Exception:  # noqa: BLE001 -- unreadable footer: keep
        return True
    return _md_survives(md, ops)


def _md_survives(md, ops: list[tuple[str, str, int]]) -> bool:
    """Keep-decision from an already-open parquet footer (shared by the
    pruner and the evolving reader's single fingerprint+prune pass).

    0-row row groups (a streaming writer's empty-batch flush, a
    committed-but-empty micro-batch) are skipped EXACTLY, not kept
    conservatively: they carry no statistics, so the stats-less
    keep-gate force-kept the whole file -- and an entirely-empty file
    could never be pruned at all, silently degrading file pruning to
    keep-everything on corpora with such artifacts (round-12 probe;
    answers stayed correct, scans did not). A row group with zero rows
    cannot contain a matching row, so skipping it is a theorem, not a
    heuristic; a file whose every row group is empty contributes no
    rows and prunes outright."""
    SLACK = 1_000  # 1ms in micros
    try:
        if md.num_row_groups == 0:
            return False  # no row groups: the file carries no rows
        first_data = next(
            (
                g
                for g in range(md.num_row_groups)
                if md.row_group(g).num_rows > 0
            ),
            None,
        )
        if first_data is None:
            return False  # every row group empty: no rows to contribute
        # lowercase: the footer carries the writer's spelling (the
        # --upper layout), canonical names are lowercase
        idx = {
            md.row_group(first_data).column(i).path_in_schema.lower(): i
            for i in range(md.row_group(first_data).num_columns)
        }
    except Exception:  # noqa: BLE001 -- unreadable footer: keep
        return True
    for g in range(md.num_row_groups):
        rg = md.row_group(g)
        if rg.num_rows == 0:
            continue
        group_ok = True
        for c, op, v in ops:
            i = idx.get(c)
            if i is None:
                continue
            st = rg.column(i).statistics
            if st is None or not st.has_min_max:
                continue
            lo = _stat_to_micros(st.min)
            hi = _stat_to_micros(st.max)
            if lo is None or hi is None:
                continue
            lo, hi = lo - SLACK, hi + SLACK
            if (
                (op == ">=" and hi < v)
                or (op == ">" and hi <= v)
                or (op == "<" and lo >= v)
                or (op == "<=" and lo > v)
                or (op == "=" and not (lo <= v <= hi))
            ):
                group_ok = False
                break
        if group_ok:
            return True
    return False


def _prune_files_for_ts_bounds(
    spark: SparkSession, src: str, name: str, preds_by_col: dict[str, list]
) -> list[str] | None:
    """FILE-level pruning for bounded canonical timestamp columns.

    Round-10 measurement (tools/rowgroup_pruning_probe.py): Spark's
    parquet reader converts pushed timestamp predicates into actual
    row-group filters ONLY for ``isAdjustedToUTC=true`` µs/ms columns.
    The driver corpus's `timestamp[us]` NTZ encoding -- and the NANOS
    layout -- are silently declined: ``PushedFilters`` lists the
    predicate, but every row group is read. No session conf changes this
    (it is the FILE's logical annotation that is matched). At 100 TB,
    the table is thousands of part files, so the recoverable unit is the
    FILE: read each footer's min/max for the bounded column (a
    metadata-only pass, the same stats the row-group filter would have
    used) and hand Spark only the files whose range can intersect the
    bounds. Conservative by construction: any file whose stats are
    missing/unconvertible is kept; non-UTC sessions skip pruning
    entirely (literals here are parsed in the contract's UTC; since
    round 11 UTC is matched by zone EQUIVALENCE -- "Etc/UTC"/"GMT"/
    "+00:00" sessions prune too, round-10 ADVICE); single-file tables
    are returned as-is (nothing to prune). Stats are widened by 1ms
    each side against sub-unit truncation (pruning must never drop a
    matching file; a kept extra file only costs what the scan already
    cost).

    Since round 11 the pass goes through ``pyarrow.fs`` (round-10
    verdict item 1): any URI ``pyarrow.fs.FileSystem.from_uri``
    resolves (``s3://``, ``gs://``, ``file://``...) reads the same
    footers remotely, and the listing is RECURSIVE with Spark's
    hidden-file rules (``_``/``.`` path segments skipped), so
    partitioned/nested layouts prune too -- at the 100 TB design point
    the table IS a partitioned object-store prefix, exactly where the
    round-10 local-only pass vanished. Spark-only schemes pyarrow
    cannot resolve (``viewfs://``) still skip conservatively. Callers
    must read the returned explicit file list with ``basePath=src`` so
    Spark keeps inferring partition columns from the pruned paths.
    """
    if not _session_tz_is_utc(
        spark.conf.get("spark.sql.session.timeZone", "")
    ):
        return None
    fs, root = _pafs_for(src)
    if fs is None:
        return None
    files = _list_parquet_files(fs, root)
    if files is None or len(files) < 2:
        return None
    # (op, micros) per column; unconvertible literals drop the predicate
    ops: list[tuple[str, str, int]] = []
    for c, preds in preds_by_col.items():
        for op, value in preds:
            micros = _bound_to_micros(value)
            if micros is not None:
                ops.append((c, op, micros))
    if not ops:
        return None
    # The footer pass is metadata-only but linear in file count: beyond
    # a threshold, distribute it over the executors (the same move
    # Spark's own mergeSchema makes) -- at 100 TB the table is thousands
    # of part files and a driver-side loop becomes the bottleneck the
    # pruning exists to remove. pyarrow filesystems are picklable, so
    # the same handle ships to the executors.
    if len(files) > 64:
        flags = (
            spark.sparkContext.parallelize(files, 32)
            .map(lambda p: (p, _ts_file_survives(p, ops, fs)))
            .collect()
        )
        keep = [p for p, ok in sorted(flags) if ok]
    else:
        keep = [f for f in files if _ts_file_survives(f, ops, fs)]
    if not keep:
        # Spark cannot read zero paths; one file + the pushed predicate
        # yields the correct empty result.
        keep = files[:1]
    if len(keep) == len(files):
        return None
    return [_respell(src, root, p) for p in keep]


def _hive_partition_cols(src: str, files: list[str]) -> list[str]:
    """Partition column names appearing as ``name=value`` path segments
    between the table root ``src`` and the data files (discovery order,
    deduped)."""
    base = src.rstrip("/")
    cols: list[str] = []
    for f in files:
        if not f.startswith(base + "/"):
            continue
        for seg in f[len(base) + 1:].split("/")[:-1]:
            if "=" in seg:
                name = seg.split("=", 1)[0]
                if name and name not in cols:
                    cols.append(name)
    return cols


def _glob_escape(p: str) -> str:
    """Backslash-escape Hadoop glob metacharacters in an engine-generated
    explicit file path. Spark's multi-path read GLOB-expands every path
    it is handed: a foreign-written partition dir carrying a literal
    ``[`` made the bounded read CRASH (``PATH_NOT_FOUND`` -- the glob
    matches nothing, while the unpruned directory read of the same
    table works), and a literal ``*`` silently matched MORE files than
    the pruner chose (round-12 probe). Spark's own writer
    percent-escapes these in dir names, but Hive's escaping set
    differs and the lake contract is writer-agnostic -- the engine's
    explicit lists name exact files and must never re-glob."""
    import re

    return re.sub(r"([{}\[\]*?\\])", r"\\\1", p)


#: Whole-table schema per table root, captured once per process (round-12
#: ADVICE: the partition-parity metadata pass re-listed the ENTIRE table on
#: every pruned read -- on a large object-store table that full listing can
#: erase much of the pruning win). Staleness tradeoff, documented: a table
#: REWRITTEN in place with different partition-value spellings mid-process
#: serves the captured types until :func:`clear_lake_schema_cache`; new
#: FILES under the same root do not change the cached types unless they
#: introduce a type-flipping spelling (the rare case the cache trades away).
_LAKE_SCHEMA_CACHE: dict[str, dict[str, T.DataType]] = {}

#: Partition spellings that already TRIGGERED a cache re-inference per
#: table root (round-14 ADVICE: a later-added directory with a
#: type-flipping spelling -- cached INT for ``p``, new dir ``p=1x`` --
#: cast the raw string to the stale cached type and produced silent
#: NULL partition values; the pruned read now revalidates every
#: spelling in its file list against the cached types and re-infers
#: once when one cannot cast). The memo caps the cost: a spelling that
#: legitimately survives Spark's cast but fails the conservative
#: driver-side check re-lists the table at most ONCE, not per read.
_LAKE_SCHEMA_REVALIDATED: dict[str, set[tuple[str, str]]] = {}

#: Serializes the brief partition-type-inference conf toggle below across
#: the ENGINE'S OWN threads. Reads issued by foreign threads on the same
#: SparkSession during the window would still see inference off -- the
#: engine's contract is a single-threaded driver (every entry point in
#: this repo runs reads sequentially); documented rather than isolated
#: because a per-read spark.newSession() would detach the returned plan
#: from the caller's session state (temp views, conf) for a hazard the
#: deployment shape does not have.
_INFERENCE_TOGGLE_LOCK = threading.Lock()


def clear_lake_schema_cache() -> None:
    """Drop the cached whole-table schemas (call after rewriting a table
    in place with different partition-value spellings)."""
    _LAKE_SCHEMA_CACHE.clear()
    _LAKE_SCHEMA_REVALIDATED.clear()


def _partition_spellings(
    src: str, files: list[str], part_cols: list[str]
) -> set[tuple[str, str]]:
    """(column, raw-spelling) pairs appearing as hive segments between
    the table root and the given data files."""
    base = src.rstrip("/")
    wanted = {c.lower(): c for c in part_cols}
    out: set[tuple[str, str]] = set()
    for f in files:
        if not f.startswith(base + "/"):
            continue
        for seg in f[len(base) + 1:].split("/")[:-1]:
            if "=" in seg:
                name, value = seg.split("=", 1)
                col = wanted.get(name.lower())
                if col is not None:
                    out.add((col, value))
    return out


def _spelling_casts(value: str, dtype: T.DataType | None) -> bool:
    """Conservative driver-side castability probe: True only when the
    raw hive spelling definitely survives ``CAST(value AS dtype)``
    non-null. False triggers a whole-table re-inference -- always safe
    (it is exactly Spark's own typing pass), just one extra listing --
    so unknown-here formats err toward False. Types outside partition
    inference's output universe (int/long/double/decimal/date/
    timestamp/string) are trusted: a cached exotic type means explicit
    schema intent, not inference gone stale."""
    import datetime
    import re
    from decimal import Decimal, InvalidOperation
    from urllib.parse import unquote

    v = unquote(value)
    if v == "__HIVE_DEFAULT_PARTITION__":
        return True  # the null spelling: NULL under every typing
    if dtype is None or isinstance(dtype, T.StringType):
        return True
    # Strict spellings only (round-15 advisor find): Python's parsers are
    # MORE permissive than Spark's CAST for some forms -- int('1_0'),
    # int(' 42'), float('inf'), and (py3.11+) date.fromisoformat
    # ('20260101') all parse while Spark casts them to NULL -- so a
    # type-flipping spelling in those shapes slipped past the probe and
    # reproduced exactly the silent-NULL partition values the
    # revalidation exists to catch. Rejecting a castable spelling is
    # always safe (False just re-runs whole-table inference), so every
    # numeric/temporal branch gates on a regex strictly no more
    # permissive than Spark's cast before the Python parse.
    try:
        if isinstance(
            dtype, (T.IntegerType, T.LongType, T.ShortType, T.ByteType)
        ):
            if not re.fullmatch(r"[+-]?\d+", v):
                return False
            int(v)
        elif isinstance(dtype, (T.DoubleType, T.FloatType, T.DecimalType)):
            # plain decimal/scientific notation only: no underscores, no
            # whitespace padding, no inf/nan spellings
            if not re.fullmatch(r"[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?", v):
                return False
            if isinstance(dtype, T.DecimalType):
                Decimal(v)
            else:
                float(v)
        elif isinstance(dtype, T.DateType):
            if not re.fullmatch(r"\d{4}-\d{2}-\d{2}", v):
                return False  # dashed ISO form only (no '20260101')
            datetime.date.fromisoformat(v)
        elif isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
            if not re.match(r"\d{4}-\d{2}-\d{2}([ T]|$)", v):
                return False  # dashed date prefix, no whitespace padding
            datetime.datetime.fromisoformat(v)
        elif isinstance(dtype, T.BooleanType):
            if v.strip().lower() not in ("true", "false", "0", "1"):
                return False
    except (ValueError, ArithmeticError, InvalidOperation):
        return False
    return True


def _read_explicit_files(
    spark: SparkSession, src: str, files: list[str], *, merge_schema: bool = False
) -> DataFrame:
    """Read an EXPLICIT file subset of table ``src`` with partition
    columns typed and canonicalized exactly as the WHOLE-table read
    types them.

    Why (round-12 probe, measured as silent corruption): Spark infers a
    partition column's TYPE from the partition values present in the
    file index. An explicit subset (a bounds-pruned read, or one
    generation of an evolving lake) re-runs that inference over ONLY
    the subset's values, so a table whose spellings span types
    (``batch=01`` next to ``batch=abc``) answers differently bounded vs
    unbounded: the full read infers STRING and keeps ``'01'``, the
    pruned read infers INT and returns ``1`` -- a different value AND a
    different column type from the same table. Fix: capture the
    whole-table partition schema once per process (a driver metadata
    pass -- data columns resolve from one arbitrary footer under
    ``mergeSchema=false``, partition columns from the full listing,
    which is exactly Spark's own inference; cached in
    :data:`_LAKE_SCHEMA_CACHE` so repeated pruned reads of the same
    table do not re-list it), read the subset with partition-type
    inference OFF (raw spellings), and cast to the whole-table types --
    bit-identical to the unpruned read on every layout. Tables without
    hive-partition segments skip all of this (one string scan of the
    path list). The inference conf is captured at ANALYSIS time
    (probed), so the brief session-conf toggle cannot leak into the
    returned lazy plan; the toggle window is serialized across engine
    threads by :data:`_INFERENCE_TOGGLE_LOCK` (single-threaded-driver
    contract for foreign threads, see the lock's note)."""
    reader = spark.read.option("basePath", src)
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    part_cols = _hive_partition_cols(src, files)  # on RAW paths
    raw_files = files
    files = [_glob_escape(f) for f in files]  # Spark globs every path
    if not part_cols:
        return reader.parquet(*files)
    lake_fields = _LAKE_SCHEMA_CACHE.get(src)
    if lake_fields is not None:
        # Staleness revalidation (round-14 ADVICE): a directory added
        # AFTER the cached inference can carry a spelling the cached
        # type cannot represent (cached INT, new dir ``p=1x``) -- the
        # cast below would then produce silent NULLs where an uncached
        # read re-infers STRING. Any subset spelling that fails the
        # conservative castability probe invalidates the entry and
        # re-runs the whole-table pass (which sees the new directory);
        # the memo ensures a probe-vs-Spark disagreement costs one
        # re-listing total, never one per read.
        seen = _LAKE_SCHEMA_REVALIDATED.setdefault(src, set())
        flipped = {
            s
            for s in _partition_spellings(src, raw_files, part_cols)
            if s not in seen
            and not _spelling_casts(s[1], lake_fields.get(s[0].lower()))
        }
        if flipped:
            seen.update(flipped)
            _LAKE_SCHEMA_CACHE.pop(src, None)
            lake_fields = None
    if lake_fields is None:
        try:
            lake_fields = {
                f.name.lower(): f.dataType
                for f in spark.read.option("mergeSchema", "false")
                .parquet(src)
                .schema.fields
            }
        except Exception as e:  # noqa: BLE001 -- whole-table schema
            # unreadable: keep the subset read's own inference (the
            # pre-round-12 behavior) but say so -- silently reverting
            # reintroduces the inconsistent-typing hazard this function
            # exists to close (round-12 ADVICE: warn, don't swallow)
            import warnings

            warnings.warn(
                f"partition-type parity: whole-table schema pass on "
                f"{src!r} failed ({type(e).__name__}: {e}); the pruned "
                "subset read falls back to its OWN partition-type "
                "inference, which can re-type partition values the "
                "full read spells differently",
                RuntimeWarning,
                stacklevel=2,
            )
            return reader.parquet(*files)
        _LAKE_SCHEMA_CACHE[src] = lake_fields
    key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    with _INFERENCE_TOGGLE_LOCK:
        old = spark.conf.get(key, "true")
        spark.conf.set(key, "false")
        try:
            df = reader.parquet(*files)
        finally:
            spark.conf.set(key, old)
    for c in part_cols:
        t = lake_fields.get(c.lower())
        if t is not None:
            df = df.withColumn(c, F.col(c).cast(t))
    return df


_OPS = {
    ">=": Column.__ge__,
    ">": Column.__gt__,
    "<": Column.__lt__,
    "<=": Column.__le__,
    "=": Column.__eq__,
}

#: Largest epoch-micros value whose nanos form fits int64
#: (9223372036854775 us; *1000 = 9223372036854775000 <= int64 max).
_NANOS_HORIZON_MICROS = ((1 << 63) - 1) // 1000

_INT_BITS = {"tinyint": 8, "smallint": 16, "int": 32, "bigint": 64}


def _normalize_bound(op: str, value, dtype: str):
    """Rewrite a bound literal that is NOT exactly representable in the
    column's dtype into an equivalent exact comparison, or decide it as
    a constant. Returns None (keep the plain ``lit(value).cast(dtype)``
    path -- literal exactly representable, dtype not discrete, or value
    unparseable here), ``("drop",)`` (predicate always true),
    ``("empty",)`` (always false), or ``(op2, literal_column)``.

    Why (round-11 probe, all three measured as silent wrong answers):
    ``lit(v).cast(dtype)`` makes the comparison exact only when ``v``
    IS a dtype value. On discrete dtypes it is lossy three ways --
    - DECIMAL(p,s): an out-of-range bound (``< 1e11`` on (12,2) as an
      effectively-open range) casts to NULL under ANSI-off and the
      filter silently kept 0 of 100 rows (ANSI: loud);
    - integers: a fractional bound truncates toward zero, so
      ``< 2.5`` became ``< 2`` (dropped v=2) and ``>= 2.5`` became
      ``>= 2`` (phantom v=2);
    - DATE: a sub-day bound truncates, so ``< '1996-01-03 12:00'``
      became ``< 1996-01-03`` (dropped the whole matching day).
    Every column value is exactly representable in its own dtype, so
    each case is decidable: out-of-range bounds saturate, between-value
    bounds shift to the adjacent representable value with the op
    closed/opened to match (``v < B`` == ``v <= floor(B)`` when B is
    strictly between representable values). The rewritten comparison is
    still a bare attribute-vs-literal predicate, so pushdown survives.
    """
    import re
    from decimal import ROUND_FLOOR, Decimal, InvalidOperation, localcontext

    m = re.fullmatch(r"decimal\((\d+),(\d+)\)", dtype)
    if m or dtype in _INT_BITS:
        if isinstance(value, bool) or not isinstance(
            value, (int, float, str, Decimal)
        ):
            return None
        try:
            big = value if isinstance(value, Decimal) else Decimal(str(value))
        except (InvalidOperation, ValueError):
            return None
        if not big.is_finite():
            return None
        if m:
            p, s = int(m.group(1)), int(m.group(2))
            step = Decimal(1).scaleb(-s)
            max_v = Decimal(10) ** (p - s) - step
            min_v = -max_v
        else:
            step = Decimal(1)
            max_v = Decimal((1 << (_INT_BITS[dtype] - 1)) - 1)
            min_v = Decimal(-(1 << (_INT_BITS[dtype] - 1)))
        if big > max_v:
            return ("drop",) if op in ("<", "<=") else ("empty",)
        if big < min_v:
            return ("drop",) if op in (">", ">=") else ("empty",)
        # wide precision: decimal(38,18) floors need ~60 significant
        # digits; the default context (28) would round or raise
        with localcontext() as ctx:
            ctx.prec = 100
            floor = big.quantize(step, rounding=ROUND_FLOOR)
        if floor != big:  # strictly between representable values
            if op == "=":
                return ("empty",)
            exact = floor if op in ("<", "<=") else floor + step
            op = "<=" if op in ("<", "<=") else ">="
            big = exact
        lit = (
            F.lit(str(big)).cast(dtype) if m else F.lit(int(big)).cast(dtype)
        )
        return (op, lit)
    if dtype == "date":
        # str AND datetime/pandas-Timestamp spellings: a sub-day bound is
        # lossy through lit().cast('date') whichever way it is spelled
        # (round-11 ADVICE: the str-only gate left the datetime spelling
        # silently truncating). A pure datetime.date value is midnight by
        # construction, so it falls through rem==0 to the exact plain cast.
        micros = _bound_to_micros(value)
        if micros is None:
            return None
        days, rem = divmod(micros, 86_400_000_000)
        if rem == 0:
            return None  # midnight: the plain cast is already exact
        if op == "=":
            return ("empty",)
        from datetime import date, timedelta

        shift = 0 if op in ("<", "<=") else 1
        d = date(1970, 1, 1) + timedelta(days=days + shift)
        op = "<=" if op in ("<", "<=") else ">="
        return (op, F.lit(d.isoformat()).cast("date"))
    return None


def _nanos_saturation(value, tz_is_utc: bool) -> str | None:
    """Classify a bound literal against the int64-nanos horizon
    (1677-09-21 .. 2262-04-11): ``"high"``/``"low"`` when the literal's
    nanos form provably cannot fit int64, None when it fits (or cannot
    be parsed here -- the Spark-side literal then resolves as before).

    Why: ``_nanos_bound_literal`` multiplies epoch-micros by 1000 in
    int64. A semantically valid bound beyond the horizon (``ts <
    '2300-01-01'`` as an effectively-open upper bound) overflowed that
    multiply -- ARITHMETIC_OVERFLOW under ANSI, and under ANSI-off a
    silent WRAP to a negative literal that kept 0 of the matching rows
    (round-11 probe; every stored nanos value fits int64 by
    construction, so a beyond-horizon bound is decidable without
    touching data). Parsing here is UTC; a non-UTC session can shift
    the true literal by up to ~14h, so saturation then needs a one-day
    margin and the sliver inside it raises rather than guessing.
    """
    # str AND datetime/pandas-Timestamp spellings (round-11 ADVICE: the
    # str-only gate let a datetime bound beyond the horizon reach the
    # int64 multiply -- overflow under ANSI, silent wrap under ANSI-off)
    micros = _bound_to_micros(value)
    if micros is None:
        return None
    margin = 0 if tz_is_utc else 86_400_000_000
    if micros > _NANOS_HORIZON_MICROS + margin:
        return "high"
    if micros < -_NANOS_HORIZON_MICROS - margin:
        return "low"
    if margin and not -_NANOS_HORIZON_MICROS + margin <= micros <= (
        _NANOS_HORIZON_MICROS - margin
    ):
        raise ValueError(
            f"bound literal {value!r} lies within one day of the "
            "int64-nanos horizon and the session timezone is not UTC; "
            "cannot decide saturation safely -- use a UTC session or an "
            "open bound"
        )
    return None


def _parse_bounds(bounds: dict[str, tuple] | None) -> dict[str, list]:
    """Normalize the public ``bounds`` spec (``(lo, hi)`` half-open range
    or ``((op, value), ...)``) to ``{col: [(op, value), ...]}``."""
    preds_by_col: dict[str, list] = {}
    for c, spec in (bounds or {}).items():
        if spec and isinstance(spec[0], (tuple, list)):
            preds_by_col[c] = [(op, v) for op, v in spec]
        else:
            lo, hi = spec
            preds_by_col[c] = []
            if lo is not None:
                preds_by_col[c].append((">=", lo))
            if hi is not None:
                preds_by_col[c].append(("<", hi))
    return preds_by_col


def _apply_bounds(
    df: DataFrame,
    preds_by_col: dict[str, list],
    *,
    nanos_cols: frozenset[str] | set[str] = frozenset(),
) -> DataFrame:
    """Apply parsed bounds on RAW scan columns as bare
    attribute-vs-literal comparisons (the pushdown-preserving shape).
    ``nanos_cols`` are columns that, when they surface as BIGINT, carry
    nanos-since-epoch and compare against a nanos literal; every other
    column gets a typed literal cast that folds at optimize time.
    Column names resolve case-insensitively (writer spelling varies;
    bounds keys are the contract's lowercase)."""
    actual = {c.lower(): c for c in df.columns}
    dtypes = {c.lower(): t for c, t in df.dtypes}
    for c, preds in preds_by_col.items():
        key = c.lower()
        src_col = actual.get(key)
        if src_col is None:
            raise KeyError(f"bounds column {c!r} not in {list(df.columns)}")
        dtype = dtypes[key]
        for op, value in preds:
            if key in nanos_cols and dtype == "bigint":
                # LONG-nanos physical layout: compare in the nanos
                # domain so the predicate stays a bare
                # attribute-vs-literal comparison the parquet source
                # can prune row groups with (folds to a bigint literal
                # at optimize time, in the session timezone). A bound
                # beyond the int64-nanos horizon saturates: every
                # stored value fits int64, so the comparison is
                # decidable as a constant (the multiply would
                # otherwise overflow -- loud under ANSI, silently
                # WRONG under ANSI-off).
                sat = _nanos_saturation(
                    value,
                    _session_tz_is_utc(
                        df.sparkSession.conf.get(
                            "spark.sql.session.timeZone", ""
                        )
                    ),
                )
                if sat is not None:
                    always = (sat == "high" and op in ("<", "<=")) or (
                        sat == "low" and op in (">", ">=")
                    )
                    if not always:
                        df = df.filter(F.lit(False))
                    continue
                lit = _nanos_bound_literal(value)
            else:
                # Typed literal on the raw column (timestamp_ntz,
                # timestamp, decimal, double...). The cast folds to a
                # literal at optimization time, so the predicate pushes
                # down unchanged. Literals not exactly representable in
                # a DISCRETE dtype (out-of-range decimal/int bounds,
                # fractional bounds on integers, sub-day bounds on
                # dates) are first rewritten into an equivalent exact
                # comparison -- the plain cast silently truncated them
                # (see _normalize_bound).
                norm = _normalize_bound(op, value, dtype)
                if norm is not None:
                    if norm[0] == "drop":
                        continue
                    if norm[0] == "empty":
                        df = df.filter(F.lit(False))
                        continue
                    op, lit = norm
                else:
                    lit = F.lit(value).cast(dtype)
            df = df.filter(_OPS[op](F.col(src_col), lit))
    return df


def read_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    *,
    bounds: dict[str, tuple] | None = None,
) -> DataFrame:
    """Read one driver testdata table, normalizing types.

    ``events.ts`` may arrive two ways depending on how the parquet was
    written:

    - TIMESTAMP(NANOS): with ``spark.sql.legacy.parquet.nanosAsLong=true``
      it reads as LONG nanos-since-epoch. Convert via integer division
      (``div`` -- a double division would lose precision above
      2**53 ns ~ 1970+104 days).
    - ``timestamp[us]`` without a timezone marker (the driver testdata's
      actual encoding): Spark reads TIMESTAMP_NTZ, which ``unix_micros``
      and ``withWatermark`` both refuse. Cast to TIMESTAMP (LTZ); the
      session timezone is pinned to UTC (session.py), so the cast is a
      lossless relabel of the same instant.

    ``bounds`` -- optional ``{column: (lo, hi)}`` range predicates,
    ``lo`` inclusive / ``hi`` exclusive, either side ``None`` for open;
    or, for other comparison shapes, ``{column: ((op, value), ...)}``
    with ``op`` in ``>= > < <= =``.
    They are applied on the RAW scan column, BELOW the normalization
    conversions, with the literal rewritten into the column's source
    domain (nanos integer for a LONG-nanos timestamp, a typed
    timestamp/decimal literal otherwise). This is the scan-pruning path
    for hot filter columns: a predicate applied *after* ``read_table``
    still answers correctly on every layout (round-8 invariance certs),
    but on a nanos- or DECIMAL-written corpus it sits above a conversion
    expression that Catalyst cannot translate into ``PushedFilters`` --
    invisible at sf0.01, a full-scan at 100 TB. Queries whose hot path
    slices a canonical date/money column pass ``bounds`` instead
    (``tests/test_plan_shapes.py`` pins PushedFilters on all three
    physical layouts).

    What the handshake actually buys, MEASURED per physical type
    (round-10, tools/rowgroup_pruning_probe.py -- ``PushedFilters`` is
    necessary but NOT sufficient; the parquet-level conversion can
    silently decline):

    - DECIMAL money: bounds delivers real row-group pruning (6.7x fewer
      scan rows on the probe corpus); the post-filter form reads all.
    - double/long/int: both forms prune (Catalyst pushes the bare
      comparison either way).
    - isAdjustedToUTC µs/ms timestamps: both forms prune.
    - NTZ µs/ms (the DRIVER CORPUS encoding) and NANOS timestamps:
      parquet DECLINES the row filter regardless of bounds -- so for
      bounded canonical timestamp columns on MULTI-FILE tables,
      ``read_table`` additionally FILE-prunes from footer statistics
      (:func:`_prune_files_for_ts_bounds`): at 100 TB the table is
      thousands of part files and the file is the recoverable unit.
      Conservative: stats-less files are kept, non-UTC sessions and
      single-file tables skip the pass.
    """
    src = f"{sf_dir}/{name}.parquet"
    # Atomically-published zone (write_parquet(atomic=True) /
    # matview.publish_snapshot): a `_current` pointer names the
    # published immutable snapshot dir -- resolve it here so a
    # versioned zone reads exactly like a plain directory (a direct
    # spark.read.parquet of the zone root would instead UNION every
    # version and surface `v` as a partition column). One os.path
    # probe per read on local paths; Hadoop FS on remote schemes.
    from iot_data_pipeline_spark.sources.matview import resolve_snapshot_dir

    resolved = resolve_snapshot_dir(spark, src)
    if resolved is not None:
        src = resolved
    ts_cols = set(TIMESTAMP_COLUMNS.get(name, ()))
    preds_by_col = _parse_bounds(bounds)
    # FILE-level pruning for bounded canonical timestamp columns: Spark's
    # parquet reader declines the row-group filter on NTZ/NANOS-encoded
    # files (see _prune_files_for_ts_bounds), so the footer pass here is
    # the only scan pruning those layouts get.
    pruned = None
    ts_preds = {c: p for c, p in preds_by_col.items() if c in ts_cols}
    if ts_preds:
        pruned = _prune_files_for_ts_bounds(spark, src, name, ts_preds)
    if pruned:
        # explicit leaf files: basePath keeps partition columns inferred,
        # and _read_explicit_files pins their TYPES to the whole-table
        # inference (round-12 probe: a pruned subset re-ran inference
        # over only its own partition values, silently re-typing
        # batch=01 from string '01' to int 1).
        df = _read_explicit_files(spark, src, pruned)
    else:
        df = spark.read.parquet(src)
    # Canonical name-case normalization: column-name CASE is a writer
    # choice (an Oracle/Snowflake-bred exporter upper-cases every
    # identifier). Spark RESOLVES references case-insensitively but
    # PRESERVES the stored spelling in outputs and in pandas-UDF batch
    # columns (which are case-sensitive), so an uppercase corpus leaked
    # the writer's spelling into results and broke Python kernels
    # (round-9 --upper sweep). One rename projection at the scan -- a
    # bare-attribute alias, transparent to filter pushdown -- pins the
    # engine contract's lowercase names; duck_connection aliases its
    # views identically.
    lower = [c.lower() for c in df.columns]
    if lower != list(df.columns):
        if len(set(lower)) != len(lower):
            # Writer emitted columns differing only by case ("Id" and
            # "ID"): renaming would mint duplicate names and defer the
            # failure to a confusing ambiguous-reference error far from
            # the read boundary (round-9 ADVICE). Fail here, by name.
            # (Case-insensitive sessions reject such a footer at the
            # scan itself; this guard is the case-SENSITIVE-session
            # path, where the scan succeeds.)
            dupes = sorted({c for c in lower if lower.count(c) > 1})
            raise ValueError(
                f"{name}: column names collide after lowercase "
                f"normalization: {dupes} (source columns {list(df.columns)})"
            )
        df = df.toDF(*lower)
    dtypes = dict(df.dtypes)
    df = _apply_bounds(df, preds_by_col, nanos_cols=ts_cols)
    for c in ts_cols:
        dtype = dtypes.get(c)
        if dtype == "bigint":
            df = df.withColumn(
                c, F.timestamp_micros(F.expr(f"{c} div 1000"))
            )
        elif dtype == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
        elif dtype == "date":
            # DATE32-encoded canonical timestamp column (the Hive/Trino
            # writer default for date-granular values like o_orderdate /
            # l_shipdate). The contract types these TIMESTAMP; left as
            # DATE, the logical type leaks into downstream plans where
            # Spark and the oracle diverge (round-12 sweep: date_trunc
            # returns DATE in DuckDB but TIMESTAMP in Spark, date+interval
            # arithmetic changes type, projections emit date where every
            # other layout emits timestamp). Midnight-UTC cast under the
            # pinned UTC session -- lossless, same read-boundary move as
            # ntz->ltz above; duck_connection applies the identical cast.
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    # Canonical logical schema normalization: the engine's contract types
    # every numeric measure as DOUBLE (TESTDATA.md -- no table carries
    # DECIMAL), but a lake's writers routinely store money as parquet
    # DECIMAL(p,s). Left unnormalized, decimal types propagate through
    # arithmetic into final projections (raw-DecimalType output, which
    # the oracle harness rejects) and decimal-vs-double summation
    # diverges in the last ulp. One columnar cast at the scan boundary
    # (free under whole-stage codegen) makes every downstream plan
    # invariant to the writer's numeric physical type; the DuckDB oracle
    # applies the same cast in its view definitions
    # (tests/oracle_harness.duck_connection), so both engines compute on
    # identical values. Queries that WANT exact decimal arithmetic
    # opt in explicitly downstream (the q72/q164 DECIMAL recipe).
    #
    # Scale-0 decimals (DECIMAL(p,0) surrogate keys / ids) cast to
    # BIGINT, not DOUBLE: a DECIMAL(18,0) key above 2**53 would silently
    # lose integer precision in a double and corrupt joins. p > 18 does
    # not fit a long, so it stays DECIMAL (exactness over convenience --
    # the no-raw-decimal-output rule then forces any query that emits it
    # to cast explicitly). If the column is actually a whole-unit
    # measure, a SUM that overflows BIGINT fails loudly rather than
    # wrapping: session.py pins spark.sql.ansi.enabled=true for exactly
    # this hazard (round-9 ADVICE).
    #
    # NOTE on pushdown: filters applied ABOVE these casts are generally
    # NOT translated into PushedFilters (Catalyst only unwraps a narrow
    # family of casts in comparisons); answers stay correct, but scan
    # pruning on that column is lost. Range predicates on normalized
    # columns belong in ``bounds`` (applied on the raw column, above).
    from pyspark.sql import types as _T

    for f in df.schema.fields:
        if not isinstance(f.dataType, _T.DecimalType):
            continue
        if f.dataType.scale == 0:
            if f.dataType.precision <= 18:
                df = df.withColumn(f.name, F.col(f.name).cast("bigint"))
            # p > 18, scale 0: keep exact DECIMAL (see note above)
        else:
            df = df.withColumn(f.name, F.col(f.name).cast("double"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {name: read_table(spark, sf_dir, name) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Register each testdata table as a temp view for ``spark.sql`` entry."""
    dfs = load_tables(spark, sf_dir, names)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = SENSOR_SCHEMA,
    keep_corrupt: bool = True,
) -> DataFrame:
    """JSONL scan with corrupt-record routing (reference A1/A4/A5/A13).

    Returns a frame with the declared columns plus ``_corrupt_record``
    (non-NULL for lines that failed to parse as a JSON object). Callers
    split good/bad with :func:`split_corrupt`. Mirrors the reference's
    behavior: malformed lines are captured, never fail the job
    (app/app.py:62-65); non-object top-level values are rejected
    (app/app.py:43-45) -- Spark's JSON reader routes those to the corrupt
    column under PERMISSIVE mode.
    """
    full = schema
    if keep_corrupt and CORRUPT_COL not in schema.fieldNames():
        full = T.StructType(schema.fields + [T.StructField(CORRUPT_COL, T.StringType())])
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a PERMISSIVE-read frame into (good, bad) frames.

    ``bad`` carries only the raw line (dead-letter channel, the engine
    realization of the reference's planned DLQ, reference README.md:215).
    Blank/whitespace-only lines never surface here -- Spark's JSON
    source skips them at the scan (measured, round 11), matching the
    reference's own skip (app/app.py:35-37). The all-NULL drop
    therefore governs FIELD-LESS records: ``{}``, all-explicit-null
    objects, and objects carrying only non-contract fields. Documented
    DIVERGENCE (round-11 probe, pinned in
    tests/test_sources.py::test_jsonl_fieldless_records_dropped): the
    reference passes such dicts through (its output would be
    ``{"processed_timestamp": ...}`` alone); the engine's schema
    contract drops them -- a record with no contract field carries
    nothing downstream, and the reference's own README validation
    (A20) would reject it there.

    The parsed frame is cached: Spark refuses to answer queries that
    reference only the internal corrupt-record column of a raw JSON scan
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), and the cache
    also makes the one-pass parse serve both output frames.
    """
    # transient (round-15): registered so batch drivers can unpersist
    # after the consuming query's action -- a bare .cache() here pinned
    # one CacheManager entry per corrupt-split read for the session's
    # lifetime (guide section 5). The cache itself stays mandatory (see
    # the docstring paragraph above).
    from iot_data_pipeline_spark.transient import transient_persist

    df = transient_persist(df)
    data_cols = [c for c in df.columns if c != CORRUPT_COL]
    all_null = F.lit(True)
    for c in data_cols:
        all_null = all_null & F.col(c).isNull()
    # ``bad`` must stay executable WITHOUT the cache: a plan referencing
    # ONLY the corrupt column of a raw JSON scan is refused outright
    # (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), so a caller
    # that first executes ``bad`` after release_transient_caches() died on
    # an AnalysisException (round-15 ADVICE, reproduced). The coalesce
    # keeps a genuine data-column reference in the projection -- the
    # filter guarantees the corrupt column is non-null, so the fallback
    # branch never evaluates and the output is byte-identical -- while
    # blocking the corrupt-only column pruning that triggers the refusal.
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.coalesce(
            F.col(CORRUPT_COL), F.to_json(F.struct(*data_cols))
        ).alias("raw_line")
    )
    good = df.filter(F.col(CORRUPT_COL).isNull() & ~all_null).select(*data_cols)
    return good, bad


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    multiline: bool = False,
    keep_corrupt: bool = False,
) -> DataFrame:
    """CSV scan with a declared schema (B2). No inference: at scale an
    inference pass is a second full read of the input.

    EMBEDDED NEWLINES (round-10 probe, frozen in
    tests/test_sources.py::test_read_csv_embedded_newlines): Spark's CSV
    WRITER quotes fields containing newlines, but the default line-mode
    READER splits records on raw newlines before the quote parser runs,
    so a quoted multi-line field silently TRUNCATES at the newline and
    its continuation lines surface as phantom rows -- the engine's own
    write->read round-trip corrupts. Two remedies, by data contract:

    - ``multiline=True``: the correct parse when text fields may contain
      newlines. Scale trade-off: a multiLine CSV file is not splittable
      (one parse stream per file; files still parallelize across tasks),
      so prefer it for many-modest-files layouts, and prefer parquet for
      anything big.
    - ``keep_corrupt=True`` (line mode): appends a ``_corrupt_record``
      column (the read_jsonl/A13 dead-letter channel; pair with
      :func:`split_corrupt`). Continuation fragments land there instead
      of passing as silent NULL rows, so the corruption is at least
      DETECTED -- the truncated first fragment still parses, which is
      why multiline is the fix and this is only the tripwire.
    """
    full = schema
    if keep_corrupt and CORRUPT_COL not in schema.fieldNames():
        full = T.StructType(
            schema.fields + [T.StructField(CORRUPT_COL, T.StringType())]
        )
    reader = (
        spark.read.option("header", str(header).lower())
        .schema(full)
        .option("mode", "PERMISSIVE")
        .option("multiLine", str(multiline).lower())
    )
    if keep_corrupt:
        reader = reader.option("columnNameOfCorruptRecord", CORRUPT_COL)
    return reader.csv(path)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Raw media ingest via the ``binaryFile`` source (B48 plumbing): one
    row per file with ``path``, ``modificationTime``, ``length``,
    ``content: binary`` -- the entry point that turns an object-store
    prefix of images/audio into the opaque-payload column
    ``operators/multimodal.py`` transforms.

    Scale notes: listing parallelizes across executors; pair with
    ``spark.sql.files.maxPartitionBytes`` so many small media files pack
    into one task, and filter on ``length`` BEFORE any decode so oversized
    payloads never reach Python. ``glob`` maps to ``pathGlobFilter``
    (pushdown at the listing, not a post-filter).
    """
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def read_parquet_evolving(
    spark: SparkSession,
    path: str,
    target_schema: T.StructType,
    *,
    bounds: dict[str, tuple] | None = None,
) -> DataFrame:
    """Schema-evolution read with contract enforcement: merge the footers
    of every file generation under ``path`` (``mergeSchema`` -- columns
    added over time union instead of erroring), then align the result to
    ``target_schema``: missing columns materialize as typed NULLs,
    columns outside the contract are dropped, and every kept column is
    cast to the contract type.

    This is the standard "old files lack the new column / stray writer
    added an extra one" read for a long-lived data lake. Scale notes:
    mergeSchema unions FOOTERS (metadata, driver-side), not data; the
    NULL backfill and casts are per-row projections in the same codegen
    span as the scan, and column pruning still reaches parquet for
    contract columns.

    VALUE-TYPE evolution (round-10 probe, tools/schema_evolution_probe.py):
    Spark's footer merge refuses any type change -- an int32-narrowed
    generation later widened back, a TIMESTAMP(NANOS) generation (which
    ``nanosAsLong`` surfaces as BIGINT), or a DECIMAL-retyped money
    column all raise ``CANNOT_MERGE_SCHEMAS`` and the lake becomes
    unreadable, even though every generation individually satisfies the
    contract after a cast. On that error this read falls back to
    per-schema-group scans: group the files by footer schema (a
    metadata-only pass), read each group homogeneously, align each to
    the contract, and ``unionByName`` -- ONE scan per generation schema,
    not per file, so the plan stays small and filters/pruning still push
    into every branch (Catalyst pushes predicates through Union). The
    footer pass also recovers what the merged read cannot see: a
    parquet TIMESTAMP(NANOS) column arrives in Spark as bare BIGINT, but
    the arrow footer says ``timestamp[ns]``, so the fallback converts
    nanos -> timestamp exactly (integer div) instead of misreading the
    longs as seconds. Since round 11 the MERGED path runs the same
    detection (round-10 ADVICE: a HOMOGENEOUS nanos lake merges fine --
    every footer surfaces the same BIGINT -- and was still seconds-cast):
    any contract timestamp column that merged as BIGINT gets a footer
    probe; all-``timestamp[ns]`` converts exactly, a ns/int64 MIX across
    files raises (per-file semantics differ -- unrecoverable ambiguity,
    fail loud over guessing).

    ``bounds`` -- optional, the :func:`read_table` spec, applied on the
    RAW columns of every generation BEFORE contract alignment so the
    predicates reach ``PushedFilters`` in each Union branch (a filter
    above the alignment casts would not translate). In the
    schema-group fallback the same bound additionally FILE-prunes each
    generation from footer stats on the one metadata pass the grouping
    already makes (UTC-equivalent sessions; str/datetime/date literals
    via :func:`_bound_to_micros` -- the
    :func:`_prune_files_for_ts_bounds` contract); a generation written
    BEFORE the bounded column existed contributes nothing (its rows
    would be NULL-backfilled, and a range predicate on NULL keeps no
    row), enforced post-alignment.

    Since round 11 both paths route listing and footer reads through
    ``pyarrow.fs``: object-store lakes (``s3://``...) get the identical
    evolution/bounds treatment; Spark-only schemes pyarrow cannot
    resolve raise (fallback) or fail loud on ambiguity (merged path)
    rather than silently corrupting.
    """
    preds_by_col = _parse_bounds(bounds)
    # Atomically-published zones resolve to their current snapshot dir
    # first (same boundary move as read_table): evolution generations
    # live INSIDE a snapshot, not across snapshots of the same zone.
    from iot_data_pipeline_spark.sources.matview import resolve_snapshot_dir

    resolved = resolve_snapshot_dir(spark, path)
    if resolved is not None:
        path = resolved
    try:
        df = spark.read.option("mergeSchema", "true").parquet(path)
    except Exception as e:  # noqa: BLE001
        if "CANNOT_MERGE_SCHEMAS" not in str(e):
            raise
        return _read_evolving_by_schema_group(
            spark, path, target_schema, preds_by_col
        )
    nanos = _merged_bigint_ts_nanos_cols(spark, path, df, target_schema)
    # FILE-level pruning on the merged path too: an evolving lake is
    # multi-file by definition, and on NTZ/NANOS encodings the pushed
    # predicates never become row-group filters (the round-10
    # measurement), so the footer pass is the only scan pruning a
    # bounded merged read gets. Same conservative gates as read_table's
    # (_prune_files_for_ts_bounds); the re-read keeps mergeSchema and
    # basePath so evolution and partition columns both survive.
    ts_fields = {
        f.name.lower()
        for f in target_schema.fields
        if isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType))
    }
    ts_preds = {
        c.lower(): p for c, p in preds_by_col.items() if c.lower() in ts_fields
    }
    if ts_preds:
        pruned = _prune_files_for_ts_bounds(spark, path, "<evolving>", ts_preds)
        if pruned:
            df = _read_explicit_files(spark, path, pruned, merge_schema=True)
    # Pre/post split (same as the fallback): a bounded column can vanish
    # from the pruned re-read when every file carrying it was pruned
    # away -- its surviving rows are contract NULLs, so the predicate
    # belongs on the aligned column (keeps nothing), not a KeyError.
    present = {c.lower() for c in df.columns}
    pre = {c: v for c, v in preds_by_col.items() if c.lower() in present}
    post = {c: v for c, v in preds_by_col.items() if c.lower() not in present}
    if pre:
        df = _apply_bounds(df, pre, nanos_cols=nanos)
    adf = _align_to_contract(df, target_schema, nanos_cols=nanos)
    if post:
        adf = _apply_bounds(adf, post)
    return adf


def _footer_probes(
    spark: SparkSession, fs, files: list[str], ops: list[tuple[str, str, int]]
) -> list[tuple[str, tuple[tuple[str, str], ...], bool]]:
    """One metadata-only pass over every footer: ``(path, arrow-type
    fingerprint, survives-bounds)`` per file. Distributed over the
    executors above 64 files (pyarrow filesystems are picklable); footer
    read errors PROPAGATE here -- unlike the best-effort pruner, the
    evolving reader is about to read these files, so an unreadable
    footer is the job's failure, not a keep-decision."""

    def probe(
        p: str,
    ) -> tuple[str, tuple[tuple[str, str], ...], tuple[tuple[str, str], ...], bool]:
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(p, filesystem=fs)
        types = tuple((f.name, str(f.type)) for f in pf.schema_arrow)
        # dotted-leaf-path -> arrow type: the nested nanos-as-bigint
        # disambiguation (nanosAsLong applies inside structs too)
        ptypes = tuple(sorted(_arrow_path_types(pf.schema_arrow).items()))
        survives = _md_survives(pf.metadata, ops) if ops else True
        return p, types, ptypes, survives

    if len(files) > 64:
        return (
            spark.sparkContext.parallelize(files, 32).map(probe).collect()
        )
    return [probe(p) for p in files]


def _merged_bigint_ts_nanos_cols(
    spark: SparkSession, path: str, df: DataFrame, target_schema: T.StructType
) -> frozenset[str]:
    """Round-10 ADVICE fix for the merged (mergeSchema-success) path: a
    homogeneous TIMESTAMP(NANOS) lake surfaces every footer as the SAME
    BIGINT under ``nanosAsLong``, so the merge succeeds -- and the plain
    contract cast then misreads nanos as SECONDS (silent near-epoch
    corruption; ANSI only catches modern values by overflow). Detect:
    for each contract timestamp POSITION whose merged dtype is bigint --
    top-level columns AND nested struct fields / array elements / map
    values (round 12: ``nanosAsLong`` applies inside structs too, and
    the positional struct cast misread nested nanos the same way) --
    probe the footers. All ``timestamp[ns]`` -> exact integer-div
    conversion; a ns/int64 MIX -> ValueError (per-file semantics differ,
    no cast is right for both); all plain int64 -> the documented
    seconds-cast contract stands. Zero cost for lakes without a
    bigint-surfaced timestamp position (the common case: no footer pass
    runs at all). Returns DOTTED lowercase paths (``ts``, ``meta.ts``,
    ``events[]``)."""
    src_fields = {f.name.lower(): f.dataType for f in df.schema.fields}
    suspects: list[str] = []
    for f in target_schema.fields:
        st = src_fields.get(f.name.lower())
        if st is not None:
            suspects += _contract_bigint_ts_paths(
                f.dataType, st, f.name.lower()
            )
    if not suspects:
        return frozenset()
    fs, root = _pafs_for(path)
    files = _list_parquet_files(fs, root) if fs is not None else None
    if not files:
        raise NotImplementedError(
            f"contract timestamp position(s) {suspects} surfaced as BIGINT "
            f"but the footers of {path!r} are not reachable via pyarrow.fs "
            "to disambiguate nanos vs plain int64; refusing the silent "
            "seconds-cast"
        )
    probes = _footer_probes(spark, fs, files, ops=[])
    nanos: set[str] = set()
    for p in suspects:
        seen = {
            t
            for _f, _types, ptypes, _s in probes
            for pp, t in ptypes
            if pp == p
        }
        ns = {t for t in seen if t.startswith("timestamp[ns")}
        others = seen - ns
        if ns and others:
            raise ValueError(
                f"position {p!r} under {path!r} is timestamp[ns] in some "
                f"files and {sorted(others)} in others; per-file semantics "
                "differ -- no single cast is correct, split the lake"
            )
        if ns:
            nanos.add(p)
    return frozenset(nanos)


def _arrow_path_types(schema_arrow) -> dict[str, str]:
    """Flatten a pyarrow schema to ``{dotted lowercase leaf path: arrow
    type string}``; array elements append ``[]``, map keys/values
    ``{k}``/``{v}``. The nested twin of the footer fingerprint: the
    nanos-as-bigint disambiguation needs the FILE's logical type at any
    depth, because ``nanosAsLong`` applies inside structs too (round-12
    probe: ``struct<ts: timestamp[ns]>`` surfaces as
    ``struct<ts: bigint>``)."""
    import pyarrow as pa

    out: dict[str, str] = {}

    def walk(t, pre: str) -> None:
        if pa.types.is_struct(t):
            for f in t:
                walk(f.type, f"{pre}.{f.name.lower()}" if pre else f.name.lower())
        elif pa.types.is_list(t) or pa.types.is_large_list(t):
            walk(t.value_type, pre + "[]")
        elif pa.types.is_map(t):
            walk(t.key_type, pre + "{k}")
            walk(t.item_type, pre + "{v}")
        else:
            out[pre] = str(t)

    for f in schema_arrow:
        walk(f.type, f.name.lower())
    return out


def _contract_bigint_ts_paths(
    dst_t: T.DataType, src_t: T.DataType | None, prefix: str
) -> list[str]:
    """Dotted paths where the contract wants TIMESTAMP/NTZ but the
    source surfaces BIGINT -- the positions whose footer logical type
    (nanos vs plain int64) decides the conversion."""
    if isinstance(dst_t, (T.TimestampType, T.TimestampNTZType)):
        return [prefix] if isinstance(src_t, T.LongType) else []
    if isinstance(dst_t, T.StructType) and isinstance(src_t, T.StructType):
        src_fields = {f.name.lower(): f.dataType for f in src_t.fields}
        out: list[str] = []
        for f in dst_t.fields:
            sub = src_fields.get(f.name.lower())
            if sub is not None:
                out += _contract_bigint_ts_paths(
                    f.dataType, sub, f"{prefix}.{f.name.lower()}"
                )
        return out
    if isinstance(dst_t, T.ArrayType) and isinstance(src_t, T.ArrayType):
        return _contract_bigint_ts_paths(
            dst_t.elementType, src_t.elementType, prefix + "[]"
        )
    if isinstance(dst_t, T.MapType) and isinstance(src_t, T.MapType):
        # keys AND values (round-12 ADVICE: a nanos-backed timestamp map
        # KEY fell through to the plain positional cast -- the same
        # silent seconds-misread class, at the key position;
        # _arrow_path_types already emits '{k}' paths for the footer
        # probe to match)
        return _contract_bigint_ts_paths(
            dst_t.keyType, src_t.keyType, prefix + "{k}"
        ) + _contract_bigint_ts_paths(
            dst_t.valueType, src_t.valueType, prefix + "{v}"
        )
    return []


def _nested_cast(col, src_t, dst_t, nanos_paths: frozenset, path: str):
    """Cast a source column/element to its contract type, recursing into
    nested types BY NAME.

    Why not a plain ``.cast`` (the pre-round-12 shape): Spark casts
    struct-to-struct POSITIONALLY and only when field counts match, so
    a generation whose struct gained a field made the whole lake
    unreadable (CAST_WITHOUT_SUGGESTION), a generation with REORDERED
    struct fields would silently swap values, and a missing nested
    field has no NULL-backfill path at all -- while parquet itself is
    a by-name format, and the reader's own top-level alignment is
    by-name. Struct fields resolve case-insensitively with typed-NULL
    backfill for contract fields the generation predates; extra source
    fields drop (contract projection); case-colliding source fields
    fail loudly (the top-level rule, recursed). ``nanos_paths`` are the
    dotted positions where BIGINT carries nanos-since-epoch (from the
    footer's logical types): those convert with integer division at
    any depth -- the plain cast would read them as SECONDS, the silent
    near-epoch corruption the merged-path probe measures."""
    if isinstance(dst_t, (T.TimestampType, T.TimestampNTZType)) and isinstance(
        src_t, T.LongType
    ):
        if path in nanos_paths:
            return F.timestamp_micros(
                F.call_function("div", col, F.lit(1000))
            ).cast(dst_t)
        return col.cast(dst_t)  # plain int64: the documented seconds cast
    if isinstance(dst_t, T.StructType) and isinstance(src_t, T.StructType):
        lower_counts: dict[str, int] = {}
        for f in src_t.fields:
            lower_counts[f.name.lower()] = lower_counts.get(f.name.lower(), 0) + 1
        collisions = sorted(
            low
            for low in (f.name.lower() for f in dst_t.fields)
            if lower_counts.get(low, 0) > 1
        )
        if collisions:
            raise ValueError(
                f"contract struct field(s) {collisions} at {path!r} match "
                "multiple source fields differing only by case; refusing "
                f"to pick one silently (source fields "
                f"{[f.name for f in src_t.fields]})"
            )
        src_fields = {f.name.lower(): f for f in src_t.fields}
        parts = []
        for f in dst_t.fields:
            sf = src_fields.get(f.name.lower())
            if sf is None:
                parts.append(F.lit(None).cast(f.dataType).alias(f.name))
            else:
                parts.append(
                    _nested_cast(
                        col.getField(sf.name),
                        sf.dataType,
                        f.dataType,
                        nanos_paths,
                        f"{path}.{f.name.lower()}",
                    ).alias(f.name)
                )
        # struct() of NULL fields is a non-NULL struct: preserve NULL rows
        return F.when(col.isNull(), F.lit(None).cast(dst_t)).otherwise(
            F.struct(*parts)
        )
    if isinstance(dst_t, T.ArrayType) and isinstance(src_t, T.ArrayType):
        if _needs_nested_cast(src_t.elementType, dst_t.elementType, nanos_paths, path + "[]"):
            return F.transform(
                col,
                lambda x: _nested_cast(
                    x, src_t.elementType, dst_t.elementType, nanos_paths, path + "[]"
                ),
            ).cast(dst_t)
        return col.cast(dst_t)
    if isinstance(dst_t, T.MapType) and isinstance(src_t, T.MapType):
        # keys recurse via transform_keys exactly like values (round-12
        # ADVICE: a struct-typed or nanos-bigint map KEY fell through to
        # the plain positional cast -- value-swap / seconds-misread at
        # the key position). Map keys are non-null by construction, so
        # the struct branch's NULL guard folds away.
        out = col
        if _needs_nested_cast(src_t.keyType, dst_t.keyType, nanos_paths, path + "{k}"):
            out = F.transform_keys(
                out,
                lambda k, _v: _nested_cast(
                    k, src_t.keyType, dst_t.keyType, nanos_paths, path + "{k}"
                ),
            )
        if _needs_nested_cast(src_t.valueType, dst_t.valueType, nanos_paths, path + "{v}"):
            out = F.transform_values(
                out,
                lambda _k, v: _nested_cast(
                    v, src_t.valueType, dst_t.valueType, nanos_paths, path + "{v}"
                ),
            )
        return out.cast(dst_t)
    return col.cast(dst_t)


def _needs_nested_cast(src_t, dst_t, nanos_paths: frozenset, path: str) -> bool:
    """True when the plain Spark cast at this position would be wrong:
    a struct anywhere below (positional cast), or a nanos conversion."""
    if isinstance(dst_t, T.StructType):
        return True
    if isinstance(dst_t, (T.TimestampType, T.TimestampNTZType)) and isinstance(
        src_t, T.LongType
    ):
        return path in nanos_paths
    if isinstance(dst_t, T.ArrayType) and isinstance(src_t, T.ArrayType):
        return _needs_nested_cast(
            src_t.elementType, dst_t.elementType, nanos_paths, path + "[]"
        )
    if isinstance(dst_t, T.MapType) and isinstance(src_t, T.MapType):
        return _needs_nested_cast(
            src_t.keyType, dst_t.keyType, nanos_paths, path + "{k}"
        ) or _needs_nested_cast(
            src_t.valueType, dst_t.valueType, nanos_paths, path + "{v}"
        )
    return False


def _align_to_contract(
    df: DataFrame, target_schema: T.StructType, nanos_cols: frozenset[str]
) -> DataFrame:
    """Project ``df`` onto the contract: case-insensitive name match,
    typed-NULL backfill, contract casts recursing into nested types BY
    NAME (:func:`_nested_cast` -- round 12; the previous whole-column
    cast was positional on structs and crashed on widened ones);
    ``nanos_cols`` are dotted lowercase paths of BIGINT
    nanos-since-epoch positions (top-level column names, or
    ``meta.ts``/``col[]`` for nested ones) converted with integer
    division (a plain cast would read them as seconds).

    Source columns that differ only by case ("Id" and "ID", a
    case-sensitive-session scan of a sloppy writer's footer) and both
    match a contract field fail LOUDLY here: the dict-build otherwise
    silently kept whichever column enumerated last (round-11 probe) --
    the same hazard ``read_table`` already rejects by name at its scan
    boundary."""
    lower_counts: dict[str, int] = {}
    for f in df.schema.fields:
        lower_counts[f.name.lower()] = lower_counts.get(f.name.lower(), 0) + 1
    collisions = sorted(
        low
        for low in (f.name.lower() for f in target_schema.fields)
        if lower_counts.get(low, 0) > 1
    )
    if collisions:
        raise ValueError(
            f"contract column(s) {collisions} match multiple source "
            "columns differing only by case; refusing to pick one "
            f"silently (source columns {[f.name for f in df.schema.fields]})"
        )
    present = {f.name.lower(): f for f in df.schema.fields}
    nanos_paths = frozenset(nanos_cols)
    cols = []
    for field in target_schema.fields:
        sf = present.get(field.name.lower())
        if sf is None:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
        else:
            cols.append(
                _nested_cast(
                    F.col(sf.name),
                    sf.dataType,
                    field.dataType,
                    nanos_paths,
                    field.name.lower(),
                ).alias(field.name)
            )
    return df.select(*cols)


def _read_evolving_by_schema_group(
    spark: SparkSession,
    path: str,
    target_schema: T.StructType,
    preds_by_col: dict[str, list] | None = None,
) -> DataFrame:
    """CANNOT_MERGE_SCHEMAS fallback: one aligned scan per distinct
    footer schema, unioned. Footer fingerprinting is distributed over
    the executors (metadata-only -- pyarrow reads the footer, never row
    groups); the driver collects one (fingerprint, type-map, survives)
    row per FILE, bounded state, and groups. Routed through
    ``pyarrow.fs`` since round 11 (object-store lakes included); each
    group reads with ``basePath`` so PARTITION columns keep being
    inferred from the explicit leaf paths (round-10 ADVICE: a
    partitioned evolving lake silently NULL-backfilled its partition
    keys). ``preds_by_col`` (parsed bounds) additionally file-prunes on
    the same footer pass and pushes per-group raw-column predicates."""
    preds_by_col = preds_by_col or {}
    fs, root = _pafs_for(path)
    if fs is None:
        raise NotImplementedError(
            "per-schema-group evolving read needs footer access via "
            f"pyarrow.fs; the scheme of {path!r} is not resolvable"
        )
    files = _list_parquet_files(fs, root)
    if not files:
        raise FileNotFoundError(f"no parquet files under {path!r}")
    # bounds -> footer keep-ops, under the same contract as
    # _prune_files_for_ts_bounds: UTC-equivalent session only (the
    # micros literals parse as UTC wall time), stats-less/missing
    # columns keep the file.
    ops: list[tuple[str, str, int]] = []
    if preds_by_col and _session_tz_is_utc(
        spark.conf.get("spark.sql.session.timeZone", "")
    ):
        for c, preds in preds_by_col.items():
            for op, value in preds:
                micros = _bound_to_micros(value)
                if micros is not None:
                    ops.append((c.lower(), op, micros))
    probes = _footer_probes(spark, fs, files, ops)
    groups: dict[tuple[tuple[str, str], ...], list[str]] = {}
    group_ptypes: dict[tuple[tuple[str, str], ...], tuple] = {}
    for p, types, ptypes, survives in probes:
        groups.setdefault(types, [])
        group_ptypes[types] = ptypes  # fingerprint-homogeneous per group
        if survives:
            groups[types].append(p)
    aligned = []
    for types, paths in sorted(groups.items()):
        if not paths:
            # every file of this generation provably outside the bounds
            continue
        # dotted nanos paths (nested included -- nanosAsLong applies
        # inside structs); _apply_bounds takes only the top-level subset
        # (bounds address top-level columns)
        nanos_paths = frozenset(
            p for p, t in group_ptypes[types] if t.startswith("timestamp[ns")
        )
        nanos = frozenset(
            p for p in nanos_paths
            if "." not in p and "[]" not in p and "{" not in p
        )
        gdf = _read_explicit_files(
            spark, path, [_respell(path, root, p) for p in paths]
        )
        present = {c.lower() for c in gdf.columns}
        pre = {c: v for c, v in preds_by_col.items() if c.lower() in present}
        post = {c: v for c, v in preds_by_col.items() if c.lower() not in present}
        gdf = _apply_bounds(gdf, pre, nanos_cols=nanos)
        adf = _align_to_contract(gdf, target_schema, nanos_paths)
        if post:
            # generation predates the bounded column: the contract
            # backfills typed NULLs, and a range/equality predicate on
            # NULL keeps no row -- applied on the aligned column so the
            # semantics are exactly that.
            adf = _apply_bounds(adf, post)
        aligned.append(adf)
    if not aligned:
        return spark.createDataFrame([], target_schema)
    out = aligned[0]
    for gdf in aligned[1:]:
        out = out.unionByName(gdf)
    return out
