"""Versioned, atomically-published parquet snapshots (zones + mat views).

A rollup that dashboards hit thousands of times a day must not rescan
the fact table per query -- it gets materialized once per refresh cycle.
The publish step is the part that matters at scale: readers must never
see a half-written snapshot. Without a table format (Delta/Iceberg),
"overwrite in place" is NOT atomic on an object store -- a reader listing
mid-rewrite sees a torn directory, and Spark's ``mode=overwrite`` is
destructive-FIRST (the round-12 SIGKILL probe measured a killed refresh
leaving the zone EMPTY: old data deleted, new write never committed).
This module uses the classic version-directory pattern instead:

    <zone>/v=<N>/part-*.parquet   -- immutable snapshot N
    <zone>/_current               -- tiny pointer file: "N"

A refresh writes the FULL new snapshot under ``v=<N+1>``, then swaps the
pointer (write-temp + rename: rename is atomic on HDFS; on S3 the
single-object copy window is milliseconds on a byte-sized file). Readers
resolve the pointer once at plan time and then only ever list an
immutable directory. Old snapshots stay readable (in-flight queries,
time travel) until ``vacuum`` reclaims them.

Round 13 promotes this from the named-matview API to the default
crash-safe shape for any full-zone refresh: ``write_parquet(...,
atomic=True)`` (sources/sinks.py) publishes through
:func:`publish_snapshot`, and the engine's read boundary
(``read_table`` / the DuckDB oracle views) resolves the pointer
transparently, so a zone written atomically reads exactly like a plain
parquet directory -- but a killed or failed refresh always leaves the
PREVIOUS snapshot fully readable.

Name reservation: the snapshot directory is hive-spelled (``v=<N>``) so
a whole-root ``spark.read.parquet(zone)`` still unions every snapshot
with ``v`` as a partition column (time-travel listing), and readers that
auto-detect hive segments (DuckDB) can identify and drop it. An atomic
zone therefore RESERVES the top-level partition-column name ``v``; data
partition columns keep any other name.

All filesystem access goes through the Hadoop FileSystem API so the same
code runs on file://, hdfs://, and s3a:// paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_POINTER = "_current"


def _parse_pointer(zone: str, text: str) -> int | None:
    """Version number from pointer-file text; None for an empty file.
    Garbage content fails LOUD naming the zone -- the pointer publish is
    temp-write + atomic rename, so a torn pointer should be impossible;
    corruption here means something else wrote the file."""
    text = text.strip()
    if not text:
        return None
    if not text.isdigit():
        raise ValueError(
            f"zone {zone!r}: snapshot pointer file {_POINTER!r} contains "
            f"{text[:40]!r}, not a version number -- the pointer publish "
            "is atomic, so this was written by something else; restore "
            "it to the latest good version (see snapshot_versions) or "
            "delete it to fall back to plain-directory reads"
        )
    return int(text)


def _jpath(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p, jvm


def _view_root(root: str, name: str) -> str:
    return f"{root.rstrip('/')}/{name}"


def _snapshot_dir(zone: str, version: int) -> str:
    return f"{zone.rstrip('/')}/v={version}"


def current_snapshot_version(spark: SparkSession, zone: str) -> int | None:
    """Version the zone's pointer currently publishes, or None if the
    zone has never been atomically published (no ``_current`` file)."""
    fs, p, jvm = _jpath(spark, f"{zone.rstrip('/')}/{_POINTER}")
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        text = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()
    return _parse_pointer(zone, text)


def resolve_snapshot_dir(spark: SparkSession, zone: str) -> str | None:
    """The published snapshot directory for ``zone``, or None when the
    path is not a versioned zone (the plain-directory read applies).

    Local paths short-circuit through ``os.path`` (no py4j round-trip:
    this sits on the engine's read boundary and runs once per table
    read); remote schemes go through the Hadoop FileSystem API.
    """
    import os
    from urllib.parse import unquote, urlsplit

    z = zone.rstrip("/")
    local = None
    if z.startswith("file:"):
        # Proper URI parse (round-14 advisor find): naive prefix
        # stripping turned the authority form 'file://host/tmp/zone'
        # into the RELATIVE string 'host/tmp/zone', so the os.path
        # pointer probe missed, the zone read as plain, and every
        # ensure_plain_zone guard silently bypassed. Empty/localhost
        # authority is the local filesystem; any other authority goes
        # through the Hadoop FileSystem branch (which fails loud on
        # schemes it cannot serve, never silently-plain).
        parts = urlsplit(z)
        if parts.netloc in ("", "localhost"):
            local = unquote(parts.path)
    elif "://" not in z:
        local = z
    if local is not None:
        ptr = os.path.join(local, _POINTER)
        if not os.path.isfile(ptr):
            return None
        with open(ptr, encoding="utf-8") as fh:
            v = _parse_pointer(z, fh.read())
        return None if v is None else _snapshot_dir(z, v)
    v = current_snapshot_version(spark, z)
    return None if v is None else _snapshot_dir(z, v)


def ensure_plain_zone(spark: SparkSession, path: str, op: str) -> None:
    """Refuse to run a plain-layout writer against an atomically-published
    zone: its output would either land invisibly beside the snapshots or
    destroy them under the pointer (both measured, SCALE.md section 7e).
    Writers with their own zone format (streaming ingest, incremental
    rollup) call this once at start."""
    if resolve_snapshot_dir(spark, path) is not None:
        raise ValueError(
            f"{op}: {path!r} is an atomically-published zone (_current "
            "pointer present); this writer manages a plain-layout zone "
            "and would corrupt or bypass the snapshots. Use a separate "
            "directory, or vacuum + remove the pointer to convert the "
            "zone back to plain layout first."
        )


def publish_snapshot(
    spark: SparkSession,
    zone: str,
    df: DataFrame,
    partition_by: tuple[str, ...] = (),
) -> int:
    """Materialize ``df`` as the next snapshot of ``zone`` and publish
    it. Returns the new version number.

    The dataframe is fully written under the new version directory
    BEFORE the pointer moves: a crash or failure anywhere mid-write
    leaves an orphan directory and the pointer still naming the last
    good snapshot (the previous zone state stays fully readable -- the
    frozen crash tests in tests/test_atomic_publish.py kill a publisher
    mid-write and assert exactly that). Publication is the pointer
    swap -- one tiny-file overwrite-rename.

    One PUBLISHER per zone (the write_parquet contract): two concurrent
    publishers both read the same ``prev`` and race on the same ``v=N+1``
    slot -- the committer's shared-staging race makes one fail loud
    (round-12 measurement), but last-writer-wins on the slot is still a
    lost update. Serialize refreshes externally.

    MIGRATING a plain zone (part files at the zone root) to atomic
    publish works in place: the first publish_snapshot writes ``v=0``
    beside the old root files and every pointer-resolving reader
    (read_table, the oracle views) serves the snapshot from then on
    (probed + pinned: test_atomic_publish.py). The stale root files are
    dead weight, invisible to engine reads -- delete them once the
    first snapshot is verified; only a NON-resolving direct
    ``spark.read.parquet(zone)`` could still be confused by the mixed
    layout.
    """
    zone = zone.rstrip("/")
    prev = current_snapshot_version(spark, zone)
    version = 0 if prev is None else prev + 1
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(_snapshot_dir(zone, version))
    fs, tmp, jvm = _jpath(spark, f"{zone}/{_POINTER}.tmp")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(str(version), "utf-8"))
    finally:
        out.close()
    final = jvm.org.apache.hadoop.fs.Path(f"{zone}/{_POINTER}")
    # Atomic replace via FileContext.rename(OVERWRITE): a plain
    # delete-then-rename opens a window where a concurrent reader finds
    # NO pointer and fails instead of serving the previous snapshot --
    # exactly the contract this module advertises. FileContext's
    # overwrite rename is atomic on HDFS and local filesystems; object
    # stores without atomic rename fall back to the tiny-file
    # delete+rename window below.
    try:
        ren_cls = getattr(jvm, "org.apache.hadoop.fs.Options$Rename")
        # FileContext.rename is varargs: py4j needs an explicit Java array
        opts = spark.sparkContext._gateway.new_array(ren_cls, 1)
        opts[0] = ren_cls.OVERWRITE
        fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            final.toUri(), spark._jsc.hadoopConfiguration()
        )
        fc.rename(tmp, final, opts)
    except Exception:
        fs.delete(final, False)
        if not fs.rename(tmp, final):
            raise IOError(f"could not publish pointer for zone {zone!r}")
    return version


def snapshot_versions(spark: SparkSession, zone: str) -> list[int]:
    """All snapshot versions present on storage (published or orphaned)."""
    fs, p, _ = _jpath(spark, zone.rstrip("/"))
    if not fs.exists(p):
        return []
    out = []
    for status in fs.listStatus(p):
        base = status.getPath().getName()
        if base.startswith("v=") and base[2:].isdigit():
            out.append(int(base[2:]))
    return sorted(out)


def vacuum_snapshots(
    spark: SparkSession, zone: str, keep: int = 1
) -> list[int]:
    """Delete snapshot directories older than the newest ``keep``
    published versions (orphans ABOVE the pointer are kept -- they may
    be an in-flight refresh). Returns the versions removed."""
    cur = current_snapshot_version(spark, zone)
    if cur is None:
        return []
    removed = []
    for v in snapshot_versions(spark, zone):
        if v <= cur - keep:
            fs, p, _ = _jpath(spark, _snapshot_dir(zone, v))
            fs.delete(p, True)
            removed.append(v)
    return removed


# --- named materialized-view API (the original surface; q174 time travel) ---


def current_version(spark: SparkSession, root: str, name: str) -> int | None:
    """Version the pointer currently publishes, or None if never refreshed."""
    return current_snapshot_version(spark, _view_root(root, name))


def refresh(spark: SparkSession, root: str, name: str, df: DataFrame) -> int:
    """Materialize ``df`` as the next snapshot of view ``name`` and
    publish it. Returns the new version number."""
    return publish_snapshot(spark, _view_root(root, name), df)


def read(
    spark: SparkSession, root: str, name: str, version: int | None = None
) -> DataFrame:
    """Read the published snapshot (or a pinned ``version`` for time
    travel). Raises FileNotFoundError when the view has never been
    refreshed."""
    zone = _view_root(root, name)
    if version is None:
        version = current_snapshot_version(spark, zone)
        if version is None:
            raise FileNotFoundError(f"materialized view {name!r} has no snapshot")
    return spark.read.parquet(_snapshot_dir(zone, version))


def list_versions(spark: SparkSession, root: str, name: str) -> list[int]:
    """All snapshot versions present on storage (published or orphaned)."""
    return snapshot_versions(spark, _view_root(root, name))


def vacuum(spark: SparkSession, root: str, name: str, keep: int = 1) -> list[int]:
    """Delete snapshot directories older than the newest ``keep`` published
    versions (orphans above the pointer are kept -- they may be an
    in-flight refresh). Returns the versions removed."""
    return vacuum_snapshots(spark, _view_root(root, name), keep)
