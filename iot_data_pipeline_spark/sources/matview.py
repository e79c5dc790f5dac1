"""Materialized views with versioned, atomically-published snapshots.

A rollup that dashboards hit thousands of times a day must not rescan
the fact table per query -- it gets materialized once per refresh cycle.
The publish step is the part that matters at scale: readers must never
see a half-written snapshot. Without a table format (Delta/Iceberg),
"overwrite in place" is NOT atomic on an object store -- a reader listing
mid-rewrite sees a torn directory. This module uses the classic
version-directory pattern instead:

    <root>/<name>/v=<N>/part-*.parquet   -- immutable snapshot N
    <root>/<name>/_current               -- tiny pointer file: "N"

A refresh writes the FULL new snapshot under ``v=<N+1>``, then swaps the
pointer (write-temp + rename: rename is atomic on HDFS; on S3 the
single-object copy window is milliseconds on a byte-sized file). Readers
resolve the pointer once at plan time and then only ever list an
immutable directory. Old snapshots stay readable (in-flight queries,
time travel) until ``vacuum`` reclaims them.

All filesystem access goes through the Hadoop FileSystem API so the same
code runs on file://, hdfs://, and s3a:// paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_POINTER = "_current"


def _jpath(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p, jvm


def _view_root(root: str, name: str) -> str:
    return f"{root.rstrip('/')}/{name}"


def _version_dir(root: str, name: str, version: int) -> str:
    return f"{_view_root(root, name)}/v={version}"


def current_version(spark: SparkSession, root: str, name: str) -> int | None:
    """Version the pointer currently publishes, or None if never refreshed."""
    fs, p, jvm = _jpath(spark, f"{_view_root(root, name)}/{_POINTER}")
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        text = jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        ).strip()
    finally:
        stream.close()
    return int(text) if text else None


def refresh(spark: SparkSession, root: str, name: str, df: DataFrame) -> int:
    """Materialize ``df`` as the next snapshot of view ``name`` and publish
    it. Returns the new version number.

    The dataframe is fully written under the new version directory BEFORE
    the pointer moves; a crash mid-write leaves an orphan directory (the
    pointer still names the last good snapshot) which the next ``vacuum``
    clears. Publication is the pointer swap -- one tiny-file rename.
    """
    prev = current_version(spark, root, name)
    version = 0 if prev is None else prev + 1
    df.write.mode("overwrite").parquet(_version_dir(root, name, version))
    vroot = _view_root(root, name)
    fs, tmp, jvm = _jpath(spark, f"{vroot}/{_POINTER}.tmp")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(str(version), "utf-8"))
    finally:
        out.close()
    final = jvm.org.apache.hadoop.fs.Path(f"{vroot}/{_POINTER}")
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
            raise IOError(f"could not publish pointer for view {name!r}")
    return version


def read(
    spark: SparkSession, root: str, name: str, version: int | None = None
) -> DataFrame:
    """Read the published snapshot (or a pinned ``version`` for time
    travel). Raises FileNotFoundError when the view has never been
    refreshed."""
    if version is None:
        version = current_version(spark, root, name)
        if version is None:
            raise FileNotFoundError(f"materialized view {name!r} has no snapshot")
    return spark.read.parquet(_version_dir(root, name, version))


def list_versions(spark: SparkSession, root: str, name: str) -> list[int]:
    """All snapshot versions present on storage (published or orphaned)."""
    fs, p, _ = _jpath(spark, _view_root(root, name))
    if not fs.exists(p):
        return []
    out = []
    for status in fs.listStatus(p):
        base = status.getPath().getName()
        if base.startswith("v=") and base[2:].isdigit():
            out.append(int(base[2:]))
    return sorted(out)


def vacuum(spark: SparkSession, root: str, name: str, keep: int = 1) -> list[int]:
    """Delete snapshot directories older than the newest ``keep`` published
    versions (orphans above the pointer are kept -- they may be an
    in-flight refresh). Returns the versions removed."""
    cur = current_version(spark, root, name)
    if cur is None:
        return []
    removed = []
    for v in list_versions(spark, root, name):
        if v <= cur - keep:
            fs, p, _ = _jpath(spark, _version_dir(root, name, v))
            fs.delete(p, True)
            removed.append(v)
    return removed
