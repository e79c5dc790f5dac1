"""Incremental backfill of a derived, partitioned zone.

The 100 TB problem this solves: a derived table (rollup, cleaned zone,
feature table) is partitioned the same way as its source, and one
upstream partition gets late data or a correction. Recomputing the whole
zone is a full-scan job; recomputing *only the changed partitions* is
minutes. Detecting "changed" must not scan data either -- at scale the
only free signal is file metadata.

Mechanics:

- ``partition_fingerprints`` lists ``<path>/<col>=<val>/`` directories
  through the Hadoop FileSystem API and fingerprints each as
  (file count, total bytes, max modification time) -- a metadata-only
  operation, no data read, works on file:// and hdfs:// and s3a://.
- a tiny JSON manifest of source fingerprints is stored next to the
  derived zone after every backfill.
- ``backfill`` diffs current source fingerprints against the manifest,
  recomputes ONLY stale/new partitions through the caller's derive
  function, and writes them with **dynamic partition overwrite** -- Spark
  replaces exactly the partition directories present in the written
  frame, leaving every other partition's files untouched.

The derive function sees only the stale partitions' source rows; its
output must retain the partition column.
"""

from __future__ import annotations

import json
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST = "_backfill_manifest.json"


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p, jvm


def partition_fingerprints(
    spark: SparkSession, path: str, partition_col: str
) -> dict[str, list[int]]:
    """Map of partition value -> [n_files, total_bytes, max_mtime_ms],
    from file status only (no data read)."""
    fs, root, _ = _fs(spark, path)
    out: dict[str, list[int]] = {}
    prefix = f"{partition_col}="
    for status in fs.listStatus(root):
        if not status.isDirectory():
            continue
        base = status.getPath().getName()
        if not base.startswith(prefix):
            continue
        n, total, mtime = 0, 0, 0
        for f in fs.listStatus(status.getPath()):
            if f.isFile() and not f.getPath().getName().startswith("_"):
                n += 1
                total += f.getLen()
                mtime = max(mtime, f.getModificationTime())
        out[base[len(prefix):]] = [n, total, mtime]
    return out


def _read_manifest(spark: SparkSession, dst_path: str) -> dict[str, list[int]]:
    fs, p, jvm = _fs(spark, f"{dst_path.rstrip('/')}/{_MANIFEST}")
    if not fs.exists(p):
        return {}
    stream = fs.open(p)
    try:
        text = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()
    return json.loads(text)


def _write_manifest(
    spark: SparkSession, dst_path: str, manifest: dict[str, list[int]]
) -> None:
    fs, p, _ = _fs(spark, f"{dst_path.rstrip('/')}/{_MANIFEST}")
    out = fs.create(p, True)
    try:
        out.write(bytearray(json.dumps(manifest, sort_keys=True), "utf-8"))
    finally:
        out.close()


def stale_partitions(
    spark: SparkSession, src_path: str, dst_path: str, partition_col: str
) -> list[str]:
    """Partition values whose source fingerprint differs from the manifest
    recorded at the last backfill (new partitions included)."""
    current = partition_fingerprints(spark, src_path, partition_col)
    seen = _read_manifest(spark, dst_path)
    return sorted(v for v, fp in current.items() if seen.get(v) != fp)


def backfill(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    partition_col: str,
    derive: Callable[[DataFrame], DataFrame],
    full: bool = False,
) -> list[str]:
    """Recompute stale partitions of the derived zone and overwrite only
    them. Returns the partition values recomputed (possibly empty).

    ``derive`` receives the source rows of the stale partitions only and
    must return a frame still carrying ``partition_col``. ``full=True``
    forces a complete rebuild (ignores the manifest).

    Atomic-zone composition (round 13): an atomically-published SOURCE
    resolves to its current snapshot (a direct root read would union
    every version); an atomically-published DESTINATION is REFUSED loud
    -- dynamic partition overwrite writes beside the snapshot dirs where
    pointer-resolving readers never look, so the backfill would
    "succeed" while every read keeps serving the old snapshot (the worst
    failure shape: silent no-op). A zone is either partition-refreshed
    (this module) or snapshot-published (matview), never both.
    """
    from iot_data_pipeline_spark.sources.matview import resolve_snapshot_dir

    resolved_src = resolve_snapshot_dir(spark, src_path)
    if resolved_src is not None:
        src_path = resolved_src
    if resolve_snapshot_dir(spark, dst_path) is not None:
        raise ValueError(
            f"backfill destination {dst_path!r} is an atomically-published "
            "zone (_current pointer present): dynamic partition overwrite "
            "would write beside the snapshots, invisible to every "
            "pointer-resolving reader. Refresh it via "
            "write_parquet(atomic=True) / matview.publish_snapshot, or "
            "choose a plain zone for partition-scoped backfill."
        )
    # capture fingerprints ONCE, before reading any data: these are the
    # versions this run consumes, and they are what the manifest must
    # record -- re-listing after the derive would stamp a fingerprint for
    # source changes that landed mid-run WITHOUT their rows being in the
    # derived output, silently exempting them from every future diff
    captured = partition_fingerprints(spark, src_path, partition_col)
    if full:
        todo = sorted(captured)
    else:
        seen = _read_manifest(spark, dst_path)
        todo = sorted(v for v, fp in captured.items() if seen.get(v) != fp)
    if not todo:
        return []
    src = spark.read.parquet(src_path).filter(F.col(partition_col).isin(todo))
    derived = derive(src)
    if partition_col not in derived.columns:
        raise ValueError(f"derive() must keep the partition column {partition_col!r}")
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            derived.write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(dst_path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    # record the fingerprints we just consumed (the pre-read capture: a
    # partition that changed again mid-run keeps its OLD stamp here, so
    # the next stale_partitions diff re-backfills it)
    manifest = _read_manifest(spark, dst_path)
    for v in todo:
        manifest[v] = captured[v]
    _write_manifest(spark, dst_path, manifest)
    return todo
