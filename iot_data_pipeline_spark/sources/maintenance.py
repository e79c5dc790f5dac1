"""Data-lake maintenance operators: small-file compaction and sorted
layout rewriting.

The reference's one-file-per-event design (reference
lambda/s3_event_handler.py:44-48) produces exactly the pathology a
long-lived lake dies of: millions of tiny objects, each a full
open/footer-parse/close at scan time. These operators are the batch
janitors a processed zone needs once files arrive continuously.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _guard_zone_write(spark: SparkSession, out_path: str, op: str) -> None:
    """Refuse a plain maintenance rewrite into an atomically-published
    zone (round-13 probe, measured as silent destruction: a plain
    ``mode=overwrite`` into a pointer zone DELETED the snapshots and the
    ``_current`` pointer, silently demoting the zone to plain layout).
    Same hazard class as the write_parquet/backfill guards."""
    from iot_data_pipeline_spark.sources.matview import resolve_snapshot_dir

    if resolve_snapshot_dir(spark, out_path) is not None:
        raise ValueError(
            f"{op}: {out_path!r} is an atomically-published zone "
            "(_current pointer present); a plain overwrite would destroy "
            "its snapshots. Pass atomic=True to publish the rewrite as "
            "the next snapshot."
        )


def expire_snapshots(
    spark: SparkSession,
    zone: str,
    keep_last: int = 2,
    keep_age_s: float | None = None,
) -> list[int]:
    """Snapshot retention for atomically-published zones -- the
    maintenance janitor that makes ``atomic=True`` sustainable.

    Every atomic refresh adds a FULL copy of the zone; before round 14
    nothing in the pipeline ever reclaimed them, so at 100 TB a nightly
    refresh doubles storage daily until someone hand-calls vacuum. This
    entry point composes with the maintenance writers (or runs on its
    own schedule): a version survives if it is among the newest
    ``keep_last`` published versions OR younger than ``keep_age_s``
    seconds -- deletion requires falling outside both, so sizing
    ``keep_age_s`` above the longest query keeps every directory a
    live plan can still reference. Default keeps the current AND
    previous snapshot (in-flight readers planned just before the last
    refresh stay servable). ``keep_last`` must be >= 1 (keep=0 would
    delete the CURRENT snapshot under a live pointer; vacuum_snapshots
    raises ValueError). Returns the versions removed."""
    from iot_data_pipeline_spark.sources.matview import vacuum_snapshots

    return vacuum_snapshots(spark, zone, keep=keep_last, keep_age_s=keep_age_s)


def compact_parquet(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    atomic: bool = False,
    keep_snapshots: int | None = None,
) -> int:
    """Rewrite a parquet directory into ~``target_file_bytes`` files.

    File count is derived from the INPUT byte size (cheap file-status
    listing, no data read), then the data is rewritten through a
    ``repartition(n)`` -- a single round-robin shuffle that also heals
    skewed file sizes. Returns the output file count.

    128 MiB default matches the HDFS-era sweet spot that parquet
    readers still assume: big enough to amortize footer+open cost,
    small enough to split work evenly.

    Atomic-zone composition (round 13): an atomic SOURCE resolves to its
    current snapshot (a root read would union every version);
    ``atomic=True`` publishes the compacted data as the zone's next
    snapshot -- the safe shape for IN-PLACE maintenance (``out_path ==
    path``), where the plain overwrite opens the measured
    destroy-then-rewrite crash window; and a plain write into a pointer
    zone is refused loud (probed: it silently destroyed the snapshots
    and pointer).
    """
    from iot_data_pipeline_spark.sources.matview import (
        publish_snapshot,
        resolve_snapshot_dir,
    )

    src = resolve_snapshot_dir(spark, path) or path
    # JVM-side file listing via the input_file_name trick would scan; use
    # the FileSystem API through the JVM gateway instead (status only).
    jvm = spark._jvm
    jsc = spark._jsc
    hadoop_conf = jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(src)
    fs = p.getFileSystem(hadoop_conf)
    total = fs.getContentSummary(p).getLength()
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(src).repartition(n_files)
    if atomic:
        publish_snapshot(spark, out_path, df)
        if keep_snapshots is not None:
            expire_snapshots(spark, out_path, keep_last=keep_snapshots)
        return n_files
    if keep_snapshots is not None:
        raise ValueError(
            "compact_parquet: keep_snapshots is a retention knob for "
            "atomic publishes; pass atomic=True"
        )
    _guard_zone_write(spark, out_path, "compact_parquet")
    df.write.mode("overwrite").parquet(out_path)
    return n_files


def rewrite_sorted(
    df: DataFrame,
    out_path: str,
    layout_cols: list[str],
    n_files: int | None = None,
    atomic: bool = False,
    keep_snapshots: int | None = None,
) -> None:
    """Rewrite with rows clustered by ``layout_cols`` inside each file
    (``sortWithinPartitions`` -- a local sort, NO global shuffle).

    Parquet keeps per-row-group min/max stats; clustering on the common
    predicate columns makes those stats selective, so later scans skip
    row groups server-side. This is the poor-man's Z-order: one sort
    column family, zero extra infrastructure, and at 100 TB it is the
    difference between reading every row group and reading the few that
    overlap the predicate range.
    """
    out = df.repartition(n_files) if n_files else df
    out = out.sortWithinPartitions(*[F.col(c) for c in layout_cols])
    if atomic:
        from iot_data_pipeline_spark.sources.matview import publish_snapshot

        publish_snapshot(df.sparkSession, out_path, out)
        if keep_snapshots is not None:
            expire_snapshots(
                df.sparkSession, out_path, keep_last=keep_snapshots
            )
        return
    if keep_snapshots is not None:
        raise ValueError(
            "rewrite_sorted: keep_snapshots is a retention knob for "
            "atomic publishes; pass atomic=True"
        )
    _guard_zone_write(df.sparkSession, out_path, "rewrite_sorted")
    out.write.mode("overwrite").parquet(out_path)


def zorder_value(cols: list[str], bits: int = 16) -> F.Column:
    """Interleaved-bit Z-value over rank-normalized columns.

    Each column is first percent_rank-normalized to a ``bits``-wide
    integer (rank, not raw value: Z-order degrades badly on skewed
    domains, and ranks are uniform by construction), then the bit
    planes interleave: z = ... c0[b] c1[b] c0[b-1] c1[b-1] ...

    Pure column arithmetic -- shifts and ORs inside codegen, no UDF.
    """
    n = len(cols)
    ranks = [
        (
            F.percent_rank().over(Window.orderBy(F.col(c)))
            * ((1 << bits) - 1)
        ).cast("long")
        for c in cols
    ]
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, r in enumerate(ranks):
            bit = F.shiftright(r, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z


def rewrite_zordered(
    df: DataFrame,
    out_path: str,
    layout_cols: list[str],
    n_files: int = 8,
    bits: int = 16,
    atomic: bool = False,
    keep_snapshots: int | None = None,
) -> None:
    """Rewrite clustered on a multi-column Z-curve: range-partition and
    sort by the interleaved Z-value so EVERY layout column's per-file
    min/max stats become selective -- predicates on any single column
    skip most files/row-groups, where a lexicographic sort only serves
    its leading column.

    Cost note: percent_rank uses a global window (single-partition rank
    pass) -- fine for the maintenance job sizes this targets; at larger
    scale substitute an approximate rank (ntile over a sampled CDF),
    which changes nothing downstream since the Z-value only needs
    monotonicity, not exactness.
    """
    z = zorder_value(layout_cols, bits)
    out = (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
    if atomic:
        from iot_data_pipeline_spark.sources.matview import publish_snapshot

        publish_snapshot(df.sparkSession, out_path, out)
        if keep_snapshots is not None:
            expire_snapshots(
                df.sparkSession, out_path, keep_last=keep_snapshots
            )
        return
    if keep_snapshots is not None:
        raise ValueError(
            "rewrite_zordered: keep_snapshots is a retention knob for "
            "atomic publishes; pass atomic=True"
        )
    _guard_zone_write(df.sparkSession, out_path, "rewrite_zordered")
    out.write.mode("overwrite").parquet(out_path)


def analyze_table(
    spark: SparkSession,
    table: str,
    columns: list[str] | None = None,
) -> dict[str, str]:
    """Collect catalog statistics for a saved table (``ANALYZE TABLE``):
    table-level rowCount/sizeInBytes, plus per-column NDV/min/max/null
    counts when ``columns`` is given.

    This is the cost-based-optimizer feed. AQE fixes plans at *runtime*
    from observed shuffle sizes; catalog stats fix them at *plan* time --
    on a 100 TB lake that is the difference between never starting the
    wrong sort-merge join and cancelling it halfway. Column NDVs also
    drive join reordering (``spark.sql.cbo.joinReorder.enabled``).

    Returns the table-level stats as reported by ``DESC EXTENDED``.
    """
    spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS")
    if columns:
        cols = ", ".join(columns)
        spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS FOR COLUMNS {cols}")
    rows = spark.sql(f"DESC EXTENDED {table}").collect()
    stats = {r["col_name"]: r["data_type"] for r in rows if r["col_name"] == "Statistics"}
    return stats


CBO_CONF = {
    "spark.sql.cbo.enabled": "true",
    "spark.sql.cbo.joinReorder.enabled": "true",
    "spark.sql.statistics.histogram.enabled": "true",
}
