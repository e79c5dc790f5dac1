"""Sinks: JSONL (reference parity) and partitioned Parquet (processed zone).

The reference writes one JSON object per line and allows an empty output
(app/app.py:68-80); its README names Parquet as the intended processed-zone
format (README.md:217). At 100 TB the parquet sink should be partitioned on a
low-cardinality routing column (e.g. date) so downstream scans prune.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ntz_format(fmt: str) -> str:
    """Derive the ``timestampNTZFormat`` from a caller's LTZ format by
    dropping every UNQUOTED zone-pattern letter (X/x/Z/z/O/V/v) anywhere
    in the pattern -- an NTZ value has no zone to print, and a leftover
    zone letter fails the whole write when NTZ columns are present.

    Round-12 ADVICE: the previous derivation stripped only a TRAILING
    zone run, so a zone mid-pattern or followed by a quoted literal
    (``...ssXXX'Z'``, ``VV yyyy...``) still leaked zone letters into
    the NTZ option -- the exact failure the fix targets, on adjacent
    spellings. This tokenizes around single-quoted literal sections
    (java.time rules: ``''`` inside or outside a section is an escaped
    quote) so quoted text like ``'Z'`` or ``'at VV'`` is preserved
    verbatim while pattern-position zone letters drop wherever they sit.
    """
    out: list[str] = []
    i, n = 0, len(fmt)
    while i < n:
        ch = fmt[i]
        if ch == "'":
            j = i + 1
            while j < n and fmt[j] != "'":
                j += 1
            out.append(fmt[i : j + 1])  # quoted section, closing quote kept
            i = j + 1
        elif ch in "XxZzOVv":
            i += 1  # unquoted zone-pattern letter: drop
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    timestamp_format: str = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    coalesce: int | None = None,
) -> None:
    """One JSON object per line, ISO-8601 UTC timestamps (reference A11).

    ``coalesce=1`` reproduces the reference's one-file-out contract for
    small micro-batches; leave None for scale (one file per partition).

    The default format keeps FULL microsecond precision (round-10 probe:
    the previous seconds-only format silently truncated sub-second
    timestamps on write, and even Spark's default keeps only millis --
    lossy for the reference's own microsecond-emitting clock,
    app/app.py:48 ``isoformat()``). String-form divergence from the
    reference, accepted and documented: the reference omits the fraction
    when it is exactly zero and emits no timezone suffix
    (``utcnow().isoformat()``); this sink always prints ``.SSSSSS`` and
    ``Z`` -- same instants, lossless, and trivially machine-parseable.
    """
    out = df.coalesce(coalesce) if coalesce else df
    # TIMESTAMP_NTZ columns render through the SEPARATE
    # timestampNTZFormat option (round-11 probe: the round-10 fix set
    # only timestampFormat, so NTZ columns still silently truncated to
    # Spark's default millis). Same full-micros format minus the zone
    # letters -- an NTZ value has no zone to print; see _ntz_format
    # (round-12 ADVICE: zone patterns ANYWHERE in the format, not just
    # a trailing run, quoted literals preserved).
    ntz_format = _ntz_format(timestamp_format)
    (
        out.write.mode(mode)
        .option("timestampFormat", timestamp_format)
        .option("timestampNTZFormat", ntz_format)
        .json(path)
    )


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
    atomic: bool = False,
    keep_snapshots: int | None = None,
) -> None:
    """Parquet sink, optionally hive-partitioned (B4).

    ``atomic=True`` (round 13, closing the one 100 TB gap the round-12
    probes measured): publish the refresh through the versioned
    write-then-swap pattern (sources/matview.py) instead of Spark's
    destructive-first ``mode=overwrite``. The new snapshot is fully
    written under ``<path>/v=<N>`` before a tiny ``_current`` pointer
    file swaps to it, so a crashed, killed, or failed refresh ALWAYS
    leaves the previous zone state fully readable (the plain overwrite
    leaves it EMPTY -- measured, SCALE.md section 7e), and a concurrent
    reader sees old-or-new, never torn. The engine's read boundary
    (``read_table``; the DuckDB oracle views) resolves the pointer
    transparently; old snapshots stay readable until
    ``matview.vacuum_snapshots``. Atomic publish IS a full-zone
    refresh, so it requires ``mode="overwrite"``; appends don't need
    it (an append crash is clean -- committed data intact, probed) and
    partition-scoped refreshes use dynamic partition overwrite
    (sources/backfill.py) with its narrower destruction window.

    CONCURRENCY posture (round-12 probe, measured): two jobs appending
    to the SAME output path race on the shared ``_temporary`` staging
    dir -- the first committer's cleanup deletes the second job's
    staging, which then fails LOUD (``FileNotFoundException:
    _temporary/0``); rows committed before the crash stay intact and
    deduplicated, so the failure mode is availability, not corruption.
    One writer per zone is the contract; concurrent producers should
    write to per-job directories (or publish via the matview
    atomic-pointer pattern, sources/matview.py), and object-store
    deployments should use the magic committer (SCALE.md section 8).

    CRASH posture for ``mode="overwrite"`` (round-12 probe, measured):
    Spark's overwrite is DESTRUCTIVE-FIRST -- the old zone is deleted
    before the new write commits, so a crash mid-overwrite loses the
    OLD data entirely (probe: a SIGKILL mid-write left the zone empty;
    the 3M-row previous state was gone). Zones whose previous state
    must survive a failed refresh pass ``atomic=True`` (the matview
    write-then-swap, promoted to this sink in round 13 -- see below);
    partition-scoped refreshes use dynamic partition overwrite
    (sources/backfill.py), which narrows the destruction window to the
    partitions being replaced. An
    APPEND crash, by contrast, is clean: committed data stays intact
    and readable, and ``_temporary`` residue is ignored by readers and
    cleared by the next write (pinned probes, SCALE.md section 7e).

    Partition-VALUE caveats (round-10 probe, frozen in
    tests/test_sources.py::test_partitioned_sink_adversarial_values):

    - Special characters in partition values (space, ``/``, ``:``, ``=``,
      ``%``, unicode, leading/trailing blanks) are percent-escaped in the
      directory name and round-trip EXACTLY through Spark's read.
    - EMPTY-STRING partition values do NOT round-trip: the Hive directory
      convention encodes both NULL and ``''`` as
      ``__HIVE_DEFAULT_PARTITION__``, so an empty string comes back as
      NULL. If ``''`` is a meaningful key, normalize it to a sentinel
      before partitioning.
    - Non-Spark readers may not unescape: DuckDB's ``hive_partitioning``
      returns the RAW escaped directory text (``a%2Fb``) and the literal
      ``__HIVE_DEFAULT_PARTITION__`` string for NULL -- an oracle-side
      divergence to remember if a DuckDB twin ever reads a partitioned
      zone keyed by values that need escaping.
    """
    if keep_snapshots is not None and not atomic:
        raise ValueError(
            "write_parquet: keep_snapshots is a retention knob for "
            "atomic publishes; pass atomic=True"
        )
    if atomic:
        if mode != "overwrite":
            raise ValueError(
                f"atomic=True publishes a full-zone refresh and requires "
                f"mode='overwrite' (got mode={mode!r}); appends commit "
                "crash-clean without it"
            )
        from iot_data_pipeline_spark.sources.matview import publish_snapshot

        publish_snapshot(
            df.sparkSession, path, df, partition_by=tuple(partition_by)
        )
        if keep_snapshots is not None:
            # Retention (round 14): without it every refresh adds a
            # full zone copy FOREVER -- at 100 TB a nightly refresh
            # doubles storage daily. keep_snapshots=N keeps the newest
            # N published versions; size N (or use
            # maintenance.expire_snapshots with a keep-age window) so
            # the longest in-flight reader's snapshot stays on disk.
            from iot_data_pipeline_spark.sources.matview import (
                vacuum_snapshots,
            )

            vacuum_snapshots(df.sparkSession, path, keep=keep_snapshots)
        return
    # Mirror guard (round 13): a NON-atomic write into a zone that has
    # a published snapshot pointer is always wrong -- an append lands at
    # the root where pointer-resolving readers never look (silent
    # no-op), and an overwrite deletes the snapshots out from under the
    # pointer. Same hazard class the backfill guard closes.
    from iot_data_pipeline_spark.sources.matview import resolve_snapshot_dir

    if resolve_snapshot_dir(df.sparkSession, path) is not None:
        raise ValueError(
            f"{path!r} is an atomically-published zone (_current pointer "
            "present): plain-mode writes either land invisibly beside the "
            "snapshots (append) or destroy them under the pointer "
            "(overwrite). Pass atomic=True to publish the next snapshot."
        )
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def seed_zone_schema(
    df: DataFrame,
    path: str,
    partition_col: str,
    seed_value: str | int = "__schema_seed__",
) -> None:
    """Make an empty partitioned zone schema-readable: write a 0-row part
    file into ``<path>/<partition_col>=<seed_value>/``.

    A partitioned parquet write of 0 rows emits NO files at all, so a
    derived zone that happens to receive no data (an empty source day, a
    stream that drained nothing) fails downstream schema inference with
    UNABLE_TO_INFER_SCHEMA -- the empty-input sweep found four pipelines
    wearing this failure. The seed partition carries the file schema and
    the partition column's directory encoding but zero rows, so every
    aggregate/filter over the zone is unaffected; ``seed_value`` must
    parse as the partition column's type (e.g. ``-2`` for a numeric
    ``batch_id``). Overwrite keeps re-seeding idempotent and touches only
    the seed directory, never data partitions.
    """
    cols = [c for c in df.columns if c != partition_col]
    (
        df.select(*cols)
        .limit(0)
        .write.mode("overwrite")
        .parquet(f"{path}/{partition_col}={seed_value}")
    )


def write_dead_letter(bad: DataFrame, path: str, mode: str = "append") -> None:
    """Dead-letter sink for corrupt records (realizes reference README.md:215).

    Keeps the raw line plus capture metadata; parquet so the DLQ is itself
    queryable (count by error day, replay a range, ...).
    """
    (
        bad.withColumn("_ingest_ts", F.current_timestamp())
        .write.mode(mode)
        .parquet(path)
    )
