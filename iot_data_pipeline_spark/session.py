"""SparkSession factory with engine defaults.

Defaults chosen for correctness-parity with the DuckDB oracle and for
100 TB-scale execution habits (SURVEY.md section 4.2):

- ``spark.sql.session.timeZone=UTC``: the reference emits UTC ISO-8601
  timestamps (reference app/app.py:48); DuckDB timestamps are UTC-naive.
- AQE on: runtime join-strategy switching, skew-join splitting, and
  shuffle-partition coalescing are the first line of defense at scale.
- ``spark.sql.legacy.parquet.nanosAsLong=true``: the driver testdata's
  ``events.ts`` column is parquet TIMESTAMP(NANOS), which Spark cannot
  represent natively; we read it as nanos-since-epoch LONG and convert
  with integer division (see sources.readers.read_table).
- shuffle partitions sized for the local test harness; a cluster deploy
  overrides via ``spark_conf`` (AQE coalescing makes over-provisioning
  cheap, so at 100 TB you set this to ~3x total cores and let AQE shrink).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Python DataSource connectors (sources/custom.py) may implement
    # pushFilters; without this flag Spark refuses to plan them at all.
    "spark.sql.python.filterPushdown.enabled": "true",
    "spark.sql.parquet.mergeSchema": "false",
    "spark.ui.enabled": "false",
}


def build_session(
    app_name: str = "iot-data-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults applied.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (falling back to
    ``local[*]``) so the same entry point serves tests, bench, and the
    driver harness; on a real cluster the caller passes its own master.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus) if cpus else 32

    builder = SparkSession.builder.master(master).appName(app_name)
    conf = dict(_DEFAULTS)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def get_session() -> SparkSession:
    """Active session if one exists (e.g. driver-provided), else build one."""
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    return build_session()


def apply_engine_conf(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine defaults to an externally-built session.

    The driver harness constructs its own SparkSession and hands it to
    ``__spark_entry__.entry``; this aligns the confs that matter for
    oracle parity (timezone, nanos handling, AQE) without restarting.
    """
    for k, v in _DEFAULTS.items():
        if k == "spark.ui.enabled":
            continue  # static conf; cannot change post-start
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on this build; defaults still acceptable
    return spark
