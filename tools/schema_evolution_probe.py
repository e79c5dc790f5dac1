"""Schema-evolution x hostile-axes probe (round-10 verdict task 5).

A long-lived lake's table directory accumulates FILE GENERATIONS whose
footers differ -- and not only by added/removed columns (the round-8
axis, already covered by tests/test_sources.py): writers also re-TYPE
columns over time. The composed hostile axes are exactly those writer
choices applied to one generation each:

    gen0  canonical schema, first third of the rows
    gen1  missing column      (``value`` dropped -- pre-value-era files)
    gen2  extra + case change (``_INGEST_SEQ`` added, names UPPER-CASED)
    gen3  narrowed keys       (``user_id``/``event_id`` as int32)
    gen4  TIMESTAMP(NANOS)    (``ts`` as timestamp[ns])
    gen5  DECIMAL money       (``value`` as DECIMAL(18,6))

Probe result (2026-08-15, Spark 4.1.2): ``mergeSchema`` merges gen0/1/2
(added columns + case change union fine, case-insensitively) but ANY
value-type change -- int32 vs int64, timestamp[ns]-as-BIGINT vs
timestamp, DECIMAL vs DOUBLE -- raises ``CANNOT_MERGE_SCHEMAS`` and the
whole directory becomes unreadable, even though every generation
individually casts cleanly to the contract. Found-and-fixed:
``read_parquet_evolving`` now falls back to per-footer-schema-group
scans (one scan per GENERATION SCHEMA, not per file), aligns each group
to the contract (the arrow footer disambiguates nanos-BIGINT from true
BIGINT, so nanos convert by integer division instead of being misread
as seconds), and unions by name. Frozen band:
tests/test_sources.py::test_read_parquet_evolving_value_type_generations.

Usage: python -m tools.schema_evolution_probe [src_sf_dir]
(default /root/testdata/sf0.01; builds the 6-generation lake in a temp
dir, reads it through read_parquet_evolving, verifies row count, NULL
backfill, value sums, key sums, and ts range against ground truth
computed from the source with pyarrow)
"""

from __future__ import annotations

import os
import sys
import tempfile

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

GENS = 6


def build_lake(d: str, src: str) -> pa.Table:
    """Write the 6-generation evolving events lake under ``d``; return
    the source table (ground truth)."""
    tab = pq.read_table(f"{src}/events.parquet")
    n = tab.num_rows
    cut = [round(i * n / GENS) for i in range(GENS + 1)]
    slices = [tab.slice(cut[i], cut[i + 1] - cut[i]) for i in range(GENS)]

    pq.write_table(slices[0], os.path.join(d, "gen0.parquet"))
    pq.write_table(slices[1].drop_columns(["value"]), os.path.join(d, "gen1.parquet"))

    g2 = slices[2].append_column(
        "_ingest_seq", pa.array(range(slices[2].num_rows), pa.int64())
    )
    g2 = g2.rename_columns([c.upper() for c in g2.column_names])
    pq.write_table(g2, os.path.join(d, "gen2.parquet"))

    g3 = slices[3]
    for c in ("event_id", "user_id"):
        i = g3.column_names.index(c)
        g3 = g3.set_column(i, c, g3.column(c).cast(pa.int32()))
    pq.write_table(g3, os.path.join(d, "gen3.parquet"))

    g4 = slices[4]
    i = g4.column_names.index("ts")
    g4 = g4.set_column(i, "ts", g4.column("ts").cast(pa.timestamp("ns")))
    pq.write_table(g4, os.path.join(d, "gen4.parquet"))

    g5 = slices[5]
    i = g5.column_names.index("value")
    g5 = g5.set_column(i, "value", g5.column("value").cast(pa.decimal128(18, 6)))
    pq.write_table(g5, os.path.join(d, "gen5.parquet"))
    return tab


def verify(spark, lake: str, truth: pa.Table) -> list[str]:
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from iot_data_pipeline_spark.sources.readers import read_parquet_evolving

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
    df = read_parquet_evolving(spark, lake, contract)
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").isNull().cast("bigint")).alias("null_values"),
        F.round(F.sum("value"), 4).alias("value_sum"),
        F.sum("event_id").alias("id_sum"),
        F.sum("user_id").alias("uid_sum"),
        F.min("ts").alias("ts_min"),
        F.max("ts").alias("ts_max"),
    ).collect()[0]

    n = truth.num_rows
    cut = [round(i * n / GENS) for i in range(GENS + 1)]
    gen1 = truth.slice(cut[1], cut[2] - cut[1])
    exp_value = (pc.sum(truth.column("value")).as_py() or 0.0) - (
        pc.sum(gen1.column("value")).as_py() or 0.0
    )

    problems = []
    if row["n"] != n:
        problems.append(f"rows {row['n']} != {n}")
    if row["null_values"] != gen1.num_rows:
        problems.append(f"null values {row['null_values']} != {gen1.num_rows}")
    if abs(row["value_sum"] - round(exp_value, 4)) > 1e-3:
        problems.append(f"value sum {row['value_sum']} != {round(exp_value, 4)}")
    if row["id_sum"] != pc.sum(truth.column("event_id")).as_py():
        problems.append("event_id sum mismatch")
    if row["uid_sum"] != pc.sum(truth.column("user_id")).as_py():
        problems.append("user_id sum mismatch")
    tmin = pc.min(truth.column("ts")).as_py()
    tmax = pc.max(truth.column("ts")).as_py()
    if row["ts_min"] != tmin or row["ts_max"] != tmax:
        problems.append(
            f"ts range [{row['ts_min']}, {row['ts_max']}] != [{tmin}, {tmax}]"
        )
    return problems


def main() -> int:
    from iot_data_pipeline_spark.session import build_session

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    d = tempfile.mkdtemp(prefix="evolake_")
    truth = build_lake(d, src)
    spark = build_session("schema-evolution-probe")
    problems = verify(spark, d, truth)
    for p in problems:
        print(f"[FAIL] {p}")
    print(
        f"{'FAIL' if problems else 'PASS'}: 6-generation evolving lake "
        f"({truth.num_rows} rows, lake: {d})"
    )
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
