"""Property test: Spark's built-in ``session_window`` (batch mode) must
agree with the lag/cumsum island formulation (q21's shape) on randomized
event times.

This is the engine's riskiest equivalence (SURVEY.md section 4.3 item 3):
the oracle can only check the island SQL against DuckDB; the built-in
session_window has no DuckDB twin, so its boundary semantics -- an event
at EXACTLY prev + gap MERGES into the running session (new session only
when diff > gap; pinned empirically round 1: events {0, 30min} -> ONE
session of 2) -- are pinned here by fuzzing offsets around the gap width.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

GAP_MIN = 30

# offsets in whole minutes, clustered so some diffs land exactly on the
# 30-minute gap (the boundary under test), some inside, some far outside
offsets = st.lists(
    st.integers(min_value=0, max_value=120),
    min_size=1,
    max_size=12,
)
events_strategy = st.dictionaries(
    st.integers(min_value=1, max_value=3),  # user_id
    offsets,
    min_size=1,
    max_size=3,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(events=events_strategy)
def test_session_window_equals_island_formulation(spark, events):
    rows = []
    for uid, offs in events.items():
        # cumulative so consecutive diffs are the raw draws (0..120 min,
        # straddling the 30-min gap); dedupe equal instants per user
        acc = 0
        seen = set()
        for o in offs:
            acc += o
            if acc not in seen:
                seen.add(acc)
                rows.append((uid, acc))
    df = spark.createDataFrame(rows, "user_id int, m int").select(
        "user_id",
        F.timestamp_seconds(F.lit(1767225600) + F.col("m") * 60).alias("ts"),
    )

    builtin = (
        df.groupBy(
            F.session_window("ts", f"{GAP_MIN} minutes").alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user_id", F.col("w.start").alias("start"), "n")
    )

    w = Window.partitionBy("user_id").orderBy("us")
    wsum = w.rowsBetween(Window.unboundedPreceding, 0)
    island = (
        df.select("user_id", F.unix_micros("ts").alias("us"))
        .withColumn("prev_us", F.lag("us").over(w))
        .withColumn(
            "new_sess",
            F.when(
                F.col("prev_us").isNull()
                | (F.col("us") - F.col("prev_us") > GAP_MIN * 60_000_000),
                1,
            ).otherwise(0),
        )
        .withColumn("sess_id", F.sum("new_sess").over(wsum))
        .groupBy("user_id", "sess_id")
        .agg(
            F.timestamp_micros(F.min("us")).alias("start"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("user_id", "start", "n")
    )

    got = {(r["user_id"], r["start"]): r["n"] for r in builtin.collect()}
    want = {(r["user_id"], r["start"]): r["n"] for r in island.collect()}
    assert got == want
