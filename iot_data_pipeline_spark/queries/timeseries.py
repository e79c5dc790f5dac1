"""Time-series repair operators: gap filling against a generated time
spine, and forward-fill of sparse readings.

These are the two canonical IoT-telemetry repairs (the reference's
domain -- its records are sensor readings keyed by device and timestamp,
reference README.md:185-189): a device that sends nothing for an hour
must still produce a zero row for dashboards, and a device that sends
intermittently must carry its last known reading forward. Both are pure
DataFrame ops: the spine is `sequence()+explode` (no driver loop), the
fill is `last(ignorenulls)` over an ordered window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iot_data_pipeline_spark.queries.base import fmt_ts
from iot_data_pipeline_spark.queries.registry import declared
from iot_data_pipeline_spark.sources.readers import read_table


@declared(
    "q58_gap_fill",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo FROM events
    ),
    spine AS (
      SELECT unnest(generate_series(lo, lo + INTERVAL 71 HOUR,
                                    INTERVAL 1 HOUR)) AS hour_ts
      FROM bounds
    ),
    hourly AS (
      SELECT date_trunc('hour', ts) AS hour_ts,
             COUNT(*) AS n, SUM(value) AS total
      FROM events WHERE event_type = 'click'
      GROUP BY 1
    )
    SELECT strftime(s.hour_ts, '%Y-%m-%d %H:%M:%S') AS hour_s,
           COALESCE(h.n, 0) AS n_clicks,
           ROUND(COALESCE(h.total, 0), 2) AS click_value
    FROM spine s LEFT JOIN hourly h ON s.hour_ts = h.hour_ts
    ORDER BY hour_s
    """,
)
def q58_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap filling: left-join hourly aggregates onto a generated 72-hour
    spine so silent hours surface as explicit zero rows.

    Scale plan: the spine is `sequence()+explode` from a 1-row bounds
    aggregate -- generated, never stored; it broadcast-joins against
    the (already aggregated, small) hourly rollup. At 100 TB only the
    rollup sees the full data, with map-side partial aggregation.
    """
    ev = read_table(spark, sf_dir, "events")
    bounds = ev.agg(F.date_trunc("hour", F.min("ts")).alias("lo"))
    spine = bounds.select(
        F.explode(
            F.sequence(
                F.col("lo"),
                F.col("lo") + F.expr("interval 71 hours"),
                F.expr("interval 1 hour"),
            )
        ).alias("hour_ts")
    )
    hourly = (
        ev.filter(F.col("event_type") == "click")
        .groupBy(F.date_trunc("hour", "ts").alias("hour_ts"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
    )
    return (
        spine.join(hourly, "hour_ts", "left")
        .select(
            fmt_ts("hour_ts").alias("hour_s"),
            F.coalesce("n", F.lit(0)).alias("n_clicks"),
            F.round(F.coalesce("total", F.lit(0.0)), 2).alias("click_value"),
        )
        .orderBy("hour_s")
    )


@declared(
    "q59_forward_fill",
    oracle="""
    WITH readings AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_id % 5 = 0 THEN value END AS reading
      FROM events WHERE user_id < 20
    )
    SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, event_id,
           ROUND(reading, 2) AS reading,
           ROUND(LAST_VALUE(reading IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS filled
    FROM readings
    ORDER BY user_id, ts_s, event_id
    """,
)
def q59_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward fill (last-observation-carried-forward): only every 5th
    event carries a reading; the rest inherit the most recent non-null
    one per user. `last(ignorenulls)` over an ordered running frame is
    the single-pass distributed formulation -- no self-join, no UDF;
    rows before the first reading stay NULL by construction.
    """
    ev = read_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    reading = F.when(F.col("event_id") % 5 == 0, F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.select(
            "user_id",
            fmt_ts("ts").alias("ts_s"),
            "event_id",
            F.round(reading, 2).alias("reading"),
            F.round(F.last(reading, ignorenulls=True).over(w), 2).alias(
                "filled"
            ),
        )
        .orderBy("user_id", "ts_s", "event_id")
    )


@declared(
    "q65_rolling_zscore",
    oracle="""
    WITH cents AS (
      SELECT user_id, ts, event_id, value,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS c
      FROM events WHERE user_id < 5
    ),
    moments AS (
      SELECT user_id, ts, event_id, value, c,
             SUM(c) OVER w AS s1,
             SUM(c * c) OVER w AS s2,
             COUNT(*) OVER w AS n
      FROM cents
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 50 PRECEDING AND 1 PRECEDING)
    ),
    scored AS (
      SELECT user_id, ts, event_id, value, c, n,
             CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS dmu,
             (CAST(s2 AS DOUBLE)
              - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * CAST(s1 AS DOUBLE))
             / CAST(n - 1 AS DOUBLE) AS dvar
      FROM moments WHERE n >= 10
    )
    SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, event_id,
           ROUND(value, 2) AS value,
           ROUND(dmu / 100, 2) AS rolling_mean,
           CASE WHEN dvar > 0
                THEN ROUND((CAST(c AS DOUBLE) - dmu) / SQRT(dvar), 2)
           END AS zscore,
           CASE WHEN dvar > 0
                 AND ROUND((CAST(c AS DOUBLE) - dmu) / SQRT(dvar), 2) > 2.0
                THEN 1 ELSE 0 END AS is_anomaly
    FROM scored
    ORDER BY user_id, ts_s, event_id
    """,
)
def q65_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection (IoT telemetry): each reading
    scored against the mean/stddev of its user's previous 50 readings
    (frame ends at 1 PRECEDING so the tested value never contaminates
    its own baseline). Warm-up rows (<10 prior readings) are excluded.

    Cross-engine float exactness: windowed AVG/STDDEV are NOT portable
    -- DuckDB aggregates sliding frames through a segment tree while
    Spark recomputes each frame sequentially, so the two sum in
    different orders and ROUND can flip on .005 boundaries. The query
    therefore accumulates integer cents (exact in any order) and
    derives mean/variance from the integer moment sums with an
    identical float expression on both sides.
    """
    ev = read_table(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    c = F.round(F.col("value") * 100, 0).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-50, -1)
    )
    base = ev.select(
        "user_id", "ts", "event_id", "value", c.alias("c")
    ).select(
        "*",
        F.sum("c").over(w).alias("s1"),
        F.sum(F.col("c") * F.col("c")).over(w).alias("s2"),
        F.count(F.lit(1)).over(w).alias("n"),
    ).filter(F.col("n") >= 10)
    dmu = F.col("s1").cast("double") / F.col("n").cast("double")
    dvar = (
        F.col("s2").cast("double") - dmu * F.col("s1").cast("double")
    ) / (F.col("n") - 1).cast("double")
    z = F.when(dvar > 0, F.round((F.col("c").cast("double") - dmu) / F.sqrt(dvar), 2))
    return (
        base.select(
            "user_id",
            fmt_ts("ts").alias("ts_s"),
            "event_id",
            F.round("value", 2).alias("value"),
            F.round(dmu / 100, 2).alias("rolling_mean"),
            z.alias("zscore"),
            F.when(z > 2.0, 1).otherwise(0).alias("is_anomaly"),
        )
        .orderBy("user_id", "ts_s", "event_id")
    )


@declared(
    "q75_scd2_intervals",
    oracle="""
    WITH changes AS (
      SELECT user_id, ts, event_id, value,
             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS next_ts
      FROM events WHERE event_type = 'signup' AND user_id < 30
    )
    SELECT user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
           COALESCE(strftime(next_ts, '%Y-%m-%d %H:%M:%S'),
                    '9999-12-31 00:00:00') AS valid_to,
           CASE WHEN next_ts IS NULL THEN 1 ELSE 0 END AS is_current,
           ROUND(value, 2) AS attr_value
    FROM changes
    ORDER BY user_id, valid_from, event_id
    """,
)
def q75_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension building: each change event becomes a
    versioned row whose validity interval runs to the NEXT change
    (LEAD), with the open-ended current row flagged. This is the
    standard warehouse pattern for as-of dimension lookups (pairs with
    q08b's as-of join), built from one window pass -- no MERGE
    machinery needed for append-only history.
    """
    ev = read_table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "signup") & (F.col("user_id") < 30)
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    next_ts = F.lead("ts").over(w)
    return (
        ev.select(
            "user_id",
            fmt_ts("ts").alias("valid_from"),
            F.coalesce(fmt_ts(next_ts), F.lit("9999-12-31 00:00:00")).alias(
                "valid_to"
            ),
            F.when(next_ts.isNull(), 1).otherwise(0).alias("is_current"),
            F.round("value", 2).alias("attr_value"),
            "event_id",
        )
        .orderBy("user_id", "valid_from", "event_id")
        .drop("event_id")
    )


@declared(
    "q142_ewma",
    oracle="""
    WITH ranked AS (
      SELECT user_id, value, ts, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rdesc
      FROM events
    ),
    seq AS (
      SELECT user_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS i
      FROM ranked WHERE rdesc <= 40
    ),
    run AS (
      SELECT user_id, i,
             SUM(value * power(0.8, -i)) OVER (
               PARTITION BY user_id ORDER BY i ROWS UNBOUNDED PRECEDING)
             / SUM(power(0.8, -i)) OVER (
               PARTITION BY user_id ORDER BY i ROWS UNBOUNDED PRECEDING)
               AS ewma
      FROM seq
    ),
    last AS (
      SELECT user_id, i, ewma,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY i DESC) AS rl
      FROM run
    )
    SELECT user_id, CAST(i AS BIGINT) AS n_obs, ROUND(ewma, 4) AS ewma_value
    FROM last WHERE rl = 1 ORDER BY user_id
    """,
)
def q142_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average per device stream (the
    smoothing/monitoring primitive next to q65's rolling z-score):
    pandas-``ewm(alpha=0.2, adjust=True)`` semantics in pure window
    algebra -- s_i = sum_j (1-a)^(i-j) x_j / sum_j (1-a)^(i-j) -- via
    running sums of value*(1-a)^(-j); the (1-a)^i factors cancel in the
    ratio, so no per-row renormalization. Series capped to the most
    recent 40 observations per key, which both bounds the (1-a)^(-j)
    dynamic range (1.25^40 ~ 7.5e3: safe doubles) and matches how a
    monitor actually windows its input.

    Scale notes: two window passes over the SAME (user_id, ts) shuffle
    partitioning (rank-cap, then running sums) -- one exchange total;
    output is one row per key. No UDFs, no iteration: the recursive EWMA
    definition is rewritten into prefix sums, the same trick as
    operators/prefix.py.
    """
    ev = read_table(spark, sf_dir, "events")
    w_desc = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    capped = ev.withColumn("rdesc", F.row_number().over(w_desc)).filter(
        F.col("rdesc") <= 40
    )
    w_asc = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = capped.withColumn("i", F.row_number().over(w_asc))
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ewma = F.sum(F.col("value") * F.pow(F.lit(0.8), -F.col("i"))).over(
        w_run
    ) / F.sum(F.pow(F.lit(0.8), -F.col("i"))).over(w_run)
    w_last = Window.partitionBy("user_id").orderBy(F.desc("i"))
    return (
        seq.withColumn("ewma", ewma)
        .withColumn("rl", F.row_number().over(w_last))
        .filter(F.col("rl") == 1)
        .select(
            "user_id",
            F.col("i").cast("bigint").alias("n_obs"),
            F.round("ewma", 4).alias("ewma_value"),
        )
        .orderBy("user_id")
    )


@declared(
    "q172_ohlc_resample",
    oracle="""
    WITH src AS (
      SELECT user_id % 8 AS series,
             time_bucket(INTERVAL 1 HOUR, ts) AS bucket,
             CAST(epoch(ts) AS BIGINT) * 100000 + event_id AS ord,
             value
      -- NULL-value ticks are not prices: DuckDB's arg_min SKIPS null
      -- arguments while Spark's min_by does not, so they must never
      -- reach the aggregate (degenerate-events fixture finding)
      FROM events WHERE event_id < 20000 AND value IS NOT NULL
    )
    -- strftime, not CAST(.. AS VARCHAR): a tz-aware source column
    -- (isAdjustedToUTC parquet, round-8 sweep) casts with a '+00'
    -- suffix, while strftime renders the same UTC wall time either way
    SELECT series, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_ticks,
           ROUND(arg_min(value, ord), 2) AS open,
           ROUND(MAX(value), 2) AS high,
           ROUND(MIN(value), 2) AS low,
           ROUND(arg_max(value, ord), 2) AS close
    FROM src GROUP BY series, bucket
    ORDER BY series, bucket
    """,
)
def q172_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling (the finance/telemetry resample every
    time-series store ships): per (series, hour bucket), open/close are
    the values at the earliest/latest (ts, event_id) -- encoded as the
    scalar key epoch*1e5 + event_id so ties are deterministic in both
    engines (SURVEY section 2.3 rule 1; min_by/max_by on a tied plain
    ts would be engine-arbitrary) -- and
    high/low are plain extremes. One partial-aggregated shuffle on
    (series, bucket): min_by/max_by are mergeable aggregates, so this
    downsample composes with streaming/rollup.py's partial-fold layout
    for always-fresh bars at 100 TB (counts/extremes merge exactly;
    open/close merge by keeping the argument-extreme pair).

    Extends the time-series family (q58 gap fill, q59 forward fill,
    q65 rolling anomaly, q142 EWMA) with the bucket-reduce member.
    """
    ev = (
        read_table(spark, sf_dir, "events")
        # NULL-value ticks are not prices (and min_by would pick them
        # where the oracle's arg_min skips them)
        .filter((F.col("event_id") < 20000) & F.col("value").isNotNull())
        .select(
            (F.col("user_id") % 8).alias("series"),
            F.date_trunc("hour", "ts").alias("bucket"),
            (
                F.unix_timestamp("ts").cast("bigint") * 100000
                + F.col("event_id")
            ).alias("ord"),
            "value",
        )
    )
    key = F.col("ord")
    return (
        ev.groupBy("series", "bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_ticks"),
            F.round(F.min_by("value", key), 2).alias("open"),
            F.round(F.max("value"), 2).alias("high"),
            F.round(F.min("value"), 2).alias("low"),
            F.round(F.max_by("value", key), 2).alias("close"),
        )
        .select(
            "series",
            F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            "n_ticks",
            "open",
            "high",
            "low",
            "close",
        )
        .orderBy("series", "bucket")
    )
