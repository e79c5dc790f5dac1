"""Measure how the headline operators' wall time scales with input volume.

SCALE.md argues structurally that every operator's plan survives scale-up
(equi-join shapes, bounded state, map-side combines); this tool measures
it: each probed operator runs at 1x, 2x, 4x, and 8x the sf0.1 row volume
and reports rows/sec at each point. A scale-safe plan holds its throughput
(ratio ~1.0) as volume grows; a quadratic or single-reducer plan degrades
super-linearly -- on 32 local cores the signal is imperfect but a
hot-key serialization or an all-pairs blowup still shows immediately.

Scaling method: inputs are replicated k times with SHIFTED keys (ids
offset per replica, document text rotated per replica) so group/join/dedup
CARDINALITIES scale with row count -- a naive self-union would collapse
every replica into the same groups and flatter the aggregation.

Run:  python tools/scale_sweep.py [sf_dir]    (default /root/testdata/sf0.1)
Prints one JSON line per (operator, scale) plus a summary line; wall
times are min-of-2 (first run pays codegen).
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iot_data_pipeline_spark.session import build_session  # noqa: E402
from iot_data_pipeline_spark.sources.readers import read_table  # noqa: E402

SCALES = (1, 2, 4, 8)


def scaled_events(spark: SparkSession, sf_dir: str, k: int) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    max_id = 10_000_000  # comfortably above sf0.1's id range
    parts = [
        ev.select(
            (F.col("event_id") + F.lit(i * max_id)).alias("event_id"),
            "ts",
            (F.col("user_id") + F.lit(i * 1_000_000)).alias("user_id"),
            "event_type",
            "value",
        )
        for i in range(k)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def scaled_documents(spark: SparkSession, sf_dir: str, k: int) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    parts = []
    for i in range(k):
        # rotate the text per replica so shingles differ: replicas must be
        # NEW documents (scaling cardinality), not near-dups of the originals
        pos = F.lit(1 + 7 * i)
        rotated = F.concat(
            F.substring("text", 1 + 7 * i, 1_000_000),
            F.lit(f" r{i} "),
            F.substring("text", 1, 7 * i),
        )
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                (rotated if i else F.col("text")).alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def scaled_embeddings(spark: SparkSession, sf_dir: str, k: int) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    parts = [
        emb.select(
            (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
            "label",
            "embedding",
        )
        for i in range(k)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def run_to_noop(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()


def probes(spark: SparkSession, sf_dir: str):
    from iot_data_pipeline_spark.operators.dedup import (
        exact_dedup,
        minhash_dedup_candidates,
    )
    from iot_data_pipeline_spark.operators.prefix import global_running_sum
    from iot_data_pipeline_spark.operators.similarity import (
        cosine_topk_blocked,
    )
    from iot_data_pipeline_spark.operators.skew import salted_join

    def p_exact_dedup(k: int) -> DataFrame:
        return exact_dedup(
            scaled_documents(spark, sf_dir, k), ["text"], "doc_id"
        )

    def p_minhash(k: int) -> DataFrame:
        return minhash_dedup_candidates(
            scaled_documents(spark, sf_dir, k), "text", "doc_id"
        )

    def p_groupby_join(k: int) -> DataFrame:
        ev = scaled_events(spark, sf_dir, k)
        dim = spark.range(2000).select(
            F.col("id").alias("bucket"), (F.col("id") % 7).alias("w")
        )
        return (
            ev.join(dim, F.pmod("user_id", F.lit(2000)) == F.col("bucket"))
            .groupBy("event_type", "w")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("value"), 2).alias("total"),
            )
        )

    def p_salted_join(k: int) -> DataFrame:
        ev = scaled_events(spark, sf_dir, k).select(
            F.when(F.pmod("event_id", 10) < 9, F.lit(0))
            .otherwise(F.pmod("event_id", 1000))
            .cast("long")
            .alias("key"),
            "value",
        )
        dim = spark.range(1000).select(
            F.col("id").alias("key"), (F.col("id") % 7 + 1).alias("w")
        )
        return (
            salted_join(ev, dim, ["key"], n_salts=32)
            .groupBy(F.pmod("key", F.lit(10)).alias("b"))
            .agg(F.count(F.lit(1)).alias("n"))
        )

    def p_ivf_topk(k: int) -> DataFrame:
        emb = scaled_embeddings(spark, sf_dir, k)
        queries = emb.filter(F.col("vec_id") % 500 == 7)
        return cosine_topk_blocked(queries, emb, k=5)

    def p_running_sum(k: int) -> DataFrame:
        return global_running_sum(
            scaled_events(spark, sf_dir, k), "value", ["event_id"]
        )

    def p_window_agg(k: int) -> DataFrame:
        return (
            scaled_events(spark, sf_dir, k)
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    return {
        "exact_dedup": p_exact_dedup,
        "minhash_lsh_candidates": p_minhash,
        "dim_join_agg": p_groupby_join,
        "salted_skew_join": p_salted_join,
        "ivf_cosine_topk": p_ivf_topk,
        "global_running_sum": p_running_sum,
        "tumbling_window_agg": p_window_agg,
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = build_session("scale-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    # warm codegen / workers like bench.py
    read_table(spark, sf_dir, "events").groupBy("event_type").count().collect()

    results: dict[str, dict[int, dict[str, float]]] = {}
    for name, make in probes(spark, sf_dir).items():
        results[name] = {}
        for k in SCALES:
            df = make(k)
            rows = df.count()  # also warms the plan
            t_best = None
            for _ in range(2):
                t0 = time.perf_counter()
                run_to_noop(make(k))
                dt = time.perf_counter() - t0
                t_best = dt if t_best is None else min(t_best, dt)
            results[name][k] = {"wall": round(t_best, 3), "out_rows": rows}
            print(
                json.dumps(
                    {"op": name, "scale": k, "wall_sec": round(t_best, 3),
                     "out_rows": rows}
                ),
                flush=True,
            )

    summary = {}
    for name, per in results.items():
        w1 = per[1]["wall"]
        row = {f"wall_{k}x": per[k]["wall"] for k in SCALES}
        # >1 means worse-than-linear scaling of per-row cost; the largest
        # scale is the binding one (a quadratic term grows with k)
        for k in SCALES[1:]:
            row[f"t{k}_over_{k}t1"] = (
                round(per[k]["wall"] / (k * w1), 2) if w1 else None
            )
        summary[name] = row
    print(json.dumps({"scale_sweep": summary}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
