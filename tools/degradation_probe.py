"""Session-age degradation probe (round-16).

q117's 32-task window stage runs 1.2 s in a fresh session but 8.5 s at
its (late) position in the full bench -- a per-session slowdown that the
round-15 verdict's "+44 s of ambient sub-second drift" may share. This
probe runs the registry in bench order and re-times a fixed probe query
(q117) plus a canonical pure-JVM 32-task stage every K queries,
recording GC time, JVM heap, loaded class count and live thread count,
to identify what accumulates.

Usage: python -m tools.degradation_probe <sf_dir> [probe_every]
"""

import json
import sys
import time


def jvm_stats(spark):
    jvm = spark.sparkContext._jvm
    mf = jvm.java.lang.management.ManagementFactory
    gc_ms = 0
    for b in mf.getGarbageCollectorMXBeans():
        gc_ms += b.getCollectionTime()
    heap = mf.getMemoryMXBean().getHeapMemoryUsage()
    classes = mf.getClassLoadingMXBean().getLoadedClassCount()
    threads = mf.getThreadMXBean().getThreadCount()
    return {
        "gc_ms": int(gc_ms),
        "heap_used_mb": int(heap.getUsed() / 1048576),
        "classes": int(classes),
        "threads": int(threads),
    }


def main() -> int:
    sf_dir = sys.argv[1]
    every = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    from iot_data_pipeline_spark.queries import REGISTRY
    from iot_data_pipeline_spark.session import build_session
    from iot_data_pipeline_spark.transient import release_transient_caches

    spark = build_session("degradation_probe")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def probe(tag):
        s0 = jvm_stats(spark)
        t0 = time.perf_counter()
        noop(REGISTRY["q117_sequence_packing"].fn(spark, sf_dir))
        dt_q = time.perf_counter() - t0
        release_transient_caches()
        # canonical pure-JVM 32-task stage: range -> repartition -> agg
        from pyspark.sql import functions as F

        t0 = time.perf_counter()
        noop(
            spark.range(32 * 50000)
            .repartition(32)
            .select(F.sha2(F.col("id").cast("string"), 256).alias("h"))
        )
        dt_s = time.perf_counter() - t0
        s1 = jvm_stats(spark)
        print(
            "PROBE "
            + json.dumps(
                {
                    "at": tag,
                    "q117_sec": round(dt_q, 3),
                    "stage_sec": round(dt_s, 3),
                    "gc_delta_ms": s1["gc_ms"] - s0["gc_ms"],
                    **s1,
                }
            ),
            flush=True,
        )

    noop(REGISTRY["q05_revenue_per_nation"].fn(spark, sf_dir))
    probe("start")
    skip = {"q117_sequence_packing"}
    n = 0
    for name, dq in REGISTRY.items():
        if name in skip:
            continue
        try:
            noop(dq.fn(spark, sf_dir))
        except Exception as exc:
            print(f"# {name}: ERR {exc}", flush=True)
        release_transient_caches()
        n += 1
        if n % every == 0:
            probe(f"after_{n}")
    probe("end")
    return 0


if __name__ == "__main__":
    sys.exit(main())
