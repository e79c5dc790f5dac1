"""Heap-sizing probe (round-15 optimization, guide section 5).

Runs a fixed mid-weight query subset in ONE session and reports wall
seconds plus the JVM's own accumulated GC milliseconds, so a
driver-memory A/B compares *GC tax*, not just noisy wall time.

Usage: python -m tools.heap_probe <sf_dir> <driver_mem> [reps]
"""

import sys
import time

SUBSET = [
    "q109_decontamination",
    "q50_vocab_coverage",
    "q111_dominant_suppliers",
    "q117_sequence_packing",
    "q145_prefix_filter_join",
    "q25_ngram_jaccard",
    "q24_simhash_pairs",
    "q13_corrupt_routing",
    "q09_lineitem_agg",
    "q104_shipping_lateness",
    "q76_priority_exists",
    "q112_kmeans_clusters",
    "q152_cms_heavy_hitters",
    "q99_global_running_sum",
    "q137_bpe_encode",
    "q86_tfidf_top_terms",
    "q78_promo_revenue",
    "q87_xml_roundtrip",
]


def gc_ms(spark) -> int:
    beans = (
        spark.sparkContext._jvm.java.lang.management.ManagementFactory
        .getGarbageCollectorMXBeans()
    )
    return sum(beans.get(i).getCollectionTime() for i in range(beans.size()))


def main() -> int:
    sf_dir, mem = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    from iot_data_pipeline_spark.queries import REGISTRY
    from iot_data_pipeline_spark.session import build_session

    spark = build_session(
        "heap_probe", extra_conf={"spark.driver.memory": mem}
    )

    def run(name):
        REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    run("q05_revenue_per_nation")  # warmup
    for r in range(reps):
        t0, g0 = time.perf_counter(), gc_ms(spark)
        for name in SUBSET:
            run(name)
        wall, gc = time.perf_counter() - t0, gc_ms(spark) - g0
        print(
            f"RESULT mem={mem} rep={r} wall={wall:.2f}s gc={gc / 1000:.2f}s",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
