"""A/B the round-15 chained worker warmup against the round-14 single-op
shape, on exactly the three light media decoders (q185/q186/q187) that the
round-15 verdict flagged as reproducibly ~30-45% slower (VERDICT item 5).

Usage: python -m tools.warmup_ab <sf_dir> <reps> <chained|single>

Each invocation is one fresh JVM/session (the quantity under test is how
the warmup shape conditions the worker pool that the first timed run of
each query sees), so run the two variants as alternating processes.
"""

import json
import sys
import time

QUERIES = ["q185_progressive_jpeg", "q186_adam7_palette_png", "q187_flac_decode"]


def main() -> int:
    sf_dir, reps, variant = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    assert variant in ("chained", "single")
    from iot_data_pipeline_spark.queries import REGISTRY
    from iot_data_pipeline_spark.session import build_session
    from iot_data_pipeline_spark.transient import release_transient_caches

    spark = build_session("warmup_ab")

    def run_to_noop(df):
        df.write.format("noop").mode("overwrite").save()

    run_to_noop(REGISTRY["q05_revenue_per_nation"].fn(spark, sf_dir))

    def _warm_workers(it):
        from iot_data_pipeline_spark.operators import (  # noqa: F401
            audio,
            flac,
            gif,
            jpeg,
            png,
        )

        return it

    if variant == "chained":  # round-15 bench.py shape: 32 tasks x 2 workers
        spark.range(64).repartition(32).mapInPandas(
            _warm_workers, "id long"
        ).mapInPandas(_warm_workers, "id long").collect()
    else:  # round-14 shape: 64 tasks x 1 worker (pool only grows to 32)
        spark.range(64).repartition(64).mapInPandas(
            _warm_workers, "id long"
        ).collect()

    out = {"variant": variant}
    for name in QUERIES:
        fn = REGISTRY[name].fn
        times = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"warmup_ab:{name}")
            t0 = time.perf_counter()
            run_to_noop(fn(spark, sf_dir))
            times.append(round(time.perf_counter() - t0, 3))
            release_transient_caches()
        out[name] = times
        print(json.dumps({name: times}), flush=True)
    print("RESULT " + json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
