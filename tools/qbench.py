"""Isolated per-query A/B measurement harness (round-15 optimization).

Runs the named registry queries in ONE session, N repeats each, prints
the min/median per query. Matches bench.py's methodology: build the
DataFrame fresh each repeat and execute to the noop sink. The warmup
query (q05) absorbs session/codegen cold start exactly like bench.py.

Usage: python -m tools.qbench <sf_dir> <reps> <name> [<name>...]
"""

import json
import sys
import time


def main() -> int:
    sf_dir, reps = sys.argv[1], int(sys.argv[2])
    names = sys.argv[3:]
    from iot_data_pipeline_spark.queries import REGISTRY
    from iot_data_pipeline_spark.session import build_session
    from iot_data_pipeline_spark.transient import release_transient_caches

    spark = build_session("qbench")

    def run_to_noop(df):
        df.write.format("noop").mode("overwrite").save()

    # same warmup as bench.py
    run_to_noop(REGISTRY["q05_revenue_per_nation"].fn(spark, sf_dir))

    out = {}
    for name in names:
        fn = REGISTRY[name].fn
        times = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"qbench:{name}")
            t0 = time.perf_counter()
            run_to_noop(fn(spark, sf_dir))
            times.append(round(time.perf_counter() - t0, 3))
            # bench.py releases per-query transient persists outside the
            # timed region; repeats here must match that lifecycle or a
            # transient_persist query re-pins a new frame every rep
            release_transient_caches()
        out[name] = {"min": min(times), "all": times}
        print(json.dumps({name: out[name]}), flush=True)
    print("RESULT " + json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
