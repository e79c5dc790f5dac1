"""Worker entry point: ``python -m iot_data_pipeline_spark``.

Mirrors the reference worker's contract (reference app/app.py:90-148):

- Configured mode: reads the same four env vars the reference's Fargate
  task receives -- INPUT_BUCKET/INPUT_KEY/OUTPUT_BUCKET/OUTPUT_KEY
  (reference app/app.py:91-95, set by lambda/s3_event_handler.py:61-66) --
  interpreted as path components (``<bucket>/<key>``), since this engine
  is storage-agnostic: any Hadoop-compatible filesystem URI works (local
  path, ``s3a://`` bucket, HDFS). ``INPUT_PATH``/``OUTPUT_PATH`` are
  accepted as the direct spelling.
- Fallback mode: with the env vars absent, writes the reference's exact
  5-record dummy dataset -- including the malformed line and the
  missing-temperature record (reference app/app.py:103-108) -- processes
  it locally, and exits 0 (reference app/app.py:110-145).
- Exit codes: 0 on success, 1 on a missing input (reference
  app/app.py:84-86).
"""

from __future__ import annotations

import json
import logging
import os
import sys

log = logging.getLogger("iot_data_pipeline_spark")

#: the reference's embedded dummy dataset, verbatim (app/app.py:103-108)
DUMMY_LINES = [
    json.dumps({"device_id": "sensor-001", "temperature": 25.5, "humidity": 60}),
    json.dumps({"device_id": "sensor-002", "temperature": 30.0, "humidity": 65}),
    json.dumps({"device_id": "sensor-003", "temperature": 20.1, "humidity": 55}),
    "this is a bad line",
    json.dumps({"device_id": "sensor-004", "humidity": 70}),
]


def _resolve_paths() -> tuple[str, str] | None:
    in_path = os.environ.get("INPUT_PATH")
    out_path = os.environ.get("OUTPUT_PATH")
    if in_path and out_path:
        return in_path, out_path
    parts = [
        os.environ.get(k)
        for k in ("INPUT_BUCKET", "INPUT_KEY", "OUTPUT_BUCKET", "OUTPUT_KEY")
    ]
    if all(parts):
        ib, ik, ob, ok = parts
        return f"{ib}/{ik}", f"{ob}/{ok}"
    return None


def main() -> int:
    logging.basicConfig(level=logging.INFO)
    from iot_data_pipeline_spark.pipeline import PipelineConfig, run_batch_pipeline
    from iot_data_pipeline_spark.session import build_session

    paths = _resolve_paths()
    spark = build_session("iot-worker")

    if paths is None:
        log.info(
            "No INPUT/OUTPUT env vars; processing the embedded dummy "
            "dataset (reference local fallback)."
        )
        with open("raw_sensor_data.jsonl", "w") as f:
            f.write("\n".join(DUMMY_LINES) + "\n")
        n_good, n_bad = run_batch_pipeline(
            spark, "raw_sensor_data.jsonl", "processed_sensor_data.jsonl"
        )
        log.info("local processing complete: %d good, %d bad", n_good, n_bad)
        return 0

    in_path, out_path = paths
    dlq = os.environ.get("DEAD_LETTER_PATH")
    threshold = os.environ.get("TEMPERATURE_THRESHOLD")
    config = PipelineConfig(
        temperature_threshold=float(threshold) if threshold else None,
        dead_letter_path=dlq,
    )
    try:
        n_good, n_bad = run_batch_pipeline(spark, in_path, out_path, config)
    except Exception as e:  # missing input object -> exit 1 (A14)
        log.error("processing failed: %s", e)
        return 1
    log.info("processing complete: %d good, %d bad", n_good, n_bad)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
