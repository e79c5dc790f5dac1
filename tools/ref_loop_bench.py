"""Measure the reference pipeline's single-threaded loop on THIS machine.

BASELINE.md's problem: the reference (`7003078589/iot-data-pipeline`)
publishes no performance numbers, so the "within 2x of baseline" gate has
no denominator. This script produces one reproducibly: it times a faithful
reimplementation of the reference worker's record loop (semantics of
reference app/app.py:33-72 -- decode, strip, skip empties, json.loads with
log-and-drop, dict check, add processed_timestamp, numeric-gated C->F,
buffer everything, serialize once) over the SAME workload shape the engine's
`bench.py` b04_pipeline_throughput uses (events reshaped to sensor JSONL).

Run:  python tools/ref_loop_bench.py [sf_dir]     (default /root/testdata/sf0.1)
Prints one JSON line: {"ref_loop_records_per_sec": N, "records": M, ...}.

The code here is written from the reference's OBSERVED semantics, not
copied; logging calls are elided (logging at debug level per record would
only slow the reference further -- omitting them is generous to it).
"""

from __future__ import annotations

import datetime
import io
import json
import os
import sys
import time


def build_fixture(sf_dir: str, path: str) -> int:
    """Reshape the events table to sensor JSONL, exactly like bench.py b04
    (device_id, temperature, humidity, timestamp). pyarrow only -- no Spark
    involvement in a reference-side measurement."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "value", "ts"]
    )
    n = 0
    with open(path, "w") as f:
        for batch in tbl.to_batches():
            users = batch.column("user_id").to_pylist()
            values = batch.column("value").to_pylist()
            tss = batch.column("ts").to_pylist()
            for u, v, ts in zip(users, values, tss):
                rec = {
                    "device_id": f"device-{u % 25}",
                    "temperature": v / 10 - 5,
                    "humidity": v,
                    "timestamp": ts.strftime("%Y-%m-%dT%H:%M:%SZ"),
                }
                f.write(json.dumps(rec) + "\n")
                n += 1
    return n


def c_to_f(celsius: float) -> float:
    return (celsius * 9 / 5) + 32


def reference_loop(raw: bytes) -> str:
    """The reference worker's per-file processing, reimplemented from its
    observed behavior (single thread, full in-memory buffering)."""
    processed = []
    for line_bytes in raw.splitlines():
        line = line_bytes.decode("utf-8").strip()
        if not line:
            continue
        try:
            record = json.loads(line)
        except json.JSONDecodeError:
            continue  # reference logs and drops
        if not isinstance(record, dict):
            continue
        record["processed_timestamp"] = datetime.datetime.now(
            datetime.timezone.utc
        ).isoformat()
        if "temperature" in record and isinstance(record["temperature"], (int, float)):
            record["temp_fahrenheit"] = c_to_f(record["temperature"])
        processed.append(record)
    out = io.StringIO()
    for record in processed:
        out.write(json.dumps(record) + "\n")
    return out.getvalue()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import tempfile

    work = tempfile.mkdtemp(prefix="ref_loop_bench_")
    fixture = os.path.join(work, "input.jsonl")
    n = build_fixture(sf_dir, fixture)

    with open(fixture, "rb") as f:
        raw = f.read()
    reference_loop(raw[: len(raw) // 50])  # warm-up slice

    t0 = time.perf_counter()
    with open(fixture, "rb") as f:
        raw = f.read()
    output = reference_loop(raw)
    out_path = os.path.join(work, "processed_input.jsonl")
    with open(out_path, "w") as f:
        f.write(output)
    dt = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "ref_loop_records_per_sec": round(n / dt),
                "records": n,
                "loop_sec": round(dt, 3),
                "sf_dir": sf_dir,
                "note": "single thread, full core; reference deploys at "
                "0.25 vCPU so its envelope rate is ~1/4 of this",
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
