"""The module CLI reproduces the reference worker contract: env-var
configured run, dummy-data fallback, exit-1 on missing input
(reference app/app.py:84-148)."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def _run(env_extra, cwd):
    env = dict(os.environ)
    env.pop("INPUT_PATH", None)
    env.pop("OUTPUT_PATH", None)
    for k in ("INPUT_BUCKET", "INPUT_KEY", "OUTPUT_BUCKET", "OUTPUT_KEY"):
        env.pop(k, None)
    env.update(env_extra)
    env["SPARK_GRAFT_CPUS"] = "2"
    # the package is run from a source checkout, not an install: make it
    # importable regardless of cwd (fallback mode runs inside tmp_path)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, "-m", "iot_data_pipeline_spark"],
        cwd=cwd,
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )


def test_worker_env_configured_run(tmp_path):
    raw = tmp_path / "in.jsonl"
    recs = [
        {"device_id": "d1", "temperature": 20.0, "humidity": 50.0},
        {"device_id": "d2", "humidity": 60.0},
    ]
    raw.write_text("".join(json.dumps(r) + "\n" for r in recs))
    out = tmp_path / "out"
    r = _run(
        {"INPUT_PATH": str(raw), "OUTPUT_PATH": str(out)}, cwd="/root/repo"
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = []
    for f in out.glob("part-*"):
        lines += [json.loads(x) for x in f.read_text().splitlines()]
    assert len(lines) == 2
    by_dev = {x["device_id"]: x for x in lines}
    assert by_dev["d1"]["temp_fahrenheit"] == 68.0
    assert "temp_fahrenheit" not in by_dev["d2"] or by_dev["d2"].get(
        "temp_fahrenheit"
    ) is None


def test_worker_dummy_fallback_and_missing_input(tmp_path):
    # fallback: no env vars -> dummy data processed, exit 0 (reference
    # app/app.py:97-145); 4 of 5 records survive (1 malformed dropped)
    r = _run({}, cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    out_lines = [
        json.loads(x)
        for x in (tmp_path / "processed_sensor_data.jsonl").read_text().splitlines()
    ] if (tmp_path / "processed_sensor_data.jsonl").is_file() else [
        json.loads(x)
        for f in (tmp_path / "processed_sensor_data.jsonl").glob("part-*")
        for x in f.read_text().splitlines()
    ]
    assert len(out_lines) == 4
    assert sum("temp_fahrenheit" in x and x["temp_fahrenheit"] is not None
               for x in out_lines) == 3

    # missing input object -> exit 1 (A14, reference app/app.py:84-86)
    r = _run(
        {
            "INPUT_PATH": str(tmp_path / "nope.jsonl"),
            "OUTPUT_PATH": str(tmp_path / "out2"),
        },
        cwd="/root/repo",
    )
    assert r.returncode == 1
