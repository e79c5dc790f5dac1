"""Property-based dirty-data fuzz for the corrupt-record channel
(SURVEY.md section 5.2; reference semantics app/app.py:35-65).

A generated JSONL file mixes valid records, records with wrong-typed
numeric fields, top-level non-objects, unparseable text, and blank lines.
Invariants, for every generated file:

1. conservation -- every non-blank line lands in exactly one of good/bad;
2. routing -- the bad side carries exactly the raw text of the lines a
   reference-faithful Python model rejects (parse failure, non-object
   top level, or non-numeric value in a declared-numeric field);
3. transform -- every surviving record with numeric temperature gets
   temp_fahrenheit = round(t*9/5+32, 2), all others NULL (app/app.py:15-17).

Generated values stay within the schema's declared field set plus unknown
extra fields (which schema-on-read must ignore), so the Python model and
Spark's PERMISSIVE JSON reader agree by construction on what "malformed"
means -- the fuzz explores mixtures and orderings, not parser edge cases.
"""

from __future__ import annotations

import json
import math
import os
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from iot_data_pipeline_spark.pipeline import PipelineConfig, transform_sensor
from iot_data_pipeline_spark.sources.readers import (
    SENSOR_SCHEMA,
    read_jsonl,
    split_corrupt,
)

NUMERIC_FIELDS = ("temperature", "humidity", "pressure")

num_value = st.one_of(
    st.integers(min_value=-1000, max_value=1000),
    st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
)
bad_num_value = st.sampled_from(["hot", "n/a", ""])


@st.composite
def record_line(draw, idx: int) -> tuple[str, bool]:
    """One line + whether the model says it survives to the good side."""
    kind = draw(st.sampled_from(["valid", "badnum", "nonobject", "garbage", "blank"]))
    if kind == "blank":
        return "", None  # dropped from both sides
    if kind == "garbage":
        return draw(st.sampled_from(["this is a bad line", "{not json", "}{", "[1,2"])), False
    if kind == "nonobject":
        return draw(st.sampled_from(['"bare string"', "42", "[1, 2, 3]", "true"])), False
    rec: dict = {"device_id": f"dev{idx}"}
    if draw(st.booleans()):
        rec["location"] = draw(st.sampled_from(["lab", "roof", "yard"]))
    for f in NUMERIC_FIELDS:
        has = draw(st.sampled_from(["num", "bad", "absent"]))
        if has == "num":
            rec[f] = draw(num_value)
        elif has == "bad":
            rec[f] = draw(bad_num_value)
    if draw(st.booleans()):
        rec["extra_field"] = "ignored"  # schema-on-read drops unknowns
    if kind == "badnum" and not any(
        isinstance(rec.get(f), str) for f in NUMERIC_FIELDS
    ):
        # badnum must actually be bad: force one non-numeric field
        rec["temperature"] = draw(bad_num_value)
    # the model: an object record is good iff every declared-numeric field
    # that is present holds a number (kind only steers generation)
    good = not any(isinstance(rec.get(f), str) for f in NUMERIC_FIELDS)
    return json.dumps(rec), good


lines_strategy = st.integers(min_value=5, max_value=25).flatmap(
    lambda n: st.tuples(*[record_line(i) for i in range(n)])
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(lines=lines_strategy)
def test_corrupt_routing_invariants(spark, lines):
    raw_lines = [text for text, _ in lines]
    expect_bad = sorted(t for t, ok in lines if ok is False)
    expect_good_n = sum(1 for _, ok in lines if ok is True)

    with tempfile.TemporaryDirectory(prefix="idp_fuzz_") as d:
        path = os.path.join(d, "in.jsonl")
        with open(path, "w") as f:
            f.write("\n".join(raw_lines) + "\n")

        df = read_jsonl(spark, path, SENSOR_SCHEMA)
        good, bad = split_corrupt(df)
        good_rows = good.collect()
        bad_rows = bad.collect()

        # (1) conservation + (2) routing: bad carries the exact raw lines
        assert len(good_rows) == expect_good_n
        assert sorted(r["raw_line"] for r in bad_rows) == expect_bad

        # (3) transform: fahrenheit iff numeric temperature
        out = transform_sensor(good, PipelineConfig(fixed_clock="2026-01-01T00:00:00Z"))
        models = {
            json.loads(t)["device_id"]: json.loads(t) for t, ok in lines if ok is True
        }
        for row in out.collect():
            model = models[row["device_id"]]
            t = model.get("temperature")
            if t is None:
                assert row["temp_fahrenheit"] is None
            else:
                # float32 JSON round-trip: compare at write precision
                assert row["temp_fahrenheit"] is not None
                assert math.isclose(
                    row["temp_fahrenheit"], round(float(t) * 9 / 5 + 32, 2), abs_tol=0.011
                )
