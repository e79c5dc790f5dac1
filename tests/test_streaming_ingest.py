

# ------------------------------------------------------- control-plane events


def test_validate_file_event_accepts_well_formed():
    from iot_data_pipeline_spark.streaming.ingest import validate_file_event

    ev = {
        "Records": [
            {"s3": {"bucket": {"name": "raw"}, "object": {"key": "a/b.jsonl"}}},
            {"s3": {"bucket": {"name": "raw"}, "object": {"key": "c.jsonl"}}},
        ]
    }
    assert validate_file_event(ev) == [("raw", "a/b.jsonl"), ("raw", "c.jsonl")]


def test_validate_file_event_rejects_malformed():
    import pytest

    from iot_data_pipeline_spark.streaming.ingest import (
        MalformedEventError,
        validate_file_event,
    )

    bad = [
        "not an object",
        {},
        {"Records": []},
        {"Records": "nope"},
        {"Records": [{"s3": {}}]},
        {"Records": [{"s3": {"bucket": {"name": ""}, "object": {"key": "k"}}}]},
        {"Records": [{"s3": {"bucket": {"name": "b"}, "object": {}}}]},
    ]
    for ev in bad:
        with pytest.raises(MalformedEventError):
            validate_file_event(ev)
