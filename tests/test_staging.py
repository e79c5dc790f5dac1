"""Per-process fixture staging cache (queries/staging.py)."""

from __future__ import annotations

from iot_data_pipeline_spark.queries import staging


def test_staged_fixture_builds_once_per_key():
    calls = []

    def build(d):
        calls.append(d)

    a1 = staging.staged_fixture("t_kind", "/sf/a", build)
    a2 = staging.staged_fixture("t_kind", "/sf/a", build)
    b1 = staging.staged_fixture("t_kind", "/sf/b", build)
    c1 = staging.staged_fixture("t_other", "/sf/a", build)
    assert a1 == a2
    assert len({a1, b1, c1}) == 3
    assert len(calls) == 3  # one build per distinct (kind, sf_dir)


def test_fresh_dir_and_unique_name_never_collide():
    assert staging.fresh_dir("t_run") != staging.fresh_dir("t_run")
    assert staging.unique_name("s") != staging.unique_name("s")
