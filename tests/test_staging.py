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


def test_batch_mtime_pinner_orders_batches(tmp_path):
    """FileStreamSource orders files by mtime; the pinner must give each
    batch's new data files an mtime strictly greater than every earlier
    batch's, even when the underlying writes land in the same
    filesystem-timestamp tick, and must skip metadata files."""
    import os

    d = str(tmp_path)
    stamp = staging.batch_mtime_pinner(d)

    def write(name: str) -> None:
        with open(os.path.join(d, name), "w") as f:
            f.write("x")

    write("part-00000-a.parquet")
    write("_SUCCESS")
    stamp()
    write("part-00000-b.parquet")
    stamp()
    write("part-00000-c.parquet")
    write("part-00001-c.parquet")  # multi-file batch
    stamp()

    mt = {n: os.stat(os.path.join(d, n)).st_mtime for n in os.listdir(d)}
    assert mt["part-00000-a.parquet"] < mt["part-00000-b.parquet"]
    assert mt["part-00000-b.parquet"] < mt["part-00000-c.parquet"]
    assert mt["part-00000-c.parquet"] == mt["part-00001-c.parquet"]
    # metadata files keep their natural (newest) mtime -> untouched means
    # LATER than the pinned (past-based) batch stamps
    assert mt["_SUCCESS"] > mt["part-00000-c.parquet"]
    # pinned mtimes sit in the past: a file appended later at natural
    # time cannot sort before any pinned batch
    assert mt["part-00000-c.parquet"] < os.path.getmtime(d)
