"""Property test: the keyed as-of join (operators/joins.asof_join) must
agree with a direct per-key reference implementation on randomized
timelines -- both directions, including no-match rows (inner semantics:
left rows with no candidate are dropped).

Right-side timestamps are deduplicated per key: with duplicate
timestamps the rank-1 pick among equal ``right_on`` values is
tie-ambiguous by construction (documented in the operator), so the
property is stated over the deterministic domain.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

keyed_times = st.dictionaries(
    st.integers(min_value=1, max_value=3),  # key
    st.tuples(
        st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=8),
        st.lists(st.integers(min_value=0, max_value=50), min_size=0, max_size=8),
    ),
    min_size=1,
    max_size=3,
)


def _reference(left_rows, right_rows, direction):
    out = {}
    for k, lt in left_rows:
        cands = [
            rt
            for rk, rt in right_rows
            if rk == k and (rt <= lt if direction == "backward" else rt >= lt)
        ]
        if cands:
            out[(k, lt)] = max(cands) if direction == "backward" else min(cands)
    return out


@settings(
    max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(data=keyed_times)
def test_asof_join_matches_reference(spark, data):
    from iot_data_pipeline_spark.operators.joins import asof_join

    left_rows, right_rows = [], []
    for k, (lts, rts) in data.items():
        left_rows.extend((k, t) for t in sorted(set(lts)))
        right_rows.extend((k, t) for t in sorted(set(rts)))
    if not right_rows:
        right_rows = [(99, 0)]  # non-matching key keeps the frame non-empty

    left = spark.createDataFrame(left_rows, "k int, lt int")
    right = spark.createDataFrame(
        [(k, t, t * 10) for k, t in right_rows], "k int, rt int, payload int"
    )

    for direction in ("backward", "forward"):
        got = {
            (r["k"], r["lt"]): r["rt"]
            for r in asof_join(
                left, right, "lt", "rt", by=["k"], direction=direction
            ).collect()
        }
        want = _reference(left_rows, right_rows, direction)
        assert got == want, direction
        # payload rides along with the matched row
        for r in asof_join(
            left, right, "lt", "rt", by=["k"], direction=direction
        ).collect():
            assert r["payload"] == r["rt"] * 10


@settings(
    max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(data=keyed_times)
def test_asof_join_tolerance_bounds_matches(spark, data):
    """With a tolerance, every match must lie within the bound and equal
    the reference computed with the same cutoff; without one, tolerance
    = infinity reproduces the unbounded operator."""
    from pyspark.sql import functions as F

    from iot_data_pipeline_spark.operators.joins import asof_join

    tol = 3
    left_rows, right_rows = [], []
    for k, (lts, rts) in data.items():
        left_rows.extend((k, t) for t in sorted(set(lts)))
        right_rows.extend((k, t) for t in sorted(set(rts)))
    if not right_rows:
        right_rows = [(99, 0)]
    left = spark.createDataFrame(left_rows, "k int, lt int")
    right = spark.createDataFrame(right_rows, "k int, rt int")

    for direction in ("backward", "forward"):
        got = {
            (r["k"], r["lt"]): r["rt"]
            for r in asof_join(
                left, right, "lt", "rt",
                by=["k"], direction=direction, tolerance=F.lit(tol),
            ).collect()
        }
        want = {
            kv: rt
            for kv, rt in _reference(left_rows, right_rows, direction).items()
            if abs(rt - kv[1]) <= tol
        }
        assert got == want, direction


@settings(
    max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(data=keyed_times)
def test_asof_keep_unmatched_matches_reference(spark, data):
    """keep_unmatched=True must emit every left row exactly once -- the
    matched ones with the same candidate the inner path picks, the rest
    with NULL right columns (merge_asof's keep-everything shape)."""
    from iot_data_pipeline_spark.operators.joins import asof_join

    left_rows, right_rows = [], []
    for k, (lts, rts) in data.items():
        left_rows.extend((k, t) for t in sorted(set(lts)))
        right_rows.extend((k, t) for t in sorted(set(rts)))
    if not right_rows:
        right_rows = [(99, 0)]

    left = spark.createDataFrame(left_rows, "k int, lt int")
    right = spark.createDataFrame(
        [(k, t, t * 10) for k, t in right_rows], "k int, rt int, payload int"
    )
    for direction in ("backward", "forward"):
        rows = asof_join(
            left, right, "lt", "rt", by=["k"],
            direction=direction, keep_unmatched=True,
        ).collect()
        got = {(r["k"], r["lt"]): r["rt"] for r in rows}
        assert len(rows) == len(left_rows)  # every left row exactly once
        want = _reference(left_rows, right_rows, direction)
        for key in got:
            assert got[key] == want.get(key), (key, direction)
