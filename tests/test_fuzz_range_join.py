"""Property test: the range join (operators/joins.range_join) must agree
with a direct per-pair reference on randomized timelines, including
boundary inclusivity on both ends and empty-candidate rows (inner
semantics)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

keyed_times = st.dictionaries(
    st.integers(min_value=1, max_value=3),
    st.tuples(
        st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=6),
        st.lists(st.integers(min_value=0, max_value=40), min_size=0, max_size=6),
    ),
    min_size=1,
    max_size=3,
)


@settings(
    max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(data=keyed_times, lower=st.integers(-5, 0), width=st.integers(0, 8))
def test_range_join_matches_reference(spark, data, lower, width):
    from iot_data_pipeline_spark.operators.joins import range_join

    upper = lower + width
    left_rows, right_rows = [], []
    for k, (lts, rts) in data.items():
        left_rows.extend((k, t) for t in sorted(set(lts)))
        right_rows.extend((k, t) for t in sorted(set(rts)))
    if not right_rows:
        right_rows = [(99, 0)]

    left = spark.createDataFrame(left_rows, "k int, lt int")
    right = spark.createDataFrame(right_rows, "k int, rt int")

    got = sorted(
        (r["k"], r["lt"], r["rt"])
        for r in range_join(left, right, "lt", "rt", lower, upper, by=["k"]).collect()
    )
    want = sorted(
        (k, lt, rt)
        for k, lt in left_rows
        for rk, rt in right_rows
        if rk == k and lt + lower <= rt <= lt + upper
    )
    assert got == want
