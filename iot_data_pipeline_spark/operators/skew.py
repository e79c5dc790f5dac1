"""Skew mitigation (SURVEY.md section 2 scale notes): salting for hot keys.

AQE's skew-join splitting (on in ``session.py``) handles most skew at
runtime by splitting oversized partitions. Salting is the *plan-level*
complement for the two cases AQE cannot fix:

- a hot GROUP BY key: one reducer owns the whole key regardless of how
  partitions are split -- pre-aggregating over (key, salt) caps any single
  task's share at 1/n_salts of the hot key;
- a hot join key against a replicable right side: replicating the right
  row n_salts times lets the hot key's probe side spread over n_salts
  tasks.

Both transforms are pure DataFrame ops and preserve exact semantics --
tests assert salted == unsalted on skewed data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(n_salts: int) -> Column:
    # Deterministic per row is NOT required -- any spread works -- but a
    # cheap hash of the whole row beats rand(): no RNG state, and re-runs
    # produce identical partitioning (reproducible stage timings).
    return F.pmod(F.hash(F.struct("*")), F.lit(n_salts))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation over (keys + salt) then keys.

    ``aggs`` maps output column -> (input column, fn) where fn is one of
    sum|count|min|max (the re-aggregatable kernels; avg = sum/count at the
    call site). SQL count semantics apply: ``count`` of a column counts
    its NON-NULL values; pass ``"*"`` as the column for a row count
    (COUNT(*)). Stage 1 shards every key n_salts ways; stage 2 combines
    n_salts rows per key -- the hot key's work parallelizes, the second
    shuffle is one row per (key, salt).
    """
    combiners = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    firsts = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for out, (col, fn) in aggs.items():
        if fn not in combiners:
            raise ValueError(f"{fn!r} is not re-aggregatable; use sum/count/min/max")
        if col == "*" and fn != "count":
            raise ValueError('column "*" only makes sense with fn="count"')

    def first_agg(col: str, fn: str):
        if col == "*" and fn == "count":
            return F.count(F.lit(1))
        return firsts[fn](col)

    stage1 = df.withColumn("__salt", _salt(n_salts)).groupBy(
        *keys, "__salt"
    ).agg(
        *[first_agg(col, fn).alias(out) for out, (col, fn) in aggs.items()]
    )
    return stage1.groupBy(*keys).agg(
        *[combiners[fn](out).alias(out) for out, (col, fn) in aggs.items()]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the (large, skewed) left side, replicate
    the (small-per-key) right side across all salt values.

    Right-side rows multiply by n_salts -- correct when the right side is
    dim-shaped (bounded rows per key). For dim tables small enough to
    broadcast, prefer ``broadcast()``: salting is for the middle ground
    where the right side exceeds the broadcast threshold but keys are
    bounded.

    Join types that emit UNMATCHED RIGHT rows (right/full outer,
    right_semi/right_anti) are rejected: an unmatched right row exists
    once per replica, so it would surface n_salts times. Salt the other
    side instead (swap the call). left/left_semi/left_anti are exact:
    each left row carries one salt, and every right key is present at
    every salt value, so match-existence per left row is unchanged.

    Caveat: the deterministic whole-row salt cannot spread rows that are
    full duplicates of each other (they hash to the same salt). The hot
    sides this operator targets carry an id/payload column that differs
    per row (q184's gate shape); for duplicate-ROW skew use salted_agg
    on the dedup count instead.
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi",
               "leftsemi", "left_anti", "leftanti", "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join cannot run how={how!r}: unmatched right rows "
            "are replicated n_salts times and would each be emitted; "
            "salt the other side instead"
        )
    salted_left = left.withColumn("__salt", _salt(n_salts))
    replicated_right = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_left.join(replicated_right, [*on, "__salt"], how).drop("__salt")
