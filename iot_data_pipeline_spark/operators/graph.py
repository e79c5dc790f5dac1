"""Iterative graph operators on DataFrames: connected components.

Dedup pipelines need the *transitive closure* of pairwise near-duplicate
matches: if A~B and B~C, all three are one duplicate cluster even when
A~C never scored above threshold. That closure is a connected-components
computation over the match graph.

Spark has no recursive-query primitive (the DuckDB oracle uses WITH
RECURSIVE), so the engine runs the classic distributed min-label
propagation: every node starts labeled with itself, and each round every
node takes the min label among itself and its neighbors. Each round is
one shuffle (join + groupBy.min); the loop converges in O(graph
diameter) rounds. Near-dup clusters are dense and shallow (diameter is
almost always <= 3), so this beats the O(log n)-round large-star/
small-star algorithm in practice -- fewer, cheaper rounds -- while
staying pure DataFrame code. ``localCheckpoint`` truncates the plan
lineage each round so the plan does not grow with the iteration count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    ``component`` is the smallest node id reachable from the node.

    Driver-side loop, cluster-side work: each iteration is a distributed
    join + min-aggregate; the only driver action is the one-row
    convergence probe (sum of labels strictly decreases until fixpoint).
    """
    sym = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
    sym = sym.distinct().localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    prev_sum = labels.agg(F.sum("component")).collect()[0][0]

    for _ in range(max_iter):
        neighbor_min = (
            labels.join(sym, labels.node == sym.a)
            .select(F.col("b").alias("node"), "component")
            .unionByName(labels.select("node", "component"))
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        labels = neighbor_min.localCheckpoint(eager=True)
        cur_sum = labels.agg(F.sum("component")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels
