"""Iterative graph operators: connected components via label
propagation.

The one algorithm class SQL cannot express in a single query:
iterate-until-fixpoint. Spark's pattern is a driver-side loop over
DataFrame steps with per-iteration persist (each iteration is a
distributed join+aggregate; the loop only controls convergence).
Used to turn pairwise near-dup edges into transitive duplicate
clusters. The converged result — every node labeled with the minimum
reachable node id — is schedule-independent, which is what makes it
oracle-checkable against a recursive-CTE reachability query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "id_a", dst: str = "id_b", max_iter: int = 25
) -> DataFrame:
    """(id, cluster_id): min reachable node id per node.

    Label propagation: each node repeatedly adopts the minimum label
    among itself and its neighbors until no label changes. Converges
    in O(diameter) iterations; each iteration is one shuffle-join +
    aggregate. For planet-scale graphs swap in the large-star/
    small-star variant — the loop harness is identical.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .persist()
    )
    try:
        for _ in range(max_iter):
            neighbor_min = (
                sym.join(labels, sym.a == labels.id)
                .groupBy(F.col("b").alias("id2"))
                .agg(F.min("label").alias("nmin"))
            )
            new_labels = (
                labels.join(neighbor_min, labels.id == F.col("id2"), "left")
                .select(
                    "id",
                    F.least(
                        F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                    ).alias("label"),
                )
                .persist()
            )
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "id")
                .filter(F.col("n.label") != F.col("o.label"))
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                break
        return labels.select("id", F.col("label").alias("cluster_id"))
    finally:
        sym.unpersist()
