"""Distributed connected components via min-label propagation.

The dedup pipelines produce near-duplicate PAIRS (shared shingle, LSH bucket,
simhash distance); turning pairs into duplicate CLUSTERS — keep one doc per
component — needs connected components over a graph with potentially billions
of vertices.  C2's driver-side union-find (operators/correlation.py) is right
for d≈10 features and wrong here, so this is the scale path: iterative
min-label propagation as pure DataFrame joins/aggregations.

Each round every vertex takes the min label among itself and its neighbors;
rounds needed = graph diameter (near-dup clusters are shallow — a handful).
Each iteration is one shuffle keyed on vertex id; the loop stops when no
label changes (cheap count on a changed-flag) or at ``max_iter``.  This is
the standard Spark/GraphX "HashMin" pattern, no GraphFrames dependency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """edges(src, dst) undirected → (vertex, component) where component is
    the minimum vertex id reachable.  Vertices = everything in edges."""
    both = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    labels = (
        both.select(F.col("a").alias("vertex"))
        .distinct()
        .withColumn("component", F.col("vertex"))
    )
    both = both.persist()
    labels = labels.persist()
    for _ in range(max_iter):
        # neighbor-min message pass, one shuffle on vertex id
        nbr_min = (
            both.join(labels, both.b == labels.vertex)
            .groupBy(F.col("a").alias("vertex"))
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(nbr_min, "vertex", "left")
            .select(
                "vertex",
                F.least(
                    "component", F.coalesce("nbr_component", "component")
                ).alias("component"),
                (
                    F.coalesce("nbr_component", "component") < F.col("component")
                ).alias("changed"),
            )
        ).persist()
        changed = new_labels.filter(F.col("changed")).limit(1).count()
        old = labels
        labels = new_labels.drop("changed")
        old.unpersist()
        if changed == 0:
            break
    both.unpersist()
    return labels
