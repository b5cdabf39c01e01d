"""Duplicate-cluster resolution: exact connected components over a
candidate-pair graph (the step after MinHash/LSH pair generation in a
training-data dedup pipeline — pairs say "a matches b", clusters decide
which rows to keep).

Algorithm: iterative min-label propagation (the standard shuffle-bounded
Spark formulation — each round is one equi-join + partial-aggregated
groupBy; rounds needed = graph diameter in label-hops, O(log n) on dedup
graphs whose components are near-cliques). The driver-side loop runs a
convergence ACTION per round, which is inherent to iterative fixpoints
(GraphX/Pregel do the same); every per-row operation stays distributed.
`localCheckpoint` truncates the lineage each round so plans don't grow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(vertices: DataFrame, edges: DataFrame,
                         max_iterations: int = 20) -> DataFrame:
    """vertices(id) + edges(u, v) -> (id, cluster_id = min id reachable).

    Singleton vertices cluster to themselves. Edges may be directed pairs
    (u < v); propagation symmetrizes them."""
    sym = edges.select("u", "v").union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    sym = sym.repartition("v").localCheckpoint()
    labels = vertices.select(F.col("id"),
                             F.col("id").alias("lbl")).localCheckpoint()
    for _ in range(max_iterations):
        # pull the smallest neighbor label across each edge
        prop = (sym.join(labels, sym.v == labels.id)
                .groupBy("u").agg(F.min("lbl").alias("nlbl")))
        new_labels = (labels.join(prop, labels.id == prop.u, "left")
                      .select(F.col("id"),
                              F.least(F.col("lbl"),
                                      F.coalesce(F.col("nlbl"), F.col("lbl")))
                              .alias("lbl")))
        new_labels = new_labels.localCheckpoint()
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), F.col("n.id") == F.col("o.id"))
                   .where(F.col("n.lbl") != F.col("o.lbl")).limit(1).count())
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("id"), F.col("lbl").alias("cluster_id"))
