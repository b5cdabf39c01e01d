"""Duplicate-cluster resolution: exact connected components over a
candidate-pair graph (the step after MinHash/LSH pair generation in a
training-data dedup pipeline — pairs say "a matches b", clusters decide
which rows to keep).

Algorithm: iterative min-label propagation with pointer-jumping (each
round pulls the min neighbor label — one equi-join + partial-aggregated
groupBy — then shortcuts every label to its label's label, so covered hop
distance doubles per round: O(log diameter) rounds, not O(diameter), even
on path-shaped components). The driver-side loop runs a convergence ACTION
per round, which is inherent to iterative fixpoints (GraphX/Pregel do the
same); every per-row operation stays distributed. `localCheckpoint`
truncates the lineage each round so plans don't grow. Exhausting
max_iterations without convergence RAISES rather than silently returning
partial clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def lsh_candidate_pairs(sig: DataFrame, min_matches: int = 4,
                        max_bucket: int = 64,
                        s1_filter=None) -> DataFrame:
    """MinHash-LSH candidate pairs with a HOT-BUCKET CEILING.

    sig(doc_id, i, mh) -> (a_id, b_id, matches >= min_matches). The
    self-equi-join on (i, mh) is quadratic PER BUCKET, so one degenerate
    bucket (many docs sharing a signature component — boilerplate corpora
    do this) can explode the join. Standard LSH practice caps the bucket:
    buckets wider than `max_bucket` are dropped BEFORE the join (they
    carry no discriminative signal — a component shared by thousands of
    docs doesn't identify near-duplicates). The cap bounds join output at
    #buckets * max_bucket^2 BY CONSTRUCTION; a corpus of n identical docs
    yields 0 pairs from this path instead of n^2 (and is exactly what
    exact-dedup (q20) catches first). The bucket-width window partitions
    by (i, mh) — the same keys the join shuffles on, so the guard rides
    the join's own Exchange.

    `s1_filter`: optional Column predicate applied to the LEFT side only,
    AFTER the bucket cap (bucket width must be measured over the full
    signature table — capping a prefiltered side would under-count bucket
    membership and let a degenerate bucket through). Used by callers that
    restrict one side of the pair space (q21's doc_id % 2 probe slice)."""
    wide = F.count("*").over(Window.partitionBy("i", "mh"))
    kept = sig.withColumn("_bw", wide).where(F.col("_bw") <= max_bucket) \
              .drop("_bw")
    s1 = (kept.where(s1_filter) if s1_filter is not None else kept) \
        .alias("s1")
    s2 = kept.alias("s2")
    return (s1.join(s2, (F.col("s1.i") == F.col("s2.i"))
                    & (F.col("s1.mh") == F.col("s2.mh"))
                    & (F.col("s1.doc_id") < F.col("s2.doc_id")))
            .groupBy(F.col("s1.doc_id").alias("a_id"),
                     F.col("s2.doc_id").alias("b_id"))
            .agg(F.count("*").alias("matches"))
            .where(F.col("matches") >= min_matches))


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
    converged = False
    for _ in range(max_iterations):
        # pull the smallest neighbor label across each edge
        prop = (sym.join(labels, sym.v == labels.id)
                .groupBy("u").agg(F.min("lbl").alias("nlbl")))
        new_labels = (labels.join(prop, labels.id == prop.u, "left")
                      .select(F.col("id"),
                              F.least(F.col("lbl"),
                                      F.coalesce(F.col("nlbl"), F.col("lbl")))
                              .alias("lbl")))
        # pointer-jumping: lbl <- min(lbl, lbl(lbl)). lbl(lbl) is always a
        # reachable label, so the fixpoint is unchanged, but the covered
        # hop distance doubles each round (chains converge in O(log d))
        jump = new_labels.select(F.col("id").alias("jid"),
                                 F.col("lbl").alias("jlbl"))
        new_labels = (new_labels.join(jump, new_labels.lbl == jump.jid,
                                      "left")
                      .select(F.col("id"),
                              F.least(F.col("lbl"),
                                      F.coalesce(F.col("jlbl"), F.col("lbl")))
                              .alias("lbl")))
        new_labels = new_labels.localCheckpoint()
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), F.col("n.id") == F.col("o.id"))
                   .where(F.col("n.lbl") != F.col("o.lbl")).limit(1).count())
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "rounds; raise max_iterations (rounds needed is "
            "O(log(component diameter)))")
    return labels.select(F.col("id"), F.col("lbl").alias("cluster_id"))
