"""connected_components: exactness on adversarial shapes (long chains,
which need O(diameter) rounds without pointer-jumping) and the
non-convergence guard."""

import pytest

from pdf_watermark_removal_otsu_inpaint_spark.operators.dedup import (
    connected_components)


def _clusters(rows):
    out = {}
    for r in rows:
        out.setdefault(r.cluster_id, set()).add(r.id)
    return sorted(out.values(), key=sorted)


def test_long_chain_converges_fast(spark):
    """A 50-hop path component: min-label propagation alone needs ~50
    rounds; pointer-jumping must close it within max_iterations=10."""
    n = 50
    vertices = spark.createDataFrame([(i,) for i in range(n + 3)], "id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "u long, v long")
    got = _clusters(connected_components(vertices, edges,
                                         max_iterations=10).collect())
    assert got == [set(range(n + 1)), {n + 1}, {n + 2}]


def test_disjoint_components_and_singletons(spark):
    vertices = spark.createDataFrame([(i,) for i in range(8)], "id long")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "u long, v long")
    got = _clusters(connected_components(vertices, edges).collect())
    assert got == [{0}, {1, 2, 3}, {4}, {5, 6}, {7}]


def test_nonconvergence_raises(spark):
    """max_iterations too small for the diameter -> hard error, never a
    silently-wrong partial clustering."""
    n = 30
    vertices = spark.createDataFrame([(i,) for i in range(n + 1)], "id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "u long, v long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(vertices, edges, max_iterations=2)


def test_lsh_hot_bucket_ceiling(spark):
    """q26's structural guard: a corpus where EVERY doc shares one
    identical signature (the quadratic-bucket worst case) must produce 0
    candidate pairs — the degenerate bucket is dropped BEFORE the
    self-join, so the join cannot be O(n^2) by construction. Small
    (discriminative) buckets still pair up."""
    from pdf_watermark_removal_otsu_inpaint_spark.operators.dedup import (
        lsh_candidate_pairs)
    n = 1000
    rows = [(f"doc{d:04d}", i, 12345) for d in range(n) for i in range(8)]
    sig = spark.createDataFrame(rows, "doc_id string, i int, mh long")
    assert lsh_candidate_pairs(sig, min_matches=4).count() == 0
    # the same signatures in a 3-doc bucket ARE informative and survive
    small = spark.createDataFrame(rows[:24], "doc_id string, i int, mh long")
    pairs = {(r.a_id, r.b_id): r.matches
             for r in lsh_candidate_pairs(small, min_matches=4).collect()}
    assert len(pairs) == 3 and all(m == 8 for m in pairs.values())


def test_lsh_bucket_filter_precedes_join(spark):
    """Plan shape: the bucket-width window FILTER sits below the self-join
    (the guard bounds the join input, not its output)."""
    from pdf_watermark_removal_otsu_inpaint_spark.operators.dedup import (
        lsh_candidate_pairs)
    sig = spark.createDataFrame([("a", 0, 1)], "doc_id string, i int, mh long")
    plan = lsh_candidate_pairs(sig)._jdf.queryExecution() \
        .optimizedPlan().toString()
    join_at = plan.find("Join")
    assert join_at >= 0
    below = plan[join_at:]
    assert "Filter" in below and "window" in below.lower()
