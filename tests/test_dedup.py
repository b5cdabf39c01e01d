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
