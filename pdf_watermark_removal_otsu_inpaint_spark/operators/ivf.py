"""IVF (inverted-file) approximate nearest neighbor over an embedding
column — the 100 TB ANN path next to the LSH buckets (q28) and the
oracle-checked modulo-centroid variant (q46).

Design for scale:
- `ivf_build` trains centroids with a seeded k-means on a bounded SAMPLE
  collected to the driver (k-means|| style: the sample is thousands of
  rows whatever the table size, so training cost is constant), then
  assigns every vector to its nearest centroid with a broadcast
  crossJoin + windowed argmin — one shuffle-free map over the corpus
  plus a top-1 window per vec_id.
- `ivf_search` probes the query's `n_probe` nearest cells and scores
  exact cosine ONLY inside those cells: the candidate set shrinks by
  ~n_cells/n_probe vs brute force (q24), and the cell join is an
  equi-join on cell id — bucketable at 100 TB.

Everything is deterministic under a fixed seed (driver-gate requirement:
no Date.now/random in query paths)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(x, y):
    return F.aggregate(
        F.zip_with(x, y, lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)


def _cos(x, y):
    return _dot(x, y) / F.sqrt(_dot(x, x)) / F.sqrt(_dot(y, y))


def train_centroids(emb: DataFrame, n_cells: int = 16, iters: int = 5,
                    sample_rows: int = 4096, seed: int = 42) -> np.ndarray:
    """Seeded k-means on a bounded deterministic sample (spherical: vectors
    are L2-normalized so nearest-centroid-by-dot == nearest-by-cosine).

    The sample is `sample_rows` rows ordered by a hash of vec_id — stable
    across runs and partitionings; at 100 TB this is the same constant-cost
    driver-side training that IVF indexes use in practice (train on a
    sample, assign everything)."""
    sample = (emb.select("vec_id", "embedding")
              .orderBy(F.xxhash64(F.col("vec_id").cast("string"),
                                  F.lit(seed)))
              .limit(sample_rows).collect())
    X = np.array([r.embedding for r in sample], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cents = X[rng.choice(X.shape[0], size=n_cells, replace=False)]
    for _ in range(iters):
        sims = X @ cents.T                       # (n, k) cosine
        assign = np.argmax(sims, axis=1)
        for c in range(n_cells):
            members = X[assign == c]
            if members.size:
                m = members.mean(axis=0)
                cents[c] = m / max(np.linalg.norm(m), 1e-12)
    return cents


def _norm(x):
    return F.sqrt(_dot(x, x))


def _centroids_df(spark, cents: np.ndarray):
    rows = [(int(i), [float(v) for v in c], float(np.linalg.norm(c)))
            for i, c in enumerate(cents)]
    return spark.createDataFrame(rows,
                                 "cell int, ce array<double>, ce_nrm double")


def ivf_build(emb: DataFrame, n_cells: int = 16, iters: int = 5,
              sample_rows: int = 4096, seed: int = 42
              ) -> tuple[DataFrame, np.ndarray]:
    """-> (assignment DataFrame (vec_id, embedding, cell), centroids).

    The assignment plan is a broadcast crossJoin against the tiny centroid
    dim + a per-vec top-1 window — no all-pairs shuffle; at 100 TB the
    result is written bucketed BY cell so searches are cell-local scans."""
    spark = emb.sparkSession
    cents = train_centroids(emb, n_cells, iters, sample_rows, seed)
    cdf = _centroids_df(spark, cents)
    # each row's own norm is computed ONCE behind a projection boundary
    # (inlined, Catalyst would re-evaluate the dot-fold per centroid pair)
    # and kept on the assignment — at 100 TB it's stored with the index
    normed = emb.select("vec_id", "embedding",
                        _norm(F.col("embedding")).alias("nrm"))
    pairs = (normed.crossJoin(F.broadcast(cdf))
             .select("vec_id", "embedding", "nrm", "cell",
                     (_dot(F.col("embedding"), F.col("ce"))
                      / F.col("nrm") / F.col("ce_nrm")).alias("sim")))
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("cell"))
    assign = (pairs.withColumn("rn", F.row_number().over(w))
              .where(F.col("rn") == 1)
              .select("vec_id", "embedding", "nrm", "cell"))
    return assign, cents


def ivf_search(assign: DataFrame, cents: np.ndarray, queries: DataFrame,
               k: int = 10, n_probe: int = 2) -> DataFrame:
    """queries(q_id, qe) -> top-k (q_id, cand_id, cos_sim, rnk) within the
    n_probe nearest cells of each query. Self-matches (cand_id == q_id) are
    excluded. Exact cosine runs only on cell-join candidates."""
    spark = assign.sparkSession
    cdf = _centroids_df(spark, cents)
    qn = queries.select("q_id", "qe", _norm(F.col("qe")).alias("q_nrm"))
    qc = (qn.crossJoin(F.broadcast(cdf))
          .select("q_id", "qe", "q_nrm", "cell",
                  (_dot(F.col("qe"), F.col("ce"))
                   / F.col("q_nrm") / F.col("ce_nrm")).alias("sim")))
    wq = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("cell"))
    probes = (qc.withColumn("rn", F.row_number().over(wq))
              .where(F.col("rn") <= n_probe)
              .select("q_id", "qe", "q_nrm", "cell"))
    scored = (probes.join(assign, "cell")
              .where(F.col("vec_id") != F.col("q_id"))
              .select("q_id", F.col("vec_id").alias("cand_id"),
                      (_dot(F.col("qe"), F.col("embedding"))
                       / F.col("q_nrm") / F.col("nrm")).alias("cos")))
    w2 = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (scored.withColumn("rnk", F.row_number().over(w2))
            .where(F.col("rnk") <= k)
            .select("q_id", "cand_id", F.round("cos", 6).alias("cos_sim"),
                    "rnk"))


def brute_force_topk(emb: DataFrame, queries: DataFrame, k: int = 10
                     ) -> DataFrame:
    """Exact ground truth: broadcast queries, full-scan cosine, top-k.
    O(Q x N) — the recall yardstick, never the scale path (q24's role)."""
    en = emb.select("vec_id", "embedding",
                    _norm(F.col("embedding")).alias("nrm"))
    qn = queries.select("q_id", "qe", _norm(F.col("qe")).alias("q_nrm"))
    scored = (en.crossJoin(F.broadcast(qn))
              .where(F.col("vec_id") != F.col("q_id"))
              .select("q_id", F.col("vec_id").alias("cand_id"),
                      (_dot(F.col("qe"), F.col("embedding"))
                       / F.col("q_nrm") / F.col("nrm")).alias("cos")))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= k)
            .select("q_id", "cand_id", F.round("cos", 6).alias("cos_sim"),
                    "rnk"))
