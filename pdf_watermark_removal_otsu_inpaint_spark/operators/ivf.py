"""IVF (inverted-file) approximate nearest neighbor over an embedding
column — the 100 TB ANN path next to the LSH buckets (q28) and the
oracle-checked modulo-centroid variant (q46).

Design for scale:
- `ivf_build` trains centroids with a seeded k-means on a bounded SAMPLE
  collected to the driver (k-means|| style: the sample is thousands of
  rows whatever the table size, so training cost is constant), then
  assigns every vector to its nearest centroid fully IN-ROW: the n_cells
  similarities are folded against centroid LITERALS and argmax'd inside
  one projection — zero Exchange, zero row inflation, a genuinely
  shuffle-free map over the corpus.
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


_HASH_BUCKETS = 1 << 20


def _train_sample_plan(emb: DataFrame, sample_rows: int, seed: int,
                       total: int) -> DataFrame:
    """The EXACT sampling plan train_centroids executes, factored out so
    tests can assert its shape (the heap must sit above the hash-threshold
    filter — the full table sees only a predicate)."""
    h = F.pmod(F.xxhash64(F.col("vec_id").cast("string"), F.lit(seed)),
               F.lit(_HASH_BUCKETS))
    cand = emb.select("vec_id", "embedding")
    if total > 2 * sample_rows:
        thresh = int(np.ceil(_HASH_BUCKETS
                             * min(1.0, 4.0 * sample_rows / total)))
        cand = cand.where(h < F.lit(thresh))
    return (cand.orderBy(F.xxhash64(F.col("vec_id").cast("string"),
                                    F.lit(seed)), F.col("vec_id"))
            .limit(sample_rows))


def train_centroids(emb: DataFrame, n_cells: int = 16, iters: int = 5,
                    sample_rows: int = 4096, seed: int = 42) -> np.ndarray:
    """Seeded k-means on a bounded deterministic sample (spherical: vectors
    are L2-normalized so nearest-centroid-by-dot == nearest-by-cosine).

    Sampling is a deterministic HASH-THRESHOLD filter, not a global
    TakeOrdered: `pmod(xxhash64(vec_id, seed), 2^20) < t` admits an
    expected 4x oversample of `sample_rows` (exact rows chosen by a heap
    over only that small subset), so the full table is touched by nothing
    heavier than a predicate — at 10^12 rows the old
    orderBy(hash).limit(n) heap-sifted every row. Deterministic across
    runs and partitionings (hash of vec_id, vec_id tiebreak); at 100 TB
    this is the same constant-cost driver-side training that IVF indexes
    use in practice (train on a sample, assign everything)."""
    total = emb.count()   # parquet/Iceberg count: footer metadata, no scan
    if total == 0:
        raise ValueError("train_centroids: embedding table is empty")
    sample = _train_sample_plan(emb, sample_rows, seed, total).collect()
    X = np.array([r.embedding for r in sample], dtype=np.float64)
    if X.shape[0] == 0:
        raise ValueError(
            f"train_centroids: hash-threshold sample is empty "
            f"(table rows={total})")
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    if n_cells > X.shape[0]:   # tiny table: can't seed more cells than rows
        n_cells = X.shape[0]
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


def _lit_vec(c) -> "F.Column":
    return F.array(*[F.lit(float(v)) for v in c])


def _cell_sims(col, nrm_col, cents: np.ndarray):
    """array<struct<sim,negcell>> of cosine similarity to every centroid,
    computed against centroid LITERALS — pure in-row expressions, so cell
    assignment and probe selection never join, inflate, or shuffle.
    negcell makes struct-ordering ties prefer the SMALLEST cell id.
    Zero-norm vectors get sim 0.0 (the engine-wide convention, q24/q31) —
    a NaN would sort ABOVE every real sim under DESC and hijack top-k."""
    norms = np.linalg.norm(cents, axis=1)
    return F.array(*[
        F.struct(F.when(nrm_col == 0, F.lit(0.0))
                 .otherwise(_dot(col, _lit_vec(c)) / nrm_col
                            / F.lit(float(max(n, 1e-12)))).alias("sim"),
                 F.lit(-i).alias("negcell"))
        for i, (c, n) in enumerate(zip(cents, norms))])


def _safe_cos(x, y, x_nrm, y_nrm):
    """Exact cosine with the zero-norm pin: 0.0 when either norm is 0."""
    return F.when((x_nrm == 0) | (y_nrm == 0), F.lit(0.0)) \
            .otherwise(_dot(x, y) / x_nrm / y_nrm)


def ivf_build(emb: DataFrame, n_cells: int = 16, iters: int = 5,
              sample_rows: int = 4096, seed: int = 42
              ) -> tuple[DataFrame, np.ndarray]:
    """-> (assignment DataFrame (vec_id, embedding, nrm, cell), centroids).

    The assignment is ONE projection: each row's norm is computed once
    behind a projection boundary (inlined, Catalyst would re-evaluate the
    dot-fold per centroid), the n_cells similarities fold against centroid
    literals, and array_max picks the cell in-row (struct ordering: max
    sim, ties -> smallest cell). Zero Exchange, no row inflation — at
    100 TB the result is written bucketed BY cell so searches are
    cell-local scans, and nrm is stored with the index."""
    cents = train_centroids(emb, n_cells, iters, sample_rows, seed)
    normed = emb.select("vec_id", "embedding",
                        _norm(F.col("embedding")).alias("nrm"))
    best = F.array_max(_cell_sims(F.col("embedding"), F.col("nrm"), cents))
    assign = normed.select("vec_id", "embedding", "nrm",
                           (-best.getField("negcell")).alias("cell"))
    return assign, cents


def ivf_search(assign: DataFrame, cents: np.ndarray, queries: DataFrame,
               k: int = 10, n_probe: int = 2) -> DataFrame:
    """queries(q_id, qe) -> top-k (q_id, cand_id, cos_sim, rnk) within the
    n_probe nearest cells of each query. Self-matches (cand_id == q_id) are
    excluded. Exact cosine runs only on cell-join candidates. Probe-cell
    selection is in-row (sort the n_cells similarity structs, slice
    n_probe, explode) — the only shuffle in the whole search is the
    bucketable equi-join on cell id."""
    qn = queries.select("q_id", "qe", _norm(F.col("qe")).alias("q_nrm"))
    ranked = F.array_sort(F.transform(
        _cell_sims(F.col("qe"), F.col("q_nrm"), cents),
        lambda s: F.struct((-s.getField("sim")).alias("negsim"),
                           (-s.getField("negcell")).alias("cell"))))
    probes = (qn.select("q_id", "qe", "q_nrm",
                        F.explode(F.slice(ranked, 1, n_probe)).alias("p"))
              .select("q_id", "qe", "q_nrm",
                      F.col("p.cell").alias("cell")))
    scored = (probes.join(assign, "cell")
              .where(F.col("vec_id") != F.col("q_id"))
              .select("q_id", F.col("vec_id").alias("cand_id"),
                      _safe_cos(F.col("qe"), F.col("embedding"),
                                F.col("q_nrm"), F.col("nrm")).alias("cos")))
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
                      _safe_cos(F.col("qe"), F.col("embedding"),
                                F.col("q_nrm"), F.col("nrm")).alias("cos")))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= k)
            .select("q_id", "cand_id", F.round("cos", 6).alias("cos_sim"),
                    "rnk"))
