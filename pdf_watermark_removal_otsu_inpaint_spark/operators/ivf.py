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


def _kmeanspp_seed(X: np.ndarray, n_cells: int,
                   rng: np.random.Generator) -> np.ndarray:
    """k-means++ D^2 seeding on normalized vectors (distance = 1 - cos):
    each next seed is drawn proportional to its distance to the nearest
    already-chosen seed, so seeds spread across the data instead of
    clumping — the standard recall lift over uniform seeding. Deterministic
    under the caller's seeded rng."""
    n = X.shape[0]
    chosen = [int(rng.integers(n))]
    d = np.maximum(1.0 - X @ X[chosen[0]], 0.0)
    for _ in range(1, n_cells):
        tot = float(d.sum())
        if tot <= 1e-12:          # all remaining points coincide with seeds
            mask = np.ones(n, dtype=bool)
            mask[chosen] = False
            rest = np.flatnonzero(mask)
            nxt = int(rest[rng.integers(rest.size)]) if rest.size \
                else chosen[0]
        else:
            nxt = int(rng.choice(n, p=d / tot))
        chosen.append(nxt)
        d = np.minimum(d, np.maximum(1.0 - X @ X[nxt], 0.0))
    return X[chosen].copy()


def train_centroids(emb: DataFrame, n_cells: int = 16, iters: int = 5,
                    sample_rows: int = 4096, seed: int = 42,
                    total_rows: int | None = None) -> np.ndarray:
    """Seeded k-means (k-means++ seeding + empty-cell reseeding) on a
    bounded deterministic sample (spherical: vectors are L2-normalized so
    nearest-centroid-by-dot == nearest-by-cosine).

    Sampling is a deterministic HASH-THRESHOLD filter, not a global
    TakeOrdered: `pmod(xxhash64(vec_id, seed), 2^20) < t` admits an
    expected 4x oversample of `sample_rows` (exact rows chosen by a heap
    over only that small subset), so the full table is touched by nothing
    heavier than a predicate — at 10^12 rows the old
    orderBy(hash).limit(n) heap-sifted every row. Deterministic across
    runs and partitionings (hash of vec_id, vec_id tiebreak); at 100 TB
    this is the same constant-cost driver-side training that IVF indexes
    use in practice (train on a sample, assign everything).

    `total_rows`: pass a precomputed row count (e.g. from table metadata /
    a prior action) to skip the count() here — for a RAW parquet/Iceberg
    scan count() is footer-metadata-only, but for any derived/filtered
    plan it is a full scan, which a caller training repeatedly should not
    pay per call."""
    total = emb.count() if total_rows is None else int(total_rows)
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
    cents = _kmeanspp_seed(X, n_cells, rng)
    n = X.shape[0]
    for _ in range(iters):
        sims = X @ cents.T                       # (n, k) cosine
        assign = np.argmax(sims, axis=1)
        best = sims[np.arange(n), assign]
        for c in range(n_cells):
            members = X[assign == c]
            if members.size:
                m = members.mean(axis=0)
                cents[c] = m / max(np.linalg.norm(m), 1e-12)
            else:
                # empty cell: reseed to the worst-served point (smallest
                # best-sim) so the cell re-enters the partition instead of
                # silently shrinking k — standard Lloyd repair, and still
                # deterministic (argmin ties break to the lowest index)
                far = int(np.argmin(best))
                cents[c] = X[far]
                best[far] = 1.0    # a point can repair only one cell/round
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
              sample_rows: int = 4096, seed: int = 42,
              total_rows: int | None = None, n_assign: int = 1
              ) -> tuple[DataFrame, np.ndarray]:
    """-> (assignment DataFrame (vec_id, embedding, nrm, cell), centroids).

    The assignment is ONE projection: each row's norm is computed once
    behind a projection boundary (inlined, Catalyst would re-evaluate the
    dot-fold per centroid), the n_cells similarities fold against centroid
    literals, and array_max picks the cell in-row (struct ordering: max
    sim, ties -> smallest cell). Zero Exchange, no row inflation — at
    100 TB the result is written bucketed BY cell so searches are
    cell-local scans, and nrm is stored with the index.

    `n_assign > 1` stores each vector in its n_assign nearest cells
    (multi-assignment): the index grows n_assign-fold but recall at a
    FIXED n_probe rises sharply on unclustered data, where a vector's true
    neighbors straddle cell boundaries (measured on the near-uniform
    sf0.01 fixture: recall@10 at n_probe=1 goes 0.24 -> 0.49 at
    n_assign=3, and 0.82 -> 1.0 at n_probe=8). The plan stays a single
    in-row projection + explode (still zero Exchange); searches over a
    multi-assigned index must pass multi_assign=True to ivf_search so
    duplicate candidates collapse before ranking."""
    cents = train_centroids(emb, n_cells, iters, sample_rows, seed,
                            total_rows=total_rows)
    normed = emb.select("vec_id", "embedding",
                        _norm(F.col("embedding")).alias("nrm"))
    if n_assign <= 1:
        best = F.array_max(_cell_sims(F.col("embedding"), F.col("nrm"),
                                      cents))
        assign = normed.select("vec_id", "embedding", "nrm",
                               (-best.getField("negcell")).alias("cell"))
        return assign, cents
    ranked = F.array_sort(F.transform(
        _cell_sims(F.col("embedding"), F.col("nrm"), cents),
        lambda s: F.struct((-s.getField("sim")).alias("negsim"),
                           (-s.getField("negcell")).alias("cell"))))
    assign = (normed.select(
        "vec_id", "embedding", "nrm",
        F.explode(F.slice(ranked, 1, n_assign)).alias("p"))
        .select("vec_id", "embedding", "nrm",
                F.col("p.cell").alias("cell")))
    return assign, cents


def ivf_search(assign: DataFrame, cents: np.ndarray, queries: DataFrame,
               k: int = 10, n_probe: int = 2,
               multi_assign: bool = False) -> DataFrame:
    """queries(q_id, qe) -> top-k (q_id, cand_id, cos_sim, rnk) within the
    n_probe nearest cells of each query. Self-matches (cand_id == q_id) are
    excluded. Exact cosine runs only on cell-join candidates. Probe-cell
    selection is in-row (sort the n_cells similarity structs, slice
    n_probe, explode) — the only shuffle in the whole search is the
    bucketable equi-join on cell id.

    `multi_assign=True` collapses duplicate (q_id, cand_id) candidates
    before ranking — required over an index built with n_assign > 1, where
    a candidate reachable through several probed cells would otherwise
    occupy several top-k slots. The dedup keys are a refinement of the
    window's partition key, so it adds no new shuffle key space."""
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
    if multi_assign:
        scored = scored.dropDuplicates(["q_id", "cand_id"])
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
