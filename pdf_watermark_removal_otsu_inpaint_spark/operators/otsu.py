"""Otsu binarization threshold from token histograms — two implementations.

1. `otsu_sql` — pure window-function SQL (cumulative sums ordered by bin):
   between-class variance argmax, expressible in any ANSI engine; this is the
   DuckDB-checkable flavor (SURVEY §4.3).
2. `otsu_udf` — vectorized Arrow UDF over assembled count vectors, used on
   the streaming path where the histogram arrives as an array<long> column.

Both match reference_kernels.otsu_threshold (ties -> smallest t; thresholds
with an empty class excluded). The north_star names this the "vectorized
Arrow-UDF Otsu binarization" fed by per-window token histograms.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def otsu_sql(hist: DataFrame, group_cols: list[str]) -> DataFrame:
    """hist(group..., tok, cnt) -> (group..., otsu_threshold).

    between(t) = (mu_T*w0(t) - m0(t))^2 / (w0(t) * (N - w0(t))), argmax over
    occupied bins with both classes non-empty; ties -> smallest t. Because
    between(t) only changes at occupied bins, restricting the argmax to
    occupied bins is exact (see reference_kernels.otsu_threshold)."""
    g = Window.partitionBy(*group_cols)
    cum = (Window.partitionBy(*group_cols).orderBy("tok")
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    scored = (hist
              .withColumn("w0", F.sum("cnt").over(cum))
              .withColumn("m0", F.sum(F.col("cnt") * F.col("tok")).over(cum))
              .withColumn("total", F.sum("cnt").over(g))
              .withColumn("mu_t", F.sum(F.col("cnt") * F.col("tok")).over(g))
              .where((F.col("w0") > 0) & (F.col("total") - F.col("w0") > 0))
              .withColumn(
                  "between",
                  F.pow(F.col("m0").cast("double") * F.col("total")
                        - F.col("mu_t").cast("double") * F.col("w0"),
                        F.lit(2.0))
                  / (F.col("w0") * (F.col("total") - F.col("w0")))))
    pick = Window.partitionBy(*group_cols).orderBy(F.desc("between"), F.asc("tok"))
    return (scored.withColumn("rn", F.row_number().over(pick))
            .where(F.col("rn") == 1)
            .select(*group_cols, F.col("tok").alias("otsu_threshold")))


def make_otsu_udf():
    """counts: array<long>[256] per row -> Otsu threshold per row,
    vectorized ACROSS rows: one (B,256) matrix, cumulative sums along the
    bin axis, one argmax — semantics exactly rk.otsu_threshold per row
    (ties -> smallest t; degenerate histograms -> 255 'mask nothing').
    (Factory: pandas_udf DDL parsing needs an active session.)"""

    @pandas_udf("int")
    def otsu_udf(counts: pd.Series) -> pd.Series:
        arrs = counts.to_numpy()
        B = len(arrs)
        if B == 0:
            return pd.Series([], dtype="int32")
        M = np.stack([np.asarray(c, dtype=np.float64) for c in arrs])
        total = M.sum(axis=1)
        bins = np.arange(M.shape[1], dtype=np.float64)
        w0 = np.cumsum(M, axis=1)
        m0 = np.cumsum(M * bins, axis=1)
        w1 = total[:, None] - w0
        mu_t = m0[:, -1]
        with np.errstate(divide="ignore", invalid="ignore"):
            between = (m0 * total[:, None]
                       - mu_t[:, None] * w0) ** 2 / (w0 * w1)
        finite = np.isfinite(between)
        between[~finite] = -1.0
        thr = np.argmax(between, axis=1).astype(np.int64)
        degenerate = (total <= 0) | ~finite.any(axis=1)
        return pd.Series(np.where(degenerate, 255, thr).astype("int32"))

    return otsu_udf


def assemble_hist_vector(hist: DataFrame, group_cols: list[str]) -> DataFrame:
    """(group..., tok, cnt) -> (group..., counts:array<long>[256]) — dense
    count vector via map assembly (no per-row Python)."""
    pairs = (hist.groupBy(*group_cols)
             .agg(F.map_from_entries(
                 F.collect_list(F.struct("tok", "cnt"))).alias("m")))
    dense = F.expr("transform(sequence(0, 255), i -> coalesce(m[i], 0L))")
    return pairs.select(*group_cols, dense.alias("counts"))


def make_threshold_repair_udf(params=None):
    """Repair driven by a per-row (window/source-level) Otsu threshold:
    mask = detect_mask_threshold + run filter, then inpaint + blend."""
    from ..params import DEFAULT_PARAMS
    p = params or DEFAULT_PARAMS

    @pandas_udf("struct<tokens:array<int>,coverage:double>")
    def repair_thr(tokens: pd.Series, thr: pd.Series) -> pd.DataFrame:
        # whole-batch vectorized through the span-space kernel
        from .repair_vectorized import flatten_arrays, threshold_repair_batch
        flat, offsets = flatten_arrays(tokens)
        B = offsets.size - 1
        if B == 0:
            return pd.DataFrame({"tokens": [], "coverage": []})
        out, cov = threshold_repair_batch(
            np.asarray(flat, dtype=np.int32), offsets,
            thr.to_numpy().astype(np.int64), p)
        return pd.DataFrame({
            "tokens": [out[offsets[i]:offsets[i + 1]] for i in range(B)],
            "coverage": cov})

    return repair_thr


def otsu_repair_windowed(df: DataFrame, duration: str = "1 minute",
                         params=None) -> DataFrame:
    """north_star, window-keyed: per-(event-time window, source) histograms
    feed the Otsu threshold that repairs that window's rows — a document
    window contaminated in one period gets that period's threshold, not a
    global one. Batch/micro-batch operator: group keys are
    (window(event_ts), source)."""
    from pyspark.sql import functions as F
    win = df.withColumn("win", F.window("event_ts", duration).start)
    out = otsu_repair(win, ["win", "source"], params)
    return out.drop("win") if "win" in out.columns else out


def otsu_repair(df: DataFrame, group_cols: list[str] | None = None,
                params=None) -> DataFrame:
    """The north_star composition as one batch operator (reused per
    micro-batch inside foreachBatch): group histogram (A1) -> Otsu threshold
    (window SQL) -> broadcast thresholds back -> threshold-mask repair (K2).

    Runs identically over a static table or inside a streaming micro-batch;
    the per-batch grouping mirrors the reference's per-page thresholding."""
    from pyspark.sql import functions as F

    from ..operators.histogram import token_histogram
    group_cols = group_cols or ["source"]
    thr = otsu_sql(token_histogram(df, group_cols), group_cols)
    joined = df.join(F.broadcast(thr), group_cols, "left") \
        .withColumn("otsu_threshold",
                    F.coalesce(F.col("otsu_threshold"), F.lit(255)))
    r = make_threshold_repair_udf(params)(F.col("tokens"),
                                          F.col("otsu_threshold"))
    keep = [c for c in ("doc_id", "seq_no", "event_ts", "source", "n_tok")
            if c in df.columns]
    return (joined.withColumn("_r", r)
            .select(*keep, "otsu_threshold",
                    F.col("_r.tokens").alias("tokens"),
                    F.col("_r.coverage").alias("coverage")))
