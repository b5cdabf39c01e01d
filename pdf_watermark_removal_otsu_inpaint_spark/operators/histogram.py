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

    Returns (group..., wm_token, coverage_pct)."""
    group_cols = group_cols or ["source"]
    hist = df_or_hist if from_hist else token_histogram(df_or_hist, group_cols)
    ranked = histogram_with_share(hist, group_cols)
    qual = ranked.where((F.col("rank") <= TOPK_MODES)
                        & mx.qualifies_as_watermark(F.col("tok"),
                                                    F.col("coverage_pct")))
    pick = Window.partitionBy(*group_cols).orderBy("rank")
    return (qual.withColumn("pick", F.row_number().over(pick))
                .where(F.col("pick") == 1)
                .select(*group_cols, F.col("tok").alias("wm_token"),
                        F.col("coverage_pct")))
