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
                  F.pow(F.col("mu_t") * F.col("w0") - F.col("m0"), F.lit(2.0))
                  / (F.col("w0") * (F.col("total") - F.col("w0")))))
    pick = Window.partitionBy(*group_cols).orderBy(F.desc("between"), F.asc("tok"))
    return (scored.withColumn("rn", F.row_number().over(pick))
            .where(F.col("rn") == 1)
            .select(*group_cols, F.col("tok").alias("otsu_threshold")))


def make_otsu_udf():
    """counts: array<long>[256] per row -> Otsu threshold per row.
    (Factory: pandas_udf DDL parsing needs an active session.)"""

    @pandas_udf("int")
    def otsu_udf(counts: pd.Series) -> pd.Series:
        from .. import reference_kernels as rk
        return pd.Series([rk.otsu_threshold(np.asarray(c, dtype=np.float64))
                          for c in counts.to_numpy()])

    return otsu_udf


def assemble_hist_vector(hist: DataFrame, group_cols: list[str]) -> DataFrame:
    """(group..., tok, cnt) -> (group..., counts:array<long>[256]) — dense
    count vector via map assembly (no per-row Python)."""
    pairs = (hist.groupBy(*group_cols)
             .agg(F.map_from_entries(
                 F.collect_list(F.struct("tok", "cnt"))).alias("m")))
    dense = F.expr("transform(sequence(0, 255), i -> coalesce(m[i], 0L))")
    return pairs.select(*group_cols, dense.alias("counts"))
