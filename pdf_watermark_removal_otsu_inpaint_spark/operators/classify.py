"""Document-profile operator (A10-A14): per-row classifier metrics ->
document type -> parameter set, broadcast-joined onto the stream (J2).

Reference: DocumentClassifier.classify + get_optimal_parameters
(document_classifier.py:33-229); first-page-derived parameters applied to the
whole document (cli.py:742-841) become a per-source profile dim.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..params import PROFILE_PARAMS

CLASSIFY_STRUCT = ("struct<color_discreteness:double,text_concentration:double,"
                   "edge_sharpness:double,noise_level:double,"
                   "doc_type:string,confidence:double>")


def make_classify_udf():
    @pandas_udf(CLASSIFY_STRUCT)
    def classify(tokens: pd.Series) -> pd.DataFrame:
        from .. import reference_kernels as rk
        rows = []
        for arr in tokens.to_numpy():
            m = rk.classify_metrics(np.asarray(arr, dtype=np.int64))
            typ, conf = rk.decide_type(m)
            rows.append({**m, "doc_type": typ, "confidence": conf})
        return pd.DataFrame(rows)

    return classify


def profile_params_df(spark) -> DataFrame:
    """The tiny doc_profile dim (profile -> engine params), for broadcast."""
    rows = [
        {"doc_type": k, "color_tolerance": p.color_tolerance,
         "kernel_size": p.kernel_size, "inpaint_strength": p.inpaint_strength,
         "passes": p.passes}
        for k, p in PROFILE_PARAMS.items() if k != "electronic-color"
    ]
    return spark.createDataFrame(rows)


def classify_sources(df: DataFrame, sample_per_source: int = 1) -> DataFrame:
    """Classify each source from its first row(s) (the reference classifies
    page 1 only, cli.py:744) and attach tuned parameters via broadcast join.

    Returns (source, doc_type, confidence, color_tolerance, kernel_size,
    inpaint_strength, passes)."""
    from pyspark.sql import Window
    w = Window.partitionBy("source").orderBy("doc_id", "seq_no")
    probe = (df.withColumn("_rn", F.row_number().over(w))
             .where(F.col("_rn") <= sample_per_source)
             .select("source", "tokens"))
    c = make_classify_udf()(F.col("tokens"))
    classified = (probe.withColumn("_c", c)
                  .select("source", F.col("_c.doc_type").alias("doc_type"),
                          F.col("_c.confidence").alias("confidence")))
    spark = df.sparkSession
    return classified.join(F.broadcast(profile_params_df(spark)), "doc_type")
