"""Cluster-side synthetic sequence generation (pure Catalyst expressions).

For throughput benchmarking and streaming tests at scale, rows are built with
native column expressions over spark.range — no Python datagen in the loop,
so the generator itself never bottlenecks the measurement, and the same
expressions drive the rate-source streaming feed.

Pattern mirrors the `wm_protect` fixture (FIXTURES.md §2): background 255,
watermark token 200 over [5%,25%) of the row, two short text-0 spans inside —
so the detect->protect->refine->inpaint kernel does real work on every row.
Sources are skewed: ~60% of rows land on the heavy-hitter source (X9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def synth_sequences(spark: SparkSession, n_rows: int, n_tok: int = 2048,
                    n_docs: int | None = None,
                    partitions: int | None = None) -> DataFrame:
    n_docs = n_docs or max(1, n_rows // 16)
    partitions = partitions or spark.sparkContext.defaultParallelism * 2
    lo, hi = int(0.05 * n_tok), int(0.25 * n_tok)
    t1a, t1b = int(0.11 * n_tok), int(0.1175 * n_tok)
    t2a, t2b = int(0.19 * n_tok), int(0.1975 * n_tok)
    tokens = F.transform(F.sequence(F.lit(0), F.lit(n_tok - 1)),
                         lambda i: tok_expr(i, lo, hi, t1a, t1b, t2a, t2b,
                                            row_id=F.col("id")))
    df = (spark.range(0, n_rows, 1, partitions)
          .withColumn("doc_id", F.format_string("doc%06d",
                                                (F.col("id") % n_docs).cast("int")))
          .withColumn("seq_no", (F.col("id") / n_docs).cast("long"))
          .withColumn("source",
                      F.when(F.col("id") % 10 < 6, F.lit("web"))
                      .otherwise(F.format_string("src%d",
                                                 (F.col("id") % 10).cast("int"))))
          .withColumn("event_ts",
                      F.timestamp_seconds(F.lit(1767225600)  # 2026-01-01 UTC
                                          + (F.col("id") % n_docs) * 997
                                          + (F.col("id") / n_docs).cast("long") * 7))
          .withColumn("tokens", tokens)
          .withColumn("n_tok", F.lit(n_tok)))
    return df.select("doc_id", "tokens", "n_tok", "source", "event_ts", "seq_no")


def tok_expr(i, lo, hi, t1a, t1b, t2a, t2b, row_id=None):
    """Background is 251..255 pseudo-noise (deterministic murmur3 of the
    position, salted by row id when given) rather than constant 255: real
    token data has entropy, and a constant background lets parquet RLE
    compress the table ~100x, which distorts split sizing and scan cost in
    benchmarks. Values 251-255 stay above the background-protection
    threshold (>250) and outside the detector's value window."""
    noise = F.pmod(F.hash(i if row_id is None else i + row_id * 4099), F.lit(5))
    return (F.when((i >= t1a) & (i < t1b), 0)
            .when((i >= t2a) & (i < t2b), 0)
            .when((i >= lo) & (i < hi), 200)
            .otherwise(F.lit(251) + noise))
