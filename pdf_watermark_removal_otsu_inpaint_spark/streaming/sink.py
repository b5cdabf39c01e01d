"""Exactly-once idempotent sink (X7) + per-partition lineage/metrics (X8).

`foreachBatch` is at-least-once on retry; exactly-once is recovered by making
each micro-batch commit idempotent (SURVEY §4.3):

- data for batch N goes to `<out>/data/batch_id=N/` with mode=overwrite, so a
  retried batch N rewrites the same directory instead of duplicating;
- a commit marker `<out>/_commits/N.json` is written atomically (tmp+rename)
  AFTER data+metrics land; a replayed batch whose marker exists is a no-op;
- readers (`read_committed`) only see batch dirs with markers, so a crash
  between data write and marker leaves no visible partial output;
- per-partition lineage rows (batch_id, partition_id, rows_out, masked
  tokens, coverage sum) land in `<out>/metrics/batch_id=N/` in the same
  commit scope — the resume audit trail (reference ProcessingStats,
  stats.py:13-245, made transactional).

The production target is an Iceberg/Delta MERGE on (doc_id, seq_no) — those
jars are not in this image (import-gated), but the commit-marker protocol
provides the same replay-idempotence guarantee on plain parquet.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ExactlyOnceParquetSink:
    def __init__(self, out_dir: str, key_cols: tuple[str, ...] = ("doc_id", "seq_no")):
        self.out_dir = out_dir
        self.key_cols = list(key_cols)
        os.makedirs(f"{out_dir}/_commits", exist_ok=True)

    def _commit_path(self, batch_id: int) -> str:
        return f"{self.out_dir}/_commits/{batch_id}.json"

    def is_committed(self, batch_id: int) -> bool:
        return os.path.exists(self._commit_path(batch_id))

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch body. Replays are no-ops; partial failures rewrite."""
        if self.is_committed(batch_id):
            return
        data_path = f"{self.out_dir}/data/batch_id={batch_id}"
        metrics_path = f"{self.out_dir}/metrics/batch_id={batch_id}"

        # in-batch dedup on the sink key (a replayed source row within the
        # same batch must not double-write), then ONE pass: the batch plan
        # executes exactly once, for the data write. Lineage is derived
        # from the WRITTEN files — a column-pruned scan of the tiny metric
        # columns (parquet reads only coverage/n_tok, never the token
        # arrays), so the audit trail describes the bytes that actually
        # landed and the big batch is never cached or recomputed (the
        # previous cache() of token-array batches was the sink's dominant
        # cost: materializing ~100 MB of array blocks per micro-batch).
        deduped = batch_df.dropDuplicates(self.key_cols)
        deduped.write.mode("overwrite").parquet(data_path)

        spark = batch_df.sparkSession
        # explicit schema: skips a schema-inference job per micro-batch AND
        # survives an EMPTY micro-batch (foreachBatch fires on no-data
        # batches for watermark progress; a committer that writes only
        # _SUCCESS would make schema inference fail after the data write
        # but before the commit marker)
        written = spark.read.schema(deduped.schema).parquet(data_path)
        agg_cols = [F.count("*").alias("rows_out")]
        if "coverage" in written.columns:
            agg_cols.append(F.round(F.sum("coverage"), 9).alias("coverage_sum"))
        if "n_tok" in written.columns and "coverage" in written.columns:
            agg_cols.append(F.round(F.sum(F.col("coverage") * F.col("n_tok")))
                            .cast("long").alias("masked_tokens"))
        lineage = (written.groupBy(F.spark_partition_id().alias("partition_id"))
                   .agg(*agg_cols)
                   .withColumn("batch_id", F.lit(batch_id)))
        # collect the tiny per-partition lineage once: the marker's row
        # count is the SUM of rows_out, and the metrics parquet is written
        # from the collected rows (one row per written partition, no shuffle)
        lineage_rows = lineage.collect()
        n_rows = int(sum(r["rows_out"] for r in lineage_rows))
        (spark.createDataFrame(lineage_rows, schema=lineage.schema)
         .coalesce(1).write.mode("overwrite").parquet(metrics_path))

        # atomic commit marker: tmp file + rename (rename is atomic on POSIX)
        fd, tmp = tempfile.mkstemp(dir=f"{self.out_dir}/_commits",
                                   suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump({"batch_id": batch_id, "rows": n_rows}, f)
        os.replace(tmp, self._commit_path(batch_id))

    def committed_batches(self) -> list[int]:
        d = f"{self.out_dir}/_commits"
        return sorted(int(f[:-5]) for f in os.listdir(d) if f.endswith(".json"))

    def read_committed(self, spark: SparkSession) -> DataFrame:
        """Only committed batch dirs are visible (exactly-once read view)."""
        paths = [f"{self.out_dir}/data/batch_id={b}"
                 for b in self.committed_batches()]
        if not paths:
            raise ValueError("no committed batches")
        return spark.read.option("basePath", f"{self.out_dir}/data") \
            .parquet(*paths)

    def read_metrics(self, spark: SparkSession) -> DataFrame:
        paths = [f"{self.out_dir}/metrics/batch_id={b}"
                 for b in self.committed_batches()]
        if not paths:
            raise ValueError("no committed batches")
        return spark.read.option("basePath", f"{self.out_dir}/metrics") \
            .parquet(*paths)


class IcebergMergeSink:
    """Exactly-once sink on an Iceberg catalog: per-batch MERGE on the sink
    key + a committed-batch ledger table (the production path the parquet
    commit-marker sink emulates; reference sink analogue
    pdf_processor.py:130-155).

    Protocol per micro-batch N:
    1. ledger lookup: if N is in `<table>_commits`, the batch already
       committed fully — no-op (foreachBatch replay).
    2. MERGE INTO <table> ON the sink key — UPDATE on match, INSERT
       otherwise. MERGE is snapshot-atomic in Iceberg and idempotent under
       replay (a matched row updates to identical values), so a crash
       between MERGE and the ledger write re-runs safely.
    3. append (batch_id, rows) to the ledger — the commit point.

    Requires an Iceberg catalog (sources.tables.iceberg_available); the
    factory `make_sink` picks this class only when one exists.
    """

    def __init__(self, table: str,
                 key_cols: tuple[str, ...] = ("doc_id", "seq_no")):
        self.table = table
        self.key_cols = list(key_cols)
        self.ledger = f"{table}_commits"

    def merge_sql(self, updates_view: str = "_updates") -> str:
        on = " AND ".join(f"t.{c} = u.{c}" for c in self.key_cols)
        return (f"MERGE INTO {self.table} t USING {updates_view} u ON {on} "
                f"WHEN MATCHED THEN UPDATE SET * "
                f"WHEN NOT MATCHED THEN INSERT *")

    def _ensure_tables(self, spark: SparkSession, batch_df: DataFrame) -> None:
        ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                        for f in batch_df.schema.fields)
        spark.sql(f"CREATE TABLE IF NOT EXISTS {self.table} ({ddl}) "
                  f"USING iceberg")
        spark.sql(f"CREATE TABLE IF NOT EXISTS {self.ledger} "
                  f"(batch_id BIGINT, rows BIGINT) USING iceberg")

    def is_committed(self, spark: SparkSession, batch_id: int) -> bool:
        try:
            return (spark.table(self.ledger)
                    .where(F.col("batch_id") == batch_id).limit(1)
                    .count() > 0)
        except Exception:
            return False  # ledger not created yet -> nothing committed

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if self.is_committed(spark, batch_id):
            return
        self._ensure_tables(spark, batch_df)
        deduped = batch_df.dropDuplicates(self.key_cols).cache()
        try:
            view = f"_updates_b{batch_id}"
            deduped.createOrReplaceTempView(view)
            spark.sql(self.merge_sql(view))
            n = deduped.count()  # rows upserted by this batch (same
            # semantics as the parquet sink's commit-marker row count)
        finally:
            deduped.unpersist()
        spark.sql(f"INSERT INTO {self.ledger} VALUES "
                  f"({int(batch_id)}, {int(n)})")


def make_sink(out: str, spark: SparkSession,
              key_cols: tuple[str, ...] = ("doc_id", "seq_no")):
    """Pick the sink for a destination: Iceberg MERGE when `out` names a
    catalog table and a catalog exists, commit-marker parquet otherwise —
    same exactly-once contract either way."""
    from ..sources.tables import iceberg_available
    if "/" not in out and iceberg_available(spark):
        return IcebergMergeSink(out, key_cols)
    return ExactlyOnceParquetSink(out, key_cols)
