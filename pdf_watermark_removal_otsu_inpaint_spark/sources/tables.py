"""Table I/O adapters: Iceberg when available, parquet otherwise.

The production deployment (north_rule) reads/writes Iceberg tables of
pre-tokenized sequences. The Iceberg runtime jar is not in this image, so
the adapter probes for the catalog and degrades to plain parquet paths with
the same schema — call sites never branch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg runtime is on the JVM classpath. NB: py4j
    attribute access (spark._jvm.org.apache.iceberg.Table) returns a
    JavaPackage stub for MISSING classes instead of raising — probe through
    Class.forName, which actually loads the class or throws."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.Table")
        return True
    except Exception:
        return False


def read_sequences(spark: SparkSession, location: str) -> DataFrame:
    """location: 'catalog.db.table' (Iceberg) or a parquet path."""
    if "/" not in location and iceberg_available(spark):
        return spark.read.format("iceberg").load(location)
    return spark.read.parquet(location)


def read_sequences_stream(spark: SparkSession, location: str,
                          max_files_per_trigger: int = 8) -> DataFrame:
    from ..streaming.pipeline import SEQ_SCHEMA
    if "/" not in location and iceberg_available(spark):
        return (spark.readStream.format("iceberg").load(location))
    return (spark.readStream.schema(SEQ_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(location))


def write_sequences(df: DataFrame, location: str, mode: str = "append") -> None:
    if "/" not in location and iceberg_available(df.sparkSession):
        df.write.format("iceberg").mode(mode).save(location)
    else:
        df.write.mode(mode).parquet(location)


def write_sequences_bucketed(df: DataFrame, table: str, buckets: int = 64,
                             key: tuple[str, ...] = ("doc_id", "seq_no"),
                             mode: str = "overwrite") -> None:
    """Bucketed+sorted table on the sink key: two tables bucketed the same
    way join WITHOUT a shuffle or sort (co-located join — the 100 TB
    strategy for the repeated detect-masks ⋈ sequences join; on Iceberg the
    equivalent is a bucket partition transform). Plan shape pinned in
    tests/test_plan_hygiene.py::test_bucketed_join_is_colocated."""
    (df.write.mode(mode).bucketBy(buckets, *key).sortBy(*key)
       .format("parquet").saveAsTable(table))
