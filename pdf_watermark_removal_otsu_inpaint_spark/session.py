"""SparkSession factory with scale-oriented defaults.

Single place for the knobs that matter at 100 TB (AQE, skew-join split,
Arrow batching, shuffle parallelism) so tests, bench, and the driver all run
the same configuration. Local mode here; on a real cluster the same builder
is driven by spark-submit --py-files (north_rule).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "pdf-wm-token-engine", cpus: int | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    # Python workers must import this package: export the repo root before
    # the JVM/worker processes launch (spark-submit --py-files on a cluster).
    import pathlib
    repo_root = str(pathlib.Path(__file__).resolve().parents[1])
    cur = os.environ.get("PYTHONPATH", "")
    if repo_root not in cur.split(os.pathsep):
        os.environ["PYTHONPATH"] = repo_root + (os.pathsep + cur if cur else "")

    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    b = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # determinism vs the DuckDB oracle (duckdb timestamps are UTC-naive)
        .config("spark.sql.session.timeZone", "UTC")
        # shuffle sized to cores locally; AQE coalesces the rest
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for pandas UDFs; batches sized so per-batch buffers stay
        # cache-resident — measured on this box, 2048-row batches of wide
        # token rows anti-scale at 32 workers (large-alloc churn against the
        # VM's memory-bandwidth ceiling), 1024 is the knee (BENCH.md)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "12g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        # CPU-dense token rows need fine input splits: 128m splits cap
        # concurrent kernel tasks well below the core count (BENCH.md)
        .config("spark.sql.files.maxPartitionBytes", "32m")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
