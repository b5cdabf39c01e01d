"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship dominant-token detection (A1+A2+A3,
  watermark_detector.py:147-191 re-expressed relationally) over char-token
  arrays derived from /root/testdata/sf0.001 documents.
- ``queries()``: every implemented operator from SURVEY.md §2 as a named
  (spark, sf_dir) -> DataFrame callable.
- ``oracle_sql()``: DuckDB-equivalent SQL for EVERY registered query
  (50/50), including cross-paradigm SQL re-derivations of the kernel
  chains: q40 unrolls the full 2-pass repair, q47 aggregates over it, and
  q37 parametrizes the unroll by the per-source classified params —
  including the float32 step-rounded blend, which DuckDB reproduces
  bit-exactly because its FLOAT arithmetic is per-step float32.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pdf_watermark_removal_otsu_inpaint_spark.plans.queries import (  # noqa: E402
    ORACLES, QUERIES)

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q29_dominant_char_token"](spark, _SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
