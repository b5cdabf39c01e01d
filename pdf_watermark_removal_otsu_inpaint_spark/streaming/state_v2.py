"""X5 on the Spark 4 state API v2 (transformWithStateInPandas).

Same semantics as streaming/state.py (detected wm token cached per
(source, doc_id), reference watermark_detector.py:562-568) but expressed as
a StatefulProcessor with typed ValueState — the forward path for stateful
operators (applyInPandasWithState is the legacy API). Requires the RocksDB
state store provider.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql.streaming.stateful_processor import (StatefulProcessor,
                                                      StatefulProcessorHandle)
from pyspark.sql.types import IntegerType, StructField, StructType

from ..params import DEFAULT_PARAMS, EngineParams

OUTPUT_SCHEMA = ("doc_id string, seq_no long, event_ts timestamp, "
                 "source string, mask array<boolean>, wm_token int, "
                 "coverage double, from_state boolean")


class DetectProcessor(StatefulProcessor):
    def __init__(self, params: EngineParams = DEFAULT_PARAMS):
        self.p = params

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.wm_state = handle.getValueState(
            "wm", StructType([StructField("wm", IntegerType(), True)]))

    def handleInputRows(self, key, rows: Iterator[pd.DataFrame],
                        timerValues) -> Iterator[pd.DataFrame]:
        # same whole-batch vectorized body as the v1 API (state.py)
        from .state import detect_group_batch
        p = self.p
        wm = None
        if self.wm_state.exists():
            got = self.wm_state.get()
            wm = got[0] if got is not None else None
        for pdf in rows:
            out, wm = detect_group_batch(pdf, wm, p)
            yield out
        if wm is not None:
            self.wm_state.update((wm,))

    def close(self) -> None:
        pass


def detect_stream_stateful_v2(seq, params: EngineParams = DEFAULT_PARAMS,
                              watermark: str = "10 minutes"):
    """sequences stream -> stateful detect_masks stream via the v2 state API.
    The session must use the RocksDB state store provider."""
    spark = seq.sparkSession
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider")
    return (seq.withWatermark("event_ts", watermark)
            .groupBy("source", "doc_id")
            .transformWithStateInPandas(
                DetectProcessor(params),
                outputStructType=OUTPUT_SCHEMA,
                outputMode="append",
                timeMode="eventTime"))
