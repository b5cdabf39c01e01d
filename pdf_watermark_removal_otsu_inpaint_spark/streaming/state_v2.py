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


STATE_TTL_MS = 600_000  # per-doc silence horizon, mirrors state.py:76-77


class DetectProcessor(StatefulProcessor):
    def __init__(self, params: EngineParams = DEFAULT_PARAMS):
        self.p = params

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
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
        last_seen_ms = 0
        for pdf in rows:
            out, wm = detect_group_batch(pdf, wm, p)
            if len(pdf):
                last_seen_ms = max(
                    last_seen_ms,
                    int(pdf["event_ts"].max().value // 1_000_000))
            yield out
        if wm is not None:
            self.wm_state.update((wm,))
        # per-doc state dies after silence (the reference's per-doc cache
        # dies with the document, watermark_detector.py:562-568): slide ONE
        # event-time timer to max(last event seen, watermark) + TTL; without
        # this, state at 10^12 docs grows without bound. The event-time
        # anchor (not just the watermark, which is 0 on the first batch)
        # makes the horizon live from the key's very first row.
        anchor = max(last_seen_ms, timerValues.getCurrentWatermarkInMs())
        if anchor > 0:
            for old in self.handle.listTimers():
                self.handle.deleteTimer(old)
            self.handle.registerTimer(anchor + STATE_TTL_MS)

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        self.wm_state.clear()
        return iter(())

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
