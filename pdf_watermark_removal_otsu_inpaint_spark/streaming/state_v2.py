"""X5 on the Spark 4 state API v2 (transformWithStateInPandas).

Same semantics as streaming/state.py (detected wm token cached per
(source, doc_id), reference watermark_detector.py:562-568) but expressed as
a StatefulProcessor with typed ValueState — the forward path for stateful
operators (applyInPandasWithState is the legacy API). Requires the RocksDB
state store provider.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
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
        from .. import reference_kernels as rk
        p = self.p
        wm = None
        if self.wm_state.exists():
            got = self.wm_state.get()
            wm = got[0] if got is not None else None
        for pdf in rows:
            masks, wms, covs, froms = [], [], [], []
            for arr in pdf["tokens"]:
                a = np.asarray(arr)
                from_state = wm is not None
                mask, wfound = rk.detect_refine(
                    a, wm, p.color_tolerance, p.kernel_size, p.protect_text,
                    p.text_expand, p.min_run, p.max_run)
                if wm is None and wfound is not None:
                    wm = int(wfound)
                masks.append(mask)
                wms.append(wfound if wfound is not None else wm)
                covs.append(rk.coverage(mask))
                froms.append(from_state)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"], "seq_no": pdf["seq_no"],
                "event_ts": pdf["event_ts"], "source": pdf["source"],
                "mask": masks, "wm_token": wms, "coverage": covs,
                "from_state": froms,
            })
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
