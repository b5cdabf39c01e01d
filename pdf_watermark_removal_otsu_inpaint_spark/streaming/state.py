"""Stateful detection carry-over (X5): applyInPandasWithState keyed by
(source, doc_id), carrying the detected watermark token across a document's
rows — the reference caches self.watermark_color after the first page
(watermark_detector.py:562-568, :188) and accumulates per-doc detections
(:63, :290); here that cache is streaming state with an event-time timeout.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from ..params import DEFAULT_PARAMS, EngineParams

DETECT_STATE_OUTPUT = ("doc_id string, seq_no long, event_ts timestamp, "
                       "source string, mask array<boolean>, wm_token int, "
                       "coverage double, from_state boolean")
DETECT_STATE_SCHEMA = "wm_token int, rows_seen long"


def make_stateful_detect(params: EngineParams = DEFAULT_PARAMS):
    p = params

    def fn(key, pdf_iter: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        from .. import reference_kernels as rk
        source, doc_id = key
        wm, rows_seen = (state.get if state.exists else (None, 0))
        for pdf in pdf_iter:
            masks, wms, covs, froms = [], [], [], []
            for arr in pdf["tokens"]:
                a = np.asarray(arr, dtype=np.int64)
                from_state = wm is not None
                mask, wfound = rk.detect_refine(
                    a, wm, p.color_tolerance, p.kernel_size, p.protect_text,
                    p.text_expand, p.min_run, p.max_run)
                if wm is None and wfound is not None:
                    wm = int(wfound)  # cache-once, like the reference
                masks.append(mask.tolist())
                wms.append(wfound if wfound is not None else wm)
                covs.append(rk.coverage(mask))
                froms.append(from_state)
                rows_seen += 1
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"], "seq_no": pdf["seq_no"],
                "event_ts": pdf["event_ts"], "source": pdf["source"],
                "mask": masks, "wm_token": wms, "coverage": covs,
                "from_state": froms,
            })
        state.update((wm, rows_seen))
        # state for a doc expires after silence (bounded state at 10^12 docs)
        if hasattr(state, "setTimeoutTimestamp") and state.getCurrentWatermarkMs() > 0:
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 600_000)

    return fn


def detect_stream_stateful(seq, params: EngineParams = DEFAULT_PARAMS,
                           watermark: str = "10 minutes"):
    """sequences stream -> stateful detect_masks stream (X5)."""
    return (seq.withWatermark("event_ts", watermark)
            .groupBy("source", "doc_id")
            .applyInPandasWithState(
                make_stateful_detect(params),
                outputStructType=DETECT_STATE_OUTPUT,
                stateStructType=DETECT_STATE_SCHEMA,
                outputMode="append",
                timeoutConf="EventTimeTimeout"))
