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
# X6 wire format: bit-packed masks divide the mask's bytes by ~8 across the
# stream-stream join SHUFFLE and inside the join's STATE STORE (each side
# of an interval join buffers its rows in state until the watermark closes
# them out) — at 2048 tokens that is ~2 KB -> 256 B per buffered row. The
# post-join repair already dispatches on the mask column name
# (pipeline.repair_joined -> make_apply_mask_bin_udf).
DETECT_STATE_OUTPUT_PACKED = (
    "doc_id string, seq_no long, event_ts timestamp, "
    "source string, mask_bin binary, wm_token int, "
    "coverage double, from_state boolean")
# Join-free chain flavor: the state op already holds each row's tokens, so
# it can pass them through alongside the mask and feed the K2 repair
# DIRECTLY — no X6 stream-stream join, so neither stream is buffered in
# join state (at 10^12 rows the join buffers BOTH sides until the
# watermark closes them). X6 stays the spec'd default composition; this is
# the measured alternative for the carry-over-without-rejoin shape.
DETECT_STATE_OUTPUT_JOINFREE = (
    "doc_id string, seq_no long, event_ts timestamp, "
    "source string, tokens array<int>, n_tok int, mask_bin binary, "
    "wm_token int, coverage double, from_state boolean")
DETECT_STATE_SCHEMA = "wm_token int, rows_seen long"


def assemble_detect_output(pdf: pd.DataFrame, mask_flat, offsets, wm_out,
                           covs, froms, packed: bool = False,
                           with_tokens: bool = False) -> pd.DataFrame:
    """The one detect-output frame builder — shared by the fine-keyed (v1)
    and coarse-keyed (X5c) stateful ops so a schema change cannot silently
    diverge between them. packed=True emits the bit-packed `mask_bin`
    (np.packbits wire format, DETECT_STATE_OUTPUT_PACKED) instead of
    `mask array<boolean>`; with_tokens=True additionally passes the input
    tokens/n_tok through (DETECT_STATE_OUTPUT_JOINFREE, packed only)."""
    B = len(pdf)
    if packed:
        mask_col = ("mask_bin",
                    [np.packbits(mask_flat[offsets[i]:offsets[i + 1]])
                     .tobytes() for i in range(B)])
    else:
        mask_col = ("mask",
                    [mask_flat[offsets[i]:offsets[i + 1]] for i in range(B)])
    out = {"doc_id": pdf["doc_id"], "seq_no": pdf["seq_no"],
           "event_ts": pdf["event_ts"], "source": pdf["source"]}
    if with_tokens:
        assert packed, "with_tokens implies the packed wire format"
        out["tokens"] = pdf["tokens"]
        out["n_tok"] = pdf["n_tok"]
    out[mask_col[0]] = mask_col[1]
    out["wm_token"] = [None if w < 0 else int(w) for w in wm_out]
    out["coverage"] = covs
    out["from_state"] = froms
    return pd.DataFrame(out)


def detect_group_batch(pdf: pd.DataFrame, wm: int | None,
                       p: EngineParams,
                       packed: bool = False) -> tuple[pd.DataFrame, int | None]:
    """Shared X5 group body (v1 applyInPandasWithState AND v2
    transformWithStateInPandas): whole-batch vectorized detection with the
    cache-once carry-over (the reference's self.watermark_color,
    watermark_detector.py:562-568) resolved as a prefix rule — rows after
    the FIRST self-detecting row inherit its token. Returns (output frame,
    possibly-updated wm)."""
    from ..operators.repair_vectorized import (_detect_wm_batch, detect_batch,
                                               flatten_arrays)
    B = len(pdf)
    flat, offsets = flatten_arrays(pdf["tokens"])
    flat = np.ascontiguousarray(flat, dtype=np.int32)
    if wm is not None:
        wm_used = np.full(B, wm, dtype=np.int32)
        froms = np.ones(B, dtype=bool)
    else:
        g = flat.astype(np.uint8)
        lengths = np.diff(offsets)
        row_idx = np.repeat(np.arange(B, dtype=np.int64), lengths)
        det = _detect_wm_batch(g, offsets, lengths, row_idx)
        wm_used = det.copy()
        froms = np.zeros(B, dtype=bool)
        found = np.flatnonzero(det >= 0)
        if found.size:
            first = found[0]
            wm_used[first + 1:] = det[first]  # cache-once
            froms[first + 1:] = True
            wm = int(det[first])
    mask_flat, wm_out, covs = detect_batch(flat, offsets, p, wm_in=wm_used)
    out = assemble_detect_output(pdf, mask_flat, offsets, wm_out, covs,
                                 froms, packed=packed)
    return out, wm


def make_stateful_detect(params: EngineParams = DEFAULT_PARAMS,
                         packed: bool = False):
    p = params

    def fn(key, pdf_iter: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        source, doc_id = key
        if getattr(state, "hasTimedOut", False):
            # expiry invocation: DROP the doc's cached token — re-updating
            # here would re-arm the timer forever and the state would never
            # actually expire (unbounded at 10^12 docs)
            state.remove()
            return
        wm, rows_seen = (state.get if state.exists else (None, 0))
        last_ms = 0
        for pdf in pdf_iter:
            out, wm = detect_group_batch(pdf, wm, p, packed=packed)
            rows_seen += len(pdf)
            if len(pdf):
                last_ms = max(last_ms, int(
                    pdf["event_ts"].to_numpy()
                    .astype("datetime64[ms]").astype("int64").max()))
            yield out
        state.update((wm, rows_seen))
        # state for a doc expires after silence (bounded state at 10^12
        # docs). Anchor at max(watermark, last event seen) like state_v2:
        # in the FIRST micro-batch the watermark is still 0, and a
        # watermark-only guard would register no timer at all for docs
        # that never appear again — permanent state leak.
        anchor = max(state.getCurrentWatermarkMs(), last_ms)
        if hasattr(state, "setTimeoutTimestamp") and anchor > 0:
            state.setTimeoutTimestamp(anchor + 600_000)

    return fn


def detect_stream_stateful(seq, params: EngineParams = DEFAULT_PARAMS,
                           watermark: str = "10 minutes",
                           packed: bool = False):
    """sequences stream -> stateful detect_masks stream (X5). packed=True
    emits bit-packed `mask_bin` masks (the X6 join wire format)."""
    return (seq.withWatermark("event_ts", watermark)
            .groupBy("source", "doc_id")
            .applyInPandasWithState(
                make_stateful_detect(params, packed=packed),
                outputStructType=(DETECT_STATE_OUTPUT_PACKED if packed
                                  else DETECT_STATE_OUTPUT),
                stateStructType=DETECT_STATE_SCHEMA,
                outputMode="append",
                timeoutConf="EventTimeTimeout"))
