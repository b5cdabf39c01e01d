"""Coarse-keyed stateful detection (X5c): identical per-document cache-once
semantics to state.py (the reference caches self.watermark_color after the
first detecting page, watermark_detector.py:562-568, :188), but the Spark
state KEY is (source, hash(doc_id) % n_shards) and the per-doc carry-over
lives in a dict inside the state value.

Why: applyInPandasWithState pays one Python dispatch + Arrow exchange +
state-store round-trip PER GROUP per micro-batch. Keyed by (source, doc_id)
that is one dispatch per document (~26k tiny groups in the bench slice —
the measured ~500 seqs/s ceiling of the fine-keyed X5 path). Keyed by
(source, shard) it is one dispatch per shard, and the whole shard batch
runs through ONE vectorized detect_batch call; the per-doc prefix rule
becomes numpy segment slicing. n_shards is the parallelism dial: enough
shards to fill every core (default 64 > local[32]), ~100-1000x fewer
groups than docs. Trade-offs, stated: (a) per-doc expiry is enforced
in-function against the event-time watermark instead of per-key timers
(same 600 s horizon as state.py/state_v2.py), so an entirely silent shard
holds its dict until the shard-level timer fires; (b) a shard's state must
fit in one state-store value (a dict of doc_id -> (token, last_ts) pairs —
tens of bytes per LIVE doc within the horizon, not per doc ever seen).
"""

from __future__ import annotations

import pickle
from collections.abc import Iterator

import numpy as np
import pandas as pd

from ..params import DEFAULT_PARAMS, EngineParams
from .state import DETECT_STATE_OUTPUT

DETECT_COARSE_STATE_SCHEMA = "blob binary"
STATE_HORIZON_MS = 600_000

_OUT_COLS = ("doc_id", "seq_no", "event_ts", "source", "mask", "wm_token",
             "coverage", "from_state")


def _empty_out() -> pd.DataFrame:
    return pd.DataFrame({c: pd.Series(dtype=object) for c in _OUT_COLS})


def detect_source_batch(pdf: pd.DataFrame, docs: dict,
                        p: EngineParams) -> tuple[pd.DataFrame, dict]:
    """Whole-batch X5 body for ALL documents of one source.

    ``docs`` maps doc_id -> (wm_token int, last_event_ms int). Semantics per
    document match state.detect_group_batch exactly: rows of a doc with
    cached state use the cached token (from_state=True); otherwise rows
    after the doc's FIRST self-detecting row inherit its token. Returns the
    output frame (v1 column set) and the updated dict."""
    from ..operators.repair_vectorized import (_detect_wm_batch, detect_batch,
                                               flatten_arrays)
    B = len(pdf)
    if B == 0:
        return _empty_out(), docs

    gid, uniq = pd.factorize(pdf["doc_id"], sort=False)
    order = np.argsort(gid, kind="stable")  # docs contiguous, row order kept
    pdf = pdf.iloc[order].reset_index(drop=True)
    gid = gid[order]
    starts = np.flatnonzero(np.r_[True, gid[1:] != gid[:-1]])
    ends = np.r_[starts[1:], B]

    flat, offsets = flatten_arrays(pdf["tokens"])
    flat = np.ascontiguousarray(flat, dtype=np.int32)
    lengths = np.diff(offsets)
    row_idx = np.repeat(np.arange(B, dtype=np.int64), lengths)
    det = _detect_wm_batch(flat.astype(np.uint8), offsets, lengths, row_idx)

    wm_used = det.copy()
    froms = np.zeros(B, dtype=bool)
    ts_ms = pdf["event_ts"].to_numpy().astype("datetime64[ms]").astype(np.int64)
    for s, e in zip(starts.tolist(), ends.tolist()):
        doc = pdf["doc_id"].iat[s]
        cached = docs.get(doc)
        if cached is not None:
            wm_used[s:e] = cached[0]
            froms[s:e] = True
            docs[doc] = (cached[0], max(cached[1], int(ts_ms[s:e].max())))
            continue
        found = np.flatnonzero(det[s:e] >= 0)
        if found.size:
            first = s + found[0]
            wm_used[first + 1:e] = det[first]  # cache-once within the batch
            froms[first + 1:e] = True
            docs[doc] = (int(det[first]), int(ts_ms[s:e].max()))

    mask_flat, wm_out, covs = detect_batch(flat, offsets, p, wm_in=wm_used)
    out = pd.DataFrame({
        "doc_id": pdf["doc_id"], "seq_no": pdf["seq_no"],
        "event_ts": pdf["event_ts"], "source": pdf["source"],
        "mask": [mask_flat[offsets[i]:offsets[i + 1]] for i in range(B)],
        "wm_token": [None if w < 0 else int(w) for w in wm_out],
        "coverage": covs,
        "from_state": froms,
    })
    return out, docs


def make_coarse_stateful_detect(params: EngineParams = DEFAULT_PARAMS,
                                horizon_ms: int = STATE_HORIZON_MS):
    p = params

    def fn(key, pdf_iter: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if getattr(state, "hasTimedOut", False):
            state.remove()  # whole-shard expiry (silent shard)
            return
        docs = pickle.loads(state.get[0]) if state.exists else {}
        wm_ms = state.getCurrentWatermarkMs()
        if wm_ms > 0:
            # per-doc expiry BEFORE processing: a doc silent past the
            # horizon must re-detect, exactly as the fine-keyed timer
            # would have cleared it between batches
            docs = {d: v for d, v in docs.items()
                    if v[1] + horizon_ms >= wm_ms}
        last_ms = 0
        for pdf in pdf_iter:
            if len(pdf):
                last_ms = max(last_ms, int(
                    pdf["event_ts"].to_numpy()
                    .astype("datetime64[ms]").astype("int64").max()))
            out, docs = detect_source_batch(pdf, docs, p)
            yield out
        state.update((pickle.dumps(docs, protocol=4),))
        # anchor at max(watermark, last event): first-batch shards (wm
        # still 0) must still get a timer or a never-again-seen shard's
        # dict leaks permanently
        anchor = max(wm_ms, last_ms)
        if anchor > 0:
            state.setTimeoutTimestamp(anchor + horizon_ms)

    return fn


def detect_stream_stateful_coarse(seq, params: EngineParams = DEFAULT_PARAMS,
                                  watermark: str = "10 minutes",
                                  n_shards: int = 64):
    """sequences stream -> stateful detect_masks stream, coarse-keyed (X5c).

    Output-equivalent to state.detect_stream_stateful (asserted in
    tests/test_streaming.py) with n_sources * n_shards state groups per
    micro-batch instead of n_docs. A doc maps to exactly one shard
    (deterministic hash), so per-doc carry-over is preserved; n_shards
    trades dispatch count against parallelism — keying by source ALONE
    measured SLOWER end-to-end on local[32] (the detect stage collapsed to
    n_sources tasks), so the default keeps ~2x-core-count groups, which
    preserves full parallelism while cutting the per-batch Python dispatch
    count ~n_docs/(n_sources*n_shards)-fold."""
    from pyspark.sql import functions as F
    return (seq.withWatermark("event_ts", watermark)
            .withColumn("_shard", F.pmod(F.xxhash64("doc_id"),
                                         F.lit(n_shards)))
            .groupBy("source", "_shard")
            .applyInPandasWithState(
                make_coarse_stateful_detect(params),
                outputStructType=DETECT_STATE_OUTPUT,
                stateStructType=DETECT_COARSE_STATE_SCHEMA,
                outputMode="append",
                timeoutConf="EventTimeTimeout"))
