"""Coarse-keyed stateful detection (X5c): identical per-document cache-once
semantics to state.py (the reference caches self.watermark_color after the
first detecting page, watermark_detector.py:562-568, :188), but the Spark
state KEY is (source, hash(doc_id) % n_shards) and the per-doc carry-over
lives in a dict inside the state value.

Why: applyInPandasWithState pays one Python dispatch + Arrow exchange +
state-store round-trip PER GROUP per micro-batch. Keyed by (source, doc_id)
that is one dispatch per document (750 groups in the bench slice; at one
doc per row the dispatch cost halves the detect stage's throughput, and it
keeps growing with doc cardinality). Keyed by (source, shard) it is one
dispatch per shard, and the whole shard batch runs through ONE vectorized
detect_batch call; the per-doc prefix rule becomes numpy segment slicing.
n_shards is the parallelism dial: enough shards to fill every core
(default 64 > local[32]), ~100-1000x fewer groups than docs. Trade-offs,
stated: (a) per-doc expiry is enforced in-function against the event-time
watermark (same 600 s horizon and same timing as the fine-keyed timers: a
doc present in the batch where its horizon lapses still uses its cached
token, exactly as v1's timer — which cannot fire for a key with data —
would allow); (b) a shard's state must fit in one state-store value (a
dict of doc_id -> (token, last_ts) pairs — tens of bytes per LIVE doc
within the horizon, not per doc ever seen).
"""

from __future__ import annotations

import pickle
from collections.abc import Iterator

import numpy as np
import pandas as pd

from ..params import DEFAULT_PARAMS, EngineParams
from .state import (DETECT_STATE_OUTPUT, DETECT_STATE_OUTPUT_JOINFREE,
                    DETECT_STATE_OUTPUT_PACKED, assemble_detect_output)

DETECT_COARSE_STATE_SCHEMA = "blob binary"
STATE_HORIZON_MS = 600_000

# column names derived from the shared schema strings, not restated by hand
_OUT_COLS = tuple(f.split()[0] for f in DETECT_STATE_OUTPUT.split(", "))
_OUT_COLS_PACKED = tuple(f.split()[0]
                         for f in DETECT_STATE_OUTPUT_PACKED.split(", "))
_OUT_COLS_JOINFREE = tuple(f.split()[0]
                           for f in DETECT_STATE_OUTPUT_JOINFREE.split(", "))


def _empty_out(packed: bool = False,
               with_tokens: bool = False) -> pd.DataFrame:
    cols = (_OUT_COLS_JOINFREE if with_tokens
            else _OUT_COLS_PACKED if packed else _OUT_COLS)
    return pd.DataFrame({c: pd.Series(dtype=object) for c in cols})


def detect_source_batch(pdf: pd.DataFrame, docs: dict,
                        p: EngineParams,
                        packed: bool = False,
                        with_tokens: bool = False
                        ) -> tuple[pd.DataFrame, dict]:
    """Whole-batch X5 body for ALL documents of one shard.

    ``docs`` maps doc_id -> (wm_token int, last_event_ms int). Semantics per
    document match state.detect_group_batch exactly: rows of a doc with
    cached state use the cached token (from_state=True); otherwise rows
    after the doc's FIRST self-detecting row inherit its token. Per-row
    detection only runs over the rows of UNCACHED docs (v1 likewise skips
    it when the group's token is cached — in carry-over steady state that
    is most of the batch). Returns the output frame and the updated dict."""
    from ..operators.repair_vectorized import (_detect_wm_batch, detect_batch,
                                               flatten_arrays)
    B = len(pdf)
    if B == 0:
        return _empty_out(packed, with_tokens), docs

    gid, uniq = pd.factorize(pdf["doc_id"], sort=False)
    order = np.argsort(gid, kind="stable")  # docs contiguous, row order kept
    pdf = pdf.iloc[order].reset_index(drop=True)
    gid = gid[order]
    starts = np.flatnonzero(np.r_[True, gid[1:] != gid[:-1]])
    ends = np.r_[starts[1:], B]

    flat, offsets = flatten_arrays(pdf["tokens"])
    flat = np.ascontiguousarray(flat, dtype=np.int32)
    lengths = np.diff(offsets)

    # per-segment cache state: the dict GETS are inherent (one per doc in
    # the batch); everything after them is array math — no per-document
    # Python loop (that loop was the coarse chain's bottleneck at the
    # one-doc-per-row shape: 12k iterations/batch).
    doc_vals = pdf["doc_id"].to_numpy()
    seg_docs = doc_vals[starts]
    seg_cached = [docs.get(d) for d in seg_docs.tolist()]
    has_cache = np.fromiter((c is not None for c in seg_cached),
                            dtype=bool, count=len(seg_cached))
    cache_tok = np.fromiter(
        (c[0] if c is not None else -1 for c in seg_cached),
        dtype=np.int32, count=len(seg_cached))
    cache_ts = np.fromiter(
        (c[1] if c is not None else 0 for c in seg_cached),
        dtype=np.int64, count=len(seg_cached))

    seg_of_row = np.repeat(np.arange(starts.size), ends - starts)
    row_cached = has_cache[seg_of_row]

    det = np.full(B, -1, dtype=np.int32)
    if not has_cache.all():
        # per-row detection only over the rows of UNCACHED docs
        row_mask = ~row_cached
        sub_rows = np.flatnonzero(row_mask)
        sub_lengths = lengths[sub_rows]
        sub_offsets = np.zeros(sub_rows.size + 1, dtype=np.int64)
        np.cumsum(sub_lengths, out=sub_offsets[1:])
        sub_flat = flat[np.repeat(row_mask, lengths)]
        sub_row_idx = np.repeat(np.arange(sub_rows.size, dtype=np.int64),
                                sub_lengths)
        det[sub_rows] = _detect_wm_batch(sub_flat.astype(np.uint8),
                                         sub_offsets, sub_lengths,
                                         sub_row_idx)

    wm_used = det.copy()
    froms = np.zeros(B, dtype=bool)
    ts_ms = pdf["event_ts"].to_numpy().astype("datetime64[ms]").astype(np.int64)
    seg_ts_max = np.maximum.reduceat(ts_ms, starts)

    # cached segments: every row uses the cached token
    wm_used[row_cached] = cache_tok[seg_of_row[row_cached]]
    froms[row_cached] = True

    # uncached segments: rows AFTER the first self-detecting row inherit
    # its token (cache-once within the batch). first_idx per segment via a
    # reduceat-min over detection positions (B = "none found"); cached
    # segments have det == -1 everywhere so they read B here too.
    pos = np.arange(B, dtype=np.int64)
    first_idx = np.minimum.reduceat(np.where(det >= 0, pos, B), starts)
    found = first_idx < B
    tok_first = np.where(found, det[np.minimum(first_idx, B - 1)],
                         -1).astype(np.int32)
    after = found[seg_of_row] & (pos > first_idx[seg_of_row])
    wm_used[after] = tok_first[seg_of_row[after]]
    froms[after] = True

    # ONE batched dict update: cached docs refresh their timestamp (token
    # unchanged), uncached-and-found docs insert their first detection
    upd_tok = np.where(has_cache, cache_tok, tok_first)
    upd_ts = np.where(has_cache, np.maximum(cache_ts, seg_ts_max),
                      seg_ts_max)
    sel = np.flatnonzero(has_cache | found)
    docs.update(zip(seg_docs[sel].tolist(),
                    zip(upd_tok[sel].tolist(), upd_ts[sel].tolist())))

    mask_flat, wm_out, covs = detect_batch(flat, offsets, p, wm_in=wm_used)
    out = assemble_detect_output(pdf, mask_flat, offsets, wm_out, covs,
                                 froms, packed=packed,
                                 with_tokens=with_tokens)
    return out, docs


def make_coarse_stateful_detect(params: EngineParams = DEFAULT_PARAMS,
                                horizon_ms: int = STATE_HORIZON_MS,
                                packed: bool = False,
                                with_tokens: bool = False):
    p = params

    def fn(key, pdf_iter: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if getattr(state, "hasTimedOut", False):
            # whole-shard expiry: the shard timer only fires after the
            # shard has been silent past the horizon, at which point every
            # doc's last event is older than the horizon too
            state.remove()
            return
        docs = pickle.loads(state.get[0]) if state.exists else {}
        last_ms = 0
        for pdf in pdf_iter:
            if len(pdf):
                last_ms = max(last_ms, int(
                    pdf["event_ts"].to_numpy()
                    .astype("datetime64[ms]").astype("int64").max()))
            out, docs = detect_source_batch(pdf, docs, p, packed=packed,
                                            with_tokens=with_tokens)
            yield out
        # per-doc expiry AFTER processing, mirroring the fine-keyed timer
        # timing: a key with data in the batch never times out in v1, so a
        # doc present here keeps its cached token even if its horizon just
        # lapsed (its last_ts was refreshed above); only absent-and-silent
        # docs are dropped
        wm_ms = state.getCurrentWatermarkMs()
        if wm_ms > 0:
            docs = {d: v for d, v in docs.items()
                    if v[1] + horizon_ms >= wm_ms}
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
                                  n_shards: int = 64,
                                  packed: bool = False,
                                  with_tokens: bool = False):
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

    out_schema = (DETECT_STATE_OUTPUT_JOINFREE if with_tokens
                  else DETECT_STATE_OUTPUT_PACKED if packed
                  else DETECT_STATE_OUTPUT)
    if with_tokens and not packed:
        raise ValueError("with_tokens requires packed=True "
                         "(the join-free wire format)")
    return (seq.withWatermark("event_ts", watermark)
            .withColumn("_shard", F.pmod(F.xxhash64("doc_id"),
                                         F.lit(n_shards)))
            .groupBy("source", "_shard")
            .applyInPandasWithState(
                make_coarse_stateful_detect(params, packed=packed,
                                            with_tokens=with_tokens),
                outputStructType=out_schema,
                stateStructType=DETECT_COARSE_STATE_SCHEMA,
                outputMode="append",
                timeoutConf="EventTimeTimeout"))
