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
from pyspark.sql.types import (BinaryType, IntegerType, LongType,
                               StructField, StructType)

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
        # (wm token, last registered timer): carrying the timer in the
        # value makes timer upkeep a precise deleteTimer(old) instead of a
        # listTimers round-trip — every state access here is an RPC to the
        # JVM state server, ~6/key/batch trimmed to <=4 (1 for keys with
        # no detection), which is what per-doc keying multiplies at scale
        self.wm_state = handle.getValueState(
            "wm", StructType([StructField("wm", IntegerType(), True),
                              StructField("tmr", LongType(), True)]))

    def handleInputRows(self, key, rows: Iterator[pd.DataFrame],
                        timerValues) -> Iterator[pd.DataFrame]:
        # same whole-batch vectorized body as the v1 API (state.py)
        from .state import detect_group_batch
        p = self.p
        got = self.wm_state.get()    # None when absent: no exists() RPC
        wm = got[0] if got is not None else None
        last_timer = got[1] if got is not None else 0
        last_seen_ms = 0
        for pdf in rows:
            out, wm = detect_group_batch(pdf, wm, p)
            if len(pdf):
                last_seen_ms = max(
                    last_seen_ms,
                    int(pdf["event_ts"].max().value // 1_000_000))
            yield out
        # per-doc state dies after silence (the reference's per-doc cache
        # dies with the document, watermark_detector.py:562-568): slide ONE
        # event-time timer to max(last event seen, watermark) + TTL; without
        # this, state at 10^12 docs grows without bound. The event-time
        # anchor (not just the watermark, which is 0 on the first batch)
        # makes the horizon live from the key's very first row. No state ->
        # no timer (nothing to expire).
        if wm is not None:
            anchor = max(last_seen_ms, timerValues.getCurrentWatermarkInMs())
            new_timer = anchor + STATE_TTL_MS if anchor > 0 else last_timer
            self.wm_state.update((wm, new_timer))
            if new_timer != last_timer:
                if last_timer:
                    self.handle.deleteTimer(last_timer)
                self.handle.registerTimer(new_timer)

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        self.wm_state.clear()
        return iter(())

    def close(self) -> None:
        pass


class CoarseDetectProcessor(StatefulProcessor):
    """X5c on the v2 API: state keyed by (source, hash(doc_id) % n_shards)
    with the per-doc carry-over dict pickled into ONE binary ValueState and
    one event-time timer per SHARD — the same shard-dict design as
    state_coarse.make_coarse_stateful_detect (whole-shard vectorized
    detection, ~n_docs/(n_sources*n_shards) fewer Python dispatches), on
    the forward-path API. Semantics per doc are identical to the legacy
    implementation (output-equality-tested in tests/test_streaming.py):
    per-doc expiry against the watermark happens in-function AFTER
    processing, and the shard timer only clears a shard silent past the
    horizon — by which time every doc in its dict has lapsed too."""

    def __init__(self, params: EngineParams = DEFAULT_PARAMS,
                 horizon_ms: int = STATE_TTL_MS,
                 packed: bool = False, with_tokens: bool = False):
        self.p = params
        self.horizon_ms = horizon_ms
        self.packed = packed
        self.with_tokens = with_tokens

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.blob = handle.getValueState(
            "docs", StructType([StructField("blob", BinaryType(), True)]))

    def handleInputRows(self, key, rows: Iterator[pd.DataFrame],
                        timerValues) -> Iterator[pd.DataFrame]:
        import pickle

        from .state_coarse import detect_source_batch
        docs: dict = {}
        last_timer = 0
        got = self.blob.get()        # None when absent: no exists() RPC
        if got is not None and got[0] is not None:
            loaded = pickle.loads(bytes(got[0]))
            if isinstance(loaded, tuple):   # (docs, last_timer)
                docs, last_timer = loaded
            else:   # earlier blob format: bare docs dict, no timer field.
                # The pre-upgrade code DID register a timer this blob
                # doesn't remember — purge it (one listTimers, once per
                # key per migration) or it fires later and
                # handleExpiredTimer clears the live shard state while
                # recent events have extended the horizon.
                docs = loaded
                for old in self.handle.listTimers():
                    self.handle.deleteTimer(old)
        last_ms = 0
        for pdf in rows:
            if len(pdf):
                last_ms = max(
                    last_ms,
                    int(pdf["event_ts"].max().value // 1_000_000))
            out, docs = detect_source_batch(pdf, docs, self.p,
                                            packed=self.packed,
                                            with_tokens=self.with_tokens)
            yield out
        wm_ms = timerValues.getCurrentWatermarkInMs()
        if wm_ms > 0:   # per-doc expiry, same timing as the legacy op
            docs = {d: v for d, v in docs.items()
                    if v[1] + self.horizon_ms >= wm_ms}
        # the shard's TTL timer rides in the blob: timer upkeep is a
        # precise deleteTimer(old) + registerTimer(new) pair (skipped
        # entirely when unchanged) instead of a listTimers iterator RPC
        anchor = max(wm_ms, last_ms)
        new_timer = anchor + self.horizon_ms if anchor > 0 else last_timer
        self.blob.update((pickle.dumps((docs, new_timer), protocol=4),))
        if new_timer != last_timer:
            if last_timer:
                self.handle.deleteTimer(last_timer)
            self.handle.registerTimer(new_timer)

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        self.blob.clear()
        return iter(())

    def close(self) -> None:
        pass


# Canonical RocksDB state-store configuration (one source: pipeline.py
# applies the same dict). Changelog checkpointing is ON: the provider
# commits each micro-batch by uploading the batch's state CHANGELOG and
# snapshots in the background every
# `...rocksdb.minDeltasForSnapshot` batches — without it every commit
# uploads a full store snapshot per partition, which at 10^12 state keys
# (the X6 join buffering both streams to the watermark horizon) is the
# checkpoint bottleneck, not the state writes themselves. A checkpoint
# written with changelog mode must be resumed with it (same flag on
# restart) — covered by the pipeline docstring's checkpoint-compatibility
# note and exercised by the default-path resume test.
ROCKSDB_CONF = {
    "spark.sql.streaming.stateStore.providerClass":
        ("org.apache.spark.sql.execution.streaming.state."
         "RocksDBStateStoreProvider"),
    "spark.sql.streaming.stateStore.rocksdb."
    "changelogCheckpointing.enabled": "true",
}


def _rocksdb(seq):
    spark = seq.sparkSession
    for k, v in ROCKSDB_CONF.items():
        spark.conf.set(k, v)


def detect_stream_stateful_v2(seq, params: EngineParams = DEFAULT_PARAMS,
                              watermark: str = "10 minutes"):
    """sequences stream -> stateful detect_masks stream via the v2 state API.
    The session must use the RocksDB state store provider."""
    _rocksdb(seq)
    return (seq.withWatermark("event_ts", watermark)
            .groupBy("source", "doc_id")
            .transformWithStateInPandas(
                DetectProcessor(params),
                outputStructType=OUTPUT_SCHEMA,
                outputMode="append",
                timeMode="eventTime"))


def detect_stream_stateful_coarse_v2(seq,
                                     params: EngineParams = DEFAULT_PARAMS,
                                     watermark: str = "10 minutes",
                                     n_shards: int = 64,
                                     packed: bool = False,
                                     with_tokens: bool = False,
                                     event_time_col: str = ""):
    """X5c on the v2 state API: coarse-keyed stateful detect stream (see
    CoarseDetectProcessor). Output-equivalent to both the legacy coarse op
    and the fine-keyed v1/v2 ops; packed / with_tokens select the same
    bit-packed and join-free wire formats as the legacy op (shared
    assemble_detect_output, so the schemas cannot diverge).

    `event_time_col`: pass the output's event-time column name (e.g.
    "event_ts") when a DOWNSTREAM stateful operator (the X6 stream-stream
    join) consumes this stream — Spark 4's sanctioned chaining mechanism:
    the operator re-declares event time on its output so the watermark
    propagates, instead of the consumer calling withWatermark again
    (which the engine rejects as watermark redefinition past a stateful
    op). Leave empty when the output feeds only stateless stages."""
    from pyspark.sql import functions as F

    from .state import (DETECT_STATE_OUTPUT_JOINFREE,
                        DETECT_STATE_OUTPUT_PACKED)
    if with_tokens and not packed:
        raise ValueError("with_tokens requires packed=True "
                         "(the join-free wire format)")
    out_schema = (DETECT_STATE_OUTPUT_JOINFREE if with_tokens
                  else DETECT_STATE_OUTPUT_PACKED if packed
                  else OUTPUT_SCHEMA)
    _rocksdb(seq)
    return (seq.withWatermark("event_ts", watermark)
            .withColumn("_shard", F.pmod(F.xxhash64("doc_id"),
                                         F.lit(n_shards)))
            .groupBy("source", "_shard")
            .transformWithStateInPandas(
                CoarseDetectProcessor(params, packed=packed,
                                      with_tokens=with_tokens),
                outputStructType=out_schema,
                outputMode="append",
                timeMode="eventTime",
                eventTimeColumnName=event_time_col))
