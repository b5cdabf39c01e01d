"""Streaming semantics tests (SURVEY.md §5.2 item 3): windows (X1-X3), late
data (X4), stateful carry-over (X5), stream-stream join (X6), exactly-once
resume (X7/X8), salting (X9)."""

import glob
import os
import time

import numpy as np
import pytest
from pyspark.sql import functions as F

from pdf_watermark_removal_otsu_inpaint_spark import reference_kernels as rk
from pdf_watermark_removal_otsu_inpaint_spark.operators import histogram as oh
from pdf_watermark_removal_otsu_inpaint_spark.operators.repair import (
    detect_masks, repair_sequences)
from pdf_watermark_removal_otsu_inpaint_spark.params import DEFAULT_PARAMS
from pdf_watermark_removal_otsu_inpaint_spark.sources.sequences import (
    sequences_df)
from pdf_watermark_removal_otsu_inpaint_spark.sources.synth import (
    synth_sequences)
from pdf_watermark_removal_otsu_inpaint_spark.streaming.metrics import (
    ProgressCapture)
from pdf_watermark_removal_otsu_inpaint_spark.streaming.pipeline import (
    SEQ_SCHEMA, file_stream, join_masks_with_sequences, repair_joined,
    run_repair_pipeline, salted_source_stats, session_stats_stream,
    windowed_hist_stream)
from pdf_watermark_removal_otsu_inpaint_spark.streaming.sink import (
    ExactlyOnceParquetSink)
from pdf_watermark_removal_otsu_inpaint_spark.streaming.state import (
    detect_stream_stateful)


def _seq_cols(df):
    return df.select("doc_id", "tokens", "n_tok", "source", "event_ts",
                     "seq_no")


def write_batches(spark, dfs, path, start=0):
    """Write each df as one parquet 'file drop' with ordered mtimes.
    `start` offsets the file index, so a later call can APPEND drops to a
    directory an earlier call populated (restart tests)."""
    os.makedirs(path, exist_ok=True)
    for i, df in enumerate(dfs, start=start):
        sub = f"{path}/_stage{i}"
        _seq_cols(df).coalesce(1).write.mode("overwrite").parquet(sub)
        src = glob.glob(f"{sub}/part-*.parquet")[0]
        dst = f"{path}/batch{i:03d}.parquet"
        os.replace(src, dst)
        t = time.time() + i  # strictly increasing mtimes
        os.utime(dst, (t, t))


def test_windowed_hist_stream_matches_batch(spark, tmp_path):
    d = str(tmp_path / "seq")
    df = sequences_df(spark, 40, seed=3)
    write_batches(spark, [df], d)
    stream = file_stream(spark, d)
    q = (windowed_hist_stream(stream, "1 minute")
         .writeStream.outputMode("complete")
         .format("memory").queryName("whist").start())
    q.processAllAvailable()
    q.stop()
    got = {(r.window.start, r.source, r.tok): r.cnt
           for r in spark.sql("SELECT * FROM whist").collect()}
    exp = {(r.window.start, r.source, r.tok): r.cnt
           for r in oh.windowed_histogram(df, "1 minute").collect()}
    assert got == exp and len(exp) > 0


def test_session_window_stream(spark, tmp_path):
    d = str(tmp_path / "seq")
    df = sequences_df(spark, 40, seed=4)
    write_batches(spark, [df], d)
    q = (session_stats_stream(file_stream(spark, d), gap="30 seconds")
         .writeStream.outputMode("complete")
         .format("memory").queryName("sess").start())
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM sess").collect()
    assert len(rows) > 0
    # per-doc totals must be conserved across session splits
    got = {}
    for r in rows:
        got[(r.source, r.doc_id)] = got.get((r.source, r.doc_id), 0) + r.rows_in_session
    exp = {(r.source, r.doc_id): r.cnt
           for r in df.groupBy("source", "doc_id")
                      .agg(F.count("*").alias("cnt")).collect()}
    assert got == exp


def test_late_rows_dropped_and_counted(spark, tmp_path):
    """X4: rows older than the watermark are dropped and show up in the
    listener's numRowsDroppedByWatermark."""
    d = str(tmp_path / "seq")
    fresh = sequences_df(spark, 30, seed=5)
    # Spark filters late records against the PREVIOUS batch's watermark
    # (one-batch lag), so advance the watermark with a second fresh batch
    # before delivering the late rows.
    fresh2 = (sequences_df(spark, 5, seed=7)
              .withColumn("event_ts",
                          F.col("event_ts") + F.expr("interval 1 hour")))
    late = (sequences_df(spark, 10, seed=6)
            .withColumn("event_ts",
                        F.col("event_ts") - F.expr("interval 300 days")))
    write_batches(spark, [fresh, fresh2, late], d)
    import json as _json
    cap = ProgressCapture()
    spark.streams.addListener(cap)
    try:
        stream = file_stream(spark, d, max_files_per_trigger=1)
        q = (windowed_hist_stream(stream, "1 minute", watermark="5 minutes")
             .writeStream.outputMode("update")
             .format("memory").queryName("late").start())
        q.processAllAvailable()
        dropped_sync = sum(
            int(op.get("numRowsDroppedByWatermark", 0))
            for p in q.recentProgress
            for op in (p if isinstance(p, dict)
                       else _json.loads(p.json)).get("stateOperators", []))
        q.stop()
        assert dropped_sync > 0
        # listener delivery is async — poll briefly for the same signal (X8)
        deadline = time.time() + 15
        while time.time() < deadline and cap.rows_dropped_by_watermark() == 0:
            time.sleep(0.3)
        assert cap.rows_dropped_by_watermark() > 0
    finally:
        spark.streams.removeListener(cap)


def test_stream_stream_join_matches_batch(spark, tmp_path):
    """X6: detect_masks stream joined to sequences stream == batch join."""
    seq_dir = str(tmp_path / "seq")
    mask_dir = str(tmp_path / "masks")
    df = sequences_df(spark, 40, seed=8)
    write_batches(spark, [df], seq_dir)
    masks_batch = detect_masks(_seq_cols(df))
    os.makedirs(mask_dir, exist_ok=True)
    masks_batch.coalesce(1).write.mode("overwrite").parquet(mask_dir + "/_m")
    os.replace(glob.glob(mask_dir + "/_m/part-*.parquet")[0],
               mask_dir + "/m0.parquet")

    seq_stream = file_stream(spark, seq_dir)
    mask_stream = (spark.readStream
                   .schema("doc_id string, seq_no long, event_ts timestamp, "
                           "source string, n_tok int, mask array<boolean>, "
                           "wm_token int, coverage double")
                   .option("maxFilesPerTrigger", 1).parquet(mask_dir))
    joined = join_masks_with_sequences(
        seq_stream, mask_stream.drop("source", "n_tok"))
    repaired = repair_joined(joined)
    q = (repaired.writeStream.outputMode("append")
         .format("memory").queryName("joined").start())
    q.processAllAvailable()
    q.stop()
    got = {(r.doc_id, r.seq_no): r.tokens
           for r in spark.sql("SELECT * FROM joined").collect()}
    exp = {(r.doc_id, r.seq_no): r.tokens
           for r in repair_sequences(_seq_cols(df),
                                     DEFAULT_PARAMS.with_(passes=1)).collect()}
    assert len(got) == df.count()
    assert got == exp


def test_stateful_detect_carries_wm_token(spark, tmp_path):
    """X5: the wm token detected on a doc's first row is applied to later
    rows of the same doc where per-row detection fails (coverage > 20%)."""
    import datetime as dt
    d = str(tmp_path / "seq")
    n = 2000
    detectable = np.full(n, 255, dtype=np.int32)
    detectable[100:460] = 200  # 18% -> auto-detect finds 200
    ambiguous = np.full(n, 255, dtype=np.int32)
    ambiguous[100:700] = 200   # 30% -> per-row auto-detect fails
    rows1 = [("docA", detectable.tolist(), n, "web",
              dt.datetime(2026, 1, 1, 0, 0, 10), 0)]
    rows2 = [("docA", ambiguous.tolist(), n, "web",
              dt.datetime(2026, 1, 1, 0, 0, 20), 1)]
    df1 = spark.createDataFrame(rows1, SEQ_SCHEMA)
    df2 = spark.createDataFrame(rows2, SEQ_SCHEMA)
    write_batches(spark, [df1, df2], d)

    # per-row (stateless) baseline: second row detects nothing
    assert rk.detect_wm_token(ambiguous) is None

    stream = file_stream(spark, d, max_files_per_trigger=1)
    q = (detect_stream_stateful(stream)
         .writeStream.outputMode("append")
         .format("memory").queryName("stateful").start())
    q.processAllAvailable()
    q.stop()
    out = {r.seq_no: r for r in spark.sql("SELECT * FROM stateful").collect()}
    assert out[0].wm_token == 200 and not out[0].from_state
    assert out[1].wm_token == 200 and out[1].from_state
    assert out[1].coverage > 0  # state-supplied token produced a mask
    # and the mask matches the kernel given the carried token
    exp_mask, _ = rk.detect_refine(ambiguous, 200)
    assert out[1].mask == exp_mask.tolist()


def test_exactly_once_crash_between_data_and_commit(spark, tmp_path):
    """X7: a sink crash after data write but before the commit marker is
    replayed idempotently on restart; committed view equals an uninterrupted
    run; lineage metrics (X8) exist per batch."""
    seq_dir = str(tmp_path / "seq")
    df = sequences_df(spark, 30, seed=9)
    halves = [df.where(F.col("seq_no") % 2 == 0),
              df.where(F.col("seq_no") % 2 == 1)]
    write_batches(spark, halves, seq_dir)

    out1 = str(tmp_path / "out_uninterrupted")
    ck1 = str(tmp_path / "ck1")
    q = run_repair_pipeline(file_stream(spark, seq_dir), out1, ck1)
    q.awaitTermination(120)
    sink1 = ExactlyOnceParquetSink(out1)
    uninterrupted = {(r.doc_id, r.seq_no): r.tokens
                     for r in sink1.read_committed(spark).collect()}

    out2 = str(tmp_path / "out_crashy")
    ck2 = str(tmp_path / "ck2")
    sink2 = ExactlyOnceParquetSink(out2)
    crashed = {"done": False}

    def crashy(batch_df, batch_id):
        from pdf_watermark_removal_otsu_inpaint_spark.operators.repair import (
            repair_sequences as rs)
        repaired = rs(batch_df, DEFAULT_PARAMS)
        if batch_id == 0 and not crashed["done"]:
            # simulate: data lands, process dies before the commit marker
            repaired.write.mode("overwrite").parquet(
                f"{out2}/data/batch_id={batch_id}")
            crashed["done"] = True
            raise RuntimeError("injected crash before commit")
        sink2(repaired, batch_id)

    stream = file_stream(spark, seq_dir, max_files_per_trigger=1)
    q2 = (stream.writeStream.foreachBatch(crashy)
          .option("checkpointLocation", ck2)
          .trigger(availableNow=True).start())
    with pytest.raises(Exception):
        q2.awaitTermination(120)
    assert sink2.committed_batches() == []  # crash left nothing visible

    q3 = (file_stream(spark, seq_dir, max_files_per_trigger=1)
          .writeStream.foreachBatch(
              lambda b, i: sink2(repair_sequences(b, DEFAULT_PARAMS), i))
          .option("checkpointLocation", ck2)
          .trigger(availableNow=True).start())
    q3.awaitTermination(120)

    resumed = {(r.doc_id, r.seq_no): r.tokens
               for r in sink2.read_committed(spark).collect()}
    assert resumed == uninterrupted  # no dup, no loss, same content
    # replaying an already-committed batch is a no-op
    before = sorted(os.listdir(f"{out2}/_commits"))
    sink2(repair_sequences(_seq_cols(df).limit(1), DEFAULT_PARAMS), 0)
    assert sorted(os.listdir(f"{out2}/_commits")) == before
    # lineage metrics per batch (X8)
    m = sink2.read_metrics(spark)
    assert set(r.batch_id for r in m.collect()) == set(sink2.committed_batches())
    assert m.agg(F.sum("rows_out")).collect()[0][0] == len(resumed)


def test_salted_stats_match_unsalted(spark):
    """X9: salt/unsalt two-stage aggregation is exact."""
    df = synth_sequences(spark, 2000, n_tok=64)
    salted = {r.source: (r.rows, r.tokens)
              for r in salted_source_stats(df, n_salts=8).collect()}
    plain = {r.source: (r.rows, r.tokens)
             for r in df.groupBy("source")
                        .agg(F.count("*").alias("rows"),
                             F.sum("n_tok").alias("tokens")).collect()}
    assert salted == plain
    # the heavy hitter actually is heavy (skew fixture)
    total = sum(v[0] for v in plain.values())
    assert plain["web"][0] / total >= 0.55


def test_sliding_window_stream_matches_batch(spark, tmp_path):
    """X2: sliding-window histogram (2 min window, 30 s slide)."""
    d = str(tmp_path / "seq")
    df = sequences_df(spark, 30, seed=11)
    write_batches(spark, [df], d)
    q = (windowed_hist_stream(file_stream(spark, d), "2 minutes", "30 seconds")
         .writeStream.outputMode("complete")
         .format("memory").queryName("slide").start())
    q.processAllAvailable()
    q.stop()
    got = {(r.window.start, r.source, r.tok): r.cnt
           for r in spark.sql("SELECT * FROM slide").collect()}
    exp = {(r.window.start, r.source, r.tok): r.cnt
           for r in oh.windowed_histogram(df, "2 minutes", "30 seconds").collect()}
    assert got == exp and len(exp) > 0


def test_otsu_pipeline_streaming_matches_batch(spark, tmp_path):
    """north_star: hist -> Otsu -> flag -> repair per micro-batch, committed
    exactly-once; single-batch stream == batch operator output."""
    from pdf_watermark_removal_otsu_inpaint_spark.operators.otsu import (
        otsu_repair)
    from pdf_watermark_removal_otsu_inpaint_spark.streaming.pipeline import (
        run_otsu_pipeline)
    d = str(tmp_path / "seq")
    df = sequences_df(spark, 30, seed=12)
    write_batches(spark, [df], d)
    q = run_otsu_pipeline(file_stream(spark, d), str(tmp_path / "out"),
                          str(tmp_path / "ck"))
    q.awaitTermination(120)
    sink = ExactlyOnceParquetSink(str(tmp_path / "out"))
    got = {(r.doc_id, r.seq_no): (r.tokens, r.otsu_threshold)
           for r in sink.read_committed(spark).collect()}
    exp = {(r.doc_id, r.seq_no): (r.tokens, r.otsu_threshold)
           for r in otsu_repair(_seq_cols(df), ["source"]).collect()}
    assert got == exp and len(got) == 30


def test_stateful_pipeline_resumes_from_checkpoint(spark, tmp_path):
    """X5+X7+X8 combined: the stateful-detect -> join -> repair pipeline is
    killed after its first micro-batch commit and restarted from the same
    checkpoint; the committed view equals an uninterrupted run (state store
    recovery included)."""
    from pdf_watermark_removal_otsu_inpaint_spark.streaming.pipeline import (
        run_stateful_pipeline)
    seq_dir = str(tmp_path / "seq")
    df = sequences_df(spark, 24, seed=16)
    halves = [df.where(F.col("seq_no") % 2 == 0),
              df.where(F.col("seq_no") % 2 == 1)]
    write_batches(spark, halves, seq_dir)

    ck_key = "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    q = run_stateful_pipeline(lambda s: file_stream(s, seq_dir),
                              str(tmp_path / "out_a"), str(tmp_path / "ck_a"))
    q.awaitTermination(180)
    # the conf disable is scoped to the query's own newSession(): the
    # shared session's stateful-correctness guard is never mutated
    assert spark.conf.get(ck_key, "true") == "true"
    base = {(r.doc_id, r.seq_no): r.tokens
            for r in ExactlyOnceParquetSink(str(tmp_path / "out_a"))
            .read_committed(spark).collect()}

    # crashy run: let batch 0 commit, kill the query before batch 1 commits
    out_b = str(tmp_path / "out_b")
    ck_b = str(tmp_path / "ck_b")
    sink_b = ExactlyOnceParquetSink(out_b)
    from pdf_watermark_removal_otsu_inpaint_spark.operators.repair import (
        make_apply_mask_udf)
    from pdf_watermark_removal_otsu_inpaint_spark.streaming.pipeline import (
        join_masks_with_sequences, repair_joined)
    from pdf_watermark_removal_otsu_inpaint_spark.streaming.state import (
        detect_stream_stateful)

    iso = spark.newSession()
    iso.conf.set(
        "spark.sql.streaming.statefulOperator.checkCorrectness.enabled",
        "false")

    def build_query(crash_on):
        seq = file_stream(iso, seq_dir, max_files_per_trigger=1)
        masks = detect_stream_stateful(seq)
        joined = join_masks_with_sequences(seq, masks,
                                           seq_watermark="10 minutes",
                                           mask_watermark="10 minutes")
        repaired = repair_joined(joined)

        def process(batch_df, batch_id):
            if batch_id in crash_on:
                raise RuntimeError("injected crash")
            sink_b(batch_df, batch_id)

        return (repaired.writeStream.foreachBatch(process)
                .option("checkpointLocation", ck_b)
                .trigger(availableNow=True).start())

    q2 = build_query(crash_on={1})
    with pytest.raises(Exception):
        q2.awaitTermination(180)
    assert 0 in sink_b.committed_batches()

    q3 = build_query(crash_on=set())
    q3.awaitTermination(180)
    resumed = {(r.doc_id, r.seq_no): r.tokens
               for r in sink_b.read_committed(spark).collect()}
    assert resumed == base


def test_observe_metrics_surface_in_progress(spark, tmp_path):
    """A8: df.observe ingest metrics appear in streaming progress."""
    import json as _json
    d = str(tmp_path / "seq")
    df = sequences_df(spark, 20, seed=17)
    write_batches(spark, [df], d)
    q = run_repair_pipeline(file_stream(spark, d), str(tmp_path / "out"),
                            str(tmp_path / "ck"))
    q.awaitTermination(120)
    rows_in = 0
    for p in q.recentProgress:
        pj = p if isinstance(p, dict) else _json.loads(p.json)
        m = pj.get("observedMetrics", {}).get("ingest")
        if m:
            rows_in += int(m["rows_in"])
    assert rows_in == 20


def _tws_available(spark, tmp_path) -> bool:
    """transformWithStateInPandas needs its driver-side python worker, which
    requires google.protobuf at runtime >= Spark's StateMessage_pb2 gencode
    (6.33 for Spark 4.1). session._ensure_protobuf_shim provides it in this
    image; elsewhere a missing/old protobuf crashes the worker with XXKST
    (STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE: ImportError
    google.protobuf.descriptor) before user code runs — probe once and skip,
    like the Iceberg jar gate."""
    import glob
    import pandas as _pd

    from pyspark.sql.streaming.stateful_processor import StatefulProcessor
    from pyspark.sql.types import IntegerType, StructField, StructType

    class P(StatefulProcessor):
        def init(self, handle):
            self.s = handle.getValueState(
                "c", StructType([StructField("c", IntegerType(), True)]))

        def handleInputRows(self, key, rows, timerValues):
            c = self.s.get()[0] if self.s.exists() else 0
            for pdf in rows:
                c += len(pdf)
            self.s.update((c,))
            yield _pd.DataFrame({"k": [key[0]], "c": [c]})

        def close(self):
            pass

    d = str(tmp_path / "tws_probe")
    os.makedirs(d, exist_ok=True)
    df = spark.createDataFrame([("a", 1)], "k string, v int")
    sub = d + "/_s"
    df.coalesce(1).write.mode("overwrite").parquet(sub)
    os.replace(glob.glob(sub + "/part-*.parquet")[0], d + "/b0.parquet")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider")
    try:
        q = (spark.readStream.schema("k string, v int").parquet(d)
             .groupBy("k")
             .transformWithStateInPandas(P(), outputStructType="k string, c int",
                                         outputMode="append", timeMode="none")
             .writeStream.format("memory").queryName("tws_probe")
             .outputMode("append").start())
        q.processAllAvailable()
        q.stop()
        return True
    except Exception:
        # the driver-side python worker init is OCCASIONALLY flaky in this
        # image even when protobuf is fine (observed: same probe passes on
        # retry within the same session) — one retry before skipping, so a
        # transient crash doesn't silently drop the v2 parity coverage
        try:
            q = (spark.readStream.schema("k string, v int").parquet(d)
                 .groupBy("k")
                 .transformWithStateInPandas(
                     P(), outputStructType="k string, c int",
                     outputMode="append", timeMode="none")
                 .writeStream.format("memory").queryName("tws_probe2")
                 .outputMode("append").start())
            q.processAllAvailable()
            q.stop()
            return True
        except Exception:
            return False


def test_stateful_detect_v2_matches_v1(spark, tmp_path):
    """X5 on the Spark 4 state API v2 (transformWithStateInPandas +
    RocksDB state store) == the applyInPandasWithState implementation."""
    import datetime as dt

    from pdf_watermark_removal_otsu_inpaint_spark.streaming.state_v2 import (
        detect_stream_stateful_v2)
    if not _tws_available(spark, tmp_path):
        pytest.skip("transformWithStateInPandas driver worker crashes in "
                    "this image (XXKST on a minimal example)")
    d = str(tmp_path / "seq")
    n = 2000
    detectable = np.full(n, 255, dtype=np.int32)
    detectable[100:460] = 200
    ambiguous = np.full(n, 255, dtype=np.int32)
    ambiguous[100:700] = 200
    rows1 = [("docA", detectable.tolist(), n, "web",
              dt.datetime(2026, 1, 1, 0, 0, 10), 0)]
    rows2 = [("docA", ambiguous.tolist(), n, "web",
              dt.datetime(2026, 1, 1, 0, 0, 20), 1)]
    write_batches(spark, [spark.createDataFrame(rows1, SEQ_SCHEMA),
                          spark.createDataFrame(rows2, SEQ_SCHEMA)], d)
    stream = file_stream(spark, d, max_files_per_trigger=1)
    q = (detect_stream_stateful_v2(stream)
         .writeStream.outputMode("append")
         .format("memory").queryName("stateful_v2").start())
    q.processAllAvailable()
    q.stop()
    out = {r.seq_no: r for r in spark.sql("SELECT * FROM stateful_v2").collect()}
    assert out[0].wm_token == 200 and not out[0].from_state
    assert out[1].wm_token == 200 and out[1].from_state
    exp_mask, _ = rk.detect_refine(ambiguous, 200)
    assert out[1].mask == exp_mask.tolist()


def test_stateful_v2_state_expires_after_watermark(spark, tmp_path):
    """X5 v2 TTL: a doc silent past the 600 s horizon has its cached wm
    token DROPPED (timer-cleared state), so its next row self-detects from
    scratch instead of inheriting — bounded state at 10^12 docs."""
    import datetime as dt

    from pdf_watermark_removal_otsu_inpaint_spark.streaming.state_v2 import (
        detect_stream_stateful_v2)
    if not _tws_available(spark, tmp_path):
        pytest.skip("transformWithStateInPandas driver worker crashes in "
                    "this image (XXKST on a minimal example)")
    d = str(tmp_path / "seq")
    n = 2000
    detectable = np.full(n, 255, dtype=np.int32)
    detectable[100:460] = 200
    ambiguous = np.full(n, 255, dtype=np.int32)  # not self-detectable
    ambiguous[100:700] = 200
    t0 = dt.datetime(2026, 1, 1, 0, 0, 10)
    late = dt.datetime(2026, 1, 1, 2, 0, 0)  # ~2 h later: wm >> t0 + 600 s
    batches = [
        [("docA", detectable.tolist(), n, "web", t0, 0)],
        # another key advances the watermark far past docA's TTL timer
        [("docB", detectable.tolist(), n, "web", late, 0)],
        # one more batch so docA's expired timer fires before it returns
        [("docC", detectable.tolist(), n, "web",
          late + dt.timedelta(seconds=10), 0)],
        [("docA", ambiguous.tolist(), n, "web",
          late + dt.timedelta(seconds=20), 1)],
    ]
    write_batches(spark, [spark.createDataFrame(b, SEQ_SCHEMA)
                          for b in batches], d)
    stream = file_stream(spark, d, max_files_per_trigger=1)
    q = (detect_stream_stateful_v2(stream)
         .writeStream.outputMode("append")
         .format("memory").queryName("stateful_v2_ttl").start())
    q.processAllAvailable()
    q.stop()
    out = {(r.doc_id, r.seq_no): r
           for r in spark.sql("SELECT * FROM stateful_v2_ttl").collect()}
    assert out[("docA", 0)].wm_token == 200
    # after expiry: fresh self-detection, NOT inherited state; the ambiguous
    # pattern is not self-detectable, so wm_token must be null
    row = out[("docA", 1)]
    assert not row.from_state and row.wm_token is None


def test_default_chain_resumes_across_restart_rocksdb(spark, tmp_path):
    """Round-5 default chain (v2 coarse detect + X6 join, RocksDB store
    with CHANGELOG CHECKPOINTING): the query runs to completion on the
    first file drop, stops, a second drop arrives, and a new query on the
    SAME checkpoint processes exactly the new rows — with the detect
    state RECOVERED from the RocksDB changelog across the restart.

    The fixture discriminates recovery from re-detection: the run-2 row is
    an AMBIGUOUS pattern (not self-detectable — coverage too high), so its
    repair is correct ONLY if the wm token cached from run 1 survived the
    restart; lost state would leave the row unrepaired."""
    import datetime as dt

    from pdf_watermark_removal_otsu_inpaint_spark.streaming.pipeline import (
        run_stateful_pipeline)
    n = 2000
    detectable = np.full(n, 255, dtype=np.int32)
    detectable[100:460] = 200
    ambiguous = np.full(n, 255, dtype=np.int32)
    ambiguous[100:700] = 200
    t0 = dt.datetime(2026, 1, 1, 0, 0, 10)
    d = str(tmp_path / "seq")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    rows1 = [("docA", detectable.tolist(), n, "web", t0, 0)]
    rows2 = [("docA", ambiguous.tolist(), n, "web",
              t0 + dt.timedelta(seconds=10), 1)]
    write_batches(spark, [spark.createDataFrame(rows1, SEQ_SCHEMA)], d)
    q1 = run_stateful_pipeline(
        lambda s: file_stream(s, d, max_files_per_trigger=1), out, ck)
    q1.awaitTermination(180)
    # every stateful operator in the chain (v2 detect AND the X6 join)
    # reports RocksDB custom metrics in its progress — the provider is
    # engaged per-operator, not just configured on the session
    ops = [op for p in q1.recentProgress
           for op in p.get("stateOperators", [])]
    assert ops, "no stateOperators in progress"
    assert all(any(k.startswith("rocksdb") for k in op["customMetrics"])
               for op in ops), [sorted(op["customMetrics"])[:3]
                                for op in ops]
    sink = ExactlyOnceParquetSink(out)
    got1 = {(r.doc_id, r.seq_no): r.tokens
            for r in sink.read_committed(spark).collect()}
    assert set(got1) == {("docA", 0)}

    write_batches(spark, [spark.createDataFrame(rows2, SEQ_SCHEMA)], d,
                  start=1)
    q2 = run_stateful_pipeline(
        lambda s: file_stream(s, d, max_files_per_trigger=1), out, ck)
    q2.awaitTermination(180)
    got2 = {(r.doc_id, r.seq_no): r.tokens
            for r in sink.read_committed(spark).collect()}
    assert set(got2) == {("docA", 0), ("docA", 1)}

    # run-2 row repaired with the RECOVERED wm token: equals the reference
    # repair under wm=200, and differs from the unrepaired input (which is
    # what a state-less re-detection would have produced)
    exp, _, _ = rk.remove_watermark(ambiguous, 200)
    assert got2[("docA", 1)] == exp.tolist()
    assert got2[("docA", 1)] != ambiguous.tolist()

    # changelog checkpointing is genuinely ACTIVE, not silently ignored:
    # the state checkpoint carries .changelog files (per-batch deltas)
    changelogs = glob.glob(f"{ck}/state/**/*.changelog", recursive=True)
    assert changelogs, "no RocksDB changelog files in the checkpoint"


def test_state_partition_count_pinned_across_resume(spark, tmp_path):
    """The sizing docstring's checkpoint-compatibility claim, pinned: a
    chain started with session_conf shuffle.partitions=4 and RESUMED under
    a conflicting session_conf (16) keeps the checkpointed 4 state
    partitions (Spark reads the count from the offset log, the conf is
    ignored on resume), recovers detect state, and commits exactly the new
    rows — resizing state partitions requires a fresh checkpoint, not a
    conf change."""
    import datetime as dt

    from pdf_watermark_removal_otsu_inpaint_spark.streaming.pipeline import (
        run_stateful_pipeline)
    n = 2000
    detectable = np.full(n, 255, dtype=np.int32)
    detectable[100:460] = 200
    ambiguous = np.full(n, 255, dtype=np.int32)
    ambiguous[100:700] = 200
    t0 = dt.datetime(2026, 1, 1, 0, 0, 10)
    d, out, ck = (str(tmp_path / p) for p in ("seq", "out", "ck"))
    write_batches(spark, [spark.createDataFrame(
        [("docA", detectable.tolist(), n, "web", t0, 0)], SEQ_SCHEMA)], d)
    q1 = run_stateful_pipeline(
        lambda s: file_stream(s, d, max_files_per_trigger=1), out, ck,
        session_conf={"spark.sql.shuffle.partitions": "4"})
    assert q1.awaitTermination(180), "q1 timed out"

    write_batches(spark, [spark.createDataFrame(
        [("docA", ambiguous.tolist(), n, "web",
          t0 + dt.timedelta(seconds=10), 1)], SEQ_SCHEMA)], d, start=1)
    q2 = run_stateful_pipeline(
        lambda s: file_stream(s, d, max_files_per_trigger=1), out, ck,
        session_conf={"spark.sql.shuffle.partitions": "16"})
    assert q2.awaitTermination(180), "q2 timed out"
    resumed_parts = {op.get("numShufflePartitions")
                     for p in q2.recentProgress
                     for op in p.get("stateOperators", [])}
    assert resumed_parts == {4}, resumed_parts
    got = {(r.doc_id, r.seq_no): r.tokens
           for r in ExactlyOnceParquetSink(out).read_committed(
               spark).collect()}
    assert set(got) == {("docA", 0), ("docA", 1)}
    # the run-2 ambiguous row is repaired ONLY with the wm token recovered
    # from run-1 state: the resume carried state, not just the row count
    exp, _, _ = rk.remove_watermark(ambiguous, 200)
    assert got[("docA", 1)] == exp.tolist()


def test_rate_stream_produces_sequences(spark):
    """stream_smoke (FIXTURES §4): the rate-source synthetic feed yields
    schema-correct sequence rows that flow through the windowed histogram."""
    from pdf_watermark_removal_otsu_inpaint_spark.streaming.pipeline import (
        rate_stream, windowed_hist_stream)
    seq = rate_stream(spark, rows_per_sec=200, n_tok=256)
    q = (windowed_hist_stream(seq, "10 seconds", watermark="1 minute")
         .writeStream.outputMode("complete")
         .format("memory").queryName("rate_smoke").start())
    deadline = time.time() + 45
    rows = 0
    while time.time() < deadline and rows == 0:
        time.sleep(2)
        rows = spark.sql("SELECT count(*) FROM rate_smoke").collect()[0][0]
    q.stop()
    assert rows > 0


def test_make_sink_contract(spark, tmp_path):
    """Sink factory: parquet fallback in this image (no Iceberg jars), and
    the MERGE path's SQL carries the exactly-once contract — keyed ON
    (doc_id, seq_no), UPDATE on match, INSERT otherwise."""
    from pdf_watermark_removal_otsu_inpaint_spark.sources.tables import (
        iceberg_available)
    from pdf_watermark_removal_otsu_inpaint_spark.streaming.sink import (
        ExactlyOnceParquetSink, IcebergMergeSink, make_sink)
    # this image has no Iceberg runtime: path destinations AND catalog names
    # both degrade to the commit-marker parquet sink
    assert not iceberg_available(spark)
    assert isinstance(make_sink(str(tmp_path / "out"), spark),
                      ExactlyOnceParquetSink)
    import shutil as _sh
    try:
        assert isinstance(make_sink("cat.db.repaired", spark),
                          ExactlyOnceParquetSink)
    finally:
        # the parquet fallback treats the catalog name as a relative path
        # and creates its _commits dir — don't leave it in the repo cwd
        _sh.rmtree("cat.db.repaired", ignore_errors=True)
    # the MERGE statement itself (exercised the day a catalog exists)
    m = IcebergMergeSink("cat.db.repaired")
    sql = m.merge_sql()
    assert "MERGE INTO cat.db.repaired t" in sql
    assert "t.doc_id = u.doc_id AND t.seq_no = u.seq_no" in sql
    assert "WHEN MATCHED THEN UPDATE SET *" in sql
    assert "WHEN NOT MATCHED THEN INSERT *" in sql
    assert m.ledger == "cat.db.repaired_commits"
    # replay guard: unknown ledger -> not committed (first run proceeds)
    assert m.is_committed(spark, 0) is False


def test_dedup_stream_drops_replayed_rows(spark, tmp_path):
    """dropDuplicatesWithinWatermark: a replayed (doc_id, seq_no) row within
    the watermark horizon is emitted once; state stays watermark-bounded."""
    import datetime as dt

    from pdf_watermark_removal_otsu_inpaint_spark.streaming.pipeline import (
        dedup_stream)
    d = str(tmp_path / "seq")
    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    tok = [255] * 16
    rows1 = [("docA", tok, 16, "web", base, 0),
             ("docA", tok, 16, "web", base, 1)]
    # batch 2 replays seq_no=1 and adds seq_no=2
    rows2 = [("docA", tok, 16, "web", base + dt.timedelta(seconds=5), 1),
             ("docA", tok, 16, "web", base + dt.timedelta(seconds=10), 2)]
    write_batches(spark, [spark.createDataFrame(rows1, SEQ_SCHEMA),
                          spark.createDataFrame(rows2, SEQ_SCHEMA)], d)
    q = (dedup_stream(file_stream(spark, d, max_files_per_trigger=1))
         .select("doc_id", "seq_no")
         .writeStream.outputMode("append")
         .format("memory").queryName("dedup_stream").start())
    q.processAllAvailable()
    q.stop()
    got = sorted((r.doc_id, r.seq_no) for r in
                 spark.sql("SELECT * FROM dedup_stream").collect())
    assert got == [("docA", 0), ("docA", 1), ("docA", 2)]


def test_window_detect_pipeline_matches_batch(spark, tmp_path):
    """north_star A-chain: per-(window, source) dominant-token detection
    drives repair with the token GIVEN; streaming result == the same
    composition run as one batch, and == the kernel with the window token."""
    d = str(tmp_path / "seq")
    df = sequences_df(spark, 40, seed=23)
    write_batches(spark, [df], d)
    from pdf_watermark_removal_otsu_inpaint_spark.operators.histogram import (
        dominant_token)
    from pdf_watermark_removal_otsu_inpaint_spark.streaming.pipeline import (
        run_window_detect_pipeline)
    q = run_window_detect_pipeline(file_stream(spark, d),
                                   str(tmp_path / "out"), str(tmp_path / "ck"),
                                   duration="1 minute")
    q.awaitTermination(180)
    sink = ExactlyOnceParquetSink(str(tmp_path / "out"))
    got = {(r.doc_id, r.seq_no): (r.tokens, r.wm_token)
           for r in sink.read_committed(spark).collect()}
    # batch equivalent of the same composition
    win = _seq_cols(df).withColumn("win", F.window("event_ts", "1 minute").start)
    dom = dominant_token(win, ["win", "source"]) \
        .select("win", "source", F.col("wm_token").alias("_win_wm"))
    joined = win.join(F.broadcast(dom), ["win", "source"], "left")
    exp = {(r.doc_id, r.seq_no): (r.tokens, r.wm_token)
           for r in repair_sequences(joined, DEFAULT_PARAMS,
                                     wm_token=F.col("_win_wm")).collect()}
    assert len(got) == df.count()
    assert got == exp
    # spot-check the kernel with the window-level token on one repaired row
    wm_rows = [k for k, v in got.items() if v[1] is not None]
    assert wm_rows, "no window produced a dominant token"
    doc_id, seq_no = wm_rows[0]
    src = {(r["doc_id"], r["seq_no"]): r["tokens"]
           for r in df.select("doc_id", "seq_no", "tokens").collect()}
    toks = np.array(src[(doc_id, seq_no)])
    wm = got[(doc_id, seq_no)][1]
    exp_t, _, _ = rk.remove_watermark(toks, wm)
    assert got[(doc_id, seq_no)][0] == exp_t.astype(np.int32).tolist()


def _wm_fill(n, token, lo, hi):
    a = np.full(n, 255, dtype=np.int32)
    a[lo:hi] = token
    return a


def test_stateful_coarse_matches_v1(spark, tmp_path):
    """X5c: the source-keyed coarse-state detect stream produces the SAME
    output as the (source, doc_id)-keyed v1 — multi-source, multi-doc,
    within-batch prefix rule, and cross-batch carry-over all exercised."""
    import datetime as dt

    from pdf_watermark_removal_otsu_inpaint_spark.streaming.state_coarse import (
        detect_stream_stateful_coarse)
    n = 2000
    det_a = _wm_fill(n, 200, 100, 460)     # 18% -> self-detects 200
    det_b = _wm_fill(n, 205, 100, 440)     # self-detects 205
    amb_a = _wm_fill(n, 200, 100, 700)     # 30% -> per-row detect fails
    amb_b = _wm_fill(n, 205, 100, 700)
    t0 = dt.datetime(2026, 1, 1, 0, 0, 10)

    def r(doc, toks, src, secs, seq):
        return (doc, toks.tolist(), n, src,
                t0 + dt.timedelta(seconds=secs), seq)

    batches = [
        # batch 0: two sources, docA on both (coarse dicts must not collide)
        [r("docA", det_a, "web", 0, 0), r("docB", det_b, "web", 1, 0),
         r("docA", det_b, "pdf", 2, 0)],
        # batch 1: carried tokens + a doc whose detection happens mid-batch
        [r("docA", amb_a, "web", 10, 1), r("docB", amb_b, "web", 11, 1),
         r("docA", amb_b, "pdf", 12, 1),
         r("docC", det_a, "web", 13, 0), r("docC", amb_a, "web", 14, 1),
         r("docC", amb_a, "web", 15, 2)],
    ]
    dirs = []
    for tag in ("v1", "xc"):
        d = str(tmp_path / f"seq_{tag}")
        write_batches(spark, [spark.createDataFrame(b, SEQ_SCHEMA)
                              for b in batches], d)
        dirs.append(d)

    outs = []
    for tag, d, fn in (("v1", dirs[0], detect_stream_stateful),
                       ("xc", dirs[1], detect_stream_stateful_coarse)):
        q = (fn(file_stream(spark, d, max_files_per_trigger=1))
             .writeStream.outputMode("append")
             .format("memory").queryName(f"st_{tag}").start())
        q.processAllAvailable()
        q.stop()
        outs.append({(r.source, r.doc_id, r.seq_no):
                     (r.wm_token, r.from_state, round(r.coverage, 9), r.mask)
                     for r in spark.sql(f"SELECT * FROM st_{tag}").collect()})
    v1, xc = outs
    assert len(v1) == sum(len(b) for b in batches)
    assert v1 == xc
    # sanity on the semantics themselves, not just mutual agreement
    assert v1[("web", "docA", 1)][0] == 200 and v1[("web", "docA", 1)][1]
    assert v1[("pdf", "docA", 1)][0] == 205 and v1[("pdf", "docA", 1)][1]
    assert v1[("web", "docC", 0)][0] == 200 and not v1[("web", "docC", 0)][1]
    assert v1[("web", "docC", 2)][0] == 200 and v1[("web", "docC", 2)][1]


def test_stateful_pipeline_dial_guards(spark, tmp_path):
    """The state_api/state_store dials reject unsupported combinations
    loudly (v2 requires RocksDB; typos must not silently pick a default),
    and legacy+default — the pre-round-5 behavior — still runs and matches
    the v2+RocksDB default's committed rows."""
    import pytest as _pt

    from pdf_watermark_removal_otsu_inpaint_spark.streaming.pipeline import (
        run_stateful_pipeline)
    factory = lambda s: file_stream(s, str(tmp_path / "nowhere"))  # noqa: E731
    with _pt.raises(ValueError, match="requires the RocksDB"):
        run_stateful_pipeline(factory, "o", "c", state_api="v2",
                              state_store="default")
    with _pt.raises(ValueError, match="state_api"):
        run_stateful_pipeline(factory, "o", "c", state_api="v3")
    with _pt.raises(ValueError, match="state_store"):
        run_stateful_pipeline(factory, "o", "c", state_store="hdfs")
    # a detect_fn override IGNORES state_api (docstring contract), so the
    # v2+default guard must NOT fire for the blessed pre-round-5
    # combination (detect_fn=<legacy op>, state_store='default') — the
    # nowhere-path factory fails later, with a non-dial error
    with _pt.raises(Exception) as ei:
        run_stateful_pipeline(factory, "o", "c",
                              detect_fn=lambda s, p: s,
                              state_store="default")
    assert "RocksDB" not in str(ei.value)

    seq_dir = str(tmp_path / "seq")
    df = sequences_df(spark, 24, seed=16)
    write_batches(spark, [df], seq_dir)
    outs = {}
    for tag, kw in (("v2rocks", {}),   # the default
                    ("legacy", dict(state_api="legacy",
                                    state_store="default"))):
        q = run_stateful_pipeline(
            lambda s: file_stream(s, seq_dir),
            str(tmp_path / f"out_{tag}"), str(tmp_path / f"ck_{tag}"), **kw)
        q.awaitTermination(180)
        outs[tag] = {(r.doc_id, r.seq_no): (r.tokens, r.wm_token)
                     for r in ExactlyOnceParquetSink(
                         str(tmp_path / f"out_{tag}"))
                     .read_committed(spark).collect()}
    assert outs["v2rocks"] == outs["legacy"] and len(outs["v2rocks"]) == 24


def test_session_conf_sizes_state_partitions(spark, tmp_path):
    """`session_conf` lands on the chain's isolated session: sizing
    spark.sql.shuffle.partitions there sets the STATE partition count
    (every state partition pays a fixed RocksDB open/commit per
    micro-batch, so the count must track per-batch volume — the
    operational knob the pipeline docstring documents), the committed
    rows are invariant under it, and the caller's session is untouched."""
    import json as _json

    from pdf_watermark_removal_otsu_inpaint_spark.streaming.pipeline import (
        run_stateful_pipeline)
    seq_dir = str(tmp_path / "seq")
    write_batches(spark, [sequences_df(spark, 24, seed=16)], seq_dir)
    caller_parts = spark.conf.get("spark.sql.shuffle.partitions")
    outs, progress = {}, {}
    for tag, conf in (("default", None),
                      ("sized", {"spark.sql.shuffle.partitions": "4"})):
        q = run_stateful_pipeline(
            lambda s: file_stream(s, seq_dir),
            str(tmp_path / f"out_{tag}"), str(tmp_path / f"ck_{tag}"),
            session_conf=conf)
        q.awaitTermination(180)
        progress[tag] = [_json.loads(p.json) for p in q.recentProgress]
        outs[tag] = {(r.doc_id, r.seq_no): (r.tokens, r.wm_token)
                     for r in ExactlyOnceParquetSink(
                         str(tmp_path / f"out_{tag}"))
                     .read_committed(spark).collect()}
    assert outs["default"] == outs["sized"] and len(outs["sized"]) == 24
    assert spark.conf.get("spark.sql.shuffle.partitions") == caller_parts
    sized_parts = {so.get("numShufflePartitions")
                   for p in progress["sized"]
                   for so in (p.get("stateOperators") or [])}
    assert sized_parts == {4}, sized_parts


def test_session_conf_rejects_state_store_keys(spark, tmp_path):
    """The state-store backend is chosen by the `state_store` dial only:
    session_conf is applied after ROCKSDB_CONF, so a provider or changelog
    key passed through it would silently override the dial. The contract
    is machine-enforced — such keys raise instead of being applied."""
    import pytest

    from pdf_watermark_removal_otsu_inpaint_spark.streaming.pipeline import (
        run_stateful_pipeline)
    from pdf_watermark_removal_otsu_inpaint_spark.streaming.state_v2 import (
        ROCKSDB_CONF)
    seq_dir = str(tmp_path / "seq")
    write_batches(spark, [sequences_df(spark, 4, seed=16)], seq_dir)
    for key in ROCKSDB_CONF:
        with pytest.raises(ValueError, match="state_store dial"):
            run_stateful_pipeline(
                lambda s: file_stream(s, seq_dir),
                str(tmp_path / "out"), str(tmp_path / "ck"),
                session_conf={key: "whatever"})


def test_join_free_chain_matches_joined_chain(spark, tmp_path):
    """join_free=True (state op passes tokens through, repair runs on its
    output, no X6 join) commits EXACTLY the rows of the joined default —
    across micro-batches with carry-over."""
    from pdf_watermark_removal_otsu_inpaint_spark.streaming.pipeline import (
        run_stateful_pipeline)
    outs = {}
    for tag, jf in (("joined", False), ("jfree", True)):
        seq_dir = str(tmp_path / f"seq_{tag}")
        df = sequences_df(spark, 24, seed=16)
        halves = [df.where(F.col("seq_no") % 2 == 0),
                  df.where(F.col("seq_no") % 2 == 1)]
        write_batches(spark, halves, seq_dir)
        q = run_stateful_pipeline(
            lambda s: file_stream(s, seq_dir),
            str(tmp_path / f"out_{tag}"), str(tmp_path / f"ck_{tag}"),
            join_free=jf)
        q.awaitTermination(180)
        outs[tag] = {(r.doc_id, r.seq_no): (r.tokens, r.wm_token)
                     for r in ExactlyOnceParquetSink(
                         str(tmp_path / f"out_{tag}"))
                     .read_committed(spark).collect()}
    assert outs["joined"] == outs["jfree"] and len(outs["jfree"]) == 24


def test_join_free_chain_has_single_stateful_operator(spark, tmp_path):
    """Plan shape of the join-free chain: exactly ONE stateful operator
    (the shard-keyed detect) and NO stream-stream join — the whole point
    is that neither stream buffers in join state."""
    from pdf_watermark_removal_otsu_inpaint_spark.streaming.pipeline import (
        repair_joined)
    from pdf_watermark_removal_otsu_inpaint_spark.streaming.state_coarse import (
        detect_stream_stateful_coarse)
    d = str(tmp_path / "seq")
    write_batches(spark, [sequences_df(spark, 4, seed=5)], d)
    iso = spark.newSession()
    iso.conf.set(
        "spark.sql.streaming.statefulOperator.checkCorrectness.enabled",
        "false")
    stream = file_stream(iso, d)
    enriched = detect_stream_stateful_coarse(stream, packed=True,
                                             with_tokens=True)
    out = repair_joined(enriched)
    q = (out.writeStream.format("noop")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.processAllAvailable()
    import json as _json
    prog = _json.loads(q.lastProgress.json) if q.lastProgress else {}
    q.stop()
    n_state = (prog.get("stateOperators") or [])
    assert len(n_state) == 1, f"expected 1 stateful operator, got {n_state}"
    assert "symmetricHashJoin" not in _json.dumps(prog)


def test_stateful_detect_packed_masks_match_unpacked(spark, tmp_path):
    """X5/X5c packed output (mask_bin, the X6 wire format): unpacking the
    bit-packed masks bit-for-bit reproduces the array<boolean> output, for
    BOTH keyings, across carry-over batches."""
    import datetime as dt

    from pdf_watermark_removal_otsu_inpaint_spark.streaming.state_coarse import (
        detect_stream_stateful_coarse)
    n = 2000
    det = _wm_fill(n, 200, 100, 460)
    amb = _wm_fill(n, 200, 100, 700)
    t0 = dt.datetime(2026, 1, 1, 0, 0, 10)
    batches = [
        [("docA", det.tolist(), n, "web", t0, 0),
         ("docB", amb.tolist(), n, "web", t0, 0)],
        [("docA", amb.tolist(), n, "web",
          t0 + dt.timedelta(seconds=10), 1)],
    ]
    outs = {}
    for tag, fn in (
            ("v1u", lambda s: detect_stream_stateful(s)),
            ("v1p", lambda s: detect_stream_stateful(s, packed=True)),
            ("xcu", lambda s: detect_stream_stateful_coarse(s)),
            ("xcp", lambda s: detect_stream_stateful_coarse(s, packed=True))):
        d = str(tmp_path / f"seq_{tag}")
        write_batches(spark, [spark.createDataFrame(b, SEQ_SCHEMA)
                              for b in batches], d)
        q = (fn(file_stream(spark, d, max_files_per_trigger=1))
             .writeStream.outputMode("append")
             .format("memory").queryName(f"pk_{tag}").start())
        q.processAllAvailable()
        q.stop()
        rows = spark.sql(f"SELECT * FROM pk_{tag}").collect()
        got = {}
        for r in rows:
            if hasattr(r, "mask_bin"):
                m = np.unpackbits(np.frombuffer(bytes(r.mask_bin),
                                                dtype=np.uint8),
                                  count=n).astype(bool).tolist()
            else:
                m = list(r.mask)
            got[(r.doc_id, r.seq_no)] = (m, r.wm_token, r.from_state)
        outs[tag] = got
    assert outs["v1u"] == outs["v1p"] == outs["xcu"] == outs["xcp"]
    assert len(outs["v1u"]) == 3
    assert any(any(m) for m, _, _ in outs["v1u"].values())  # non-trivial


def test_stateful_coarse_v2_matches_coarse_v1(spark, tmp_path):
    """X5c on the v2 state API (CoarseDetectProcessor: shard-dict in a
    binary ValueState + per-shard timer) == the legacy
    applyInPandasWithState coarse op, on the same multi-source multi-doc
    carry-over scenario as the v1-vs-coarse parity test."""
    import datetime as dt

    from pdf_watermark_removal_otsu_inpaint_spark.streaming.state_coarse import (
        detect_stream_stateful_coarse)
    from pdf_watermark_removal_otsu_inpaint_spark.streaming.state_v2 import (
        detect_stream_stateful_coarse_v2)
    if not _tws_available(spark, tmp_path):
        pytest.skip("transformWithStateInPandas driver worker crashes in "
                    "this image (XXKST on a minimal example)")
    n = 2000
    det_a = _wm_fill(n, 200, 100, 460)
    det_b = _wm_fill(n, 205, 100, 440)
    amb_a = _wm_fill(n, 200, 100, 700)
    amb_b = _wm_fill(n, 205, 100, 700)
    t0 = dt.datetime(2026, 1, 1, 0, 0, 10)

    def r(doc, toks, src, secs, seq):
        return (doc, toks.tolist(), n, src,
                t0 + dt.timedelta(seconds=secs), seq)

    batches = [
        [r("docA", det_a, "web", 0, 0), r("docB", det_b, "web", 1, 0),
         r("docA", det_b, "pdf", 2, 0)],
        [r("docA", amb_a, "web", 10, 1), r("docB", amb_b, "web", 11, 1),
         r("docA", amb_b, "pdf", 12, 1),
         r("docC", det_a, "web", 13, 0), r("docC", amb_a, "web", 14, 1),
         r("docC", amb_a, "web", 15, 2)],
    ]
    outs = []
    for tag, fn in (
            ("xc1", detect_stream_stateful_coarse),
            ("xc2", detect_stream_stateful_coarse_v2),
            # packed wire format on the v2 API too (shared assembler)
            ("xc2p", lambda s: detect_stream_stateful_coarse_v2(
                s, packed=True))):
        d = str(tmp_path / f"seq_{tag}")
        write_batches(spark, [spark.createDataFrame(b, SEQ_SCHEMA)
                              for b in batches], d)
        q = (fn(file_stream(spark, d, max_files_per_trigger=1))
             .writeStream.outputMode("append")
             .format("memory").queryName(f"st_{tag}").start())
        q.processAllAvailable()
        q.stop()
        got = {}
        for r in spark.sql(f"SELECT * FROM st_{tag}").collect():
            if hasattr(r, "mask_bin"):
                m = np.unpackbits(np.frombuffer(bytes(r.mask_bin),
                                                dtype=np.uint8),
                                  count=n).astype(bool).tolist()
            else:
                m = list(r.mask)
            got[(r.source, r.doc_id, r.seq_no)] = (
                r.wm_token, r.from_state, round(r.coverage, 9), m)
        outs.append(got)
    xc1, xc2, xc2p = outs
    assert len(xc1) == sum(len(b) for b in batches)
    assert xc1 == xc2 == xc2p
    assert xc2[("web", "docA", 1)][0] == 200 and xc2[("web", "docA", 1)][1]


def test_stateful_coarse_state_expires_after_watermark(spark, tmp_path):
    """X5c TTL: a doc silent past the 600 s horizon is pruned from the
    source dict, so its next row self-detects from scratch (bounded state
    per source at 10^12 docs)."""
    import datetime as dt

    from pdf_watermark_removal_otsu_inpaint_spark.streaming.state_coarse import (
        detect_stream_stateful_coarse)
    n = 2000
    detectable = _wm_fill(n, 200, 100, 460)
    ambiguous = _wm_fill(n, 200, 100, 700)  # not self-detectable
    t0 = dt.datetime(2026, 1, 1, 0, 0, 10)
    late = dt.datetime(2026, 1, 1, 2, 0, 0)  # wm >> t0 + 600 s
    batches = [
        [("docA", detectable.tolist(), n, "web", t0, 0)],
        # advance the watermark far past docA's horizon
        [("docB", detectable.tolist(), n, "web", late, 0)],
        # spacer so docA's expiry materializes while docA is absent (the
        # same timing v1's timer needs: a key with data never times out)
        [("docC", detectable.tolist(), n, "web",
          late + dt.timedelta(seconds=10), 0)],
        [("docA", ambiguous.tolist(), n, "web",
          late + dt.timedelta(seconds=20), 1)],
    ]
    d = str(tmp_path / "seq")
    write_batches(spark, [spark.createDataFrame(b, SEQ_SCHEMA)
                          for b in batches], d)
    q = (detect_stream_stateful_coarse(
            file_stream(spark, d, max_files_per_trigger=1))
         .writeStream.outputMode("append")
         .format("memory").queryName("st_ttl_xc").start())
    q.processAllAvailable()
    q.stop()
    out = {(r.doc_id, r.seq_no): r
           for r in spark.sql("SELECT * FROM st_ttl_xc").collect()}
    assert out[("docA", 0)].wm_token == 200
    # expired: re-detects from scratch -> ambiguous row finds nothing
    assert out[("docA", 1)].wm_token is None
    assert not out[("docA", 1)].from_state


def test_stateful_v1_state_expires_after_watermark(spark, tmp_path):
    """X5 v1 TTL: the event-time timeout must actually DROP the state — a
    timed-out invocation that re-updates would re-arm the timer forever.
    A doc silent past the 600 s horizon re-detects from scratch."""
    import datetime as dt
    n = 2000
    detectable = _wm_fill(n, 200, 100, 460)
    ambiguous = _wm_fill(n, 200, 100, 700)  # not self-detectable
    t0 = dt.datetime(2026, 1, 1, 0, 0, 10)
    late = dt.datetime(2026, 1, 1, 2, 0, 0)
    batches = [
        [("docA", detectable.tolist(), n, "web", t0, 0)],
        # advance the watermark far past docA's horizon
        [("docB", detectable.tolist(), n, "web", late, 0)],
        # one more batch so docA's expired timer fires
        [("docC", detectable.tolist(), n, "web",
          late + dt.timedelta(seconds=10), 0)],
        [("docA", ambiguous.tolist(), n, "web",
          late + dt.timedelta(seconds=20), 1)],
    ]
    d = str(tmp_path / "seq")
    write_batches(spark, [spark.createDataFrame(b, SEQ_SCHEMA)
                          for b in batches], d)
    q = (detect_stream_stateful(file_stream(spark, d, max_files_per_trigger=1))
         .writeStream.outputMode("append")
         .format("memory").queryName("st_ttl_v1").start())
    q.processAllAvailable()
    q.stop()
    out = {(r.doc_id, r.seq_no): r
           for r in spark.sql("SELECT * FROM st_ttl_v1").collect()}
    assert out[("docA", 0)].wm_token == 200
    assert out[("docA", 1)].wm_token is None
    assert not out[("docA", 1)].from_state
