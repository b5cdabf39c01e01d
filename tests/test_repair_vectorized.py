"""Batch-vectorized kernel == per-row reference kernel, token-array equality
on every fixture scenario plus randomized arrays, and the mapInArrow
operators == the pandas-UDF operators on Spark."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_watermark_removal_otsu_inpaint_spark import reference_kernels as rk
from pdf_watermark_removal_otsu_inpaint_spark.operators.repair_vectorized import (
    repair_batch)
from pdf_watermark_removal_otsu_inpaint_spark.params import DEFAULT_PARAMS
from pdf_watermark_removal_otsu_inpaint_spark.sources.sequences import (
    SCENARIOS, generate_rows, scenario_tokens)


def _flat(rows):
    arrs = [np.asarray(r, dtype=np.int32) for r in rows]
    offsets = np.zeros(len(arrs) + 1, dtype=np.int64)
    offsets[1:] = np.cumsum([a.size for a in arrs])
    return np.concatenate(arrs) if arrs else np.empty(0, np.int32), offsets


def _expected(rows, params):
    outs, covs, wms, nps = [], [], [], []
    for r in rows:
        out, n, cov, wm = rk.remove_watermark_multi_pass(
            np.asarray(r, dtype=np.int32), params.passes,
            None, params.color_tolerance, params.kernel_size,
            params.protect_text, params.text_expand, params.min_run,
            params.max_run, params.inpaint_radius, params.inpaint_strength)
        outs.append(out.astype(np.int32))
        covs.append(cov)
        wms.append(-1 if wm is None else wm)
        nps.append(n)
    return outs, covs, wms, nps


def _check(rows, params):
    flat, offsets = _flat(rows)
    out, cov, wm, npass = repair_batch(flat, offsets, params)
    exp_out, exp_cov, exp_wm, exp_np = _expected(rows, params)
    for i in range(len(rows)):
        got = out[offsets[i]:offsets[i + 1]]
        assert got.tolist() == exp_out[i].tolist(), f"row {i} tokens differ"
        assert wm[i] == exp_wm[i], f"row {i} wm"
        assert npass[i] == exp_np[i], f"row {i} pass_count"
        assert abs(cov[i] - exp_cov[i]) < 1e-12, f"row {i} coverage"


@pytest.mark.parametrize("passes", [1, 2, 3])
def test_all_scenarios_batch_equal(passes):
    rows = [scenario_tokens(s, 2000) for s in SCENARIOS if s != "wm_runs"]
    rows.append(scenario_tokens("wm_runs", 12000))
    _check(rows, DEFAULT_PARAMS.with_(passes=passes))


def test_generated_mix_batch_equal():
    rows = [r["tokens"] for r in generate_rows(80, seed=13)]
    _check(rows, DEFAULT_PARAMS.with_(passes=2))


def test_non_default_params_batch_equal():
    rows = [r["tokens"] for r in generate_rows(40, seed=14)]
    _check(rows, DEFAULT_PARAMS.with_(passes=2, color_tolerance=18,
                                      kernel_size=5, inpaint_strength=1.3,
                                      min_run=50, max_run=800))
    _check(rows, DEFAULT_PARAMS.with_(passes=1, inpaint_strength=0.5))
    _check(rows, DEFAULT_PARAMS.with_(passes=2, protect_text=False,
                                      inpaint_strength=1.5))


@settings(max_examples=60, deadline=None)
@given(st.lists(st.lists(st.integers(min_value=0, max_value=255),
                         min_size=1, max_size=80),
                min_size=1, max_size=8),
       st.integers(min_value=1, max_value=3))
def test_random_rows_batch_equal(rows, passes):
    _check(rows, DEFAULT_PARAMS.with_(passes=passes, min_run=3, max_run=40))


def test_spark_arrow_operator_matches_pandas_udf(spark):
    from pyspark.sql import functions as F

    from pdf_watermark_removal_otsu_inpaint_spark.operators.repair import (
        make_pack_udf, repair_sequences)
    from pdf_watermark_removal_otsu_inpaint_spark.operators.repair_vectorized import (
        repair_sequences_arrow, repair_sequences_arrow_packed)
    from pdf_watermark_removal_otsu_inpaint_spark.sources.sequences import (
        sequences_df)
    df = sequences_df(spark, 50, seed=15)
    params = DEFAULT_PARAMS.with_(passes=2)
    exp = {(r.doc_id, r.seq_no): (r.tokens, r.wm_token, r.pass_count)
           for r in repair_sequences(df, params).collect()}
    got = {(r.doc_id, r.seq_no): (r.tokens, r.wm_token, r.pass_count)
           for r in repair_sequences_arrow(df, params).collect()}
    assert got == exp
    packed = df.withColumn("tokens_bin", make_pack_udf()(F.col("tokens"))) \
        .drop("tokens")
    got_b = {(r.doc_id, r.seq_no):
             (np.frombuffer(r.tokens_bin, "<i4").tolist(), r.wm_token,
              r.pass_count)
             for r in repair_sequences_arrow_packed(packed, params).collect()}
    assert got_b == exp


def test_empty_and_tiny_rows(spark):
    """Degenerate rows (empty, single-token) flow through both kernel paths."""
    import datetime as dt

    from pdf_watermark_removal_otsu_inpaint_spark.operators.repair import (
        repair_sequences)
    from pdf_watermark_removal_otsu_inpaint_spark.operators.repair_vectorized import (
        repair_sequences_arrow)
    rows = [("d0", [], 0, "web", dt.datetime(2026, 1, 1), 0),
            ("d1", [200], 1, "web", dt.datetime(2026, 1, 1), 0),
            ("d2", [255] * 10, 10, "web", dt.datetime(2026, 1, 1), 0)]
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string, "
              "event_ts timestamp, seq_no long")
    a = {r.doc_id: r.tokens for r in repair_sequences(df).collect()}
    b = {r.doc_id: r.tokens for r in repair_sequences_arrow(df).collect()}
    assert a == b == {"d0": [], "d1": [200], "d2": [255] * 10}


@settings(max_examples=40, deadline=None)
@given(st.lists(st.lists(st.integers(min_value=0, max_value=255),
                         min_size=0, max_size=80),
                min_size=1, max_size=8))
def test_detect_auto_batch_matches_reference(rows):
    """detect_auto_batch == rk.detect_mask_auto + rk.filter_runs per row
    (mask equality + coverage), including empty rows in the batch."""
    from pdf_watermark_removal_otsu_inpaint_spark.operators.repair_vectorized import (  # noqa: E501
        detect_auto_batch)
    params = DEFAULT_PARAMS.with_(min_run=3, max_run=40)
    flat, offsets = _flat(rows)
    mask_flat, cov = detect_auto_batch(flat, offsets, params)
    for i, r in enumerate(rows):
        exp = rk.detect_mask_auto(np.asarray(r, dtype=np.int32),
                                  params.kernel_size, params.protect_text,
                                  params.text_expand)
        exp = rk.filter_runs(exp, params.min_run, params.max_run)
        got = mask_flat[offsets[i]:offsets[i + 1]]
        assert got.tolist() == exp.tolist(), f"row {i} mask"
        exp_cov = rk.coverage(exp) if len(r) else 0.0
        assert abs(cov[i] - exp_cov) < 1e-12, f"row {i} cov"


def test_empty_rows_in_batch_kernels():
    """Zero-length rows anywhere in a batch (head / middle / tail) flow
    through repair_batch, detect_batch and apply_mask_batch without crashing
    and with per-row results equal to the reference kernels (empty row ->
    empty output, zero coverage). Regression: a trailing empty row used to
    put m.size into _spans_rowwise's start-boundary scatter (IndexError)."""
    from pdf_watermark_removal_otsu_inpaint_spark.operators.repair_vectorized import (  # noqa: E501
        apply_mask_batch, detect_batch)
    wm_row = scenario_tokens("wm_basic", 600)
    for layout in ([[], list(wm_row)], [list(wm_row), []],
                   [[], list(wm_row), [], [200] * 30, []], [[], []]):
        _check(layout, DEFAULT_PARAMS.with_(passes=2))
        flat, offsets = _flat(layout)
        mask, wm, cov = detect_batch(flat, offsets, DEFAULT_PARAMS)
        assert mask.size == flat.size
        for i, r in enumerate(layout):
            if not r:
                assert wm[i] == -1 and cov[i] == 0.0
        out = apply_mask_batch(flat, mask, offsets, DEFAULT_PARAMS)
        assert out.size == flat.size


def test_fused_text_path_matches_split_ascii(spark):
    """repair_text_arrow (zero-copy UTF-8 tokenization) == the split+ascii
    + per-row pandas path on the real documents table."""
    from pyspark.sql import functions as F

    from pdf_watermark_removal_otsu_inpaint_spark.operators.repair import (
        repair_sequences)
    from pdf_watermark_removal_otsu_inpaint_spark.operators.repair_vectorized import (
        repair_text_arrow)
    from pdf_watermark_removal_otsu_inpaint_spark.plans.queries import (
        _char_tokens)
    sf = "/root/testdata/sf0.001"
    params = DEFAULT_PARAMS.with_(passes=2, min_run=5)
    docs = spark.read.parquet(f"{sf}/documents.parquet") \
        .select("doc_id", "source", "text")
    new = {r.doc_id: (round(r.coverage, 6), r.wm_token, r.pass_count)
           for r in repair_text_arrow(docs, params).collect()}
    old_df = repair_sequences(
        _char_tokens(spark, sf).withColumn("seq_no", F.lit(0).cast("long")),
        params)
    old = {r.doc_id: (round(r.coverage, 6), r.wm_token, r.pass_count)
           for r in old_df.collect()}
    assert new == old and len(new) > 0


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(
           st.lists(st.integers(min_value=0, max_value=255),
                    min_size=1, max_size=60),
           st.one_of(st.none(), st.integers(min_value=0, max_value=255))),
       min_size=1, max_size=6))
def test_detect_batch_random_with_given_wm(rows_wm):
    """detect_batch == rk.detect_refine per row, for self-detect AND
    caller-supplied wm tokens mixed in one batch."""
    from pdf_watermark_removal_otsu_inpaint_spark.operators.repair_vectorized import (  # noqa: E501
        detect_batch)
    params = DEFAULT_PARAMS.with_(min_run=3, max_run=40)
    rows = [r for r, _ in rows_wm]
    wms = [w for _, w in rows_wm]
    flat, offsets = _flat(rows)
    wm_in = np.array([-1 if w is None else w for w in wms], dtype=np.int32)
    mask_flat, wm_out, cov = detect_batch(flat, offsets, params, wm_in=wm_in)
    for i, (r, w) in enumerate(rows_wm):
        exp_mask, exp_wm = rk.detect_refine(
            np.asarray(r, dtype=np.int32), w, params.color_tolerance,
            params.kernel_size, params.protect_text, params.text_expand,
            params.min_run, params.max_run)
        got = mask_flat[offsets[i]:offsets[i + 1]]
        assert got.tolist() == exp_mask.tolist(), f"row {i} mask"
        exp_w = -1 if exp_wm is None else exp_wm
        assert wm_out[i] == exp_w, f"row {i} wm"
        assert abs(cov[i] - rk.coverage(exp_mask)) < 1e-12, f"row {i} cov"
