"""Engine-vs-kernel parity: the Spark operators must produce token-array
equality against reference_kernels row by row (BASELINE.json input_hint
invariant), and the relational histogram/dominant-token/Otsu paths must match
the NumPy versions exactly.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pdf_watermark_removal_otsu_inpaint_spark import reference_kernels as rk
from pdf_watermark_removal_otsu_inpaint_spark.functions import mask_exprs as mx
from pdf_watermark_removal_otsu_inpaint_spark.operators import histogram as oh
from pdf_watermark_removal_otsu_inpaint_spark.operators import otsu as oo
from pdf_watermark_removal_otsu_inpaint_spark.operators.repair import (
    detect_masks, make_apply_mask_udf, repair_sequences)
from pdf_watermark_removal_otsu_inpaint_spark.params import DEFAULT_PARAMS
from pdf_watermark_removal_otsu_inpaint_spark.sources.sequences import (
    generate_rows, sequences_df)


@pytest.fixture(scope="module")
def seq_df(spark):
    return sequences_df(spark, n_rows=60, seed=7).cache()


@pytest.fixture(scope="module")
def seq_rows():
    return generate_rows(60, seed=7)


def test_repair_token_array_equality(spark, seq_df, seq_rows):
    """The per-row invariant: engine repaired tokens == kernel repaired
    tokens, for every row and scenario mix."""
    params = DEFAULT_PARAMS.with_(passes=2)
    out = (repair_sequences(seq_df, params)
           .select("doc_id", "seq_no", "tokens", "coverage", "pass_count")
           .collect())
    got = {(r.doc_id, r.seq_no): r for r in out}
    assert len(out) == len(seq_rows)
    checked = 0
    for row in seq_rows:
        exp_t, exp_p, exp_c, _ = rk.remove_watermark_multi_pass(
            np.array(row["tokens"]), passes=2)
        g = got[(row["doc_id"], row["seq_no"])]
        assert g.tokens == exp_t.astype(np.int32).tolist(), (
            f"token mismatch for {row['doc_id']}/{row['seq_no']} "
            f"scenario={row['scenario']}")
        assert g.pass_count == exp_p
        assert abs(g.coverage - exp_c) < 1e-12
        checked += 1
    assert checked == len(seq_rows)


def test_detect_mask_equality(spark, seq_df, seq_rows):
    out = detect_masks(seq_df).select("doc_id", "seq_no", "mask", "wm_token").collect()
    got = {(r.doc_id, r.seq_no): r for r in out}
    for row in seq_rows:
        mask, wm = rk.detect_refine(np.array(row["tokens"]))
        g = got[(row["doc_id"], row["seq_no"])]
        assert g.mask == mask.tolist()
        assert g.wm_token == (wm if wm is not None else None)


def test_apply_mask_matches_single_pass_repair(spark, seq_df, seq_rows):
    """detect -> apply_mask (the stream-join shape) == fused single-pass."""
    masked = detect_masks(seq_df).join(
        seq_df.select("doc_id", "seq_no", "tokens"), ["doc_id", "seq_no"])
    out = (masked.withColumn("repaired",
                             make_apply_mask_udf()(F.col("tokens"), F.col("mask")))
           .select("doc_id", "seq_no", "repaired").collect())
    got = {(r.doc_id, r.seq_no): r.repaired for r in out}
    for row in seq_rows:
        exp, _, _ = rk.remove_watermark(np.array(row["tokens"]))
        assert got[(row["doc_id"], row["seq_no"])] == exp.astype(np.int32).tolist()


def test_native_mask_exprs_match_kernel(spark, seq_df, seq_rows):
    """Catalyst-side raw mask + protections == kernel intermediates."""
    df = (seq_df
          .withColumn("raw", mx.raw_color_mask(F.col("tokens"), F.lit(200), F.lit(30)))
          .withColumn("bg", mx.background_mask(F.col("tokens")))
          .withColumn("prot", mx.mask_and_not(F.col("raw"), F.col("bg")))
          .withColumn("cov", mx.mask_coverage(F.col("prot"), F.col("n_tok")))
          .select("doc_id", "seq_no", "raw", "prot", "cov"))
    got = {(r.doc_id, r.seq_no): r for r in df.collect()}
    for row in seq_rows:
        g = rk.bucket256(np.array(row["tokens"]))
        raw = rk.raw_color_mask(g, 200, 30)
        prot = raw & ~rk.background_mask(g)
        r = got[(row["doc_id"], row["seq_no"])]
        assert r.raw == raw.tolist()
        assert r.prot == prot.tolist()
        assert abs(r.cov - prot.sum() / g.size) < 1e-12


def test_relational_dominant_token_matches_kernel(spark, seq_df, seq_rows):
    """A1-A3 relational path: per-(doc_id,seq_no) dominant token == kernel.

    Grouped per row so the kernel's per-row detection is the exact oracle."""
    dom = oh.dominant_token(seq_df, ["doc_id", "seq_no"]).collect()
    got = {(r.doc_id, r.seq_no): r.wm_token for r in dom}
    for row in seq_rows:
        exp = rk.detect_wm_token(np.array(row["tokens"]))
        assert got.get((row["doc_id"], row["seq_no"])) == exp


def test_otsu_sql_matches_kernel(spark, seq_df, seq_rows):
    hist = oh.token_histogram(seq_df, ["doc_id", "seq_no"])
    got = {(r.doc_id, r.seq_no): r.otsu_threshold
           for r in oo.otsu_sql(hist, ["doc_id", "seq_no"]).collect()}
    for row in seq_rows:
        h = rk.histogram256(rk.bucket256(np.array(row["tokens"])))
        assert got[(row["doc_id"], row["seq_no"])] == rk.otsu_threshold(h)


def test_otsu_udf_matches_kernel(spark, seq_df, seq_rows):
    hist = oh.token_histogram(seq_df, ["doc_id", "seq_no"])
    vec = oo.assemble_hist_vector(hist, ["doc_id", "seq_no"])
    got = {(r.doc_id, r.seq_no): r.th
           for r in vec.withColumn("th", oo.make_otsu_udf()(F.col("counts")))
                       .select("doc_id", "seq_no", "th").collect()}
    for row in seq_rows:
        h = rk.histogram256(rk.bucket256(np.array(row["tokens"])))
        assert got[(row["doc_id"], row["seq_no"])] == rk.otsu_threshold(h)


def test_repair_plan_shape(spark, seq_df):
    """The fused path must be a single ArrowEvalPython over a pruned scan —
    no shuffle, no extra Python stages."""
    plan = repair_sequences(seq_df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
    assert "Exchange" not in plan


def test_packed_path_matches_list_path(spark, seq_df):
    """The packed-binary physical layout produces identical results to the
    input_hint array<int32> layout."""
    from pdf_watermark_removal_otsu_inpaint_spark.operators.repair import (
        make_pack_udf, repair_sequences_packed)
    params = DEFAULT_PARAMS.with_(passes=2)
    lst = {(r.doc_id, r.seq_no): (r.tokens, r.coverage, r.wm_token, r.pass_count)
           for r in repair_sequences(seq_df, params).collect()}
    packed_in = seq_df.withColumn("tokens_bin",
                                  make_pack_udf()(F.col("tokens"))) \
                      .drop("tokens")
    got = repair_sequences_packed(packed_in, params).collect()
    assert len(got) == len(lst)
    for r in got:
        exp_t, exp_c, exp_w, exp_p = lst[(r.doc_id, r.seq_no)]
        assert np.frombuffer(r.tokens_bin, dtype="<i4").tolist() == exp_t
        assert r.coverage == exp_c and r.wm_token == exp_w
        assert r.pass_count == exp_p


def test_repair_with_profiles_matches_kernel(spark, seq_df, seq_rows):
    """J2 end-to-end: per-source classified params drive the kernel; engine
    output == kernel run with the same per-source parameters."""
    from pdf_watermark_removal_otsu_inpaint_spark.operators.classify import (
        classify_sources)
    from pdf_watermark_removal_otsu_inpaint_spark.operators.repair import (
        repair_with_profiles)
    prof = {r.source: r for r in classify_sources(seq_df).collect()}
    out = {(r.doc_id, r.seq_no): r
           for r in repair_with_profiles(seq_df).collect()}
    assert len(out) == len(seq_rows)
    for row in seq_rows:
        p = prof[row["source"]]
        exp_t, exp_p, _, _ = rk.remove_watermark_multi_pass(
            np.array(row["tokens"]), passes=int(p.passes),
            tolerance=int(p.color_tolerance), kernel_size=int(p.kernel_size),
            inpaint_strength=float(p.inpaint_strength))
        g = out[(row["doc_id"], row["seq_no"])]
        assert g.tokens == exp_t.astype(np.int32).tolist()
        assert g.pass_count == exp_p
        assert g.doc_type == p.doc_type


def test_otsu_repair_matches_kernel(spark, seq_df, seq_rows):
    """north_star composition: per-source histogram -> Otsu -> threshold
    mask -> repair == kernel run with the same per-source threshold."""
    from pdf_watermark_removal_otsu_inpaint_spark.operators.otsu import (
        otsu_repair)
    out = {(r.doc_id, r.seq_no): r
           for r in otsu_repair(seq_df, ["source"]).collect()}
    # per-source thresholds from the kernel
    by_source = {}
    for row in seq_rows:
        h = by_source.setdefault(row["source"], np.zeros(256, dtype=np.int64))
        h += rk.histogram256(rk.bucket256(np.array(row["tokens"])))
    thr = {s: rk.otsu_threshold(h) for s, h in by_source.items()}
    for row in seq_rows:
        g = out[(row["doc_id"], row["seq_no"])]
        assert g.otsu_threshold == thr[row["source"]]
        a = np.array(row["tokens"])
        mask = rk.filter_runs(
            rk.detect_mask_threshold(a, thr[row["source"]]), 100, 5000)
        if not mask.any():
            exp = a
        else:
            radius = rk.dynamic_radius(rk.coverage(mask), 2, 1.0)
            exp = rk.blend(a, rk.inpaint_1d(a, mask, radius), mask, 1.0)
        assert g.tokens == exp.astype(np.int32).tolist()


def test_marker_span_merge_properties(spark, seq_df, seq_rows):
    """J3 merged-mask semantics (reference tests/test_qr_detection.py:104-123
    analogue): merged ⊇ detect mask, merged ⊇ span mask, repair touches only
    merged positions, untouched positions are identical to the input."""
    from pdf_watermark_removal_otsu_inpaint_spark.operators.repair import (
        repair_with_marker_spans)
    # deterministic marker span per row: [10, 40) on every row
    df = seq_df.withColumn("marker_lo", F.lit(10)) \
               .withColumn("marker_hi", F.lit(40))
    out = {(r.doc_id, r.seq_no): r
           for r in repair_with_marker_spans(df).collect()}
    assert len(out) == len(seq_rows)
    for row in seq_rows:
        g = out[(row["doc_id"], row["seq_no"])]
        det = np.array(g.detect_mask, dtype=bool)
        merged = np.array(g.merged_mask, dtype=bool)
        n = det.size
        span = np.zeros(n, dtype=bool)
        span[10:40] = True
        # merged is exactly the OR, hence superset of both inputs
        assert (merged == (det | span)).all()
        assert g.detect_cnt == int(det.sum())
        assert g.span_cnt == 30
        assert g.merged_cnt == int(merged.sum())
        # repair only inside the merged mask: outside positions untouched
        orig = np.array(row["tokens"])
        rep = np.array(g.tokens)
        assert (rep[~merged] == orig[~merged]).all()
        # and equals the kernel's single-pass repair with the merged mask
        if merged.any():
            radius = rk.dynamic_radius(rk.coverage(merged), 2, 1.0)
            exp = rk.blend(orig, rk.inpaint_1d(orig, merged, radius),
                           merged, 1.0)
        else:
            exp = orig
        assert rep.tolist() == exp.astype(np.int64).tolist()


def test_packed_mask_join_path_matches_unpacked(spark, seq_df, seq_rows):
    """X6 wire format: the bit-packed mask (binary, 1/8 shuffle bytes)
    through join + K2 repair produces token-identical results to the
    array<boolean> layout."""
    from pdf_watermark_removal_otsu_inpaint_spark.operators.repair import (
        detect_masks_packed, make_apply_mask_bin_udf)
    toks = seq_df.select("doc_id", "seq_no", "tokens")
    plain = (detect_masks(seq_df).join(toks, ["doc_id", "seq_no"])
             .withColumn("repaired",
                         make_apply_mask_udf()(F.col("tokens"), F.col("mask")))
             .select("doc_id", "seq_no", "repaired"))
    packed = (detect_masks_packed(seq_df).join(toks, ["doc_id", "seq_no"])
              .withColumn("repaired",
                          make_apply_mask_bin_udf()(F.col("tokens"),
                                                    F.col("mask_bin")))
              .select("doc_id", "seq_no", "repaired"))
    a = {(r.doc_id, r.seq_no): r.repaired for r in plain.collect()}
    b = {(r.doc_id, r.seq_no): r.repaired for r in packed.collect()}
    assert a == b and len(a) == len(seq_rows)
    # and the packed wire format is genuinely ~8x smaller than bool masks
    row = detect_masks_packed(seq_df).select("mask_bin", "n_tok").first()
    assert len(row.mask_bin) == (row.n_tok + 7) // 8


def test_windowed_otsu_repair_matches_kernel(spark, seq_df, seq_rows):
    """north_star window-keyed: per-(event-time window, source) histograms
    feed the Otsu threshold that repairs exactly that window's rows."""
    from pdf_watermark_removal_otsu_inpaint_spark.operators.otsu import (
        otsu_repair_windowed)
    out = {(r.doc_id, r.seq_no): r
           for r in otsu_repair_windowed(seq_df, "1 minute").collect()}
    # kernel thresholds per (minute-window, source)
    by_key = {}
    rows_key = {}
    for row in seq_rows:
        wstart = row["event_ts"].replace(second=0, microsecond=0)
        k = (wstart, row["source"])
        h = by_key.setdefault(k, np.zeros(256, dtype=np.int64))
        h += rk.histogram256(rk.bucket256(np.array(row["tokens"])))
        rows_key[(row["doc_id"], row["seq_no"])] = k
    thr = {k: rk.otsu_threshold(h) for k, h in by_key.items()}
    assert len(out) == len(seq_rows)
    for row in seq_rows:
        g = out[(row["doc_id"], row["seq_no"])]
        t = thr[rows_key[(row["doc_id"], row["seq_no"])]]
        assert g.otsu_threshold == t
        a = np.array(row["tokens"])
        mask = rk.filter_runs(rk.detect_mask_threshold(a, t), 100, 5000)
        if not mask.any():
            exp = a
        else:
            radius = rk.dynamic_radius(rk.coverage(mask), 2, 1.0)
            exp = rk.blend(a, rk.inpaint_1d(a, mask, radius), mask, 1.0)
        assert g.tokens == exp.astype(np.int32).tolist()
