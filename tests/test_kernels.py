"""Kernel-level tests for the 1-D NumPy reference kernels.

Mirrors the reference's test strategy (SURVEY.md §5.1):
- synthetic-scenario assertions (reference tests/test_watermark_core.py:11-57)
- protection-order properties (tests/fix_validation/test_protection_order.py)
- run-filter bounds (watermark_detector.py:772-789)
- multi-pass convergence (watermark_remover.py:243-246)
"""

import numpy as np
import pytest

from pdf_watermark_removal_otsu_inpaint_spark import reference_kernels as rk
from pdf_watermark_removal_otsu_inpaint_spark.sources.sequences import (
    SCENARIOS, scenario_tokens)


def test_bucket256_matches_pmod():
    t = np.array([-1, -256, 0, 255, 256, 300, 511], dtype=np.int64)
    assert rk.bucket256(t).tolist() == [255, 0, 0, 255, 0, 44, 255]


def test_histogram_counts():
    g = np.array([0, 0, 5, 255, 255, 255])
    h = rk.histogram256(g)
    assert h[0] == 2 and h[5] == 1 and h[255] == 3 and h.sum() == 6


def test_detect_wm_token_basic():
    # bg 255 (too high value), wm 200 at ~18.5% coverage -> 200 wins
    t = scenario_tokens("wm_protect", 2000)
    assert rk.detect_wm_token(t) == 200


def test_detect_wm_token_none_on_clean():
    t = scenario_tokens("wm_none", 2000)
    # token 30 is outside [100,250]; bg 255 outside range -> None
    assert rk.detect_wm_token(t) is None


def test_detect_wm_token_coverage_bounds():
    # a candidate above 20% coverage must be rejected
    t = np.full(1000, 255, dtype=np.int32)
    t[:300] = 200  # 30% coverage
    assert rk.detect_wm_token(t) != 200


def test_dilate_erode_roundtrip_and_padding():
    m = np.zeros(20, dtype=bool)
    m[8:12] = True
    d = rk.dilate(m, 3)
    assert d[7] and d[12] and not d[6] and not d[13]
    e = rk.erode(d, 3)
    assert (e == m).all()  # close of an isolated run == original
    # erosion pads True at borders (cv2 +inf border): edge run survives
    edge = np.zeros(10, dtype=bool)
    edge[:3] = True
    assert rk.erode(edge, 3)[0]


def test_open_removes_specks_close_fills_gaps():
    m = np.zeros(50, dtype=bool)
    m[10] = True           # single-speck noise
    m[20:30] = True
    assert not rk.morph_open(m, 3)[10]
    assert rk.morph_open(m, 3)[20:30].all()
    g = np.zeros(50, dtype=bool)
    g[10:20] = True
    g[21:30] = True        # 1-wide gap
    assert rk.morph_close(g, 3)[20]


def test_text_protection_property():
    """Zero mask positions inside the dark-text region (reference
    test_protection_order.py:62-67)."""
    t = scenario_tokens("wm_protect", 2000)
    mask = rk.detect_mask(t, 200)
    assert not mask[220:235].any()   # text span 1
    assert not mask[380:395].any()   # text span 2
    # but the watermark body is detected
    assert mask[120:210].any()


def test_protection_is_monotone():
    """Adding protection never grows the mask (test_protection_order.py core
    property)."""
    t = scenario_tokens("wm_protect", 2000)
    with_prot = rk.detect_mask(t, 200, protect_text=True)
    without = rk.detect_mask(t, 200, protect_text=False)
    assert not (with_prot & ~without).any()


def test_textlike_guard_skips_protection():
    """wm token in [100,150] skips text protection (watermark_detector.py:463)."""
    t = scenario_tokens("wm_textlike", 2000)
    mask = rk.detect_mask(t, 120)
    assert mask[250:500].any()  # watermark detected despite being text-like


def test_gap_closing_with_protection():
    """Gap between watermark fragments closes; text stays out
    (test_protection_order.py:107-144)."""
    t = scenario_tokens("wm_gap", 2000)
    mask = rk.detect_mask(t, 200)
    assert mask[400:403].all()          # 3-gap closed by close x2
    assert not mask[1200:1280].any()    # text protected


def test_filter_runs_bounds():
    t = scenario_tokens("wm_runs", 12000)
    mask = rk.raw_color_mask(rk.bucket256(t), 200, 30)
    kept = rk.filter_runs(mask, 100, 5000)
    lens = sorted(e - s for s, e in rk.run_spans(kept))
    assert lens == [100, 150, 5000]


def test_inpaint_one_sided_and_two_sided():
    t = np.array([10, 10, 0, 0, 0, 0, 20, 20], dtype=np.int64)
    m = np.zeros(8, dtype=bool)
    m[2:6] = True
    out = rk.inpaint_1d(t, m, radius=10)
    # boundaries t[1]=10, t[6]=20; interp (10*dr+20*dl)//(dl+dr):
    # p=2: dl=1,dr=4 ->(40+20)//5=12; p=3: dl=2,dr=3 ->(30+40)//5=14; ...
    assert out.tolist() == [10, 10, 12, 14, 16, 18, 20, 20]
    # edge run fills from the single side
    t2 = np.array([0, 0, 7, 7], dtype=np.int64)
    m2 = np.array([True, True, False, False])
    assert rk.inpaint_1d(t2, m2, 2).tolist() == [7, 7, 7, 7]
    # fully masked row unchanged
    m3 = np.ones(4, dtype=bool)
    assert rk.inpaint_1d(t2, m3, 2).tolist() == t2.tolist()


def test_inpaint_radius_plateau():
    t = np.zeros(30, dtype=np.int64)
    t[0] = 100
    t[-1] = 200
    m = np.ones(30, dtype=bool)
    m[0] = m[-1] = False
    out = rk.inpaint_1d(t, m, radius=2)
    # deep interior (dl,dr > 2) plateaus at nearest boundary
    assert out[5] == 100 and out[24] == 200
    # near boundary interpolates
    assert out[1] == (100 * 27 + 200 * 1) // 28


def test_blend_truncation_and_full_strength():
    orig = np.array([100, 100], dtype=np.int64)
    fill = np.array([105, 105], dtype=np.int64)
    m = np.array([True, False])
    half = rk.blend(orig, fill, m, 0.5)
    assert half.tolist() == [102, 100]  # 102.5 truncates to 102
    full = rk.blend(orig, fill, m, 1.5)
    assert full.tolist() == [105, 105]
    one = rk.blend(orig, fill, m, 1.0)
    assert one.tolist() == [105, 100]


def test_remove_watermark_clean_row_identity():
    t = scenario_tokens("wm_none", 2000)
    out, cov, wm = rk.remove_watermark(t)
    assert (out == t).all() and cov == 0.0 and wm is None


def test_remove_watermark_repairs_span():
    t = scenario_tokens("wm_protect", 2000)
    out, cov, wm = rk.remove_watermark(t)
    assert wm == 200 and cov > 0
    # repaired positions no longer match the watermark token en masse
    still = np.abs(rk.bucket256(out) - 200) < 30
    assert still.sum() < (np.abs(rk.bucket256(t) - 200) < 30).sum()
    # unmasked positions are untouched
    mask, _ = rk.detect_refine(t)
    assert (out[~mask] == t[~mask]).all()


def test_multipass_stops_when_clean():
    t = scenario_tokens("wm_none", 2000)
    out, n_passes, cov, wm = rk.remove_watermark_multi_pass(t, passes=3)
    assert n_passes == 0 and (out == t).all()


def test_multipass_runs_multiple_passes():
    t = scenario_tokens("wm_multipass", 2000)
    out1, _, _ = rk.remove_watermark(t)
    out2, n_passes, _, _ = rk.remove_watermark_multi_pass(t, passes=2)
    assert n_passes >= 1
    # multi-pass removes at least as much watermark-range content as single
    rem1 = (np.abs(out1 - 200) < 30).sum() + (np.abs(out1 - 170) < 30).sum()
    rem2 = (np.abs(out2 - 200) < 30).sum() + (np.abs(out2 - 170) < 30).sum()
    assert rem2 <= rem1


def test_otsu_bimodal():
    h = np.zeros(256, dtype=np.int64)
    h[50] = 100
    h[200] = 100
    th = rk.otsu_threshold(h)
    assert 50 <= th < 200


def test_otsu_degenerate():
    # no valid split (empty / single occupied bin) -> 255 = "mask nothing",
    # the same convention as otsu_sql dropping the group + otsu_repair's
    # coalesce(threshold, 255)
    assert rk.otsu_threshold(np.zeros(256)) == 255
    h = np.zeros(256)
    h[7] = 10
    assert rk.otsu_threshold(h) == 255


def test_classifier_decides():
    t = scenario_tokens("wm_electronic", 2000)
    m = rk.classify_metrics(t)
    typ, conf = rk.decide_type(m)
    assert typ in ("electronic", "scanned", "mixed") and 0 <= conf <= 100
    t2 = scenario_tokens("wm_scanned", 2000)
    m2 = rk.classify_metrics(t2)
    # scanned fixture must score noisier (lower cleanness) than electronic
    assert m2["noise_level"] <= m["noise_level"]


@pytest.mark.parametrize("scen", SCENARIOS)
def test_all_scenarios_run_end_to_end(scen):
    n = 12000 if scen == "wm_runs" else 2000
    t = scenario_tokens(scen, n)
    out, n_passes, cov, wm = rk.remove_watermark_multi_pass(t, passes=2)
    assert out.shape == t.shape
    assert out.dtype == t.dtype
    assert 0.0 <= cov <= 1.0


# --- run-arithmetic morphology == sliding-window spec (property tests) ------
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(st.lists(st.booleans(), min_size=0, max_size=64),
       st.integers(min_value=1, max_value=9),
       st.integers(min_value=1, max_value=3))
def test_dilate_matches_bruteforce(bits, k, iters):
    m = np.array(bits, dtype=bool)
    assert (rk.dilate(m, k, iters) == rk._dilate_bruteforce(m, k, iters)).all()


@settings(max_examples=200, deadline=None)
@given(st.lists(st.booleans(), min_size=0, max_size=64),
       st.integers(min_value=1, max_value=9),
       st.integers(min_value=1, max_value=3))
def test_erode_matches_bruteforce(bits, k, iters):
    m = np.array(bits, dtype=bool)
    assert (rk.erode(m, k, iters) == rk._erode_bruteforce(m, k, iters)).all()


def test_local_mean_shrinking_window():
    g = np.array([0, 10, 20, 30, 40], dtype=np.int32)
    m = rk.local_mean_1d(g, block=3)
    # edges shrink: mean([0,10]) = 5, mean([30,40]) = 35
    assert m.tolist() == [5.0, 10.0, 20.0, 30.0, 35.0]


def test_adaptive_threshold_mask():
    g = np.full(50, 200, dtype=np.int32)
    g[25] = 100  # local dip stays below local mean - 2
    m = rk.adaptive_threshold_mask(g)
    assert not m[25] and m[0] and m[49]


def test_saturation_mask_dynamic_threshold():
    g = np.full(100, 200, dtype=np.int32)
    g[:10] = 50  # below 0.6*mean (~111) -> masked
    m = rk.saturation_mask_1d(g)
    assert m[:10].all() and not m[10:].any()
    low = np.full(100, 10, dtype=np.int32)
    # mean*0.6 = 6 < 30 -> floor at 30 applies
    assert rk.saturation_mask_1d(low).all()


def test_detect_mask_auto_runs_and_respects_protection():
    t = scenario_tokens("wm_protect", 2000)
    m = rk.detect_mask_auto(t)
    assert m.dtype == bool and m.size == t.size
    # dark text is protected out even in auto mode
    assert not m[220:235].any()


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=255), min_size=2,
                max_size=64),
       st.lists(st.booleans(), min_size=2, max_size=64),
       st.integers(min_value=1, max_value=8))
def test_inpaint_touches_only_masked_positions(toks, bits, radius):
    n = min(len(toks), len(bits))
    t = np.array(toks[:n], dtype=np.int32)
    m = np.array(bits[:n], dtype=bool)
    out = rk.inpaint_1d(t, m, radius)
    assert (out[~m] == t[~m]).all()
    # filled values are bounded by the original value range
    assert out.min() >= t.min() and out.max() <= t.max()


@settings(max_examples=100, deadline=None)
@given(st.lists(st.booleans(), min_size=1, max_size=64),
       st.integers(min_value=1, max_value=10),
       st.integers(min_value=1, max_value=20))
def test_filter_runs_is_subset_and_bounds_hold(bits, lo, hi):
    m = np.array(bits, dtype=bool)
    lo, hi = min(lo, hi), max(lo, hi)
    kept = rk.filter_runs(m, lo, hi)
    assert not (kept & ~m).any()  # subset of the input mask
    for s, e in rk.run_spans(kept):
        assert lo <= e - s <= hi
