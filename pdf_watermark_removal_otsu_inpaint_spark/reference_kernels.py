"""Independent NumPy re-implementation of the reference pipeline in the 1-D
token domain — the engine's correctness anchor (SURVEY.md §5.2 item 1).

Domain translation (SURVEY.md §intro): a page's grayscale plane becomes a 1-D
``tokens: int32[n]`` array; a token's *value class* is ``token mod 256`` (the
grayscale analogue); the binary pixel mask becomes a per-position bool mask;
2-D elliptical morphology becomes 1-D flat-window erosion/dilation; connected
components become contiguous runs; Telea inpainting becomes deterministic
nearest-boundary / distance-weighted fill.

Every constant is cited into /root/reference/src/pdf_watermark_removal/ —
this module is written from those *semantics*, not from the reference code
(which is 2-D OpenCV and has no 1-D path).

All functions are pure, deterministic, and NumPy-vectorized per row; the Spark
engine (operators/) calls them inside Arrow-batched pandas UDFs, and pytest
asserts token-array equality engine-vs-here (`python -m pytest -x -q`).
"""

from __future__ import annotations

import numpy as np

# --- constants (cited) -----------------------------------------------------
TEXT_CORE_THRESHOLD = 140     # watermark_detector.py:207 (THRESH_BINARY_INV at 140)
BACKGROUND_THRESHOLD = 250    # watermark_detector.py:455,625 (gray > 250 protected)
TEXTLIKE_LO, TEXTLIKE_HI = 100, 150  # watermark_detector.py:463,638 skip-protection guard
TEXT_CLEAN_KERNEL = 2         # watermark_detector.py:220 MORPH_RECT (2,2) open
WM_VALUE_LO, WM_VALUE_HI = 100, 250  # watermark_detector.py:181
WM_COV_LO, WM_COV_HI = 1.0, 20.0     # watermark_detector.py:181 (percent)
TOPK_MODES = 10               # watermark_detector.py:172 (sorted_idx[:10])
MULTIPASS_DILATE_KERNEL = 3   # watermark_remover.py:249 (3,3) dilate between passes
BLEND_FULL_STRENGTH = 1.5     # watermark_remover.py:168 (>=1.5 -> no blending)


# --- value-class bucketing (P1, SURVEY §2.2) --------------------------------
def bucket256(tokens: np.ndarray) -> np.ndarray:
    """Token value -> 0..255 class, the grayscale analogue.

    Matches Spark ``pmod(t, 256)`` (non-negative remainder). Stays in int32
    (memory-bandwidth matters: the VM-measured ceiling is the kernel's
    limiting resource at 32 workers, so no int64 temporaries)."""
    a = np.asarray(tokens)
    if a.dtype not in (np.int32, np.int64):
        a = a.astype(np.int32)
    return np.mod(a, 256).astype(np.int32, copy=False)


# --- histogram + dominant-token detection (A1-A3) ---------------------------
def histogram256(g: np.ndarray) -> np.ndarray:
    """256-bin value histogram — cv2.calcHist analogue (watermark_detector.py:162-165)."""
    return np.bincount(np.asarray(g), minlength=256)


def detect_wm_token(tokens: np.ndarray) -> int | None:
    """Dominant watermark token (detect_watermark_color, watermark_detector.py:147-191).

    Top-10 histogram modes by count desc (ties: higher token value first —
    deterministic spec for the reference's unspecified argsort tie order);
    first mode with value in [100,250] and coverage in [1%,20%] wins.
    """
    g = bucket256(tokens)
    n = g.size
    if n == 0:
        return None
    hist = histogram256(g)
    order = np.argsort(hist, kind="stable")[::-1][:TOPK_MODES]
    for v in order:
        count = hist[v]
        coverage = count / n * 100.0
        if WM_VALUE_LO <= v <= WM_VALUE_HI and WM_COV_LO <= coverage <= WM_COV_HI:
            return int(v)
    return None


# --- 1-D morphology (K1, SURVEY §2.9) ---------------------------------------
# Window of width k anchored with left reach (k-1)//2 and right reach k//2.
# Dilation pads False outside, erosion pads True (cv2 border convention:
# dilate border = -inf, erode border = +inf).
#
# Implemented as run-boundary arithmetic (O(#runs), not O(n*k)): a dilated
# run [s,e) becomes [s-right, e+left) (window reach mirrored), an eroded run
# becomes [s+left, e-right) except at array borders where the True padding
# keeps the edge. Bit-identical to the sliding-window definition — the
# brute-force reference below is kept for the property tests.
def _spans_of(m: np.ndarray) -> np.ndarray:
    """(n_runs, 2) array of [start, end) spans of True."""
    if m.size == 0:
        return np.empty((0, 2), dtype=np.int64)
    d = np.diff(m.astype(np.int8))
    starts = np.flatnonzero(d == 1) + 1
    ends = np.flatnonzero(d == -1) + 1
    if m[0]:
        starts = np.concatenate(([0], starts))
    if m[-1]:
        ends = np.concatenate((ends, [m.size]))
    return np.stack([starts, ends], axis=1)


def _mask_of(spans: np.ndarray, n: int) -> np.ndarray:
    out = np.zeros(n, dtype=bool)
    for s, e in spans:
        out[s:e] = True
    return out


def dilate(mask: np.ndarray, k: int, iterations: int = 1) -> np.ndarray:
    m = np.asarray(mask, dtype=bool)
    if k <= 1 or m.size == 0 or iterations <= 0:
        return m.copy()
    left, right = (k - 1) // 2, k // 2
    n = m.size
    spans = _spans_of(m)
    if spans.size == 0:
        return m.copy()
    # iterations compose linearly for flat windows: total expansion i*(reach)
    lo = np.maximum(spans[:, 0] - right * iterations, 0)
    hi = np.minimum(spans[:, 1] + left * iterations, n)
    # merge overlapping/adjacent spans
    out = np.zeros(n, dtype=bool)
    for s, e in zip(lo, hi):
        out[s:e] = True
    return out


def erode(mask: np.ndarray, k: int, iterations: int = 1) -> np.ndarray:
    m = np.asarray(mask, dtype=bool)
    if k <= 1 or m.size == 0 or iterations <= 0:
        return m.copy()
    left, right = (k - 1) // 2, k // 2
    n = m.size
    spans = _spans_of(m)
    if spans.size == 0:
        return m.copy()
    # True padding outside the array: a run touching a border keeps that edge
    lo = np.where(spans[:, 0] == 0, 0, spans[:, 0] + left * iterations)
    hi = np.where(spans[:, 1] == n, n, spans[:, 1] - right * iterations)
    keep = lo < hi
    return _mask_of(np.stack([lo[keep], hi[keep]], axis=1), n)


def _dilate_bruteforce(mask: np.ndarray, k: int, iterations: int = 1) -> np.ndarray:
    """Sliding-window definition — the spec; used by property tests."""
    m = np.asarray(mask, dtype=bool)
    if k <= 1 or m.size == 0 or iterations <= 0:
        return m.copy()
    left, right = (k - 1) // 2, k // 2
    for _ in range(iterations):
        p = np.zeros(m.size + left + right, dtype=bool)
        p[left:left + m.size] = m
        m = np.lib.stride_tricks.sliding_window_view(p, k).any(axis=1)
    return m


def _erode_bruteforce(mask: np.ndarray, k: int, iterations: int = 1) -> np.ndarray:
    m = np.asarray(mask, dtype=bool)
    if k <= 1 or m.size == 0 or iterations <= 0:
        return m.copy()
    left, right = (k - 1) // 2, k // 2
    for _ in range(iterations):
        p = np.ones(m.size + left + right, dtype=bool)
        p[left:left + m.size] = m
        m = np.lib.stride_tricks.sliding_window_view(p, k).all(axis=1)
    return m


def morph_open(mask: np.ndarray, k: int, iterations: int = 1) -> np.ndarray:
    """cv2.MORPH_OPEN with iterations=i == erode×i then dilate×i."""
    return dilate(erode(mask, k, iterations), k, iterations)


def morph_close(mask: np.ndarray, k: int, iterations: int = 1) -> np.ndarray:
    """cv2.MORPH_CLOSE with iterations=i == dilate×i then erode×i."""
    return erode(dilate(mask, k, iterations), k, iterations)


# --- protection masks (P3, P4, get_text_protect_mask) -----------------------
def background_mask(g: np.ndarray) -> np.ndarray:
    """g > 250 (watermark_detector.py:455)."""
    return np.asarray(g) > BACKGROUND_THRESHOLD


def text_protect_mask(g: np.ndarray, expand: int = 3) -> np.ndarray:
    """get_text_protect_mask (watermark_detector.py:193-229) in 1-D.

    core = g < 140 (:207); dilate by width 2*expand+1 (:212-215, ellipse
    (2e+1, 2e+1)); open with width-2 window ×1 (:220-223, RECT (2,2))."""
    core = np.asarray(g) < TEXT_CORE_THRESHOLD
    if expand > 0:
        core = dilate(core, 2 * expand + 1, 1)
    return morph_open(core, TEXT_CLEAN_KERNEL, 1)


# --- detection pipeline (P2/P3/P5 + K1; _precise_color_based_detection +
#     _unified_protection_and_refinement, watermark_detector.py:421-479,592-696)
def raw_color_mask(g: np.ndarray, wm_token: int, tolerance: int) -> np.ndarray:
    """|g - wm| < tolerance (watermark_detector.py:439-441)."""
    g = np.asarray(g)
    return np.abs(g - np.int32(wm_token) if g.dtype == np.int32
                  else g - int(wm_token)) < tolerance


def detect_mask(tokens: np.ndarray, wm_token: int, tolerance: int = 30,
                kernel_size: int = 3, protect_text: bool = True,
                text_expand: int = 3) -> np.ndarray:
    """Detection → protection → refinement (watermark_detector.py:421-479).

    1. raw color mask (:439-441)
    2. background protection AND-NOT (:455-458)
    3. text protection AND-NOT unless 100<=wm<=150 (:463-467)
    4. open ×1 then close ×2 with kernel_size window (:470-479)
    """
    g = bucket256(tokens)
    m = raw_color_mask(g, wm_token, tolerance)
    m &= ~background_mask(g)
    if not m.any():  # clean row: protections/morphology of empty == empty
        return m
    if protect_text and not (TEXTLIKE_LO <= int(wm_token) <= TEXTLIKE_HI):
        m &= ~text_protect_mask(g, text_expand)
    m = morph_open(m, kernel_size, 1)
    m = morph_close(m, kernel_size, 2)
    return m


# --- run analysis (R1, _traditional_refine_mask, watermark_detector.py:772-789)
def run_spans(mask: np.ndarray) -> list[tuple[int, int]]:
    """Maximal [start, end) spans of True."""
    m = np.asarray(mask, dtype=bool)
    if m.size == 0:
        return []
    d = np.diff(m.astype(np.int8))
    starts = list(np.flatnonzero(d == 1) + 1)
    ends = list(np.flatnonzero(d == -1) + 1)
    if m[0]:
        starts.insert(0, 0)
    if m[-1]:
        ends.append(m.size)
    return list(zip(starts, ends))


def filter_runs(mask: np.ndarray, min_run: int = 100, max_run: int = 5000) -> np.ndarray:
    """Keep runs with min_run <= length <= max_run (the 1-D connected-component
    area filter; aspect ratio has no 1-D analogue — documented divergence)."""
    out = np.zeros_like(np.asarray(mask, dtype=bool))
    for s, e in run_spans(mask):
        if min_run <= e - s <= max_run:
            out[s:e] = True
    return out


# --- coverage + dynamic radius (A5, watermark_remover.py:143-150) ------------
def coverage(mask: np.ndarray) -> float:
    m = np.asarray(mask, dtype=bool)
    return float(np.count_nonzero(m)) / m.size if m.size else 0.0


def dynamic_radius(cov: float, base_radius: int = 2, strength: float = 1.0) -> int:
    """max(2, int(base + coverage*10*strength)) (watermark_remover.py:146-149)."""
    return max(2, int(base_radius + cov * 10.0 * strength))


# --- 1-D Telea-style inpaint (K2, watermark_remover.py:160-164) --------------
def inpaint_1d(tokens: np.ndarray, mask: np.ndarray, radius: int) -> np.ndarray:
    """Deterministic 1-D re-expression of cv2.INPAINT_TELEA.

    For each masked run [i, j) with boundary values L = tokens[i-1],
    R = tokens[j] (where present) and distances dl = p-(i-1), dr = j-p:

    - one-sided run (touches an array edge): copy the available boundary.
    - fully masked row (no boundary at all): left unchanged.
    - two-sided, min(dl, dr) <= radius: integer distance-weighted interpolation
      ``(L*dr + R*dl) // (dl+dr)`` (equals ``(L+R)//2`` at the midpoint).
    - two-sided, min(dl, dr) > radius: beyond the trust radius the fill
      plateaus at the nearest boundary value (tie -> ``(L+R)//2``).

    Integer-only, vectorized per run.
    """
    t = np.asarray(tokens).copy()
    m = np.asarray(mask, dtype=bool)
    n = t.size
    for s, e in run_spans(m):
        has_l, has_r = s > 0, e < n
        if not has_l and not has_r:
            continue
        if not has_l:
            t[s:e] = t[e]
            continue
        if not has_r:
            t[s:e] = t[s - 1]
            continue
        L, R = int(t[s - 1]), int(t[e])  # python ints: overflow-safe products
        p = np.arange(s, e, dtype=np.int64)
        dl = p - (s - 1)
        dr = e - p
        interp = (L * dr + R * dl) // (dl + dr)
        nearest = np.where(dl < dr, L, np.where(dr < dl, R, (L + R) // 2))
        t[s:e] = np.where(np.minimum(dl, dr) <= radius, interp, nearest)
    return t


# --- strength blend (F4, apply_inpaint_strength, watermark_remover.py:78-99) -
def blend(orig: np.ndarray, filled: np.ndarray, mask: np.ndarray,
          strength: float) -> np.ndarray:
    """float32 blend then truncating integer cast, exactly as the reference.

    result = orig*(1 - m*strength) + filled*(m*strength), float32 math
    (watermark_remover.py:90-99), truncated toward zero by the uint8 cast.
    strength >= 1.5 skips blending (watermark_remover.py:166-172)."""
    if strength >= BLEND_FULL_STRENGTH:
        return np.asarray(filled).copy()
    if strength == 1.0:
        # bit-identical fast path: with m in {0,1} and float32-exact int
        # values <= 2^24, orig*(1-m)+filled*m == where(m, filled, orig)
        return np.where(np.asarray(mask, dtype=bool),
                        np.asarray(filled), np.asarray(orig))
    bf = np.asarray(mask, dtype=np.float32) * np.float32(strength)
    res = (np.asarray(orig, dtype=np.float32) * (np.float32(1.0) - bf)
           + np.asarray(filled, dtype=np.float32) * bf)
    # trunc toward zero, matches the reference astype(uint8) in range
    return res.astype(np.asarray(orig).dtype)


# --- full per-row pipelines (remove_watermark / multi-pass) ------------------
def detect_refine(tokens: np.ndarray, wm_token: int | None = None,
                  tolerance: int = 30, kernel_size: int = 3,
                  protect_text: bool = True, text_expand: int = 3,
                  min_run: int = 100, max_run: int = 5000):
    """detect_watermark_mask + refine_mask (_detect_and_refine_mask,
    watermark_remover.py:117-141). Returns (mask, wm_token|None)."""
    if wm_token is None:
        wm_token = detect_wm_token(tokens)
    if wm_token is None:
        return np.zeros(np.asarray(tokens).size, dtype=bool), None
    m = detect_mask(tokens, wm_token, tolerance, kernel_size, protect_text, text_expand)
    return filter_runs(m, min_run, max_run), wm_token


def remove_watermark(tokens: np.ndarray, wm_token: int | None = None,
                     tolerance: int = 30, kernel_size: int = 3,
                     protect_text: bool = True, text_expand: int = 3,
                     min_run: int = 100, max_run: int = 5000,
                     inpaint_radius: int = 2, inpaint_strength: float = 1.0):
    """Single-pass removal (watermark_remover.py:174-232).

    Returns (repaired_tokens, coverage, wm_token|None)."""
    t = np.asarray(tokens)
    mask, wm = detect_refine(t, wm_token, tolerance, kernel_size,
                             protect_text, text_expand, min_run, max_run)
    if not mask.any():  # empty-mask short-circuit (watermark_remover.py:196-204)
        return t.copy(), 0.0, wm
    cov = coverage(mask)
    radius = dynamic_radius(cov, inpaint_radius, inpaint_strength)
    filled = inpaint_1d(t, mask, radius)
    return blend(t, filled, mask, inpaint_strength), cov, wm


def remove_watermark_multi_pass(tokens: np.ndarray, passes: int = 2,
                                wm_token: int | None = None,
                                tolerance: int = 30, kernel_size: int = 3,
                                protect_text: bool = True, text_expand: int = 3,
                                min_run: int = 100, max_run: int = 5000,
                                inpaint_radius: int = 2,
                                inpaint_strength: float = 1.0):
    """Multi-pass removal with progressive mask expansion
    (watermark_remover.py:234-302). Pass >0 dilates the mask with a width-3
    window before inpainting (:248-250); stops when the mask empties
    (:243-246). The watermark token, once detected, is reused across passes
    (detector caches self.watermark_color, watermark_detector.py:562-568).

    Returns (repaired_tokens, pass_count, first_pass_coverage, wm_token|None).
    """
    result = np.asarray(tokens).copy()
    first_cov = 0.0
    done_passes = 0
    wm = wm_token
    for pass_num in range(passes):
        mask, wm_found = detect_refine(result, wm, tolerance, kernel_size,
                                       protect_text, text_expand, min_run, max_run)
        if wm is None:
            wm = wm_found
        if not mask.any():
            break
        if pass_num > 0:
            mask = dilate(mask, MULTIPASS_DILATE_KERNEL, 1)
        cov = coverage(mask)
        if pass_num == 0:
            first_cov = cov
        radius = dynamic_radius(cov, inpaint_radius, inpaint_strength)
        filled = inpaint_1d(result, mask, radius)
        result = blend(result, filled, mask, inpaint_strength)
        done_passes += 1
    return result, done_passes, first_cov, wm


# --- Otsu threshold from a histogram (north_star component) ------------------
def otsu_threshold(hist: np.ndarray) -> int:
    """Classic Otsu: threshold t maximizing inter-class variance over a 256-bin
    histogram (the reference's adaptive/threshold family re-expressed; also
    implemented as pure SQL window cumulative sums in operators/otsu.py so the
    DuckDB oracle can check it). Ties -> smallest t.

    Degenerate convention (engine spec, aligned with otsu_sql+otsu_repair):
    a histogram with no valid split — empty, or a single occupied bin, where
    every candidate threshold leaves one class empty — returns 255, meaning
    "mask nothing" under detect_mask_threshold (g > 255 is always False).
    """
    h = np.asarray(hist, dtype=np.float64)
    total = h.sum()
    if total <= 0:
        return 255
    bins = np.arange(h.size, dtype=np.float64)
    w0 = np.cumsum(h)                 # class-0 weight for threshold t (bins <= t)
    m0 = np.cumsum(h * bins)
    w1 = total - w0
    mu_t = m0[-1]
    # sigma_b^2(t) = w0*w1*(mu0-mu1)^2 with unnormalized masses:
    # (m0*total - mu_t*w0)^2 / (w0*w1) — note the total factor on m0;
    # dropping it (an earlier bug) maximizes a different criterion whenever
    # total != 1 (counts [5,3,2] split at t=1 instead of the true t=0)
    with np.errstate(divide="ignore", invalid="ignore"):
        between = (m0 * total - mu_t * w0) ** 2 / (w0 * w1)
    finite = np.isfinite(between)
    if not finite.any():
        return 255  # single occupied bin: no threshold has two non-empty classes
    between[~finite] = -1.0
    return int(np.argmax(between))


# --- document classifier (A10-A14, document_classifier.py) -------------------
def classify_metrics(tokens: np.ndarray) -> dict:
    """1-D re-expression of DocumentClassifier.classify (document_classifier.py:33-75).

    - color_discreteness (:77-97): distinct count of (t//8)*8, score 100 - n/2
      clamped to [0,100].
    - text_concentration (:99-123): std-dev of the dominant dark (<100) peak
      (20 bins over [0,100)), score 100 - 2.5*std clamped >= 0; neutral 50 when
      fewer than 100 dark tokens.
    - edge_sharpness (:125-137): variance of the 2nd-order difference
      (1-D Laplacian), score min(100, var/10).
    - noise_level (:139-152): mean |t - median3(t)| residual (NlMeans residual
      simplified to a width-3 median filter — documented divergence),
      score max(0, 100 - ratio*1000) with ratio = mean(|diff|)/255.
    """
    g = bucket256(tokens).astype(np.float64)
    n = g.size
    # A10
    nq = np.unique((g.astype(np.int64) // 8) * 8).size
    discreteness = float(min(100.0, max(0.0, 100.0 - nq / 2.0)))
    # A11
    dark = g[g < 100]
    if dark.size < 100:
        concentration = 50.0
    else:
        hist, edges = np.histogram(dark, bins=20, range=(0, 100))
        pk = int(np.argmax(hist))
        peak = dark[(dark >= edges[pk]) & (dark < edges[pk + 1])]
        std = float(np.std(peak)) if peak.size > 10 else 255.0
        concentration = max(0.0, 100.0 - std * 2.5)
    # A12
    lap_var = float(np.diff(g, 2).var()) if n >= 3 else 0.0
    sharpness = min(100.0, lap_var / 10.0)
    # A13 (median-3 residual)
    if n >= 3:
        stacked = np.stack([g[:-2], g[1:-1], g[2:]])
        med = np.median(stacked, axis=0)
        resid = float(np.mean(np.abs(g[1:-1] - med)))
    else:
        resid = 0.0
    cleanness = max(0.0, 100.0 - (resid / 255.0) * 1000.0)
    return {"color_discreteness": discreteness, "text_concentration": concentration,
            "edge_sharpness": sharpness, "noise_level": cleanness}


def decide_type(metrics: dict) -> tuple[str, float]:
    """_decide_type (document_classifier.py:154-177)."""
    e = (metrics["color_discreteness"] * 0.3 + metrics["text_concentration"] * 0.3
         + metrics["edge_sharpness"] * 0.2 + metrics["noise_level"] * 0.2)
    s = 100.0 - e
    if e > 70 and s < 30:
        return "electronic", e
    if s > 70 and e < 30:
        return "scanned", s
    return "mixed", max(e, s) / 2.0


# --- automatic detection mode (P6/P7/P8, _automatic_detection_mode,
#     watermark_detector.py:481-545) ------------------------------------------
ADAPTIVE_BLOCK = 11   # watermark_detector.py:498 (blockSize)
ADAPTIVE_C = 2        # watermark_detector.py:498 (C)
SAT_MIN_THRESHOLD = 30  # watermark_detector.py:504 (max(30, 0.6*mean))
SAT_MEAN_FACTOR = 0.6


def local_mean_1d(g: np.ndarray, block: int = ADAPTIVE_BLOCK) -> np.ndarray:
    """Sliding local mean with a width-`block` window, SHRINKING at the
    array edges (mean over the in-bounds part of the window). This is the
    engine's 1-D re-expression of the Gaussian-weighted local mean in
    cv2.adaptiveThreshold (flat window + shrinking border — chosen so the
    identical definition is expressible as a SQL window frame
    `ROWS BETWEEN k PRECEDING AND k FOLLOWING`, giving a DuckDB oracle)."""
    left, right = (block - 1) // 2, block // 2
    n = g.size
    c = np.concatenate(([0.0], np.cumsum(np.asarray(g, dtype=np.float64))))
    idx = np.arange(n)
    lo = np.maximum(idx - left, 0)
    hi = np.minimum(idx + right + 1, n)
    return (c[hi] - c[lo]) / (hi - lo)


def adaptive_threshold_mask(g: np.ndarray, block: int = ADAPTIVE_BLOCK,
                            c: int = ADAPTIVE_C) -> np.ndarray:
    """P6: THRESH_BINARY against (local_mean - C): mask = g > mean - C
    (watermark_detector.py:497-499)."""
    return np.asarray(g, dtype=np.float64) > (local_mean_1d(g, block) - c)


def saturation_mask_1d(g: np.ndarray) -> np.ndarray:
    """P7: 1-D analogue of the HSV low-saturation detector —
    t < max(30, 0.6 * row_mean) (watermark_detector.py:501-505)."""
    thr = max(SAT_MIN_THRESHOLD, float(np.mean(g)) * SAT_MEAN_FACTOR)
    return np.asarray(g, dtype=np.float64) < thr


def detect_mask_auto(tokens: np.ndarray, kernel_size: int = 3,
                     protect_text: bool = True,
                     text_expand: int = 3) -> np.ndarray:
    """Automatic detection mode (no known watermark token,
    watermark_detector.py:481-545): adaptive-threshold OR saturation mask,
    then background/text protection and open x1 / close x2.

    NOTE: the engine's default pipeline treats rows with no detectable
    dominant token as clean (P10 short-circuit) — this mode is an explicit
    opt-in operator, not a silent fallback; documented divergence."""
    g = bucket256(tokens)
    m = adaptive_threshold_mask(g) | saturation_mask_1d(g)
    m &= ~background_mask(g)
    if protect_text:
        m &= ~text_protect_mask(g, text_expand)
    m = morph_open(m, kernel_size, 1)
    m = morph_close(m, kernel_size, 2)
    return m


# --- Otsu-threshold detection (north_star composition: per-window histogram
#     -> Otsu binarization -> contaminated-span mask) -------------------------
def detect_mask_threshold(tokens: np.ndarray, threshold: int,
                          kernel_size: int = 3, protect_text: bool = True,
                          text_expand: int = 3) -> np.ndarray:
    """Binarize against an externally-supplied (Otsu) threshold: positions
    with value class ABOVE the threshold are watermark candidates (the
    watermark sits between text [dark] and background [>250]); then the same
    protection + refinement chain as detect_mask. The threshold normally
    comes from otsu_threshold over a per-window histogram (engine spec; the
    reference's binary-threshold family, watermark_detector.py:497-499,
    repo-titled 'otsu')."""
    g = bucket256(tokens)
    m = np.asarray(g) > int(threshold)
    m &= ~background_mask(g)
    if not m.any():
        return m
    if protect_text:
        m &= ~text_protect_mask(g, text_expand)
    m = morph_open(m, kernel_size, 1)
    m = morph_close(m, kernel_size, 2)
    return m
