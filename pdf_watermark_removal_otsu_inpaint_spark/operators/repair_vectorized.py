"""Batch-vectorized repair kernel over the flat Arrow buffer (mapInArrow).

The pandas-UDF path (operators/repair.py) loops rows inside the batch; this
path vectorizes ACROSS rows: a micro-batch's token lists arrive as one flat
int32 values buffer + offsets (zero-copy from Arrow's ListArray/BinaryArray
buffers), and every stage runs as whole-batch NumPy:

- per-row histograms: one bincount over (row_idx*256 + g)
- dominant-token selection: one argsort over the (B,256) histogram matrix
- masks: flat elementwise ops
- morphology / run filtering: span-table arithmetic (start/end vectors with
  per-span row bounds) — the whole open/close/filter chain stays in span
  space; masks are written back (span-merge + bool XOR-accumulate) only at
  chain boundaries. Runs are split at row boundaries so nothing leaks
  across rows
- inpaint: one gather of span boundaries + one scatter over all masked
  positions, indexed straight off the span table

Semantics are EXACTLY reference_kernels.remove_watermark_multi_pass per row
(tests/test_repair_vectorized.py asserts token-array equality row-by-row on
every fixture scenario plus randomized inputs).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np

from .. import reference_kernels as rk
from ..params import DEFAULT_PARAMS, EngineParams

_I64 = np.int64


def _spans_rowwise(m: np.ndarray, offsets: np.ndarray):
    """Spans of True in flat mask `m`, split at row boundaries.

    Returns (starts, ends, row_of_span) int64 arrays."""
    n = m.size
    if n == 0:
        z = np.empty(0, dtype=_I64)
        return z, z, z
    prev = np.empty(n, dtype=bool)
    prev[0] = False
    prev[1:] = m[:-1]
    # empty rows make offsets[i] == offsets[i+1]: a trailing empty row puts
    # n in the starts (out of range) and a leading empty row puts 0 in the
    # ends (index -1 would wrap) — mask both out
    b = offsets[:-1]
    prev[b[b < n]] = False              # break continuity at row starts
    nxt = np.empty(n, dtype=bool)
    nxt[-1] = False
    nxt[:-1] = m[1:]
    t = offsets[1:]
    nxt[t[t > 0] - 1] = False           # break continuity at row ends
    starts = np.flatnonzero(m & ~prev).astype(_I64)
    ends = (np.flatnonzero(m & ~nxt) + 1).astype(_I64)
    rows = np.searchsorted(offsets, starts, side="right") - 1
    return starts, ends, rows


def _merge_spans(lo: np.ndarray, hi: np.ndarray):
    """Union of spans sorted by start: O(#spans) cummax group-merge.
    Overlapping or touching spans fuse into one."""
    if lo.size <= 1:
        return lo, hi
    cm = np.maximum.accumulate(hi)
    new = np.empty(lo.size, dtype=bool)
    new[0] = True
    new[1:] = lo[1:] > cm[:-1]
    if new.all():
        return lo, hi
    return lo[new], np.maximum.reduceat(hi, np.flatnonzero(new))


def _write_spans(lo: np.ndarray, hi: np.ndarray, n: int) -> np.ndarray:
    """Span table -> flat bool mask: merge overlaps in span space (cheap
    cummax over #spans), then one bool XOR-accumulate over the flat length —
    ~5x cheaper than the int32 delta+cumsum it replaced (the cumsum was 51%
    of whole-kernel time; BENCH.md bandwidth note)."""
    if lo.size == 0:
        return np.zeros(n, dtype=bool)
    keep = lo < hi
    if not keep.all():
        lo, hi = lo[keep], hi[keep]
        if lo.size == 0:
            return np.zeros(n, dtype=bool)
    lo, hi = _merge_spans(lo, hi)
    # after the merge boundaries are strictly interleaved
    # (lo[i] < hi[i] < lo[i+1]), so one flip per index is exact parity
    d = np.zeros(n + 1, dtype=bool)
    d[lo] = True
    d[hi] = True
    return np.logical_xor.accumulate(d[:n])


# ---------------------------------------------------------------------------
# Span-space morphology: the whole open/close/run-filter chain runs on the
# (start, end, row) table — O(#spans) per op, no flat-array passes. Masks are
# materialized only at the chain's boundaries (raw-mask compares in, optional
# final mask out), which is where the kernel's memory traffic went (BENCH.md).
# ---------------------------------------------------------------------------
def _span_merge_rowwise(lo, hi, rows):
    """Union of per-row spans, never fusing across row boundaries: merge in
    a translated space (pos + row) where consecutive rows are separated by
    one unit, so in-row touching spans fuse but cross-row touching don't."""
    if lo.size <= 1:
        return lo, hi, rows
    tl = lo + rows
    th = hi + rows
    cm = np.maximum.accumulate(th)
    new = np.empty(lo.size, dtype=bool)
    new[0] = True
    new[1:] = tl[1:] > cm[:-1]
    if new.all():
        return lo, hi, rows
    rows2 = rows[new]
    return lo[new], np.maximum.reduceat(th, np.flatnonzero(new)) - rows2, rows2


def _span_dilate(s, e, rows, offsets, k, iters=1):
    if k <= 1 or iters <= 0 or s.size == 0:
        return s, e, rows
    left, right = (k - 1) // 2, k // 2
    row_lo, row_hi = offsets[rows], offsets[rows + 1]
    lo = np.maximum(s - right * iters, row_lo)
    hi = np.minimum(e + left * iters, row_hi)
    return _span_merge_rowwise(lo, hi, rows)


def _span_erode(s, e, rows, offsets, k, iters=1):
    """Erode non-overlapping sorted spans. True padding outside each ROW:
    spans touching a row edge keep that edge (cv2 border convention)."""
    if k <= 1 or iters <= 0 or s.size == 0:
        return s, e, rows
    left, right = (k - 1) // 2, k // 2
    row_lo, row_hi = offsets[rows], offsets[rows + 1]
    lo = np.where(s == row_lo, row_lo, s + left * iters)
    hi = np.where(e == row_hi, row_hi, e - right * iters)
    keep = lo < hi
    return lo[keep], hi[keep], rows[keep]


def _span_open(s, e, rows, offsets, k, iters=1):
    return _span_dilate(*_span_erode(s, e, rows, offsets, k, iters),
                        offsets, k, iters)


def _span_close(s, e, rows, offsets, k, iters=1):
    return _span_erode(*_span_dilate(s, e, rows, offsets, k, iters),
                       offsets, k, iters)


def _span_filter_runs(s, e, rows, min_run, max_run):
    if s.size == 0:
        return s, e, rows
    ln = e - s
    keep = (ln >= min_run) & (ln <= max_run)
    return s[keep], e[keep], rows[keep]


# Flat-mask wrappers (kept for the mask-space callers: text protection and
# the detection chain's final mask materialization)
def _dilate_flat(m, offsets, k, iters=1):
    if k <= 1 or iters <= 0:
        return m.copy()
    s, e, rows = _spans_rowwise(m, offsets)
    if s.size == 0:
        return m.copy()
    s, e, rows = _span_dilate(s, e, rows, offsets, k, iters)
    return _write_spans(s, e, m.size)


def _erode_flat(m, offsets, k, iters=1):
    if k <= 1 or iters <= 0:
        return m.copy()
    s, e, rows = _spans_rowwise(m, offsets)
    if s.size == 0:
        return m.copy()
    s, e, rows = _span_erode(s, e, rows, offsets, k, iters)
    return _write_spans(s, e, m.size)


def _open_flat(m, offsets, k, iters=1):
    s, e, rows = _spans_rowwise(m, offsets)
    if s.size == 0:
        return m.copy()
    return _write_spans(*_span_open(s, e, rows, offsets, k, iters)[:2], m.size)


def _close_flat(m, offsets, k, iters=1):
    s, e, rows = _spans_rowwise(m, offsets)
    if s.size == 0:
        return m.copy()
    return _write_spans(*_span_close(s, e, rows, offsets, k, iters)[:2],
                        m.size)


def _filter_runs_flat(m, offsets, min_run, max_run):
    s, e, _ = _spans_rowwise(m, offsets)
    if s.size == 0:
        return m.copy()
    ln = e - s
    keep = (ln >= min_run) & (ln <= max_run)
    return _write_spans(s[keep], e[keep], m.size)


def _detect_wm_batch(g, offsets, lengths, row_idx):
    """Vectorized detect_wm_token per row: returns int32 wm (-1 = none)."""
    B = lengths.size
    hist = np.bincount(row_idx * 256 + g, minlength=B * 256).reshape(B, 256)
    order = np.argsort(hist, axis=1, kind="stable")[:, ::-1][:, :rk.TOPK_MODES]
    counts = np.take_along_axis(hist, order, axis=1)
    cov = counts * 100.0 / np.maximum(lengths, 1)[:, None]
    qual = ((order >= rk.WM_VALUE_LO) & (order <= rk.WM_VALUE_HI)
            & (cov >= rk.WM_COV_LO) & (cov <= rk.WM_COV_HI))
    has = qual.any(axis=1)
    first = np.argmax(qual, axis=1)
    wm = np.take_along_axis(order, first[:, None], axis=1)[:, 0]
    return np.where(has, wm, -1).astype(np.int32)


def _text_protect_flat(g, offsets, expand):
    core = g < rk.TEXT_CORE_THRESHOLD
    s, e, rows = _spans_rowwise(core, offsets)
    if s.size == 0:
        return core
    if expand > 0:
        s, e, rows = _span_dilate(s, e, rows, offsets, 2 * expand + 1, 1)
    s, e, rows = _span_open(s, e, rows, offsets, rk.TEXT_CLEAN_KERNEL, 1)
    return _write_spans(s, e, g.size)


def _inpaint_spans(out, s, e, rows, offsets, radius_per_row):
    """Vectorized inpaint_1d over a span table; scatters into `out`.
    Masked positions come straight from the spans (repeat + offset arange) —
    no flatnonzero over the flat mask, no per-position searchsorted."""
    if s.size == 0:
        return
    row_lo, row_hi = offsets[rows], offsets[rows + 1]
    has_l = s > row_lo
    has_r = e < row_hi
    L = np.where(has_l, out[np.maximum(s - 1, 0)], 0).astype(_I64)
    R = np.where(has_r, out[np.minimum(e, out.size - 1)], 0).astype(_I64)

    ln = e - s
    total = int(ln.sum())
    if total == 0:
        return
    sp = np.repeat(np.arange(s.size, dtype=_I64), ln)
    base = np.zeros(s.size, dtype=_I64)
    np.cumsum(ln[:-1], out=base[1:])
    P = np.arange(total, dtype=_I64) - base[sp] + s[sp]
    dl = P - (s[sp] - 1)
    dr = e[sp] - P
    Lp, Rp = L[sp], R[sp]
    hl, hr = has_l[sp], has_r[sp]
    rad = radius_per_row[rows[sp]]

    interp = (Lp * dr + Rp * dl) // (dl + dr)
    nearest = np.where(dl < dr, Lp, np.where(dr < dl, Rp, (Lp + Rp) // 2))
    two = np.where(np.minimum(dl, dr) <= rad, interp, nearest)
    v = np.where(hl & hr, two,
                 np.where(hl, Lp, np.where(hr, Rp, out[P].astype(_I64))))
    out[P] = v.astype(out.dtype)


def _inpaint_flat(out, m, offsets, radius_per_row):
    """Mask-input wrapper around _inpaint_spans (apply_mask_batch path)."""
    s, e, rows = _spans_rowwise(m, offsets)
    _inpaint_spans(out, s, e, rows, offsets, radius_per_row)


def _row_sums(m: np.ndarray, offsets: np.ndarray,
              lengths: np.ndarray) -> np.ndarray:
    """Per-row True counts of a flat bool mask via prefix sums — exact for
    empty rows anywhere in the batch (reduceat mis-handles idx[i]==idx[i+1]
    and clamping the start index steals the previous row's last element)."""
    if m.size == 0:
        return np.zeros(lengths.size, dtype=_I64)
    c = np.empty(m.size + 1, dtype=_I64)
    c[0] = 0
    np.cumsum(m, dtype=_I64, out=c[1:])
    return c[offsets[1:]] - c[offsets[:-1]]


def repair_batch(flat: np.ndarray, offsets: np.ndarray,
                 params: EngineParams = DEFAULT_PARAMS,
                 wm_in: np.ndarray | None = None):
    """Whole-batch remove_watermark_multi_pass.

    flat: int32 concatenated tokens; offsets: int64 (B+1).
    Returns (out_flat int32, coverage float64[B], wm int32[B] (-1=none),
    pass_count int32[B]).

    Memory-traffic-minimized (the VM's DRAM bandwidth is the scaling
    ceiling, BENCH.md): value classes live in uint8 (int32 low byte == mod
    256), the raw mask is two uint8 range compares against per-row repeated
    byte bounds (no int32 |g-wm| temp, no int64 row-index gathers), per-row
    counts go through add.reduceat, and for full-strength blends the inpaint
    scatters straight into the output buffer (no `filled` copy, no
    np.where pass)."""
    p = params
    offsets = np.asarray(offsets, dtype=_I64)
    B = offsets.size - 1
    lengths = np.diff(offsets)
    out = np.array(flat, dtype=np.int32, copy=True)
    wm = (np.full(B, -1, dtype=np.int32) if wm_in is None
          else np.asarray(wm_in, dtype=np.int32).copy())
    first_cov = np.zeros(B)
    n_passes = np.zeros(B, dtype=np.int32)
    active = np.ones(B, dtype=bool)
    full_strength = (p.inpaint_strength >= rk.BLEND_FULL_STRENGTH
                     or p.inpaint_strength == 1.0)

    for pass_num in range(p.passes):
        if not active.any():
            break
        g = out.astype(np.uint8)  # low byte == np.mod(out, 256)
        need = wm < 0
        if need.any():
            row_idx = np.repeat(np.arange(B, dtype=_I64), lengths)
            det = _detect_wm_batch(g, offsets, lengths, row_idx)
            wm = np.where(need, det, wm)
        # raw mask: |g - wm| < tol as a uint8 interval test; rows with no wm
        # (or already converged) get an empty interval (lo=1 > hi=0)
        valid = active & (wm >= 0)
        lo_b = np.where(valid, np.clip(wm - (p.color_tolerance - 1), 0, 255),
                        1).astype(np.uint8)
        hi_b = np.where(valid, np.clip(wm + (p.color_tolerance - 1), 0, 255),
                        0).astype(np.uint8)
        m = (g >= np.repeat(lo_b, lengths)) & (g <= np.repeat(hi_b, lengths))
        m &= g <= rk.BACKGROUND_THRESHOLD  # P3: protect g > 250
        if p.protect_text:
            # protection applies per row unless wm is text-like
            prot_rows = ~((wm >= rk.TEXTLIKE_LO) & (wm <= rk.TEXTLIKE_HI))
            if prot_rows.any() and m.any():
                tp = _text_protect_flat(g, offsets, p.text_expand)
                m &= ~(tp & np.repeat(prot_rows, lengths))
        # morphology + run filter stay in span space: one extraction, no
        # flat-array passes until the (optional) final mask write
        s, e, rows = _spans_rowwise(m, offsets)
        s, e, rows = _span_open(s, e, rows, offsets, p.kernel_size, 1)
        s, e, rows = _span_close(s, e, rows, offsets, p.kernel_size, 2)
        s, e, rows = _span_filter_runs(s, e, rows, p.min_run, p.max_run)

        masked_per_row = np.zeros(B, dtype=_I64)
        np.add.at(masked_per_row, rows, e - s)
        active &= masked_per_row > 0
        if not active.any():
            break
        keep = active[rows]
        if not keep.all():
            s, e, rows = s[keep], e[keep], rows[keep]
        if pass_num > 0:
            s, e, rows = _span_dilate(s, e, rows, offsets,
                                      rk.MULTIPASS_DILATE_KERNEL, 1)
            masked_per_row = np.zeros(B, dtype=_I64)
            np.add.at(masked_per_row, rows, e - s)
        else:
            masked_per_row = np.where(active, masked_per_row, 0)
        cov = masked_per_row / np.maximum(lengths, 1)
        if pass_num == 0:
            first_cov = np.where(active, cov, 0.0)
        n_passes += active.astype(np.int32)
        radius = np.maximum(
            2, (p.inpaint_radius + cov * 10.0 * p.inpaint_strength)
            .astype(_I64))
        if full_strength:
            # result == filled on mask, orig elsewhere: scatter in place
            # (inpaint reads boundaries from UNMASKED positions and the
            # whole-row-masked fallback gathers before the scatter)
            _inpaint_spans(out, s, e, rows, offsets, radius)
        else:
            mfin = _write_spans(s, e, out.size)
            filled = out.copy()
            _inpaint_spans(filled, s, e, rows, offsets, radius)
            bf = mfin.astype(np.float32) * np.float32(p.inpaint_strength)
            res = (out.astype(np.float32) * (np.float32(1.0) - bf)
                   + filled.astype(np.float32) * bf)
            out = res.astype(np.int32)
    return out, first_cov, wm, n_passes



def detect_batch(flat: np.ndarray, offsets: np.ndarray,
                 params: EngineParams = DEFAULT_PARAMS,
                 wm_in: np.ndarray | None = None):
    """Whole-batch detect_refine (detection only, no inpaint): the pass-0
    detection stage of repair_batch factored out for the detect_masks /
    stateful (X5) paths.

    wm_in: int32[B] with -1 = self-detect (reference_kernels.detect_refine
    wm_token=None). Returns (mask_flat bool, wm int32[B] (-1 = none found),
    coverage float64[B])."""
    p = params
    offsets = np.asarray(offsets, dtype=_I64)
    B = offsets.size - 1
    lengths = np.diff(offsets)
    g = np.asarray(flat).astype(np.uint8)  # low byte == mod 256
    wm = (np.full(B, -1, dtype=np.int32) if wm_in is None
          else np.asarray(wm_in, dtype=np.int32).copy())
    need = wm < 0
    if need.any():
        row_idx = np.repeat(np.arange(B, dtype=_I64), lengths)
        det = _detect_wm_batch(g, offsets, lengths, row_idx)
        wm = np.where(need, det, wm)
    # uint8 interval test with per-row repeated byte bounds (as repair_batch)
    valid = wm >= 0
    lo_b = np.where(valid, np.clip(wm - (p.color_tolerance - 1), 0, 255),
                    1).astype(np.uint8)
    hi_b = np.where(valid, np.clip(wm + (p.color_tolerance - 1), 0, 255),
                    0).astype(np.uint8)
    m = (g >= np.repeat(lo_b, lengths)) & (g <= np.repeat(hi_b, lengths))
    m &= g <= rk.BACKGROUND_THRESHOLD
    if p.protect_text:
        prot_rows = ~((wm >= rk.TEXTLIKE_LO) & (wm <= rk.TEXTLIKE_HI))
        if prot_rows.any() and m.any():
            tp = _text_protect_flat(g, offsets, p.text_expand)
            m &= ~(tp & np.repeat(prot_rows, lengths))
    m = _open_flat(m, offsets, p.kernel_size, 1)
    m = _close_flat(m, offsets, p.kernel_size, 2)
    m = _filter_runs_flat(m, offsets, p.min_run, p.max_run)
    cov = _row_sums(m, offsets, lengths) / np.maximum(lengths, 1)
    return m, wm, cov


def detect_auto_batch(flat: np.ndarray, offsets: np.ndarray,
                      params: EngineParams = DEFAULT_PARAMS):
    """Whole-batch automatic detection mode (P6 adaptive threshold OR P7
    saturation, then protection + open x1 / close x2 + run filter) — the
    batch form of rk.detect_mask_auto + rk.filter_runs, no per-row Python.

    The P6 local mean uses ONE global float64 prefix sum with per-row
    clamped window bounds: token classes are integers <= 255, so the prefix
    sum stays exact in float64 up to ~3.5e13 positions per batch and the
    windowed differences equal the per-row computation bit-for-bit
    (rk.local_mean_1d, watermark_detector.py:497-499).

    Returns (mask_flat bool, coverage float64[B])."""
    p = params
    offsets = np.asarray(offsets, dtype=_I64)
    B = offsets.size - 1
    lengths = np.diff(offsets)
    g = np.asarray(flat).astype(np.uint8)  # low byte == mod 256
    n = g.size
    if n == 0:
        return np.zeros(0, dtype=bool), np.zeros(B)
    gf = g.astype(np.float64)
    # P6: g > local_mean(block, shrinking at ROW edges) - C
    left = (rk.ADAPTIVE_BLOCK - 1) // 2
    right = rk.ADAPTIVE_BLOCK // 2
    c = np.empty(n + 1, dtype=np.float64)
    c[0] = 0.0
    np.cumsum(gf, out=c[1:])
    row_idx = np.repeat(np.arange(B, dtype=_I64), lengths)
    pos = np.arange(n, dtype=_I64)
    lo = np.maximum(pos - left, offsets[row_idx])
    hi = np.minimum(pos + right + 1, offsets[row_idx + 1])
    local_mean = (c[hi] - c[lo]) / (hi - lo)
    m = gf > (local_mean - rk.ADAPTIVE_C)
    # P7: g < max(30, 0.6 * row_mean) — exact integer row sums
    row_mean = np.where(lengths > 0,
                        (c[offsets[1:]] - c[offsets[:-1]])
                        / np.maximum(lengths, 1), 0.0)
    thr = np.maximum(rk.SAT_MIN_THRESHOLD, row_mean * rk.SAT_MEAN_FACTOR)
    m |= gf < thr[row_idx]
    m &= g <= rk.BACKGROUND_THRESHOLD
    if p.protect_text and m.any():
        m &= ~_text_protect_flat(g, offsets, p.text_expand)
    m = _open_flat(m, offsets, p.kernel_size, 1)
    m = _close_flat(m, offsets, p.kernel_size, 2)
    m = _filter_runs_flat(m, offsets, p.min_run, p.max_run)
    cov = _row_sums(m, offsets, lengths) / np.maximum(lengths, 1)
    return m, cov


def threshold_repair_batch(flat: np.ndarray, offsets: np.ndarray,
                           thr: np.ndarray,
                           params: EngineParams = DEFAULT_PARAMS):
    """Whole-batch detect_mask_threshold + run filter + single-pass K2
    (the otsu_repair per-row body, reference_kernels.detect_mask_threshold
    semantics): mask = g > thr_row, background/text protection, open x1 /
    close x2, run filter, inpaint + blend.

    thr: int32[B] per-row (window/source-level Otsu) thresholds.
    Returns (out_flat int32, coverage float64[B])."""
    p = params
    offsets = np.asarray(offsets, dtype=_I64)
    B = offsets.size - 1
    lengths = np.diff(offsets)
    out = np.array(flat, dtype=np.int32, copy=True)
    g = out.astype(np.uint8)
    thr_b = np.clip(np.asarray(thr, dtype=np.int64), 0, 255).astype(np.uint8)
    m = g > np.repeat(thr_b, lengths)
    # rows whose threshold is >= 255 mask nothing (degenerate convention)
    if (np.asarray(thr) >= 255).any():
        m &= np.repeat(np.asarray(thr) < 255, lengths)
    m &= g <= rk.BACKGROUND_THRESHOLD
    if p.protect_text and m.any():
        m &= ~_text_protect_flat(g, offsets, p.text_expand)
    s, e, rows = _spans_rowwise(m, offsets)
    s, e, rows = _span_open(s, e, rows, offsets, p.kernel_size, 1)
    s, e, rows = _span_close(s, e, rows, offsets, p.kernel_size, 2)
    s, e, rows = _span_filter_runs(s, e, rows, p.min_run, p.max_run)
    masked = np.zeros(B, dtype=_I64)
    np.add.at(masked, rows, e - s)
    cov = masked / np.maximum(lengths, 1)
    radius = np.maximum(
        2, (p.inpaint_radius + cov * 10.0 * p.inpaint_strength).astype(_I64))
    if p.inpaint_strength >= rk.BLEND_FULL_STRENGTH or \
       p.inpaint_strength == 1.0:
        _inpaint_spans(out, s, e, rows, offsets, radius)
    else:
        mfin = _write_spans(s, e, out.size)
        filled = out.copy()
        _inpaint_spans(filled, s, e, rows, offsets, radius)
        bf = mfin.astype(np.float32) * np.float32(p.inpaint_strength)
        res = (out.astype(np.float32) * (np.float32(1.0) - bf)
               + filled.astype(np.float32) * bf)
        out = res.astype(np.int32)
    return out, cov


def apply_mask_batch(flat: np.ndarray, mask_flat: np.ndarray,
                     offsets: np.ndarray,
                     params: EngineParams = DEFAULT_PARAMS) -> np.ndarray:
    """Whole-batch K2 (inpaint + blend with a GIVEN mask): the post-join
    stage of the stream-stream pipeline (X6 -> repair), vectorized across
    rows. Per-row semantics == reference_kernels inpaint_1d + blend with
    dynamic_radius; empty-mask rows pass through (P10)."""
    p = params
    offsets = np.asarray(offsets, dtype=_I64)
    lengths = np.diff(offsets)
    out = np.array(flat, dtype=np.int32, copy=True)
    m = np.asarray(mask_flat, dtype=bool)
    if not m.any():
        return out
    cov = _row_sums(m, offsets, lengths) / np.maximum(lengths, 1)
    radius = np.maximum(
        2, (p.inpaint_radius + cov * 10.0 * p.inpaint_strength).astype(_I64))
    if p.inpaint_strength >= rk.BLEND_FULL_STRENGTH or p.inpaint_strength == 1.0:
        # in-place scatter (boundaries read from unmasked positions)
        _inpaint_flat(out, m, offsets, radius)
        return out
    filled = out.copy()
    _inpaint_flat(filled, m, offsets, radius)
    bf = m.astype(np.float32) * np.float32(p.inpaint_strength)
    res = (out.astype(np.float32) * (np.float32(1.0) - bf)
           + filled.astype(np.float32) * bf)
    return res.astype(np.int32)


def flatten_arrays(series) -> tuple[np.ndarray, np.ndarray]:
    """pandas Series of per-row arrays -> (flat, offsets). One C-level
    concatenate, no per-element Python."""
    arrs = series.to_numpy()
    B = len(arrs)
    lengths = np.fromiter((len(a) for a in arrs), dtype=_I64, count=B)
    offsets = np.zeros(B + 1, dtype=_I64)
    np.cumsum(lengths, out=offsets[1:])
    if B == 0 or offsets[-1] == 0:
        return np.empty(0, dtype=np.int32), offsets
    flat = np.concatenate([np.asarray(a) for a in arrs])
    return flat, offsets


def _as_plain(col, typ):
    """Pass-through column -> exactly the declared output type (parquet scans
    hand mapInArrow dictionary-encoded strings, which Spark cannot read back
    through a plain-string output schema)."""
    import pyarrow as pa
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.type != typ:
        col = col.cast(typ)
    return col


# ---------------------------------------------------------------------------
# mapInArrow operator: zero-copy in and out for both physical layouts.
# ---------------------------------------------------------------------------
# Key columns passed through (same list as repair.repair_sequences, so the
# arrow and pandas engine paths emit identical schemas and the sink's
# masked_tokens lineage metric survives either path)
_KEEP_COLS = ("doc_id", "seq_no", "event_ts", "source", "n_tok")


def _passthrough(b, name):
    """Input column -> plain (non-dictionary) array for re-emission.

    Parquet scans hand mapInArrow dictionary-encoded strings, which Spark
    cannot read back through a plain output schema — decode those; other
    types pass through unchanged (their Arrow type already matches Spark's
    expectation since Spark produced them)."""
    import pyarrow as pa
    col = b.column(b.schema.get_field_index(name))
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_dictionary(col.type):
        col = col.dictionary_decode()
    return col


def repair_sequences_arrow(df, params: EngineParams = DEFAULT_PARAMS):
    """sequences -> repaired via mapInArrow (whole-batch vectorized kernel).

    Reads the ListArray's values/offsets buffers directly; emits a new
    ListArray over the repaired flat buffer — no per-row Python objects.
    Passes every present key column (doc_id/seq_no/event_ts/source/n_tok)
    through so the output schema matches repair.repair_sequences exactly."""
    import pyarrow as pa

    p = params
    keep = [c for c in _KEEP_COLS if c in df.columns]
    in_types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    out_schema = ", ".join(
        [f"{c} {in_types[c]}" for c in keep]
        + ["tokens array<int>", "coverage double", "wm_token int",
           "pass_count int"])

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            toks = b.column(b.schema.get_field_index("tokens"))
            if isinstance(toks, pa.ChunkedArray):
                toks = toks.combine_chunks()
            lst = toks
            offsets = lst.offsets.to_numpy(zero_copy_only=False).astype(_I64)
            flat = lst.values.to_numpy(zero_copy_only=False)
            # Arrow list offsets may not start at 0 when sliced
            base = offsets[0]
            flat = flat[base:offsets[-1]]
            offsets = offsets - base
            out, cov, wm, npass = repair_batch(
                np.ascontiguousarray(flat, dtype=np.int32), offsets, p)
            out_list = pa.ListArray.from_arrays(
                pa.array(offsets, type=pa.int32()),
                pa.array(out, type=pa.int32()))
            wm_arr = pa.array(np.where(wm < 0, None, wm).tolist(),
                              type=pa.int32())
            yield pa.RecordBatch.from_arrays(
                [_passthrough(b, c) for c in keep]
                + [out_list, pa.array(cov, type=pa.float64()), wm_arr,
                   pa.array(npass, type=pa.int32())],
                keep + ["tokens", "coverage", "wm_token", "pass_count"])

    return df.mapInArrow(fn, out_schema)


def repair_sequences_arrow_packed(df, params: EngineParams = DEFAULT_PARAMS):
    """Packed-binary flavor: the BinaryArray's data buffer IS the flat int32
    token buffer (offsets in bytes / 4)."""
    import pyarrow as pa

    p = params

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            col = b.column(b.schema.get_field_index("tokens_bin"))
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            byte_offsets = np.frombuffer(col.buffers()[1], dtype=np.int32,
                                         count=len(col) + 1 + col.offset)
            byte_offsets = byte_offsets[col.offset:].astype(_I64)
            data = np.frombuffer(col.buffers()[2], dtype=np.int32)
            base = byte_offsets[0] // 4
            offsets = byte_offsets // 4 - base
            # read-only frombuffer view goes straight in: repair_batch copies
            # into its output buffer and never mutates the input
            flat = data[base:base + offsets[-1]]
            out, cov, wm, npass = repair_batch(flat, offsets, p)
            # zero-copy out: py_buffer wraps the numpy arrays directly
            out_bin = pa.BinaryArray.from_buffers(
                pa.binary(), len(col),
                [None, pa.py_buffer((offsets * 4).astype(np.int32)),
                 pa.py_buffer(out)])
            wm_arr = pa.array(np.where(wm < 0, None, wm).tolist(),
                              type=pa.int32())
            yield pa.RecordBatch.from_arrays(
                [_as_plain(b.column(b.schema.get_field_index("doc_id")),
                           pa.string()),
                 _as_plain(b.column(b.schema.get_field_index("seq_no")),
                           pa.int64()),
                 _as_plain(b.column(b.schema.get_field_index("source")),
                           pa.string()),
                 out_bin,
                 pa.array(cov, type=pa.float64()),
                 wm_arr,
                 pa.array(npass, type=pa.int32())],
                ["doc_id", "seq_no", "source", "tokens_bin", "coverage",
                 "wm_token", "pass_count"])

    return df.mapInArrow(fn, "doc_id string, seq_no long, source string, "
                             "tokens_bin binary, coverage double, "
                             "wm_token int, pass_count int")


def repair_text_arrow(df, params: EngineParams = DEFAULT_PARAMS):
    """Fused tokenize+repair over document text: Arrow's UTF-8 StringArray
    stores (offsets, bytes) — for an ASCII corpus the bytes buffer IS the
    char-token array, so tokenization is a zero-copy buffer view and the
    whole batch goes straight into repair_batch. (Non-ASCII bytes become
    their raw byte values mod 256 — same as per-byte tokenization.)

    Input: (doc_id, source, text); output per-doc repair stats (no token
    lists shipped back — the aggregate shape used by q40)."""
    import pyarrow as pa

    p = params

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            txt = b.column(b.schema.get_field_index("text"))
            if isinstance(txt, pa.ChunkedArray):
                txt = txt.combine_chunks()
            if pa.types.is_large_string(txt.type):
                off_dtype = np.int64
            else:
                off_dtype = np.int32
            offs = np.frombuffer(txt.buffers()[1], dtype=off_dtype,
                                 count=len(txt) + 1 + txt.offset)
            offs = offs[txt.offset:].astype(_I64)
            data = np.frombuffer(txt.buffers()[2], dtype=np.uint8)
            base = offs[0]
            offsets = offs - base
            flat = data[base:base + offsets[-1]].astype(np.int32)
            out, cov, wm, npass = repair_batch(flat, offsets, p)
            changed = np.add.reduceat(
                (out != flat).astype(np.int64),
                offsets[:-1].clip(max=max(flat.size - 1, 0))) \
                if flat.size else np.zeros(len(txt), dtype=np.int64)
            # rows with zero length: reduceat duplicates — recompute safely
            if (np.diff(offsets) == 0).any():
                changed = np.array(
                    [int((out[offsets[i]:offsets[i + 1]]
                          != flat[offsets[i]:offsets[i + 1]]).sum())
                     for i in range(len(txt))], dtype=np.int64)
            # value-level evidence of the inpaint fills: per-row sum of the
            # FINAL repaired tokens (exact int64 — order-independent), the
            # quantity q40's unrolled 2-pass DuckDB oracle re-derives
            c = np.empty(out.size + 1, dtype=np.int64)
            c[0] = 0
            np.cumsum(out, dtype=np.int64, out=c[1:])
            token_sum = c[offsets[1:]] - c[offsets[:-1]]
            wm_arr = pa.array(np.where(wm < 0, None, wm).tolist(),
                              type=pa.int32())
            yield pa.RecordBatch.from_arrays(
                [_as_plain(b.column(b.schema.get_field_index("doc_id")),
                           pa.int64()),
                 _as_plain(b.column(b.schema.get_field_index("source")),
                           pa.string()),
                 pa.array(np.diff(offsets), type=pa.int64()),
                 pa.array(cov, type=pa.float64()),
                 wm_arr,
                 pa.array(npass, type=pa.int32()),
                 pa.array(changed, type=pa.int64()),
                 pa.array(token_sum, type=pa.int64())],
                ["doc_id", "source", "n_out", "coverage", "wm_token",
                 "pass_count", "changed_tokens", "token_sum"])

    return df.mapInArrow(
        fn, "doc_id long, source string, n_out long, coverage double, "
            "wm_token int, pass_count int, changed_tokens long, "
            "token_sum long")
