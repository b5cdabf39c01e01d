"""Deterministic synthetic `sequences` table generator (FIXTURES.md §1-2).

Shape per BASELINE.json input_hint:
    (doc_id:string, tokens:array<int32>, n_tok:int32, source:string)
plus derived streaming columns (event_ts:timestamp, seq_no:long).

Token scenarios mirror the reference's synthetic test images translated to
1-D (FIXTURES.md §2; reference tests/test_watermark_core.py:12-25,
tests/fix_validation/test_protection_order.py:14-30,
tests/fix_validation/test_protection_improvement.py:32-69).

Everything is seeded (seed 42) — no wall-clock, no external data.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import numpy as np

SEED = 42
EPOCH = datetime(2026, 1, 1, tzinfo=timezone.utc).replace(tzinfo=None)  # naive UTC
SOURCES = ["web", "books", "code", "wiki", "news", "forum", "paper", "chat"]
HEAVY_SOURCE = "web"  # skew fixture: ~60% of rows (FIXTURES.md, SURVEY X9)


def _spans(arr: np.ndarray, spans: list[tuple[int, int, int]]) -> np.ndarray:
    for lo, hi, val in spans:
        arr[lo:hi] = val
    return arr


def _f(arr: np.ndarray, spans: list[tuple[float, float, int]]) -> np.ndarray:
    """Proportional spans: (lo_frac, hi_frac, value)."""
    n = arr.size
    return _spans(arr, [(int(lo * n), int(hi * n), v) for lo, hi, v in spans])


def scenario_tokens(name: str, n: int = 2000, rng: np.random.Generator | None = None) -> np.ndarray:
    """Named fixture scenarios (FIXTURES.md §2). All int32, values 0-255.

    Spans are proportional to n, tuned so the detector's coverage window
    [1%,20%] (watermark_detector.py:181) admits the watermark and the
    run-length filter (min 100) keeps the refined spans at n >= 2000.
    """
    a = np.full(n, 255, dtype=np.int32)
    if name == "wm_basic":        # bg 200, "text" spans of token 100 (17%)
        a[:] = 200
        _f(a, [(0.10, 0.16, 100), (0.30, 0.38, 100), (0.70, 0.73, 100)])
    elif name == "wm_protect":    # wm 200 at 20% with black text inside
        _f(a, [(0.05, 0.25, 200), (0.11, 0.1175, 0), (0.19, 0.1975, 0)])
    elif name == "wm_gap":        # two wm spans, 3-token gap (closable); text outside
        _f(a, [(0.10, 0.20, 200)])
        s2 = int(0.20 * n) + 3
        _spans(a, [(s2, int(0.30 * n), 200)])
        _f(a, [(0.60, 0.64, 0)])
    elif name == "wm_dark_graytext":
        _f(a, [(0.10, 0.28, 180), (0.50, 0.56, 80)])
    elif name == "wm_electronic":
        _f(a, [(0.08, 0.26, 210), (0.60, 0.70, 0)])
    elif name == "wm_scanned":
        if rng is None:
            rng = np.random.default_rng(SEED)
        a = np.clip(245 + rng.normal(0, 5, n), 0, 255).astype(np.int32)
        _f(a, [(0.10, 0.28, 190), (0.55, 0.62, 20)])
    elif name == "wm_textlike":   # wm token in [100,150] -> skip text protection
        _f(a, [(0.10, 0.28, 120), (0.60, 0.65, 0)])
    elif name == "wm_none":       # clean row (dark text only)
        _f(a, [(0.10, 0.20, 30)])
    elif name == "wm_edge":       # wm touching both edges (18% total)
        _f(a, [(0.0, 0.09, 200), (0.91, 1.0, 200)])
    elif name == "wm_runs":       # runs of assorted lengths around the 100..5000 bounds
        n = max(n, 12000)
        a = np.full(n, 255, dtype=np.int32)
        pos = 10
        for ln in (1, 5, 99, 100, 150, 5000, 5001):
            if pos + ln + 10 > n:
                break
            _spans(a, [(pos, pos + ln, 200)])
            pos += ln + 50
    elif name == "wm_multipass":  # two tolerance-adjacent wm values
        _f(a, [(0.10, 0.20, 200), (0.21, 0.30, 170)])
    else:
        raise ValueError(f"unknown scenario {name!r}")
    return a.astype(np.int32)


SCENARIOS = ["wm_basic", "wm_protect", "wm_gap", "wm_dark_graytext",
             "wm_electronic", "wm_scanned", "wm_textlike", "wm_none",
             "wm_edge", "wm_runs", "wm_multipass"]


def generate_rows(n_rows: int = 200, seed: int = SEED,
                  min_tok: int = 256, max_tok: int = 4096,
                  late_fraction: float = 0.0, watermark_delay_s: int = 600):
    """Deterministic list of row dicts for the `sequences` table.

    Sources are skewed: HEAVY_SOURCE gets ~60% of rows. event_ts is strictly
    increasing per doc (seq_no * 7s) from a fixed epoch; `late_fraction` of
    rows get event_ts pushed older than the watermark delay (X4 fixture).
    """
    rng = np.random.default_rng(seed)
    rows = []
    n_docs = max(1, n_rows // 4)
    next_seq: dict[int, int] = {}
    for i in range(n_rows):
        doc_n = int(rng.integers(0, n_docs))
        doc_id = f"doc{doc_n:06d}"
        if rng.random() < 0.6:
            source = HEAVY_SOURCE
        else:
            source = SOURCES[1:][int(rng.integers(0, len(SOURCES) - 1))]
        scen = SCENARIOS[int(rng.integers(0, len(SCENARIOS)))]
        n = int(rng.integers(min_tok, max_tok + 1))
        tokens = scenario_tokens(scen, n, rng)
        # (doc_id, seq_no) is the exactly-once sink key — unique per doc
        seq_no = next_seq.get(doc_n, 0)
        next_seq[doc_n] = seq_no + 1
        ts = EPOCH + timedelta(seconds=doc_n * 997 + seq_no * 7)
        if late_fraction > 0 and rng.random() < late_fraction:
            ts = ts - timedelta(seconds=watermark_delay_s * 3)
        rows.append({
            "doc_id": doc_id,
            "tokens": tokens.tolist(),
            "n_tok": int(tokens.size),
            "source": source,
            "event_ts": ts,
            "seq_no": int(seq_no),
            "scenario": scen,
        })
    return rows


SEQUENCES_DDL = ("doc_id string, tokens array<int>, n_tok int, source string, "
                 "event_ts timestamp, seq_no long, scenario string")


def sequences_df(spark, n_rows: int = 200, seed: int = SEED, **kw):
    """Spark DataFrame of the synthetic sequences table (deterministic)."""
    rows = generate_rows(n_rows, seed, **kw)
    df = spark.createDataFrame(rows, schema=SEQUENCES_DDL)
    # stable column order matching input_hint
    return df.select("doc_id", "tokens", "n_tok", "source",
                     "event_ts", "seq_no", "scenario")
