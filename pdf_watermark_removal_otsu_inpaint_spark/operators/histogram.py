"""Relational histogram + dominant-token operators (A1-A3, W1-W2, X1-X3).

The scan path is pure Catalyst: explode -> hash aggregate. The explode emits
n_tok rows per sequence, but partial (map-side) aggregation collapses them to
<= 256 rows per group per partition *before* the shuffle, so shuffle volume is
O(groups x 256), independent of token count — the property that makes this
hold at 10^12 sequences. (The per-row np.bincount flavor lives inside the
fused kernel for per-row decisions; relationally, explode+partial-agg already
achieves the same tree-merge, SURVEY §4.3.)

Reference: cv2.calcHist (watermark_detector.py:162-165), top-k modes
(:168-172), dominant-token selection (:172-189).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import mask_exprs as mx
from ..reference_kernels import TOPK_MODES


def token_histogram(df: DataFrame, group_cols: list[str] | None = None,
                    tokens_col: str = "tokens") -> DataFrame:
    """Per-group 256-bin token-value histogram: (group..., tok, cnt)."""
    group_cols = group_cols or ["source"]
    ex = df.select(*group_cols,
                   F.explode(mx.bucket_tokens(F.col(tokens_col))).alias("tok"))
    return ex.groupBy(*group_cols, "tok").agg(F.count("*").alias("cnt"))


def token_histogram_bincount(df: DataFrame,
                             group_cols: list[str] | None = None,
                             tokens_col: str = "tokens") -> DataFrame:
    """A1b: the at-scale flavor of token_histogram — identical result,
    different physical shape. mapInPandas bincounts each batch's tokens at
    memory speed (one np.bincount over group_code*256 + token_class per
    batch: the whole batch collapses to <= groups x 256 partial rows
    WITHOUT ever materializing n_tok exploded rows), then a final
    groupBy(group, tok) sum tree-merges the partials. Shuffle volume is
    O(groups x 256 x partitions), the same as the explode path's partial
    agg, but the map side does one vectorized pass instead of emitting and
    hash-aggregating n_tok rows per sequence — the swap SURVEY §4.3 calls
    out for 2048-token rows at 10^12 scale."""
    group_cols = group_cols or ["source"]
    src = df.select(*group_cols, tokens_col)
    out_schema = ", ".join(
        [f"{c} {t}" for c, t in src.dtypes if c != tokens_col]
        + ["tok int", "cnt long"])

    def bincount_batches(pdfs):
        import numpy as np
        import pandas as pd

        from .repair_vectorized import flatten_arrays
        for pdf in pdfs:
            # the explode path silently drops NULL token arrays; match it
            pdf = pdf[pdf[tokens_col].notna()]
            if not len(pdf):
                continue
            flat, offsets = flatten_arrays(pdf[tokens_col])
            g = np.asarray(flat).astype(np.uint8)  # low byte == mod 256
            lengths = np.diff(offsets)
            # NB: pandas' factorize hashtable treats \x00 as a C string
            # terminator ('a\x00b' == 'a\x00c'); \x1f is a safe separator
            keys = pdf[group_cols].astype(str).agg("\x1f".join, axis=1)
            codes, uniq = pd.factorize(keys)
            code_per_pos = np.repeat(codes, lengths)
            hist = np.bincount(code_per_pos * 256 + g,
                               minlength=len(uniq) * 256)
            nz = np.flatnonzero(hist)
            if nz.size == 0:
                continue
            # one representative row per group code (codes are 0..k-1 in
            # first-appearance order, so first-occurrence indexes map 1:1)
            _, first_pos = np.unique(codes, return_index=True)
            rep = pdf.iloc[first_pos][group_cols].reset_index(drop=True)
            out = rep.iloc[nz // 256].reset_index(drop=True)
            out["tok"] = (nz % 256).astype("int32")
            out["cnt"] = hist[nz].astype("int64")
            yield out

    partial = src.mapInPandas(bincount_batches, out_schema)
    return partial.groupBy(*group_cols, "tok") \
        .agg(F.sum("cnt").alias("cnt"))


def _utf8_flat(txt):
    """Arrow StringArray -> (flat uint8 byte buffer view, int64 offsets).

    For an ASCII corpus the bytes ARE the per-char ascii() tokens (non-ASCII
    bytes count as raw bytes mod 256 — the repair_text_arrow convention)."""
    import numpy as np
    import pyarrow as pa
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    if pa.types.is_dictionary(txt.type):
        txt = txt.dictionary_decode()
    off_dtype = np.int64 if pa.types.is_large_string(txt.type) else np.int32
    offs = np.frombuffer(txt.buffers()[1], dtype=off_dtype,
                         count=len(txt) + 1 + txt.offset)
    offs = offs[txt.offset:].astype(np.int64)
    data = np.frombuffer(txt.buffers()[2], dtype=np.uint8)
    base = offs[0]
    return data[base:offs[-1]], offs - base


def _plain_col(b, name):
    """RecordBatch column -> plain (non-dictionary) array, for re-emission
    through a declared output schema."""
    import pyarrow as pa
    col = b.column(b.schema.get_field_index(name))
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_dictionary(col.type):
        col = col.dictionary_decode()
    return col


def _bincount_partial_batch(b, group_cols, g, lengths):
    """Shared A1b core for the fused mapInArrow feeds: bincount the uint8
    token classes `g` (flat, `lengths` per row) per group key and return
    the partial-histogram RecordBatch, or None when the batch is empty.
    Same group handling as bincount_batches (factorize over a \\x1f-joined
    key — \\x00 is unsafe in pandas' hashtable)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    gp = pa.RecordBatch.from_arrays(
        [_plain_col(b, c) for c in group_cols], list(group_cols)).to_pandas()
    keys = gp.astype(str).agg("\x1f".join, axis=1)
    codes, uniq = pd.factorize(keys)
    code_per_pos = np.repeat(codes, lengths)
    hist = np.bincount(code_per_pos * 256 + g, minlength=len(uniq) * 256)
    nz = np.flatnonzero(hist)
    if nz.size == 0:
        return None
    _, first_pos = np.unique(codes, return_index=True)
    rep_idx = pa.array(first_pos[nz // 256])
    return pa.RecordBatch.from_arrays(
        [_plain_col(b, c).take(rep_idx) for c in group_cols]
        + [pa.array((nz % 256).astype("int32")),
           pa.array(hist[nz].astype("int64"))],
        list(group_cols) + ["tok", "cnt"])


def token_histogram_bincount_text(df: DataFrame,
                                  group_cols: list[str] | None = None,
                                  text_col: str = "text") -> DataFrame:
    """A1b with tokenization FUSED into the bincount: per-char tokens are
    the UTF-8 bytes of `text_col`, read zero-copy off the Arrow
    StringArray's data buffer (ASCII corpus — the repair_text_arrow
    convention; identical to ascii() per char).

    Replaces the round-5 feed `token_histogram_bincount(split+transform)`,
    whose Catalyst stage materialized one single-char string plus one int
    per character (~15M objects at sf1) and shipped the int arrays through
    Arrow before the kernel saw a byte. Here the text column crosses once
    and the whole batch is one np.bincount — result identical (asserted in
    tests/test_histogram_paths.py)."""
    group_cols = group_cols or ["source"]
    src = df.select(*group_cols, text_col)
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}"
         for f in src.schema.fields if f.name != text_col]
        + ["tok int", "cnt long"])

    def fn(batches):
        import numpy as np
        import pyarrow.compute as pc
        for b in batches:
            if b.num_rows == 0:
                continue
            tcol = b.column(b.schema.get_field_index(text_col))
            if tcol.null_count:  # explode feed drops NULL token rows
                b = b.filter(pc.is_valid(tcol))
                if b.num_rows == 0:
                    continue
                tcol = b.column(b.schema.get_field_index(text_col))
            g, offsets = _utf8_flat(tcol)
            out = _bincount_partial_batch(b, group_cols, g,
                                          np.diff(offsets))
            if out is not None:
                yield out

    partial = src.mapInArrow(fn, out_schema)
    return partial.groupBy(*group_cols, "tok") \
        .agg(F.sum("cnt").alias("cnt"))


def token_histogram_bincount_floats(df: DataFrame,
                                    group_cols: list[str] | None = None,
                                    emb_col: str = "embedding") -> DataFrame:
    """A1b with P1 quantization FUSED into the bincount: float lists are
    read off the Arrow ListArray's values buffer and quantized in NumPy
    (clip(floor(v*128+128), 0, 255) over float64 — bit-identical to the
    Catalyst _quantize expression: *128 and +128 are exact in float64).

    Replaces the round-5 feed `token_histogram_bincount(transform(
    _quantize))`, which built a full int array per row in Catalyst and
    shipped it through Arrow. Result identical (tests/
    test_histogram_paths.py)."""
    group_cols = group_cols or ["label"]
    src = df.select(*group_cols, emb_col)
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}"
         for f in src.schema.fields if f.name != emb_col]
        + ["tok int", "cnt long"])

    def fn(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        for b in batches:
            if b.num_rows == 0:
                continue
            lst = b.column(b.schema.get_field_index(emb_col))
            if lst.null_count:
                b = b.filter(pc.is_valid(lst))
                if b.num_rows == 0:
                    continue
                lst = b.column(b.schema.get_field_index(emb_col))
            if isinstance(lst, pa.ChunkedArray):
                lst = lst.combine_chunks()
            offs = lst.offsets.to_numpy().astype(np.int64)
            base = offs[0]
            vals = lst.values.to_numpy(zero_copy_only=False)
            v = vals[base:offs[-1]].astype(np.float64)
            g = np.clip(np.floor(v * 128.0 + 128.0), 0.0, 255.0) \
                .astype(np.int64).astype(np.uint8)
            out = _bincount_partial_batch(b, group_cols, g,
                                          np.diff(offs - base))
            if out is not None:
                yield out

    partial = src.mapInArrow(fn, out_schema)
    return partial.groupBy(*group_cols, "tok") \
        .agg(F.sum("cnt").alias("cnt"))


def windowed_histogram(df: DataFrame, window_duration: str = "1 minute",
                       slide: str | None = None,
                       group_cols: list[str] | None = None) -> DataFrame:
    """X1/X2: tumbling (or sliding) event-time window histogram — works
    identically over batch and streaming DataFrames."""
    group_cols = group_cols or ["source"]
    win = (F.window("event_ts", window_duration, slide) if slide
           else F.window("event_ts", window_duration))
    ex = df.select(win.alias("window"), *group_cols,
                   F.explode(mx.bucket_tokens(F.col("tokens"))).alias("tok"))
    return ex.groupBy("window", *group_cols, "tok").agg(F.count("*").alias("cnt"))


def histogram_with_share(hist: DataFrame, group_cols: list[str]) -> DataFrame:
    """W1/W2: rank bins by count within the group and compute coverage share
    (count / total positions) — watermark_detector.py:168-175."""
    w = Window.partitionBy(*group_cols)
    order = Window.partitionBy(*group_cols).orderBy(F.desc("cnt"), F.desc("tok"))
    return (hist
            .withColumn("total", F.sum("cnt").over(w))
            .withColumn("coverage_pct", F.col("cnt") * 100.0 / F.col("total"))
            .withColumn("rank", F.row_number().over(order)))


def dominant_token(df_or_hist: DataFrame, group_cols: list[str] | None = None,
                   from_hist: bool = False) -> DataFrame:
    """A3: per group, the first of the top-10 modes with value in [100,250]
    and coverage in [1%,20%] (watermark_detector.py:172-189). Ties in count
    break toward the higher token value (engine spec, reference_kernels).

    Returns (group..., wm_token, coverage_pct).

    The histogram stage runs through the A1b bincount path (identical
    result to the explode path — asserted in tests/test_histogram_paths.py
    — but the map side does one np.bincount per Arrow batch instead of
    emitting and hash-aggregating n_tok rows per sequence: 2.4x faster on
    the 60k x 2048 bench input and the shape that holds at 10^12 rows).
    Pass a pre-built histogram with from_hist=True to choose the path
    yourself."""
    group_cols = group_cols or ["source"]
    hist = (df_or_hist if from_hist
            else token_histogram_bincount(df_or_hist, group_cols))
    ranked = histogram_with_share(hist, group_cols)
    qual = ranked.where((F.col("rank") <= TOPK_MODES)
                        & mx.qualifies_as_watermark(F.col("tok"),
                                                    F.col("coverage_pct")))
    pick = Window.partitionBy(*group_cols).orderBy("rank")
    return (qual.withColumn("pick", F.row_number().over(pick))
                .where(F.col("pick") == 1)
                .select(*group_cols, F.col("tok").alias("wm_token"),
                        F.col("coverage_pct")))
