"""A1 vs A1b: the explode+partial-agg histogram and the bincount-vector
mapInPandas histogram must produce identical results — same groups, same
bins, same counts — on real tables and synthetic sequences."""

from pyspark.sql import functions as F

from pdf_watermark_removal_otsu_inpaint_spark.operators.histogram import (
    token_histogram, token_histogram_bincount)
from pdf_watermark_removal_otsu_inpaint_spark.sources.sequences import (
    sequences_df)


def _as_dict(rows, keys):
    return {tuple(getattr(r, k) for k in keys) + (r.tok,): r.cnt
            for r in rows}


def test_bincount_path_matches_explode_path(spark):
    df = sequences_df(spark, 120, seed=21)
    a = _as_dict(token_histogram(df, ["source"]).collect(), ["source"])
    b = _as_dict(token_histogram_bincount(df, ["source"]).collect(),
                 ["source"])
    assert a == b and len(a) > 0


def test_bincount_path_multi_group_cols(spark):
    df = sequences_df(spark, 80, seed=22)
    keys = ["source", "doc_id"]
    a = _as_dict(token_histogram(df, keys).collect(), keys)
    b = _as_dict(token_histogram_bincount(df, keys).collect(), keys)
    assert a == b and len(a) > 0


def test_q29_dominant_token_same_via_both_histogram_paths(spark):
    """The q29 flagship chain (A1 -> A2 -> A3) yields identical dominant
    tokens whether the grouped histogram comes from the explode path or the
    A1b bincount path."""
    from pdf_watermark_removal_otsu_inpaint_spark.operators.histogram import (
        dominant_token)
    from pdf_watermark_removal_otsu_inpaint_spark.plans.queries import (
        _char_tokens)
    df = _char_tokens(spark, "/root/testdata/sf0.001")
    # dominant_token's DEFAULT path is now bincount-backed, so the explode
    # side must be fed explicitly via from_hist (otherwise this test would
    # compare bincount against itself)
    hist_a = token_histogram(df, ["source"])
    a = {(r.source): (r.wm_token, round(r.coverage_pct, 9))
         for r in dominant_token(hist_a, ["source"],
                                 from_hist=True).collect()}
    b = {(r.source): (r.wm_token, round(r.coverage_pct, 9))
         for r in dominant_token(df, ["source"]).collect()}
    assert a == b and len(a) > 0


def test_bincount_path_handles_empty_and_negative_tokens(spark):
    import datetime as dt
    rows = [("d0", [], 0, "web", dt.datetime(2026, 1, 1), 0),
            ("dn", None, 0, "web", dt.datetime(2026, 1, 1), 2),
            ("d1", [-1, -256, 255, 256, 300], 5, "web",
             dt.datetime(2026, 1, 1), 1)]
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string, "
              "event_ts timestamp, seq_no long")
    a = _as_dict(token_histogram(df, ["source"]).collect(), ["source"])
    b = _as_dict(token_histogram_bincount(df, ["source"]).collect(),
                 ["source"])
    # pmod semantics for negatives: -1 -> 255, -256 -> 0, 256 -> 0, 300 -> 44
    assert a == b == {("web", 255): 2, ("web", 0): 2, ("web", 44): 1}
