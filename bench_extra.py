#!/usr/bin/env python
"""Round-6 optimization harness: per-query noop-sink isolation (guide §1.4)
and .explain("formatted") capture, kept OUT of the frozen bench.py.

Usage:
  python bench_extra.py plans <outdir> [query ...]  # dump formatted plans
  python bench_extra.py time  [query ...]           # noop timings (median/min)
  python bench_extra.py duck  <query ...>           # DuckDB oracle cross-check

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS,
BENCH_EXTRA_TRIALS (default 5). Sessions mirror bench.py exactly
(get_spark("bench", cpus, TOKEN_CONF)) so numbers are comparable.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
TRIALS = int(os.environ.get("BENCH_EXTRA_TRIALS", "5"))
TOKEN_CONF = {"spark.sql.files.maxPartitionBytes": "8m"}  # == bench.py

HEADLINE = [
    "q01_pricing_summary", "q03_revenue_by_nation",
    "q07_order_share_per_customer", "q08_events_hourly",
    "q10_sessionize_events", "q11_token_histogram", "q13_dominant_token",
    "q24_cosine_topk", "q25_minhash_signatures", "q29_dominant_char_token",
    "q30_otsu_per_source", "q40_repair_char_tokens",
]


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _spark():
    from pdf_watermark_removal_otsu_inpaint_spark.session import get_spark
    return get_spark("bench-extra", cpus=CPUS, extra_conf=TOKEN_CONF)


def _plans(outdir: str, names: list[str]) -> None:
    from pdf_watermark_removal_otsu_inpaint_spark.plans.queries import QUERIES
    spark = _spark()
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        p = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(p)
        print(f"wrote {outdir}/{name}.txt")
    spark.stop()


def _time(names: list[str]) -> None:
    from pdf_watermark_removal_otsu_inpaint_spark.plans.queries import QUERIES
    spark = _spark()
    plans = {n: QUERIES[n](spark, SF_DIR) for n in names}
    for n in names:                 # warmup pass (workers + codegen)
        spark.sparkContext.setJobDescription(f"warmup {n}")
        _noop(plans[n])
    out = {}
    for _ in range(TRIALS):         # interleaved rounds, like run_headline
        for n in names:
            spark.sparkContext.setJobDescription(f"trial {n}")
            t0 = time.perf_counter()
            _noop(plans[n])
            out.setdefault(n, []).append(time.perf_counter() - t0)
    res = {n: {"median": round(statistics.median(ts), 3),
               "min": round(min(ts), 3),
               "trials": [round(t, 3) for t in ts]}
           for n, ts in out.items()}
    res["_total_median"] = round(sum(v["median"] for v in res.values()), 3)
    res["_sf_dir"] = SF_DIR
    print(json.dumps(res, indent=1))
    spark.stop()


def _duck(names: list[str]) -> None:
    """Row-level oracle check at $SPARK_GRAFT_SF_DIR (the parity test runs
    at sf0.01; this lets a restructure be proven at the bench SF too)."""
    import duckdb

    from pdf_watermark_removal_otsu_inpaint_spark.plans.queries import (
        ORACLES, QUERIES)
    spark = _spark()
    con = duckdb.connect()
    for tbl in ("region nation customer supplier part orders lineitem "
                "events documents embeddings").split():
        con.execute(f"CREATE VIEW {tbl} AS "
                    f"SELECT * FROM '{SF_DIR}/{tbl}.parquet'")
    ok = True
    for name in names:
        sdf = QUERIES[name](spark, SF_DIR)
        srows = sorted([tuple(_n(v) for v in r) for r in sdf.collect()])
        orows = sorted([tuple(_n(v) for v in r)
                        for r in con.execute(ORACLES[name]).fetchall()])
        match = srows == orows
        ok &= match
        print(f"{name}: rows {len(srows)} vs {len(orows)} "
              f"{'MATCH' if match else 'MISMATCH'}")
        if not match:
            diff = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
            print("  first diffs:", diff)
    spark.stop()
    sys.exit(0 if ok else 1)


def _n(v):
    if isinstance(v, float):
        return f"{v:.6f}"
    return v


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "time"
    if cmd == "plans":
        _plans(sys.argv[2], sys.argv[3:] or HEADLINE)
    elif cmd == "time":
        _time(sys.argv[2:] or HEADLINE)
    elif cmd == "duck":
        _duck(sys.argv[2:] or HEADLINE)
    else:
        raise SystemExit(f"unknown command {cmd}")
