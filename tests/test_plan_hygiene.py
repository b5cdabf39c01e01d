"""Plan-shape hygiene: the declarative paths must produce the physical plans
a 100 TB deployment needs — filter pushdown into the parquet scan, column
pruning, broadcast joins for small dims, and partial aggregation before the
shuffle. These lock in the Catalyst behavior SURVEY §4.2 relies on.
"""

import os

import pytest
from pyspark.sql import functions as F

from pdf_watermark_removal_otsu_inpaint_spark.plans.queries import QUERIES

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_point_lookup_pushes_filters(spark):
    """S2: point lookup predicates reach the scan (PushedFilters)."""
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    df = o.where((F.col("o_orderkey") == 42) & (F.col("o_custkey") > 10))
    p = plan_of(df)
    assert "PushedFilters: [" in p
    assert "IsNotNull(o_orderkey)" in p or "EqualTo(o_orderkey,42)" in p


def test_q01_scan_prunes_columns(spark):
    """Column pruning: the q01 scan reads only the 8 needed lineitem columns."""
    p = plan_of(QUERIES["q01_pricing_summary"](spark, SF_DIR))
    # ReadSchema should not mention unused columns
    read = p[p.index("ReadSchema"):].splitlines()[0]
    assert "l_orderkey" not in read and "l_partkey" not in read
    assert "l_quantity" in read and "l_returnflag" in read
    # shipdate predicate is pushed
    assert "PushedFilters: [" in p and "l_shipdate" in p[p.index("PushedFilters"):]


def test_q04_uses_broadcast_joins(spark):
    """J2: tiny dims join via BroadcastHashJoin, no shuffle join."""
    p = plan_of(QUERIES["q04_region_customer_rollup"](spark, SF_DIR))
    assert p.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in p


def test_histogram_has_partial_aggregation(spark):
    """A1: explode path partial-aggregates before the shuffle, so shuffle
    volume is O(groups x 256) regardless of n_tok."""
    from pdf_watermark_removal_otsu_inpaint_spark.operators.histogram import (
        token_histogram)
    from pdf_watermark_removal_otsu_inpaint_spark.sources.sequences import (
        sequences_df)
    df = sequences_df(spark, 20, seed=2)
    p = plan_of(token_histogram(df, ["source"]))
    # two HashAggregates (partial + final) around a single exchange
    assert p.count("HashAggregate") >= 2
    first_agg = p.index("HashAggregate")
    assert "Exchange" in p
    # partial agg appears below (after, in printed tree) the exchange
    assert p.index("Exchange") < p.rindex("HashAggregate")


def test_repair_pipeline_is_shuffle_free(spark):
    """The fused kernel path over a parquet scan adds no Exchange."""
    from pdf_watermark_removal_otsu_inpaint_spark.operators.repair import (
        repair_sequences)
    from pdf_watermark_removal_otsu_inpaint_spark.sources.sequences import (
        sequences_df)
    p = plan_of(repair_sequences(sequences_df(spark, 10)))
    assert "Exchange" not in p
    assert p.count("ArrowEvalPython") == 1


def test_dedup_queries_have_no_all_pairs_join(spark):
    """q21/q31 scale hygiene: every join is a bounded equi-join (MinHash /
    LSH candidate keys) — no cartesian product, no nested-loop join, and no
    join keyed on a raw word column alone (the round-1 hot-key shape)."""
    for name, bnlj_allowed in (("q21_jaccard_pairs", 2),
                               ("q31_cosine_near_dups", 0)):
        p = plan_of(QUERIES[name](spark, SF_DIR))
        assert "CartesianProduct" not in p, name
        # q21 keeps nested-loop joins ONLY for the broadcast crossJoin
        # against the 8-row minhash params dim (constant-size build side —
        # scale-safe); it appears twice because the signature subplan is
        # instantiated on both sides of the candidate self-join
        assert p.count("BroadcastNestedLoopJoin") <= bnlj_allowed, name
    # q31's candidate join is keyed on the LSH band/bit columns
    p31 = plan_of(QUERIES["q31_cosine_near_dups"](spark, SF_DIR))
    assert "band" in p31 and "k1" in p31 and "k2" in p31
    # q21's word join is keyed on (candidate pair, word), i.e. the join that
    # touches `word` also carries a doc-pair key (b_id/doc_id equality)
    p21 = plan_of(QUERIES["q21_jaccard_pairs"](spark, SF_DIR))
    assert "mh" in p21  # minhash candidate join present


def test_semi_and_anti_join_plans(spark):
    p5 = plan_of(QUERIES["q05_customer_order_activity"](spark, SF_DIR))
    assert "LeftSemi" in p5
    assert "LeftAnti" in p5


def test_map_only_training_ops_are_shuffle_free(spark):
    """q25 minhash signatures and q23 quality scoring are pure maps — no
    hash/range Exchange from the query logic. Since round 6 the map-only
    paths may carry ONE round-robin scan-parallelism bootstrap exchange
    (queries._ensure_parallelism): the driver's single-row-group parquet
    files yield a one-task scan, so the CPU-dense kernel would otherwise
    run on one core. The bootstrap is conditional — identity whenever the
    scan already has >= cores splits (the 100 TB case), asserted below."""
    for name in ("q25_minhash_signatures", "q23_doc_quality",
                 "q27_simhash"):
        p = plan_of(QUERIES[name](spark, SF_DIR))
        assert "hashpartitioning" not in p, name
        assert "rangepartitioning" not in p, name
        n_ex = p.count("Exchange")
        assert n_ex <= 1, name
        if n_ex:
            assert "RoundRobinPartitioning" in p, name


def test_parallelism_bootstrap_is_conditional(spark):
    """_ensure_parallelism is the identity (no Exchange) when the input
    already has >= the session's core count of partitions — the shape a
    real many-file/many-row-group table produces — and repartitions up
    to the core count otherwise."""
    from pdf_watermark_removal_otsu_inpaint_spark.plans.queries import (
        _ensure_parallelism)
    cores = spark.sparkContext.defaultParallelism
    wide = spark.range(0, 1000, numPartitions=cores + 2)
    assert _ensure_parallelism(wide, spark) is wide
    narrow = spark.range(0, 1000, numPartitions=1)
    boosted = _ensure_parallelism(narrow, spark)
    assert boosted.rdd.getNumPartitions() == cores
    assert "RoundRobinPartitioning" in plan_of(boosted)


def test_bucketed_join_is_colocated(spark):
    """Two tables bucketed+sorted on (doc_id, seq_no) join with NO Exchange
    and NO Sort — the co-located join strategy for the repeated
    masks ⋈ sequences join at 100 TB."""
    from pdf_watermark_removal_otsu_inpaint_spark.operators.repair import (
        detect_masks)
    from pdf_watermark_removal_otsu_inpaint_spark.sources.sequences import (
        sequences_df)
    from pdf_watermark_removal_otsu_inpaint_spark.sources.tables import (
        write_sequences_bucketed)
    import shutil as _sh
    wh = spark.conf.get("spark.sql.warehouse.dir").replace("file:", "")
    for tbl in ("seq_b", "masks_b"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        _sh.rmtree(f"{wh}/{tbl}", ignore_errors=True)
    df = sequences_df(spark, 30, seed=21)
    write_sequences_bucketed(df, "seq_b", buckets=4)
    write_sequences_bucketed(
        detect_masks(df).select("doc_id", "seq_no", "mask", "wm_token"),
        "masks_b", buckets=4)
    # force the shuffle-join path (tiny test tables would broadcast and the
    # planner disables bucketing) so the plan shows what a 100 TB join does
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("seq_b").join(spark.table("masks_b"),
                                           ["doc_id", "seq_no"])
        p = plan_of(joined)
        assert "Exchange" not in p
        assert "SortMergeJoin" in p
        assert joined.count() == 30
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE seq_b")
        spark.sql("DROP TABLE masks_b")


def test_aqe_splits_hot_doc_partition(spark):
    """X9's second half (north_star: 'AQE-style split of hot doc_id
    partitions'): a heavy-hitter doc_id holding 90% of the fact side is
    SPLIT by adaptive skew-join — the final plan shows
    SortMergeJoin(skew=true) over a skewed AQEShuffleRead — with results
    identical to the unskewed computation. Thresholds are lowered to make
    the 20k-row fixture skew-eligible; the payload column must survive
    into the aggregate or column pruning erases the skew bytes (the exact
    trap a naive count(*) probe falls into)."""
    from pyspark.sql import functions as F
    keys = ("spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    prev = {k: spark.conf.get(k) for k in keys}
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "64KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    try:
        pay = F.repeat(F.sha2(F.col("id").cast("string"), 256), 4)
        seq = spark.range(0, 20000).select(
            F.when(F.col("id") % 10 < 9, F.lit("doc-hot"))
             .otherwise(F.concat(F.lit("doc"), F.col("id")))
             .alias("doc_id"),
            F.col("id").alias("seq_no"), pay.alias("payload"))
        dim = spark.range(0, 2001).select(
            F.when(F.col("id") == 2000, F.lit("doc-hot"))
             .otherwise(F.concat(F.lit("doc"), F.col("id")))
             .alias("doc_id"),
            F.lit(1).alias("meta"))
        agg = (seq.join(dim, "doc_id")
               .groupBy().agg(F.count("*").alias("n"),
                              F.sum(F.length("payload")).alias("bytes")))
        row = agg.collect()[0]
        # 18000 hot + 200 matched cold rows; byte sum pins value parity
        assert row.n == 18200
        assert row.bytes == 18200 * 256
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin(skew=true)" in plan
        assert "skewed" in plan  # AQEShuffleRead ... skewed
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
