"""Physical-plan audits: the scale properties the operators claim
(pushdown, pruning, broadcast, no Python in the relational row path) are
asserted on the actual Catalyst output, not taken on faith."""

import contextlib
import io

import pytest

import __spark_entry__ as e


def _plan(df, mode="formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def queries():
    return e.queries()


def test_rule_filter_pushed_to_parquet_scan(spark, sf_dir, queries):
    """rule_amount_gt filters on amount (alias of events.value): the
    predicate must reach the parquet scan as a pushed filter."""
    plan = _plan(queries["rule_amount_gt"](spark, sf_dir))
    assert "PushedFilters" in plan
    assert "GreaterThan(value,120" in plan.replace(" ", "")


def test_rule_scan_prunes_unused_columns(spark, sf_dir, queries):
    """rule_amount_gt never touches props/ts/event_type — the scan's
    ReadSchema must not include them (Catalyst column pruning, S3)."""
    plan = _plan(queries["rule_amount_gt"](spark, sf_dir))
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema, plan
    line = read_schema[0]
    assert "props" not in line and "event_type" not in line
    assert "value" in line and "user_id" in line


def test_q5_dimension_joins_broadcast(spark, sf_dir, queries):
    plan = _plan(queries["tpch_q5_local_supplier"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3


def test_q1_codegen_and_shipdate_pushdown(spark, sf_dir, queries):
    plan = _plan(queries["tpch_q1_pricing_summary"](spark, sf_dir))
    assert "LessThanOrEqual(l_shipdate" in plan
    # spark 4 formatted mode doesn't tag codegen stages, and under AQE the
    # un-executed plan reports no compiled subtrees yet — audit the
    # static plan with AQE off
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        codegen = _plan(queries["tpch_q1_pricing_summary"](spark, sf_dir), "codegen")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "WholeStageCodegen subtrees" in codegen
    assert "Found 0 WholeStageCodegen" not in codegen


def test_no_python_in_relational_paths(spark, sf_dir, queries):
    """No row-at-a-time Python (BatchEvalPython) anywhere; Arrow-batched
    Python (ArrowEvalPython) only in the operators that declare it
    (LSH bucket generation)."""
    for name in (
        "rule_mixed",
        "analytics_trailing_rollups",
        "tpch_q3_shipping_priority",
        "dedup_minhash_lsh_pairs",
        "window_topn_per_group",
        # r5 additions: positional-gram span dedup and the LSH recall
        # eval are pure built-ins end to end
        "dedup_duplicate_spans",
        "dedup_recall_eval",
    ):
        plan = _plan(queries[name](spark, sf_dir), "simple")
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
    ann = _plan(queries["ann_lsh_near_pairs"](spark, sf_dir), "simple")
    assert "BatchEvalPython" not in ann
    # the final plan reads the bucket table back from the materialized
    # parquet (the Arrow matmul ran once, inside the materialization job),
    # so the declared vectorized escape hatch is asserted on the
    # pre-materialization bucket plan instead
    from audience_manager_platform_spark.operators import similarity as S
    from audience_manager_platform_spark.sources import load_table
    from pyspark.sql import functions as F

    base = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", S._vec_double().alias("v")
    )
    bucket_plan = _plan(S._bucketed(base), "simple")
    assert "ArrowEvalPython" in bucket_plan
    assert "BatchEvalPython" not in bucket_plan


def test_semi_join_physical(spark, sf_dir, queries):
    plan = _plan(queries["join_semi"](spark, sf_dir), "simple")
    assert "LeftSemi" in plan
    plan = _plan(queries["join_anti"](spark, sf_dir), "simple")
    assert "LeftAnti" in plan


def test_one_shuffle_for_segment_aggregate(spark, sf_dir, queries):
    """The core segment query needs exactly ONE shuffle (on user_id):
    partial aggregation map-side, final after the exchange."""
    plan = _plan(queries["rule_amount_gt"](spark, sf_dir), "simple")
    assert plan.count("Exchange hashpartitioning(user_id") == 1
    assert "partial" in plan  # map-side combine present


def test_q6_filters_pushed_to_scan(spark, sf_dir, queries):
    """Q6 is the pushdown showcase: shipdate bounds and quantity bound
    must all reach the parquet scan."""
    plan = _plan(queries["tpch_q6_forecast_revenue"](spark, sf_dir))
    flat = plan.replace(" ", "")
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(l_shipdate" in flat
    assert "LessThan(l_quantity,24" in flat


def test_q11_scalar_subquery_broadcast_not_nested_loop(spark, sf_dir, queries):
    """The 1-row global aggregate joins via broadcast; there must be no
    shuffled cartesian product."""
    plan = _plan(queries["tpch_q11_important_parts"](spark, sf_dir), "simple")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_q17_per_part_threshold_aqe_owns_the_strategy(spark, sf_dir, queries):
    """Q17's decorrelated per-part aggregate is keyed by partkey — a
    data-sized side at warehouse scale, so it must NOT be statically
    broadcast (a hint would OOM the driver at 100 TB). The static plan
    keys both sides on the part key and leaves strategy to AQE, which
    upgrades to broadcast at runtime when the aggregate side is actually
    small (as it is at fixture scale)."""
    df = queries["tpch_q17_small_quantity_revenue"](spark, sf_dir)
    static = _plan(df, "simple")
    assert "AdaptiveSparkPlan" in static
    df.collect()  # let AQE finalize with real runtime sizes
    final = _plan(df, "simple")
    assert "isFinalPlan=true" in final
    assert "BroadcastHashJoin" in final


def test_q22_anti_join_physical(spark, sf_dir, queries):
    plan = _plan(queries["tpch_q22_idle_customers"](spark, sf_dir), "simple")
    assert "LeftAnti" in plan


def test_trailing_rollups_single_fact_shuffle_no_explosion(spark, sf_dir, queries):
    """The rewritten rollup must shuffle the fact table exactly once
    (user_id, category) and never multiply rows per window: no Expand and
    no Generate before the first aggregate (the explode happens after the
    tiny per-user aggregate)."""
    plan = _plan(queries["analytics_trailing_rollups"](spark, sf_dir), "simple")
    assert plan.count("Exchange hashpartitioning(user_id") == 2  # fact + tiny
    assert "Expand" not in plan
    # the only Generate (explode) runs above the per-user aggregate:
    # everything below the first exchange is scan+project+partial-agg
    first_exchange = plan.index("Exchange hashpartitioning(user_id")
    assert "Generate" not in plan[first_exchange:]


def test_tfidf_broadcasts_stats_no_python(spark, sf_dir, queries):
    """TF-IDF joins document frequencies and corpus size as broadcasts
    (tiny vs the (doc,term) table) and stays JVM-side end to end."""
    plan = _plan(queries["text_tfidf_top_terms"](spark, sf_dir), "simple")
    assert plan.count("BroadcastHashJoin") >= 1
    assert "BroadcastNestedLoopJoin" in plan or plan.count("BroadcastHashJoin") >= 2
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_funnel_single_shuffle(spark, sf_dir, queries):
    """The funnel computes all stages from ONE per-user aggregate — no
    per-stage self-joins of the fact table."""
    plan = _plan(queries["analytics_funnel_stages"](spark, sf_dir), "simple")
    assert plan.count("Exchange hashpartitioning(user_id") == 1
    assert "Join" not in plan


def test_corpus_operators_leave_no_cached_rdds(spark, sf_dir, queries):
    """VERDICT r1 finding 5: dedup/ANN intermediates must not stay pinned
    in the block manager after the action — a long-lived engine session
    running repeated sweeps would otherwise accumulate cached partitions
    until eviction. The self-join reuse these operators need comes from
    Catalyst exchange reuse, not persist()."""
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    for name in (
        "dedup_minhash_lsh_pairs",
        "dedup_ngram_jaccard",
        "dedup_ngram_jaccard_capped",
        "ann_lsh_near_pairs",
        "dedup_embedding_near_dup",
        "text_tfidf_top_terms",
    ):
        queries[name](spark, sf_dir).count()
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == before


def test_minhash_exchange_reused_across_branches(spark, sf_dir, queries):
    """Without persist(), the signature aggregate's shuffle must be
    computed once and re-read by the banding + both pair-join branches.
    Audited on the static plan with AQE off — under AQE the same reuse
    happens through the runtime stage cache but isn't tagged in
    explain()."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = queries["dedup_minhash_lsh_pairs"](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "ReusedExchange" in plan


def test_minhash_lsh_driver_path_has_hot_band_guard(spark, sf_dir, queries):
    """VERDICT r3 #1: the driver-visible LSH query must run the capped
    plan — the band-count pre-aggregation (groupBy band_key → band_n ≤
    cap) has to appear between banding and the candidate self-join, else
    a boilerplate mega-cluster emits k²/2 candidates from one task."""
    df = queries["dedup_minhash_lsh_pairs"](spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "band_n" in plan, "hot-band cap aggregation missing from plan"


def test_q15_single_fact_scan(spark, sf_dir, queries):
    """Q15 must touch lineitem exactly ONCE: the per-supplier rollup is
    a materialized stage (one fact scan inside it), and the consumer
    plan — max broadcast + join back — reads only the stage table, so a
    second aggregation branch can never sneak a second fact scan in."""
    from audience_manager_platform_spark.operators import partitioning

    partitioning.STAGE_PLAN_RECORDER = []
    try:
        plan = _plan(queries["tpch_q15_top_suppliers"](spark, sf_dir), "simple")
        stages = list(partitioning.STAGE_PLAN_RECORDER)
    finally:
        partitioning.STAGE_PLAN_RECORDER = None
    assert plan.count("lineitem.parquet") == 0  # consumer reads the stage
    assert sum(s.count("lineitem.parquet") for s in stages) == 1


def test_cohort_retention_no_second_fact_scan(spark, sf_dir, queries):
    """Cohort assignment is derived from the distinct (user, week) pass —
    the events fixture is scanned exactly once."""
    plan = _plan(queries["analytics_cohort_retention"](spark, sf_dir), "simple")
    assert plan.count("FileScan parquet") == 1


def test_aqe_splits_skewed_join(spark):
    """The session enables AQE skew-join handling; verify the final
    adaptive plan actually marks the skewed side on a planted 1000:1 hot
    key (this is the runtime answer to hot-key joins the salted
    aggregation covers for groupBys)."""
    from pyspark.sql import functions as F

    # hot key 0 on ONE side only (half of `big`); `other` carries each key
    # once, so the join output stays linear while partition 0 is ~1000x
    # the median
    big = spark.range(200_000).select(
        F.when(F.col("id") % 2 == 0, F.lit(0)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    other = spark.range(50_000).select(
        F.col("id").alias("k"), F.col("id").alias("p2")
    )
    conf = spark.conf
    saved = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": conf.get(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256MB"
        ),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": conf.get(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB"
        ),
        "spark.sql.autoBroadcastJoinThreshold": conf.get(
            "spark.sql.autoBroadcastJoinThreshold", "10MB"
        ),
    }
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force shuffle join
    try:
        joined = big.join(other, "k")
        # execute THIS DataFrame's plan (count() would build a separate
        # aggregated plan and leave joined's adaptive plan unfinalized)
        assert len(joined.collect()) > 0
        final = _plan(joined, "simple")
        assert "isFinalPlan=true" in final
        assert "skew=true" in final, final[:2000]
    finally:
        for k, v in saved.items():
            conf.set(k, v)


def test_pq_adc_single_wide_op(spark, sf_dir, queries):
    """ADC scoring is a narrow map over the encoded codes; the ONLY data
    exchange in the final query is the per-query top-k window."""
    import re

    df = queries["ann_pq_adc_topk"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    data_exchanges = re.findall(r"Exchange hashpartitioning", plan)
    assert len(data_exchanges) == 1, plan[:2000]


def test_kmeans_assignment_is_shuffle_free(spark, sf_dir):
    """The literal-folded assignment map must introduce NO exchange: scan
    -> project(s) only. (The mean update's exchange lives in a separate
    job inside kmeans_fit_model.)"""
    from audience_manager_platform_spark.operators import similarity as S
    from audience_manager_platform_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", S._vec_double().alias("v"))
    model = [
        (int(r["vec_id"]), [float(x) for x in r["v"]])
        for r in base.filter("vec_id < 16").collect()
    ]
    plan = (
        S._assign_inline(base, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    # the two-stage structure survived optimization (greatest over the
    # per-centroid struct columns, not one inlined mega-expression)
    assert "greatest(_s" in plan


def test_ts_resample_two_data_exchanges_grid_broadcast(spark, sf_dir, queries):
    """LOCF resample: (user, day) compaction + per-user window are the
    only data exchanges; the user x day grid join must be broadcast."""
    import re

    df = queries["ts_resample_locf"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 2, plan[:2000]
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_incremental_refresh_broadcasts_changed_days(spark, sf_dir, queries):
    """The churned-day set must ride broadcast joins (semi for the
    recompute, anti for the carry-over) — never a shuffled join against
    the base table."""
    df = queries["rollup_incremental_refresh"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi, BuildRight" in plan
    assert "LeftAnti, BuildRight" in plan


def test_lsh_verify_parallelism_respread(spark, sf_dir, queries):
    """Regression pin for the AQE byte-coalescing fix: the candidate
    id-pair table must be re-spread (keyed repartition on id_a) before
    the 64-dim cosine verify, or the heavy per-row compute runs on the
    1-2 partitions AQE's byte heuristic leaves behind."""
    plan = _plan(queries["ann_lsh_near_pairs"](spark, sf_dir), "simple")
    assert "hashpartitioning(id_a" in plan, plan[:2000]


def test_duplicate_spans_plan_shape(spark, sf_dir, queries):
    """The span-dedup plan must contain no cartesian product and no
    Python eval: candidate restriction is the hash-keyed semi join
    (distinct build side), islands are windows."""
    plan = _plan(queries["dedup_duplicate_spans"](spark, sf_dir), "simple")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "LeftSemi" in plan  # duplicated-gram restriction


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """Co-located layout: orders and customer bucketed on the customer
    key join WITHOUT any Exchange (bucket i pairs with bucket i), and a
    groupBy on the bucket key also runs shuffle-free. Broadcast is
    disabled so the shuffle-free sort-merge join is what's proven, not
    a broadcast fallback."""
    from pyspark.sql import functions as F

    from audience_manager_platform_spark.operators.partitioning import (
        write_bucketed,
    )
    from audience_manager_platform_spark.sources import load_table

    write_bucketed(
        load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey"),
        "t_orders_bkt",
        ["o_custkey"],
        n_buckets=8,
    )
    write_bucketed(
        load_table(spark, sf_dir, "customer").select("c_custkey", "c_name"),
        "t_customer_bkt",
        ["c_custkey"],
        n_buckets=8,
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("t_orders_bkt").join(
            spark.table("t_customer_bkt"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = _plan(joined, "simple")
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        agg = (
            spark.table("t_orders_bkt")
            .groupBy("o_custkey")
            .agg(F.count("*").alias("n"))
        )
        agg_plan = _plan(agg, "simple")
        assert "Exchange" not in agg_plan, agg_plan
        # and the result is right (join actually pairs the buckets)
        n = joined.count()
        assert n == spark.table("t_orders_bkt").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_orders_bkt")
        spark.sql("DROP TABLE IF EXISTS t_customer_bkt")


def test_runtime_bloom_filter_injects_on_selective_dim_join(spark, sf_dir):
    """100 TB posture pin: a selective dim-side filter propagates to the
    FACT scan as an injected runtime bloom filter (Catalyst's
    InjectRuntimeFilter — `might_contain` guarding the probe side), so a
    shuffle join reads only plausibly-matching fact rows. The default
    trigger thresholds are sized for real deployments (10 GB application
    side), far above the fixtures, so this proof lowers them; production
    plans get the same injection for free with no code change."""
    from pyspark.sql import functions as F

    from audience_manager_platform_spark.sources import load_table

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold":
            "100MB",
    }
    old = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, sf_dir, "lineitem")
        part = load_table(spark, sf_dir, "part").filter(
            F.col("p_brand") == "Brand#12"
        )
        j = li.join(part, li["l_partkey"] == part["p_partkey"]).groupBy(
            "p_brand"
        ).count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, "runtime bloom filter not injected"
        # and the filtered join still computes the right answer
        rows = j.collect()
        assert len(rows) <= 1
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join_at_runtime(spark):
    """100 TB posture pin: the engine leans on AQE's OptimizeSkewedJoin
    for skewed JOIN keys (the salted-join operator covers the corner
    AQE can't split — see skew.py; the salted-AGGREGATE measurement
    showed map-side combine already handles aggregation skew). A
    90%-hot key through a shuffle join must come out as
    SortMergeJoin(skew=true) with a skewed AQEShuffleRead — the
    trigger thresholds are deployment-sized, so the fixture-scale proof
    lowers them; production plans get the split for free."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    old = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(2_000_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0))
            .otherwise(F.col("id") % 97 + 1)
            .alias("k"),
            F.col("id").alias("payload"),
        )
        right = spark.range(200).select(
            (F.col("id") % 98).alias("k"), F.col("id").alias("r")
        )
        j = left.join(right, "k").agg(F.count("*").alias("n"))
        n = j.collect()[0]["n"]
        assert n > 0
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, "AQE did not split the skewed join"
        assert "skewed" in plan  # AQEShuffleRead coalesced and skewed
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
