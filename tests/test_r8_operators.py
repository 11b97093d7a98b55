"""Round-8 operators: IVF-gated margin mining, salted aggregate wired to
the salt plan, per-group reservoir, ROLLUP grouping sets, and the
stage-plan guarantees the r8 audit upgrade pins (single decode pass,
materialize() stage scanning)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from audience_manager_platform_spark.operators import corpus as C
from audience_manager_platform_spark.operators import similarity as S
from audience_manager_platform_spark.operators import skew as SK
from audience_manager_platform_spark.operators.analytics import (
    grouping_sets_rollup,
)
from audience_manager_platform_spark.operators import partitioning
from audience_manager_platform_spark.sources import load_table


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


# ------------------------------------------------ IVF-gated margin kNN
def test_margin_ivf_equals_exact_when_probing_all_cells(spark, sf_dir):
    """Probing every cell makes the candidate set the full bipartite
    product, so the gated miner must reproduce the exact miner row for
    row — the gating is the ONLY approximation."""
    emb = _emb(spark, sf_dir)
    model = S.kmeans_fit_model(emb, S.KMEANS_K, 1)
    exact = S.margin_mutual_knn(emb).toPandas()
    gated = S.margin_mutual_knn_ivf(
        emb, n_probes=S.KMEANS_K, iters=1, model=model
    ).toPandas()
    assert len(exact) > 0
    assert exact.values.tolist() == gated.values.tolist()


def test_margin_ivf_candidates_are_subset_and_recall_bounded(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    model = S.kmeans_fit_model(emb, S.KMEANS_K, 1)
    row = S.margin_recall_eval(emb, iters=1, model=model).collect()[0]
    assert row["n_common"] <= min(row["n_exact_pairs"], row["n_ivf_pairs"])
    assert 0.0 <= row["pair_recall"] <= 1.0
    # the fixture mines a non-trivial number of pairs and the gate keeps
    # a usable share of them (4/16 probes scans ~25% of cell space)
    assert row["n_exact_pairs"] > 0 and row["pair_recall"] > 0.3


# ------------------------------------------------ salted agg by plan
def test_salted_agg_matches_plain_aggregate_with_planted_hot_key(spark):
    rows = [("hot", float(i % 7), i) for i in range(5000)] + [
        ("cold", 1.5, 10_000),
        ("cold", 2.5, 10_001),
    ]
    df = spark.createDataFrame(rows, "k string, value double, rid long")
    out = SK.salted_agg_by_plan(
        df, "k", "value", "rid", target_rows=1000
    ).collect()
    by_key = {r["k"]: r for r in out}
    plain = {
        r["k"]: r
        for r in df.groupBy("k")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")).alias(
                "cents"
            ),
        )
        .collect()
    }
    for k in ("hot", "cold"):
        assert by_key[k]["n_rows"] == plain[k]["n"]
        assert by_key[k]["total_cents"] == plain[k]["cents"]
    # the hot key was split (ceil(5000/1000) = 5), the cold one was not
    assert by_key["hot"]["salt_factor"] == 5
    assert by_key["cold"]["salt_factor"] == 1


def test_salted_agg_first_stage_splits_hot_key(spark):
    """The wiring proof: stage-1 groups for the hot key actually spread
    across salt subkeys (each under ~target_rows), so no single reduce
    task sees the whole key."""
    rows = [("hot", 1.0, i) for i in range(5000)]
    df = spark.createDataFrame(rows, "k string, value double, rid long")
    plan = SK.salt_plan(df, "k", target_rows=1000).select(
        F.col("key").alias("_k"), "salt_factor"
    )
    staged = (
        df.select(F.col("k").alias("_k"), F.col("rid").alias("_rk"))
        .join(F.broadcast(plan), "_k", "left")
        .select(
            "_k",
            F.pmod(
                F.xxhash64("_rk"), F.coalesce("salt_factor", F.lit(1))
            ).alias("_salt"),
        )
    )
    sizes = [
        r["n"]
        for r in staged.groupBy("_k", "_salt")
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    assert len(sizes) == 5  # ceil(5000/1000) subkeys materialized
    assert max(sizes) < 2 * 1000  # hash split keeps each near budget


# ------------------------------------------------ per-group reservoir
def test_reservoir_per_group_exact_n_deterministic_and_growth_stable(
    spark, sf_dir
):
    docs = load_table(spark, sf_dir, "documents")
    out = C.reservoir_per_group(docs, "source", "doc_id", n=3).toPandas()
    counts = out.groupby("source").size()
    assert (counts == 3).all()
    assert set(out["pick_rank"]) == {1, 2, 3}
    # deterministic: a second run picks the identical rows
    again = C.reservoir_per_group(docs, "source", "doc_id", n=3).toPandas()
    assert out.values.tolist() == again.values.tolist()
    # growth-stable: adding rows never evicts a *better-ranked* pick —
    # the n=2 sample is exactly the first two ranks of the n=3 sample
    two = C.reservoir_per_group(docs, "source", "doc_id", n=2).toPandas()
    assert (
        two.values.tolist()
        == out[out["pick_rank"] <= 2].reset_index(drop=True).values.tolist()
    )


# ------------------------------------------------ ROLLUP grouping sets
def test_grouping_sets_rollup_subtotals_are_consistent(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    rows = grouping_sets_rollup(orders).collect()
    cells = [r for r in rows if r["g_status"] == 0 and r["g_priority"] == 0]
    subtotals = {
        r["status"]: r
        for r in rows
        if r["g_status"] == 0 and r["g_priority"] == 1
    }
    grand = [r for r in rows if r["g_status"] == 1 and r["g_priority"] == 1]
    assert len(grand) == 1
    assert grand[0]["n_orders"] == orders.count()
    # every status subtotal equals the sum of its cells
    for status, sub in subtotals.items():
        mine = [r for r in cells if r["status"] == status]
        assert sub["n_orders"] == sum(r["n_orders"] for r in mine)
        assert sub["total_cents"] == sum(r["total_cents"] for r in mine)
    assert grand[0]["total_cents"] == sum(r["total_cents"] for r in cells)


# --------------------------------------------- stage-plan pins (r8 audit)
def _collect_stage_plans(fn):
    partitioning.STAGE_PLAN_RECORDER = []
    try:
        df = fn()
        consumer = df._jdf.queryExecution().executedPlan().toString()
        stages = list(partitioning.STAGE_PLAN_RECORDER)
    finally:
        partitioning.STAGE_PLAN_RECORDER = None
    return consumer, stages


def _has_arrow(plan: str) -> bool:
    return any(
        m in plan
        for m in (
            "ArrowEvalPython",
            "MapInPandas",
            "FlatMapGroupsInPandas",
            "FlatMapCoGroupsInPandas",
        )
    )


def test_phash_neardup_decodes_each_image_exactly_once(spark, sf_dir):
    """The r7 perf fix pinned: the decode+DCT kernel runs in exactly ONE
    materialized stage; the banded self-join consumer reads the
    materialized fingerprint table (zero Arrow markers), so neither join
    branch re-decodes."""
    from audience_manager_platform_spark import registry

    fn = registry.queries()["multimodal_phash_neardup"]
    consumer, stages = _collect_stage_plans(lambda: fn(spark, sf_dir))
    assert not _has_arrow(consumer), "consumer plan re-runs the decode"
    arrow_stages = [p for p in stages if _has_arrow(p)]
    assert len(arrow_stages) == 1, (
        f"expected exactly one decode stage, saw {len(arrow_stages)} "
        f"of {len(stages)} stages"
    )


def test_margin_exact_cross_join_is_stage_visible(spark, sf_dir):
    """The r7 audit blind spot stays closed: the exact margin miner's
    cross join lives in a materialized stage and the recorder surfaces
    it (this is what lets tools/audit_plans.py enforce the declared
    list)."""
    emb = _emb(spark, sf_dir)
    consumer, stages = _collect_stage_plans(
        lambda: S.margin_mutual_knn(emb)
    )
    joined = "\n".join(stages)
    assert (
        "CartesianProduct" in joined or "BroadcastNestedLoopJoin" in joined
    ), "scoring stage's cross join must be visible to the audit"
