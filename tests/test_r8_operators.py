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


# --------------------------------------------- difference-in-differences
def test_diff_in_diff_cancels_level_and_trend(spark):
    """A synthetic 2x2 with a group level gap (+10), a shared trend
    (+5), and a planted treatment effect (+3): DiD must recover exactly
    the +3 (in micro units), which neither the raw post-period gap nor
    the treated pre/post delta equals."""
    import datetime as dt

    from audience_manager_platform_spark.functions import stable_long_hash

    # find user ids landing in each hash arm (the operator's own split)
    probe = spark.range(200).select(
        F.col("id").alias("user_id"),
        (
            stable_long_hash(F.col("id").cast("string"), salt="ab-v1") % 2
        ).alias("arm"),
    )
    arms = {r["user_id"]: r["arm"] for r in probe.collect()}
    ctrl = [u for u, a in arms.items() if a == 0][:5]
    treat = [u for u, a in arms.items() if a == 1][:5]
    pre, post = dt.datetime(2025, 1, 1), dt.datetime(2025, 1, 31)
    rows = []
    for u in ctrl:
        rows += [(u, 10.0, pre), (u, 15.0, post)]          # base + trend
    for u in treat:
        rows += [(u, 20.0, pre), (u, 28.0, post)]          # +10 level, +3 effect
    df = spark.createDataFrame(
        rows, "user_id long, value double, ts timestamp"
    )
    out = __import__(
        "audience_manager_platform_spark.operators.analytics",
        fromlist=["diff_in_diff"],
    ).diff_in_diff(df).collect()[0]
    assert out["n_c_pre"] == 5 and out["n_t_post"] == 5
    assert out["did_micro"] == 3 * 1_000_000
    # sanity: naive comparisons are confounded
    assert out["treat_post_micro"] - out["ctrl_post_micro"] != 3 * 1_000_000
    assert out["treat_post_micro"] - out["treat_pre_micro"] != 3 * 1_000_000


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


def test_margin_exact_scoring_kernel_is_stage_visible(spark, sf_dir):
    """The r7 audit blind spot stays closed: the exact margin miner's
    scoring pass lives in a materialized stage and the recorder
    surfaces it (this is what lets tools/audit_plans.py enforce the
    declared list). Since the r10 rewrite the scoring stage is the
    Arrow top-k kernel (B shipped whole — the same broadcast posture as
    the former cross join), so the audit must see the Python eval node
    where it used to see the CartesianProduct."""
    emb = _emb(spark, sf_dir)
    consumer, stages = _collect_stage_plans(
        lambda: S.margin_mutual_knn(emb)
    )
    joined = "\n".join(stages)
    assert (
        "MapInPandas" in joined or "ArrowEvalPython" in joined
    ), "scoring kernel stage must be visible to the audit"


# ------------------------------------------------------ wave 42: CUPED
def test_cuped_theta_recovers_exact_linear_relation(spark):
    """y = 2x exactly (no treatment effect): theta must be exactly
    2.0 on the ppm grid, and the adjusted arm means must close most of
    the raw gap that x-imbalance between the arms fakes."""
    import datetime as dt

    pre, post = dt.datetime(2025, 1, 1), dt.datetime(2025, 1, 31)
    rows = []
    for u in range(200):
        x = float(u % 37 + 1)
        rows.append((u, x, pre))
        rows.append((u, 2.0 * x, post))
    df = spark.createDataFrame(
        rows, "user_id long, value double, ts timestamp"
    )
    from audience_manager_platform_spark.operators.analytics import (
        cuped_adjustment,
    )

    out = {r["arm"]: r for r in cuped_adjustment(df).collect()}
    # integer grand means truncate, so theta sits within one ppm of 2.0
    assert abs(out[0]["theta_ppm"] - 2_000_000) <= 1
    raw_gap = abs(out[1]["mean_post_micro"] - out[0]["mean_post_micro"])
    adj_gap = abs(out[1]["mean_cuped_micro"] - out[0]["mean_cuped_micro"])
    # no true effect exists, so whatever raw gap the hash split shows is
    # pure x-imbalance — CUPED with the exact theta must remove it
    # (up to integer-truncation crumbs)
    assert adj_gap <= max(raw_gap // 100, 2)


def test_sprt_crosses_h1_on_high_conversion_stream(spark):
    """20% purchase share (well above H1's 12%): the cumulative LLR must
    cross the accept-H1 threshold and stay there; the LLR itself must
    equal the closed form in exact 1e-9 units."""
    import datetime as dt

    from audience_manager_platform_spark.operators.analytics import (
        SPRT_LLR_NEG_E9,
        SPRT_LLR_POS_E9,
        sprt_monitor,
    )

    rows = []
    for day in range(10):
        ts = dt.datetime(2025, 2, 1 + day)
        for i in range(50):
            et = "purchase" if i % 5 == 0 else "view"
            rows.append((day * 50 + i, et, ts))
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out = sprt_monitor(df).collect()
    last = out[-1]
    assert last["cum_n"] == 500 and last["cum_k"] == 100
    assert last["llr_e9"] == (
        100 * SPRT_LLR_POS_E9 + 400 * SPRT_LLR_NEG_E9
    )
    verdicts = [r["verdict"] for r in out]
    assert verdicts[-1] == "accept_h1"
    # monotone under a constant above-H1 rate: once accepted, stays
    first_accept = verdicts.index("accept_h1")
    assert all(v == "accept_h1" for v in verdicts[first_accept:])


def test_qini_deciles_partition_users_and_reconcile(spark, sf_dir):
    from audience_manager_platform_spark.operators.analytics import (
        qini_uplift_deciles,
    )

    events = load_table(spark, sf_dir, "events")
    rows = qini_uplift_deciles(events).collect()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    n_users = (
        events.filter(F.col("user_id").isNotNull())
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r["n_t"] + r["n_c"] for r in rows) == n_users
    # the last cumulative point is the overall treated-minus-control gap
    tot_nt = sum(r["n_t"] for r in rows)
    tot_nc = sum(r["n_c"] for r in rows)
    tot_kt = sum(r["k_t"] for r in rows)
    tot_kc = sum(r["k_c"] for r in rows)
    expect = tot_kt * 1_000_000 // tot_nt - tot_kc * 1_000_000 // tot_nc
    assert rows[-1]["cum_qini_ppm"] == expect


def test_cms_heavy_change_exact_in_collision_free_regime(spark):
    """Fewer distinct keys than sketch buckets => no collisions => the
    estimated deltas must equal the exact per-key deltas."""
    import datetime as dt

    from audience_manager_platform_spark.operators.skew import (
        cms_heavy_change,
    )

    pre, post = dt.datetime(2025, 3, 1), dt.datetime(2025, 3, 30)
    rows = []
    for k, (a, b) in {1: (5, 20), 2: (10, 10), 3: (7, 1)}.items():
        rows += [(k, pre)] * a + [(k, post)] * b
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {r["user_id"]: r for r in cms_heavy_change(
        df, "user_id", "ts", [1, 2, 3]
    ).collect()}
    assert out[1]["est_delta"] == out[1]["true_delta"] == 15
    assert out[2]["est_delta"] == out[2]["true_delta"] == 0
    assert out[3]["est_delta"] == out[3]["true_delta"] == -6
    assert out[1]["est_pre"] == 5 and out[1]["est_post"] == 20


# ------------------------------------------------------ wave 43
def test_personalized_pagerank_mass_stays_in_seed_component(spark):
    """Path 1-2-3-4-5 plus a DISCONNECTED edge 10-11, seed {1}: the
    defining PPR property — teleport returns to the seed, so the
    disconnected component gets EXACTLY zero rank (uniform PageRank
    would pay it teleport mass every iteration), the seed holds the
    max, every reachable node holds some, and total mass stays ~1."""
    from audience_manager_platform_spark.operators.graph import (
        personalized_pagerank,
    )

    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)]
    edges = spark.createDataFrame(
        [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs],
        "src long, dst long",
    )
    ranks = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(edges, [1], iters=4).collect()
    }
    assert ranks[10] == 0.0 and ranks[11] == 0.0
    assert ranks[1] == max(ranks.values())
    assert all(ranks[n] > 0.0 for n in (2, 3, 4, 5))
    assert abs(sum(ranks.values()) - 1.0) < 1e-3


def test_fd_audit_separates_keys_from_fanout(spark):
    from audience_manager_platform_spark.operators.validation import fd_audit

    df = spark.createDataFrame(
        [(1, 10, "x"), (2, 20, "x"), (3, 30, "y"), (4, 30, "z")],
        "pk long, fk long, attr string",
    )
    out = {
        (r["determinant"], r["dependent"]): r
        for r in fd_audit(df, [("pk", "fk"), ("fk", "attr")]).collect()
    }
    holds = out[("pk", "fk")]
    assert holds["verdict"] == "holds" and holds["n_violating"] == 0
    viol = out[("fk", "attr")]
    # fk=30 maps to {'y','z'} — exactly one violating determinant value
    assert viol["verdict"] == "violated"
    assert viol["n_violating"] == 1 and viol["max_dep_ndv"] == 2


def test_jsonl_corrupt_audit_quarantines_planted_lines(spark, sf_dir):
    from audience_manager_platform_spark.sources.jsonl import (
        jsonl_corrupt_audit,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = {r["lang"]: r for r in jsonl_corrupt_audit(spark, docs).collect()}
    n_bad = docs.filter(F.col("doc_id") % 97 == 0).count()
    assert out["_corrupt"]["n_rows"] == n_bad
    assert out["_corrupt"]["total_chars"] is None
    good = docs.filter(F.col("doc_id") % 97 != 0)
    by_lang = {
        r["lang"]: r["n"]
        for r in good.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, n in by_lang.items():
        assert out[lang]["n_rows"] == n
    assert sum(r["n_rows"] for r in out.values()) == docs.count()


# ------------------------------------------------------ wave 44
def test_phrase_search_requires_adjacency(spark):
    from audience_manager_platform_spark.operators.text import phrase_search

    docs = spark.createDataFrame(
        [
            (1, "big data small data big data"),   # 2 matches of "big data"
            (2, "big red data"),                    # not adjacent
            (3, "data big"),                        # wrong order
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["n_matches"] for r in phrase_search(
        docs, ["big", "data"]
    ).collect()}
    assert out == {1: 2}


def test_schema_contract_audit_all_four_verdicts(spark):
    from audience_manager_platform_spark.operators.validation import (
        schema_contract_audit,
    )

    df = spark.createDataFrame([(1, "a", 2.0)], "id long, name string, x double")
    out = {r["column"]: r["status"] for r in schema_contract_audit(
        df, [("id", "bigint"), ("name", "int"), ("ghost", "string")]
    ).collect()}
    assert out == {
        "id": "ok",
        "name": "type_mismatch",
        "ghost": "missing",
        "x": "unexpected",
    }


def test_subject_access_report_zero_rows_still_reported(spark):
    from audience_manager_platform_spark.operators.validation import (
        subject_access_report,
    )

    a = spark.createDataFrame([(1, "x"), (1, "y"), (7, "z")], "uid long, v string")
    b = spark.createDataFrame([(42, "q")], "cust long, v string")
    rows = subject_access_report(
        [("a", a, "uid"), ("b", b, "cust")], [1, 7, 42, 99]
    ).collect()
    got = {(r["user_id"], r["table_name"]): r["n_rows"] for r in rows}
    assert got[(1, "a")] == 2 and got[(7, "a")] == 1 and got[(42, "b")] == 1
    assert got[(99, "a")] == 0 and got[(99, "b")] == 0
    assert len(rows) == 8  # full spine: every (subject, table) pair
