"""Round-9 scale fixes: the sharded global-rank helper and the
closed-form exact ntile must be BIT-IDENTICAL to the unpartitioned
Spark windows they replace (reference semantics: plain ANSI
ROW_NUMBER/NTILE/cumulative-SUM; cited at
reference backend/app/core/aggregates.py for the rank-consuming ops)."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from audience_manager_platform_spark.operators.partitioning import (
    exact_ntile_expr,
    global_row_positions,
)


def _sym_diff_empty(a, b):
    return a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_global_row_positions_matches_global_window(spark):
    df = spark.range(999).select(
        (F.col("id") * 37 % 101).alias("v"), F.col("id").alias("k")
    )
    got = global_row_positions(df, "v", ["k"]).select("v", "k", "_gpos")
    w = Window.orderBy(F.asc("v"), F.asc("k"))
    exp = df.select(
        "v", "k", F.row_number().over(w).cast("long").alias("_gpos")
    )
    assert _sym_diff_empty(got, exp)


def test_global_row_positions_desc_with_running_sum(spark):
    df = spark.range(500).select(
        (F.col("id") * 13 % 47).alias("v"),
        F.col("id").alias("k"),
        (F.col("id") % 7 + 1).alias("x"),
    )
    got = global_row_positions(
        df, "v", ["k"], descending=True, running_sum_col="x"
    ).select("v", "k", "_gpos", "_gsum")
    w = Window.orderBy(F.desc("v"), F.asc("k"))
    exp = df.select(
        "v",
        "k",
        F.row_number().over(w).cast("long").alias("_gpos"),
        F.sum("x")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("_gsum"),
    )
    assert _sym_diff_empty(got, exp)


def test_global_row_positions_constant_value_column(spark):
    # all values equal -> every row lands in shard 0; positions must
    # still be the exact 1..n under the tiebreak order
    df = spark.range(64).select(F.lit(5).alias("v"), F.col("id").alias("k"))
    got = (
        global_row_positions(df, "v", ["k"])
        .orderBy("_gpos")
        .select("k")
        .collect()
    )
    assert [r["k"] for r in got] == list(range(64))


def test_exact_ntile_matches_spark_ntile(spark):
    # n spanning < k, == k, off-by-one and non-divisible cases
    for n in (1, 3, 9, 10, 11, 25, 101):
        for k in (3, 10):
            df = spark.range(n).select(F.col("id").alias("pos1"))
            w = Window.orderBy("pos1")
            both = (
                df.withColumn("pos", F.row_number().over(w))
                .withColumn("n", F.lit(n))
                .select(
                    F.ntile(k).over(w).alias("want"),
                    exact_ntile_expr("pos", "n", k).alias("got"),
                )
            )
            bad = both.filter(F.col("want") != F.col("got")).count()
            assert bad == 0, f"ntile mismatch at n={n}, k={k}"


def _emb001(spark):
    from audience_manager_platform_spark.sources import load_table

    return load_table(spark, "/root/testdata/sf0.001", "embeddings")


def test_graph_knn_edges_symmetric_and_bounded(spark):
    from audience_manager_platform_spark.operators import similarity as S

    emb = _emb001(spark)
    model = S.kmeans_fit_model(emb, S.KMEANS_K, 1)
    edges = S.graph_knn_edges(emb, model=model)
    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    assert edges.exceptAll(rev).count() == 0  # symmetrized by build
    # a node FORWARD-links to at most m neighbors; back-links can exceed
    # that on hub nodes (in-degree is the choosing side's decision), so
    # the sound bound is the largest cell: degree < |home cell|
    from audience_manager_platform_spark.sources import load_table  # noqa: F401

    assigned = S.assign_cells_arrow(
        emb.select("vec_id", S._vec_double().alias("v")), model
    )
    max_cell = (
        assigned.groupBy("cent_id").count().agg(F.max("count")).collect()[0][0]
    )
    deg = edges.groupBy("src").count().agg(F.max("count")).collect()[0][0]
    assert deg < max_cell
    assert deg >= S.GRAPH_M  # forward links survived the union


def test_graph_beam_recall_floor(spark):
    """The 2-step NSW beam must recover most exact top-5 neighbors on
    the fixture (measured 0.8-1.0 per query at build time; the floor
    leaves headroom for fixture regeneration, not for regressions)."""
    from audience_manager_platform_spark.operators import similarity as S

    emb = _emb001(spark)
    model = S.kmeans_fit_model(emb, S.KMEANS_K, 1)
    rows = S.graph_beam_recall_eval(
        emb, [0, 1, 2, 3, 4], k=5, model=model
    ).collect()
    recalls = [r["recall_at_k"] for r in rows]
    assert len(recalls) == 5
    assert min(recalls) >= 0.6
    assert sum(recalls) / len(recalls) >= 0.7


# ------------------------------ wave 47: feature-scoring audits ----------
from datetime import datetime

_EVENTS_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, ts, uid, et, val, "{}") for i, (ts, uid, et, val) in enumerate(rows)],
        _EVENTS_SCHEMA,
    )


def _planted_feature_events(spark):
    # 20-day span (midpoint day 10). Users 1-10: pre-period mostly
    # "click", and ALL convert post. Users 11-20: pre-period mostly
    # "view", none convert. So feature=click must get positive WOE,
    # feature=view negative, and a large chi2.
    rows = []
    for u in range(1, 11):
        rows += [(datetime(2024, 1, d), u, "click", 1.0) for d in (2, 3, 4)]
        rows += [(datetime(2024, 1, 15), u, "purchase", 10.0)]
    for u in range(11, 21):
        rows += [(datetime(2024, 1, d), u, "view", 1.0) for d in (2, 3, 4)]
        rows += [(datetime(2024, 1, 15), u, "click", 0.0)]
    return _ev(spark, rows)


def test_woe_iv_signs_on_planted_separation(spark):
    from audience_manager_platform_spark.operators.analytics import (
        woe_iv_feature,
    )

    got = {
        r["feature"]: r
        for r in woe_iv_feature(_planted_feature_events(spark)).collect()
    }
    assert got["click"]["n_good"] == 10 and got["click"]["n_bad"] == 0
    assert got["view"]["n_good"] == 0 and got["view"]["n_bad"] == 10
    assert got["click"]["woe"] > 0 > got["view"]["woe"]
    # IV contributions are non-negative by construction ((dg-db), WOE
    # always share a sign)
    assert all(r["iv_contrib"] >= 0 for r in got.values())


def test_chi2_nonnegative_and_large_on_planted_separation(spark):
    from audience_manager_platform_spark.operators.analytics import (
        chi2_feature_conversion,
    )

    rows = chi2_feature_conversion(_planted_feature_events(spark)).collect()
    assert all(r["chi2_contrib"] >= 0 for r in rows)
    # perfect separation on 20 users: total chi2 == n == 20
    assert abs(sum(r["chi2_contrib"] for r in rows) - 20.0) < 1e-6


def test_ab_smd_hash_split_is_balanced(spark):
    from audience_manager_platform_spark.operators.analytics import (
        ab_smd_balance,
    )

    # identical spend distribution for every user: a hash split MUST be
    # perfectly balanced (smd == 0 since all per-user sums are equal)
    rows = []
    for u in range(1, 41):
        rows += [(datetime(2024, 1, 2), u, "purchase", 25.0)]
        rows += [(datetime(2024, 1, 15), u, "view", 0.0)]
    got = ab_smd_balance(_ev(spark, rows)).collect()[0]
    assert got["n_t"] + got["n_c"] == 40
    assert got["smd"] == 0.0 and bool(got["balanced"])


# -------------------------- wave 48: multi-arm experiment statistics ------
import hashlib


def _arm_of(uid: int, k: int, salt: str = "ab-v1") -> int:
    return int(hashlib.md5(f"{salt}{uid}".encode()).hexdigest()[:15], 16) % k


def _arm_events(spark, n_users=60):
    # 20-day span (midpoint day 10): every user gets one pre event and one
    # post "purchase" whose value depends on the user id, so per-arm
    # groups have real spread and a hand-computed reference is exact
    rows = []
    for u in range(1, n_users + 1):
        rows += [(datetime(2024, 1, 2), u, "view", 0.0)]
        rows += [(datetime(2024, 1, 15), u, "purchase", float(u % 7) * 3.0)]
    return _ev(spark, rows), {
        u: int(round(float(u % 7) * 3.0 * 100)) for u in range(1, n_users + 1)
    }


def test_anova_matches_pure_python_reference(spark):
    from audience_manager_platform_spark.operators.analytics import (
        anova_oneway_arms,
    )

    ev, y_of = _arm_events(spark)
    arms = {}
    for u, y in y_of.items():
        arms.setdefault(_arm_of(u, 4), []).append(y)
    n = sum(len(v) for v in arms.values())
    s = sum(sum(v) for v in arms.values())
    q = sum(y * y for v in arms.values() for y in v)
    sum_sa2 = sum(sum(v) ** 2 / len(v) for v in arms.values())
    k = len(arms)
    ssb = sum_sa2 - s * s / n
    ssw = q - sum_sa2
    want = round((ssb / (k - 1)) / (ssw / (n - k)), 6)
    got = anova_oneway_arms(ev).collect()
    assert {r["arm"] for r in got} == set(arms)
    for r in got:
        assert r["n_users"] == len(arms[r["arm"]])
        assert abs(r["f_stat"] - want) < 1e-6


def test_kruskal_wallis_matches_pure_python_reference(spark):
    from audience_manager_platform_spark.operators.analytics import (
        kruskal_wallis_arms,
    )

    ev, y_of = _arm_events(spark)
    ys = sorted(y_of.values())
    # midranks with ties
    midrank = {}
    pos = 0
    for v in sorted(set(ys)):
        c = ys.count(v)
        midrank[v] = pos + (c + 1) / 2.0
        pos += c
    arms = {}
    for u, y in y_of.items():
        arms.setdefault(_arm_of(u, 4), []).append(midrank[y])
    n = len(ys)
    sum_ra2 = sum(sum(v) ** 2 / len(v) for v in arms.values())
    tie3 = sum(ys.count(v) ** 3 - ys.count(v) for v in set(ys))
    h = (12.0 / (n * (n + 1)) * sum_ra2 - 3 * (n + 1)) / (
        1 - tie3 / (n**3 - n)
    )
    want = round(h, 6)
    got = kruskal_wallis_arms(ev).collect()
    for r in got:
        assert abs(r["h_stat"] - want) < 1e-6
        assert abs(
            r["mean_rank"]
            - round(sum(arms[r["arm"]]) / len(arms[r["arm"]]), 6)
        ) < 1e-6
