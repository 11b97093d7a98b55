"""Round-10 hardening: the hot-shard escalation inside the sharded
global-rank helper, its NULL-value contract, and the clustered-bucket
recursion in exact percentiles. Reference semantics stay plain ANSI
ROW_NUMBER / cumulative SUM / PERCENTILE_CONT (cited at reference
backend/app/core/aggregates.py for the rank-consuming ops); these tests
pin that every escalation level is BIT-IDENTICAL to the unpartitioned
window it replaces while provably splitting the work."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from audience_manager_platform_spark.operators.partitioning import (
    global_row_positions,
)


def _sym_diff_empty(a, b):
    return a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_hot_shard_escalation_constant_value_splits_and_is_exact(spark):
    # THE pathological case from the r9 verdict: everyone spends the same
    # amount, so every row lands in one width-bucket shard. The second
    # level must re-shard by the tiebreak surrogate — common-prefix
    # string ids, the worst case for a fixed-prefix surrogate.
    df = spark.range(256).select(
        F.lit(9.99).alias("v"),
        F.format_string("user_%06d", F.col("id")).alias("k"),
    )
    got = global_row_positions(
        df, "v", ["k"], hot_shard_rows=16, n_sub=8, keep_cells=True
    )
    cells = got.groupBy("_shard", "_sub").count().collect()
    assert max(r["count"] for r in cells) < 256, "no split happened"
    assert len(cells) >= 4
    w = Window.orderBy(F.asc("v"), F.asc("k"))
    exp = df.select(
        "v", "k", F.row_number().over(w).cast("long").alias("_gpos")
    )
    assert _sym_diff_empty(got.select("v", "k", "_gpos"), exp)


def test_hot_shard_escalation_numeric_tiebreak_and_running_sum(spark):
    # constant value + NUMERIC tiebreak + descending + running sum: the
    # surrogate takes the cast-double path and _gsum must still be the
    # exact inclusive running sum in the global order
    df = spark.range(200).select(
        F.lit(5.0).alias("v"),
        F.col("id").alias("k"),
        (F.col("id") % 9 + 1).alias("x"),
    )
    got = global_row_positions(
        df,
        "v",
        ["k"],
        descending=True,
        running_sum_col="x",
        hot_shard_rows=20,
        n_sub=8,
        keep_cells=True,
    )
    cells = got.groupBy("_shard", "_sub").count().collect()
    assert max(r["count"] for r in cells) < 200
    w = Window.orderBy(F.desc("v"), F.asc("k"))
    exp = df.select(
        "v",
        "k",
        F.row_number().over(w).cast("long").alias("_gpos"),
        F.sum("x")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("_gsum"),
    )
    assert _sym_diff_empty(got.select("v", "k", "_gpos", "_gsum"), exp)


def test_hot_shard_escalation_value_spread_rebuckets_on_value(spark):
    # a hot shard whose values DO spread re-buckets on the value itself
    # (shard-local bounds), not the tiebreak
    df = spark.range(300).select(
        (F.col("id") % 50).cast("double").alias("v"),
        F.col("id").alias("k"),
    )
    got = global_row_positions(
        df, "v", ["k"], n_parts=1, hot_shard_rows=30, n_sub=8, keep_cells=True
    )
    cells = got.groupBy("_shard", "_sub").count().collect()
    assert max(r["count"] for r in cells) < 300
    w = Window.orderBy(F.asc("v"), F.asc("k"))
    exp = df.select(
        "v", "k", F.row_number().over(w).cast("long").alias("_gpos")
    )
    assert _sym_diff_empty(got.select("v", "k", "_gpos"), exp)


def test_null_values_keep_spark_null_order_and_are_never_dropped(spark):
    # r9 ADVICE (medium): NULL value rows used to fall out of the shard
    # join, shifting every other position. They must survive and take
    # Spark's null placement: FIRST under ASC, LAST under DESC.
    df = spark.range(40).select(
        F.when(F.col("id") % 5 == 0, None)
        .otherwise(F.col("id").cast("double"))
        .alias("v"),
        F.col("id").alias("k"),
    )
    for desc in (False, True):
        got = global_row_positions(df, "v", ["k"], descending=desc)
        assert got.count() == 40, "rows were dropped"
        order = F.desc("v") if desc else F.asc("v")
        w = Window.orderBy(order, F.asc("k"))
        exp = df.select(
            "v", "k", F.row_number().over(w).cast("long").alias("_gpos")
        )
        assert _sym_diff_empty(got.select("v", "k", "_gpos"), exp)


def test_null_values_inside_hot_shard(spark):
    # nulls mixed into a hot constant-value shard: pinned to the boundary
    # sub-shard, positions still exact under Spark's null placement
    df = spark.range(120).select(
        F.when(F.col("id") % 4 == 0, None).otherwise(F.lit(7.5)).alias("v"),
        F.col("id").alias("k"),
    )
    got = global_row_positions(
        df, "v", ["k"], hot_shard_rows=10, n_sub=4, keep_cells=True
    )
    assert got.count() == 120
    w = Window.orderBy(F.asc("v"), F.asc("k"))
    exp = df.select(
        "v", "k", F.row_number().over(w).cast("long").alias("_gpos")
    )
    assert _sym_diff_empty(got.select("v", "k", "_gpos"), exp)


def test_all_null_value_hot_shard_splits_by_tiebreak(spark):
    # every value NULL: the whole table is one null-shard; the tiebreak
    # surrogate must still split it
    df = spark.range(100).select(
        F.lit(None).cast("double").alias("v"),
        F.format_string("id_%04d", F.col("id")).alias("k"),
    )
    got = global_row_positions(
        df, "v", ["k"], hot_shard_rows=10, n_sub=8, keep_cells=True
    )
    cells = got.groupBy("_shard", "_sub").count().collect()
    assert max(r["count"] for r in cells) < 100
    ks = [r["k"] for r in got.orderBy("_gpos").select("k").collect()]
    assert ks == sorted(ks)


def test_non_numeric_shuffle_partitions_conf_falls_back():
    # r9 ADVICE (low): some managed platforms set
    # spark.sql.shuffle.partitions to "auto" (vanilla Spark rejects the
    # set, so the stub emulates the platform conf getter); the helper
    # must fall back instead of crashing on int()
    from audience_manager_platform_spark.operators.partitioning import (
        _default_n_parts,
    )

    class _Conf:
        def __init__(self, v):
            self._v = v

        def get(self, key, default=None):
            return self._v

    class _S:
        def __init__(self, v):
            self.conf = _Conf(v)

    assert _default_n_parts(_S("auto")) == 32
    assert _default_n_parts(_S("64")) == 64


# ------------------- exact percentiles: clustered-bucket recursion --------


def _pct_ref(vals, grp_col):
    return vals.groupBy(grp_col).agg(
        F.round(F.expr("percentile(v, 0.25)"), 4).alias("p25"),
        F.round(F.expr("percentile(v, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(v, 0.75)"), 4).alias("p75"),
    )


def test_exact_percentiles_99pct_one_value_resolves_without_sorting(spark):
    from audience_manager_platform_spark.registry.tpch_extra import (
        exact_group_percentiles,
    )

    # 99% of group A at exactly 42.0, 1% spread: the clustered bucket must
    # recurse, the constant sub-run must resolve DRIVER-SIDE, and pass B
    # must never sort the clustered mass
    n = 3000
    df = spark.range(n).select(
        F.lit("A").alias("g"),
        F.when(F.col("id") % 100 == 0, F.col("id").cast("double"))
        .otherwise(F.lit(42.0))
        .alias("v"),
    )
    debug = {}
    got = exact_group_percentiles(
        spark, df, "g", oversize_min_rows=0, debug=debug
    )
    assert debug["oversized"], "clustered bucket was not escalated"
    assert debug["resolved_driver_side"] >= 1
    assert debug["pass_b_rows_bound"] < n * 0.5, (
        "pass B would still sort the clustered mass"
    )
    assert _sym_diff_empty(got, _pct_ref(df, "g"))


def test_exact_percentiles_all_constant_group(spark):
    from audience_manager_platform_spark.registry.tpch_extra import (
        exact_group_percentiles,
    )

    df = spark.range(500).select(
        F.lit("C").alias("g"), F.lit(7.25).alias("v")
    )
    debug = {}
    got = exact_group_percentiles(
        spark, df, "g", oversize_min_rows=0, debug=debug
    )
    # every endpoint (lo and hi per pct when the rank is fractional) is
    # driver-known
    assert debug["resolved_driver_side"] in (3, 6)
    assert debug["pass_b_rows_bound"] == 0
    rows = got.collect()
    assert rows[0]["p25"] == rows[0]["p50"] == rows[0]["p75"] == 7.25


def test_exact_percentiles_unchanged_on_spread_data(spark):
    from audience_manager_platform_spark.registry.tpch_extra import (
        exact_group_percentiles,
    )

    # well-spread data must take the ORIGINAL (non-recursive) path and
    # match ANSI percentile exactly, group by group
    df = spark.range(2000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") * 37 % 997).cast("double").alias("v"),
    )
    debug = {}
    got = exact_group_percentiles(spark, df, "g", debug=debug)
    assert debug["oversized"] == []
    assert _sym_diff_empty(got, _pct_ref(df, "g"))


# ----------------------- graph-ANN: auto-sized build + param contract -----


def test_graph_auto_n_clusters_formula():
    from audience_manager_platform_spark.operators.similarity import (
        KMEANS_K,
        graph_auto_n_clusters,
    )

    # fixture-sized corpora keep the historical K (and hashes)
    assert graph_auto_n_clusters(2_000) == KMEANS_K
    assert graph_auto_n_clusters(0) == KMEANS_K
    # at scale the cell count grows linearly: cell size stays ~200
    assert graph_auto_n_clusters(100_000) == 500
    assert graph_auto_n_clusters(10_000_000) == 50_000


def test_graph_beam_topk_validates_steps_and_k(spark):
    import pytest

    from audience_manager_platform_spark.operators import similarity as S
    from audience_manager_platform_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    with pytest.raises(ValueError, match="steps"):
        S.graph_beam_topk(emb, [0], steps=0)
    with pytest.raises(ValueError, match="beam"):
        S.graph_beam_topk(emb, [0], k=20, beam=8)


def test_graph_beam_superstep_rows_stay_bounded(spark):
    from audience_manager_platform_spark.operators import similarity as S
    from audience_manager_platform_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    model = S.kmeans_fit_model(emb, S.KMEANS_K, 1)
    rows: list[int] = []
    qids = [0, 1, 2]
    out = S.graph_beam_topk(
        emb, qids, k=5, model=model, superstep_rows=rows
    ).collect()
    assert len(rows) == S.GRAPH_STEPS
    assert out  # search still returns results with instrumentation on
    # sound per-step bound uses the measured max symmetrized degree
    edges = S.graph_knn_edges(emb, model=model)
    max_deg = edges.groupBy("src").count().agg(F.max("count")).collect()[0][0]
    bound = len(qids) * S.GRAPH_BEAM * (max_deg + 1)
    assert all(r <= bound for r in rows), (rows, bound)
