"""Extended relational surface: pivot/unpivot, cube/rollup, as-of join,
range join (SURVEY.md §7.2 step 7 — "general operator surface beyond the
reference's literal code").

The as-of and range joins are the two shapes Spark lacks natively; both
are implemented as compositions of built-ins with one shuffle (the
union-window trick / broadcast non-equi join), per the preference order in
§7.3 — no Pandas fallback needed.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pivot_counts(
    df: DataFrame, row_key, pivot_col: str, values: Sequence[str]
) -> DataFrame:
    """Pivot with an EXPLICIT value list: without it Spark runs an extra
    distinct pass over the data to discover columns — at 100 TB that is a
    full scan before the real one. Missing cells zero-filled."""
    out = df.groupBy(row_key).pivot(pivot_col, list(values)).count()
    return out.select(
        out.columns[0],
        *[F.coalesce(F.col(v), F.lit(0)).alias(v) for v in values],
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_vals: Sequence[str],
) -> DataFrame:
    """As-of join: for every left row, the latest right row with
    ``right_ts <= left_ts`` (per key). Spark has no native ASOF; the
    scalable composition is the union-window trick:

      tag sides → union on (key, ts) → per-key time-ordered window →
      ``last(value, ignorenulls)`` carries the most recent right values
      forward → keep left rows.

    ONE shuffle on the key (vs. a per-row correlated subquery, or
    ``merge_asof`` in per-group Pandas which forces Python). Ties
    (right_ts == left_ts) sort the right row first → inclusive semantics,
    matching DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts``."""
    # left_ts already travels as _ts and is renamed back on the way out —
    # keeping it in lcols too would emit a DUPLICATE column of that name
    # (ambiguous for any downstream select of left_ts; latent until a
    # caller actually selected it)
    lcols = [c for c in left.columns if c not in (on, left_ts)]
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_vals],
    )
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"_r_{c}") for c in right_vals],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l.unionByName(r).select(
        "_k",
        "_ts",
        "_side",
        *lcols,
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_vals
        ],
    )
    return (
        filled.filter(F.col("_side") == 1)
        .drop("_side")
        .withColumnRenamed("_k", on)
        .withColumnRenamed("_ts", left_ts)
    )


def range_join_bands(
    df: DataFrame, value_col: str, bands: Sequence[tuple[str, float, float]]
) -> DataFrame:
    """Non-equi join of a fact column into literal value bands
    [lo, hi). The band table is tiny → broadcast nested-loop join, which
    is exactly right; for a LARGE range side, bucketize both sides to an
    equi-join key first (documented scale path)."""
    spark = df.sparkSession
    band_df = spark.createDataFrame(
        [(name, float(lo), float(hi)) for name, lo, hi in bands],
        "band string, lo double, hi double",
    )
    return (
        df.join(
            F.broadcast(band_df),
            (F.col(value_col) >= F.col("lo")) & (F.col(value_col) < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(value_col), 2).alias("total"),
        )
    )


# ------------------------------------------------- basket co-occurrence
def basket_brand_pairs(
    lineitem: DataFrame, part: DataFrame, k: int = 25
) -> DataFrame:
    """Market-basket co-occurrence: per unordered brand pair, in how many
    orders both brands appear — the association signal behind
    bought-together recommenders, on the TPC-H schema.

    Shape: broadcast-join the (small) part dim onto lineitem, reduce to
    DISTINCT (order, brand) so multi-line orders don't overcount, then
    self-join keyed on the ORDER key — the basket — with brand_a <
    brand_b, and aggregate pair counts. The order-keyed self-join is the
    scale path: cost is Σ basket_size², never |lineitem|², and baskets
    are bounded (TPC-H ≤ 7 lines). Top-k carries the usual total order
    (count DESC, pair ASC). The distinct basket table feeds both join
    sides — materialized once (4.0 s → 1.4 s at sf0.1; exchange reuse
    does not cross the aliased branches)."""
    from .partitioning import materialize

    ob = materialize(
        lineitem.select("l_orderkey", "l_partkey")
        .join(F.broadcast(part.select("p_partkey", "p_brand")),
              F.col("l_partkey") == F.col("p_partkey"))
        .select("l_orderkey", F.col("p_brand").alias("brand"))
        .distinct()
    )
    pairs = (
        ob.alias("x")
        .join(ob.alias("y"), "l_orderkey")
        .filter(F.col("x.brand") < F.col("y.brand"))
        .select(
            F.col("x.brand").alias("brand_a"), F.col("y.brand").alias("brand_b")
        )
    )
    return (
        pairs.groupBy("brand_a", "brand_b")
        .agg(F.count("*").alias("n_orders"))
        .orderBy(F.desc("n_orders"), F.asc("brand_a"), F.asc("brand_b"))
        .limit(k)
    )


def basket_brand_pairs_sql(
    lineitem: str = "lineitem", part: str = "part", k: int = 25
) -> str:
    return f"""
        WITH ob AS (
          SELECT DISTINCT l_orderkey, p_brand AS brand
          FROM {lineitem} JOIN {part} ON l_partkey = p_partkey
        )
        SELECT x.brand AS brand_a, y.brand AS brand_b,
               COUNT(*) AS n_orders
        FROM ob x JOIN ob y
          ON x.l_orderkey = y.l_orderkey AND x.brand < y.brand
        GROUP BY 1, 2
        ORDER BY n_orders DESC, brand_a ASC, brand_b ASC
        LIMIT {k}
    """


def basket_brand_lift(
    lineitem: DataFrame, part: DataFrame, k: int = 25, min_orders: int = 5
) -> DataFrame:
    """Association LIFT per brand pair: ``P(a,b) / (P(a)·P(b))`` over
    order baskets — the normalized form of
    :func:`basket_brand_pairs` that separates genuinely associated
    brands from merely popular ones (raw co-occurrence counts rank
    popular×popular pairs first even when independent).

    Same shuffle geometry as the pair count (one materialized distinct
    basket table, order-keyed self-join bounded by Σ basket²) plus a
    |brands|-row marginal aggregate broadcast back; ``min_orders``
    suppresses the noise floor where tiny supports produce huge
    spurious lifts. 6dp-rounded ratios; top-k totally ordered."""
    from .partitioning import materialize

    ob = materialize(
        lineitem.select("l_orderkey", "l_partkey")
        .join(F.broadcast(part.select("p_partkey", "p_brand")),
              F.col("l_partkey") == F.col("p_partkey"))
        .select("l_orderkey", F.col("p_brand").alias("brand"))
        .distinct()
    )
    n_orders = ob.select("l_orderkey").distinct().count()
    marg = ob.groupBy("brand").agg(F.count("*").alias("n_brand"))
    pairs = (
        ob.alias("x")
        .join(ob.alias("y"), "l_orderkey")
        .filter(F.col("x.brand") < F.col("y.brand"))
        .groupBy(
            F.col("x.brand").alias("brand_a"),
            F.col("y.brand").alias("brand_b"),
        )
        .agg(F.count("*").alias("n_both"))
        .filter(F.col("n_both") >= min_orders)
    )
    ma = marg.select(F.col("brand").alias("brand_a"), F.col("n_brand").alias("na"))
    mb = marg.select(F.col("brand").alias("brand_b"), F.col("n_brand").alias("nb"))
    return (
        pairs.join(F.broadcast(ma), "brand_a")
        .join(F.broadcast(mb), "brand_b")
        .select(
            "brand_a",
            "brand_b",
            "n_both",
            F.round(
                (F.col("n_both") * F.lit(float(n_orders)))
                / (F.col("na") * F.col("nb")).cast("double"),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), F.asc("brand_a"), F.asc("brand_b"))
        .limit(k)
    )


def basket_brand_lift_sql(
    lineitem: str = "lineitem", part: str = "part",
    k: int = 25, min_orders: int = 5,
) -> str:
    return f"""
        WITH ob AS (
          SELECT DISTINCT l_orderkey, p_brand AS brand
          FROM {lineitem} JOIN {part} ON l_partkey = p_partkey
        ),
        tot AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM ob),
        marg AS (SELECT brand, COUNT(*) AS n_brand FROM ob GROUP BY brand),
        pairs AS (
          SELECT x.brand AS brand_a, y.brand AS brand_b,
                 COUNT(*) AS n_both
          FROM ob x JOIN ob y
            ON x.l_orderkey = y.l_orderkey AND x.brand < y.brand
          GROUP BY 1, 2 HAVING COUNT(*) >= {min_orders}
        )
        SELECT brand_a, brand_b, n_both,
               ROUND((n_both * CAST(tot.n_orders AS DOUBLE))
                     / (ma.n_brand * mb.n_brand), 6) AS lift
        FROM pairs
        JOIN marg ma ON ma.brand = pairs.brand_a
        JOIN marg mb ON mb.brand = pairs.brand_b
        CROSS JOIN tot
        ORDER BY lift DESC, brand_a ASC, brand_b ASC LIMIT {k}
    """
