"""Window-function query family (SURVEY.md §2.5 surface)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.windows import running_total, top_n_per_group
from ..sources import load_table


def window_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price (unique orderkey tiebreak)."""
    orders = load_table(spark, sf_dir, "orders")
    return top_n_per_group(
        orders,
        ["o_custkey"],
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        n=3,
    ).select(
        "o_custkey",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        "rn",
    )


def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer cumulative spend in order-date order. The frame order
    fixes the summation order, so the double is deterministic across
    engines; rounded anyway per the registry convention."""
    orders = load_table(spark, sf_dir, "orders")
    out = running_total(
        orders,
        ["o_custkey"],
        [F.asc("o_orderdate"), F.asc("o_orderkey")],
        "o_totalprice",
    )
    return out.select(
        "o_custkey",
        "o_orderkey",
        F.round("running_total", 2).alias("running_total"),
    )


def window_lag_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag(): days since the customer's previous order."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(
            F.to_date("o_orderdate"), F.to_date(F.lag("o_orderdate").over(w))
        ).alias("gap_days"),
    )


def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank vs dense_rank over per-segment account balances (duplicate
    balances exercise the rank/dense_rank divergence)."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return cust.select(
        "c_mktsegment",
        "c_custkey",
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
    )


def window_moving_avg_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded ROWS frame: 3-order moving average of a customer's order
    values. The frame sum runs in decimal, so whatever tree each engine's
    sliding-window implementation uses (DuckDB segment-trees its frames),
    the total is exact and identical."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(-2, Window.currentRow)
    )
    dec_sum = F.sum(F.col("o_totalprice").cast("decimal(18,4)")).over(w)
    n = F.count("*").over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round((dec_sum / n).cast("double"), 4).alias("moving_avg_3"),
    )


def window_range_trailing_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a numeric day offset: how many orders the customer
    placed in the trailing 90 days (value-based frame — same-day peers
    join the frame on both engines by definition)."""
    orders = load_table(spark, sf_dir, "orders")
    day_num = F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day_num)
        .rangeBetween(-90, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.count("*").over(w).alias("orders_90d"),
    )



def window_percent_cume_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distribution-rank surface: percent_rank / cume_dist / ntile
    over per-segment account balances. Order carries a unique suppkey
    tiebreak so every rank function is total and both engines agree
    bit-for-bit (percent_rank's (rank-1)/(n-1) is an exact small-integer
    ratio; rounded 6dp per convention anyway)."""
    supplier = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy(F.col("s_nationkey") % 5).orderBy(
        F.desc("s_acctbal"), F.asc("s_suppkey")
    )
    return supplier.select(
        (F.col("s_nationkey") % 5).alias("grp"),
        "s_suppkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
    )




def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact sliding median (trailing 5-order ROWS frame per customer) —
    the robust smoother for spend/latency series where one outlier order
    would drag a moving AVERAGE for the whole frame width. ``percentile``
    sorts only the <= 5-row frame, so cost is frame-bounded, and the one
    shuffle is the customer-key window partition.

    Determinism: money lives on a 2dp grid, so the even-frame
    interpolated midpoint lives on a 3dp grid — rounding at 4dp leaves
    every representable value untouched (never a rounding boundary), and
    the <= 1-ulp difference between the engines' interpolation formulas
    cannot cross a 4dp edge."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(-4, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.expr("percentile(o_totalprice, 0.5)").over(w), 4
        ).alias("median_5"),
    )


QUERIES = {
    "window_topn_per_group": window_topn_per_group,
    "window_running_total": window_running_total,
    "window_lag_gap_days": window_lag_gap_days,
    "window_rank_dense": window_rank_dense,
    "window_moving_avg_rows": window_moving_avg_rows,
    "window_range_trailing_count": window_range_trailing_count,
    "window_percent_cume_ntile": window_percent_cume_ntile,
    "window_rolling_median": window_rolling_median,
}

ORACLES = {
    "window_topn_per_group": """
        SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice, rn
        FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
          FROM orders
        ) t WHERE rn <= 3
    """,
    "window_running_total": """
        SELECT o_custkey, o_orderkey,
               ROUND(SUM(o_totalprice) OVER (
                 PARTITION BY o_custkey
                 ORDER BY o_orderdate ASC, o_orderkey ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                 AS running_total
        FROM orders
    """,
    "window_lag_gap_days": """
        SELECT o_custkey, o_orderkey,
               CAST(DATEDIFF('day',
                 CAST(LAG(o_orderdate) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate ASC, o_orderkey ASC) AS DATE),
                 CAST(o_orderdate AS DATE)) AS INTEGER) AS gap_days
        FROM orders
    """,
    "window_rank_dense": """
        SELECT c_mktsegment, c_custkey,
               RANK() OVER (
                 PARTITION BY c_mktsegment
                 ORDER BY c_acctbal DESC, c_custkey ASC) AS bal_rank,
               DENSE_RANK() OVER (
                 PARTITION BY c_mktsegment
                 ORDER BY c_acctbal DESC, c_custkey ASC) AS bal_dense_rank
        FROM customer
    """,
    "window_moving_avg_rows": """
        SELECT o_custkey, o_orderkey,
               ROUND(CAST(
                 SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w
                 / COUNT(*) OVER w AS DOUBLE), 4) AS moving_avg_3
        FROM orders
        WINDOW w AS (
          PARTITION BY o_custkey
          ORDER BY o_orderdate ASC, o_orderkey ASC
          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    "window_percent_cume_ntile": """
        SELECT s_nationkey % 5 AS grp, s_suppkey,
               ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
               ROUND(CUME_DIST() OVER w, 6) AS cume,
               CAST(NTILE(4) OVER w AS INT) AS quartile
        FROM supplier
        WINDOW w AS (PARTITION BY s_nationkey % 5
                     ORDER BY s_acctbal DESC, s_suppkey ASC)
    """,
    "window_range_trailing_count": """
        SELECT o_custkey, o_orderkey,
               COUNT(*) OVER (
                 PARTITION BY o_custkey
                 ORDER BY DATEDIFF('day', DATE '1995-01-01',
                                   CAST(o_orderdate AS DATE))
                 RANGE BETWEEN 90 PRECEDING AND CURRENT ROW) AS orders_90d
        FROM orders
    """,
}


def window_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest run of CONSECUTIVE active days per user (the engagement
    streak metric): gaps-and-islands on the distinct (user, day) grid —
    island anchor = day − row_number() days, so every maximal run of
    consecutive dates shares one anchor; streak length is the island
    size. One distinct shuffle compacts events to the grid; everything
    after is grid-sized."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    isl = days.withColumn(
        "anchor", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    streaks = isl.groupBy("user_id", "anchor").agg(
        F.count("*").alias("len")
    )
    return streaks.groupBy("user_id").agg(
        F.max("len").cast("long").alias("longest_streak"),
        F.sum("len").cast("long").alias("active_days"),
    )


QUERIES["window_longest_streak"] = window_longest_streak
ORACLES["window_longest_streak"] = """
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    isl AS (
      SELECT user_id, day,
             day - CAST(ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY day) AS INTEGER) AS anchor
      FROM days
    ),
    streaks AS (
      SELECT user_id, anchor, COUNT(*) AS len
      FROM isl GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(MAX(len) AS BIGINT) AS longest_streak,
           CAST(SUM(len) AS BIGINT) AS active_days
    FROM streaks GROUP BY user_id
"""
ORACLES["window_rolling_median"] = """
    SELECT o_custkey, o_orderkey,
           ROUND(quantile_cont(o_totalprice, 0.5) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS median_5
    FROM orders
"""
