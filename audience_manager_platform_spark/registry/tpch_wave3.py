"""Third TPC-H wave, adapted to the fixture schemas (no partsupp table;
lineitem lacks commitdate/receiptdate/shipmode, so Q6/Q8/Q9/Q10/Q11/Q13/
Q14/Q16/Q17/Q22 keep their canonical *shape* over the columns that exist).

New plan shapes this wave adds over waves 1-2: scalar-subquery HAVING
against a global aggregate (Q11/Q22), ratio-of-conditional-sums market
share (Q8/Q14), correlated per-group average threshold (Q17), outer-join
count distribution (Q13), and exact COUNT(DISTINCT) over a join (Q16).

Cross-engine exactness: thresholds derived from averages are never
computed as fractions — ``x < SUM/(5*n)`` is rewritten to the
all-decimal ``x*5*n < SUM`` (both sides exact, no float division), so a
row on the boundary can't diverge between Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .tpch import DEC, _revenue_col


def _ts(s: str) -> F.Column:
    return F.lit(s).cast("timestamp")


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: pure filter + scalar aggregate — the predicate-pushdown
    showcase (all three filters reach the parquet scan)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1997-01-01"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast(DEC) * F.col("l_discount").cast(DEC)
                ).cast("double"),
                2,
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: NATION_5's share of ECONOMY-part revenue sold to ASIA
    customers, per order year. Share = conditional-sum / sum, both decimal
    then one double division — bit-identical across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    cust_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select(F.col("n_nationkey").alias("cn_key"))
    supp_nation = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    rev = _revenue_col()
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cust_nations), cust.c_nationkey == F.col("cn_key"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(supp_nation), supp.s_nationkey == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_5", rev).otherwise(
                        F.lit(0).cast(DEC)
                    )
                ).cast("double")
                / F.sum(rev).cast("double"),
                6,
            ).alias("mkt_share"),
            F.round(F.sum(rev).cast("double"), 2).alias("total_revenue"),
        )
    )


def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape (minus partsupp supply cost): revenue from parts whose
    name contains 'red', by supplier nation and order year."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.round(F.sum(_revenue_col()).cast("double"), 2).alias("sum_profit"))
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10: top-20 customers by revenue lost to returns ('R' lines) in a
    six-month window — join + group + deterministic top-k."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1996-07-01"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(_revenue_col()).cast("double"), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: parts whose revenue exceeds 1.5x the mean per-part
    revenue. The canonical fixed fraction (rev*1000 > total) is
    scale-DEPENDENT — with ~20k uniform parts at sf0.1 no part reaches
    1/1000 of total, so the query would be vacuously empty at every
    fixture scale. A mean-relative cutoff keeps the plan shape (scalar
    subquery HAVING against a global aggregate, broadcast as a 1-row
    cross join) while returning rows at any SF. The comparison stays in
    decimal (rev*n_parts*2 > 3*total): both sides exact, no float
    division, so boundary rows can't diverge between engines."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(_revenue_col()).alias("rev_dec")
    )
    total = li.agg(
        F.sum(_revenue_col()).alias("total_dec"),
        F.countDistinct("l_partkey").alias("n_parts"),
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("rev_dec") * F.col("n_parts") * 2 > F.col("total_dec") * 3)
        .select(
            "l_partkey",
            F.round(F.col("rev_dec").cast("double"), 2).alias("part_value"),
        )
    )


def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: distribution of per-customer order counts including zero —
    outer join, two stacked aggregations."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14: promo revenue share for one year — conditional-sum ratio over
    a broadcast part join."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = _revenue_col()
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", rev).otherwise(
                        F.lit(0).cast(DEC)
                    )
                ).cast("double")
                / F.sum(rev).cast("double"),
                6,
            ).alias("promo_revenue_pct"),
            F.count("*").alias("n_lines"),
        )
    )


def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape (partsupp replaced by shipped lineitems): distinct
    suppliers per (brand, type) for small parts, excluding one brand —
    exact COUNT(DISTINCT) over a join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 10) & (F.col("p_brand") != "Brand#1")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17: revenue from Brand#3 lines below 20% of their part's average
    quantity. The correlated AVG is decorrelated into a per-part aggregate
    join; the threshold compare is all-decimal (qty*5*n < sum_qty), never
    a float division."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    li = load_table(spark, sf_dir, "lineitem").join(
        part, F.col("l_partkey") == F.col("p_partkey")
    )
    per_part = li.groupBy(F.col("l_partkey").alias("pp_key")).agg(
        F.sum(F.col("l_quantity").cast(DEC)).alias("sum_qty"),
        F.count("*").alias("n_qty"),
    )
    small = li.join(
        per_part, F.col("l_partkey") == F.col("pp_key")
    ).filter(
        F.col("l_quantity").cast(DEC) * 5 * F.col("n_qty") < F.col("sum_qty")
    )
    return small.agg(
        F.round(
            F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / 7.0, 2
        ).alias("avg_yearly"),
        F.count("*").alias("n_small_lines"),
    )


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: customers with above-average positive balance and no
    RECENT orders (none since 1999-01-01), rolled up per nation. The
    fixtures give essentially every customer at least one order ever, so
    the canonical "no orders at all" anti-join is vacuously empty;
    restricting the NOT EXISTS side to recent orders keeps the exact plan
    shape (filtered left-anti join) non-degenerate at every SF
    (2/14/148 qualifying customers at sf0.001/0.01/0.1). Global average
    via broadcast 1-row aggregate with an exact decimal compare
    (bal*n > sum)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= _ts("1999-01-01")
    )
    pos = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(F.col("c_acctbal").cast(DEC)).alias("sum_bal"),
        F.count("*").alias("n_bal"),
    )
    rich = cust.crossJoin(F.broadcast(pos)).filter(
        F.col("c_acctbal").cast(DEC) * F.col("n_bal") > F.col("sum_bal")
    )
    idle = rich.join(orders, rich.c_custkey == orders.o_custkey, "left_anti")
    return idle.groupBy("c_nationkey").agg(
        F.count("*").alias("numcust"),
        F.round(F.sum(F.col("c_acctbal").cast(DEC)).cast("double"), 2).alias(
            "totacctbal"
        ),
    )


QUERIES = {
    "tpch_q6_forecast_revenue": q6_forecast_revenue,
    "tpch_q8_market_share": q8_market_share,
    "tpch_q9_profit_by_nation_year": q9_profit_by_nation_year,
    "tpch_q10_returned_items": q10_returned_items,
    "tpch_q11_important_parts": q11_important_parts,
    "tpch_q13_order_count_distribution": q13_order_count_distribution,
    "tpch_q14_promo_revenue": q14_promo_revenue,
    "tpch_q16_supplier_count": q16_supplier_count,
    "tpch_q17_small_quantity_revenue": q17_small_quantity_revenue,
    "tpch_q22_idle_customers": q22_idle_customers,
}

_REV = "CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))"

ORACLES = {
    "tpch_q6_forecast_revenue": """
        SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                             * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE), 2)
                 AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    "tpch_q8_market_share": f"""
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
               ROUND(CAST(SUM(CASE WHEN sn.n_name = 'NATION_5' THEN {_REV}
                                   ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                     / CAST(SUM({_REV}) AS DOUBLE), 6) AS mkt_share,
               ROUND(CAST(SUM({_REV}) AS DOUBLE), 2) AS total_revenue
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region ON cn.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
        GROUP BY 1
    """,
    "tpch_q9_profit_by_nation_year": f"""
        SELECT n_name AS nation,
               CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
               ROUND(CAST(SUM({_REV}) AS DOUBLE), 2) AS sum_profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
        GROUP BY n_name, 2
    """,
    "tpch_q10_returned_items": f"""
        SELECT c_custkey, c_name, n_name,
               ROUND(CAST(SUM({_REV}) AS DOUBLE), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
    """,
    "tpch_q11_important_parts": f"""
        SELECT l_partkey,
               ROUND(CAST(SUM({_REV}) AS DOUBLE), 2) AS part_value
        FROM lineitem
        GROUP BY l_partkey
        HAVING SUM({_REV}) * (SELECT COUNT(DISTINCT l_partkey) FROM lineitem) * 2
               > (SELECT SUM({_REV}) FROM lineitem) * 3
    """,
    "tpch_q13_order_count_distribution": """
        WITH per_cust AS (
          SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer
          LEFT JOIN (SELECT * FROM orders WHERE o_orderpriority != '1-URGENT') o
            ON c_custkey = o_custkey
          GROUP BY c_custkey
        )
        SELECT c_count, COUNT(*) AS custdist
        FROM per_cust GROUP BY c_count
    """,
    "tpch_q14_promo_revenue": f"""
        SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV}
                                      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                     / CAST(SUM({_REV}) AS DOUBLE), 6) AS promo_revenue_pct,
               COUNT(*) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    """,
    "tpch_q16_supplier_count": """
        SELECT p_brand, p_type, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_size <= 10 AND p_brand != 'Brand#1'
        GROUP BY p_brand, p_type
    """,
    "tpch_q17_small_quantity_revenue": """
        WITH br AS (
          SELECT l_partkey, l_quantity, l_extendedprice
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_brand = 'Brand#3'
        ),
        per_part AS (
          SELECT l_partkey AS pp_key,
                 SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sum_qty,
                 COUNT(*) AS n_qty
          FROM br GROUP BY l_partkey
        )
        SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
                     / 7.0, 2) AS avg_yearly,
               COUNT(*) AS n_small_lines
        FROM br JOIN per_part ON l_partkey = pp_key
        WHERE CAST(l_quantity AS DECIMAL(18,4)) * 5 * n_qty < sum_qty
    """,
    "tpch_q22_idle_customers": """
        WITH pos AS (
          SELECT SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS sum_bal,
                 COUNT(*) AS n_bal
          FROM customer WHERE c_acctbal > 0.0
        )
        SELECT c_nationkey,
               COUNT(*) AS numcust,
               ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE), 2)
                 AS totacctbal
        FROM customer, pos
        WHERE CAST(c_acctbal AS DECIMAL(18,4)) * n_bal > sum_bal
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        GROUP BY c_nationkey
    """,
}


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape (lateness proxied by shipdate > orderdate + 60 days —
    fixtures carry no commit/receipt dates): suppliers whose line was late
    on a multi-supplier 'F' order where NO other supplier was late.

    Decorrelation: the two correlated subqueries (EXISTS other-supplier,
    NOT EXISTS other-late-supplier) become one per-order aggregate —
    distinct supplier count and distinct LATE supplier count — broadcast
    back onto the late lines. One pass over lineitem for the aggregate,
    one for the probe."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    li = load_table(spark, sf_dir, "lineitem")
    lo = li.join(
        orders.select("o_orderkey", "o_orderdate"),
        li.l_orderkey == F.col("o_orderkey"),
    ).select(
        "l_orderkey",
        "l_suppkey",
        # Timestamp-preserving interval arithmetic: F.date_add would
        # truncate o_orderdate to a DATE (midnight) while the DuckDB
        # oracle's `+ INTERVAL 60 DAY` keeps time-of-day — divergent for
        # any non-midnight orderdate.
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
        ).alias("late"),
    )
    per_order = lo.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
    )
    supp = load_table(spark, sf_dir, "supplier")
    # per_order is derived FROM the fact table (one row per order) — at
    # warehouse scale it is data-sized, so it must NOT be broadcast: both
    # sides are keyed on the order key, and the late-filtered probe side
    # is the smaller one, so this is a plain key-partitioned join
    # (shuffle_hash: the groupBy output is already compact per key).
    waiting = (
        lo.filter(F.col("late"))
        .join(per_order.hint("shuffle_hash"), F.col("l_orderkey") == F.col("ok"))
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    return (
        waiting.join(supp, waiting.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


QUERIES["tpch_q21_waiting_suppliers"] = q21_waiting_suppliers

ORACLES["tpch_q21_waiting_suppliers"] = """
    WITH lo AS (
      SELECT l_orderkey, l_suppkey,
             l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
    ),
    per_order AS (
      SELECT l_orderkey AS ok,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late_supp
      FROM lo GROUP BY l_orderkey
    ),
    waiting AS (
      SELECT DISTINCT lo.l_orderkey, lo.l_suppkey
      FROM lo JOIN per_order ON lo.l_orderkey = per_order.ok
      WHERE lo.late AND per_order.n_supp > 1 AND per_order.n_late_supp = 1
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM waiting JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_name
"""


def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape (partsupp availability replaced by shipped quantity):
    suppliers who shipped more than a SIXTH of some 'red' part's
    total quantity (non-trivial at every fixture scale). Fraction-of-group
    compare stays decimal-exact (6*supp_qty > part_qty); the supplier list
    falls out of a semi-join.
    """
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    li = load_table(spark, sf_dir, "lineitem").join(
        part.select("p_partkey"),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    per_ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast(DEC)).alias("supp_qty")
    )
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(F.col("l_quantity").cast(DEC)).alias("part_qty")
    )
    dominant = (
        per_ps.join(per_part, F.col("l_partkey") == F.col("pk"))
        .filter(F.col("supp_qty") * 6 > F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier")
    return supp.join(
        dominant, supp.s_suppkey == dominant.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


QUERIES["tpch_q20_dominant_suppliers"] = q20_dominant_suppliers

ORACLES["tpch_q20_dominant_suppliers"] = """
    WITH red_li AS (
      SELECT l_partkey, l_suppkey, l_quantity
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE '%red%'
    ),
    per_ps AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(l_quantity AS DECIMAL(18,4))) AS supp_qty
      FROM red_li GROUP BY l_partkey, l_suppkey
    ),
    per_part AS (
      SELECT l_partkey AS pk, SUM(CAST(l_quantity AS DECIMAL(18,4))) AS part_qty
      FROM red_li GROUP BY l_partkey
    ),
    dominant AS (
      SELECT DISTINCT l_suppkey
      FROM per_ps JOIN per_part ON l_partkey = pk
      WHERE supp_qty * 6 > part_qty
    )
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE EXISTS (SELECT 1 FROM dominant WHERE l_suppkey = s_suppkey)
"""
