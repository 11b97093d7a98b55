"""Deterministic reference-shaped synthetic transactions (FIXTURES.md §A1).

Reproduces the reference's seeded data model — 100 users x 50 txns,
60/40 UPI/CC split, amounts U(10, 2000) at 2dp, dates over 2025, 8
categories with occasional nulls, city tiers 1-4
(``backend/seed_database.py:9-65``) — but generated INSIDE Spark
(``spark.range`` + hash-derived pseudorandoms): no driver loop, no Faker,
fully partition-parallel, byte-deterministic for a given seed.

Discriminating boundary rows are planted per user (the
``seed_filter_test_data.py`` pattern): amounts exactly at/around 500, and
transaction dates on the Q2 date-BETWEEN boundary (2025-06-30 midnight and
mid-day) so tests can observe both sides of every predicate edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CATEGORIES = (
    "Electronics",
    "Groceries",
    "Apparel",
    "Dining",
    "Travel",
    "Utilities",
    "Entertainment",
    "Health",
)


def _u(col, salt: int, seed: int):
    """Uniform [0,1) derived from a 64-bit hash — cheap, stable, JVM-side."""
    return (F.abs(F.xxhash64(col, F.lit(salt), F.lit(seed))) % 1_000_000_000) / 1_000_000_000.0


def synthetic_transactions(
    spark: SparkSession,
    n_users: int = 100,
    txns_per_user: int = 50,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """Returns (upi_df, cc_df) with the raw-table schema of FIXTURES §A1:
    ``user_id`` is a numeric STRING, exactly like the reference's TEXT
    column (the string->long cast happens downstream, quirk §1.2)."""
    n = n_users * txns_per_user
    base = spark.range(n).select(
        F.col("id"),
        (F.col("id") % n_users + 1).cast("string").alias("user_id"),
        # slot k of user u is row id = k*n_users + (u-1): id DIV n_users
        # varies 0..txns_per_user-1 WITHIN each user (id % txns_per_user
        # would be constant per user since the id stride is n_users)
        (F.col("id") / n_users).cast("long").alias("slot"),
        _u(F.col("id"), 1, seed).alias("u_amt"),
        _u(F.col("id"), 2, seed).alias("u_date"),
        _u(F.col("id"), 3, seed).alias("u_cat"),
        _u(F.col("id"), 4, seed).alias("u_null"),
        _u(F.col("id"), 5, seed).alias("u_tier"),
    )
    amount = F.round(10.0 + F.col("u_amt") * 1990.0, 2)
    # planted boundary rows (slots 0-2): strictly-below / exactly-at /
    # strictly-above the reference's live rule-1 threshold
    amount = (
        F.when(F.col("slot") == 0, 499.99)
        .when(F.col("slot") == 1, 500.00)
        .when(F.col("slot") == 2, 500.01)
        .otherwise(amount)
    )
    ts = F.timestamp_seconds(
        F.unix_timestamp(F.lit("2025-01-01 00:00:00"))
        + F.floor(F.col("u_date") * 364 * 86400)
    )
    # Q2 boundary rows: June 30 midnight (excluded by compat BETWEEN even
    # at 00:00:00 — SQLite string-compare, SURVEY §4.3) and June 30 noon
    ts = (
        F.when(F.col("slot") == 3, F.lit("2025-06-30 00:00:00").cast("timestamp"))
        .when(F.col("slot") == 4, F.lit("2025-06-30 12:00:00").cast("timestamp"))
        .when(F.col("slot") == 5, F.lit("2025-06-15 08:00:00").cast("timestamp"))
        .otherwise(ts)
    )
    cats = F.array(*[F.lit(c) for c in CATEGORIES])
    category = F.when(F.col("u_null") < 0.05, F.lit(None).cast("string")).otherwise(
        F.element_at(cats, (F.abs(F.xxhash64("id", F.lit(6), F.lit(seed))) % 8 + 1).cast("int"))
    )
    full = base.select(
        F.col("id").alias("row_id"),
        "user_id",
        amount.alias("amount"),
        ts.alias("transaction_date"),
        category.alias("category"),
        (F.abs(F.xxhash64("id", F.lit(7), F.lit(seed))) % 4 + 1).cast("int").alias("city_tier"),
        F.concat(F.lit("Merchant_"), (F.col("id") % 37).cast("string")).alias(
            "merchant_name"
        ),
        (F.col("id") % 5 < 3).alias("_is_upi"),  # 60/40 split like the seed
    )
    upi = full.filter("_is_upi").drop("_is_upi", "row_id")
    cc = full.filter("NOT _is_upi").drop("_is_upi", "row_id")
    return upi, cc
