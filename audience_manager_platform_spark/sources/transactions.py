"""The unified transaction stream (SURVEY.md §1.1 "all_transactions").

The reference builds a virtual ``all_transactions`` relation as the SQL

    SELECT user_id, amount, transaction_date, category, city_tier,
           'UPI' AS transaction_type FROM upi_transactions_raw
    UNION ALL
    SELECT ..., 'CREDIT_CARD' ... FROM credit_card_transactions_raw

(reference ``backend/app/utils/rule_parser.py:104-110``). Here that is a
by-name union of two projected DataFrames with a literal tag (U1/P1) — a
pure narrow transformation: no shuffle, fully pipelined into whatever
filter/aggregate consumes it.

A second constructor adapts the driver's ``events`` fixture to the same
logical schema so every rule-engine operator can be exercised (and
oracle-checked) on driver data: ``value``→amount, ``ts``→transaction_date,
``event_type``→category, a deterministic 60/40 split→transaction_type
(mirroring the reference's seeded UPI/CC mix,
``backend/seed_database.py:55``), and ``props.k % 4 + 1``→city_tier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# The canonical projection every rule/analytics query sees (P1).
TRANSACTION_COLUMNS = (
    "user_id",
    "amount",
    "transaction_date",
    "category",
    "city_tier",
    "transaction_type",
)


def _tagged(df: DataFrame, tag: str) -> DataFrame:
    return df.select(
        "user_id", "amount", "transaction_date", "category", "city_tier"
    ).withColumn("transaction_type", F.lit(tag))


def unified_transactions(df_upi: DataFrame, df_cc: DataFrame) -> DataFrame:
    """Reference-shaped union of the two raw transaction tables (U1).

    ``unionByName`` (not positional ``union``) so schema drift between the
    two sources fails loudly instead of silently mis-aligning columns.
    """
    return _tagged(df_upi, "UPI").unionByName(_tagged(df_cc, "CREDIT_CARD"))


def _events_transaction_type(event_id: Column) -> Column:
    # Deterministic 60/40 UPI / CREDIT_CARD split, like the reference seed.
    return F.when(event_id % 5 < 3, F.lit("UPI")).otherwise(F.lit("CREDIT_CARD"))


def transactions_with_id(events: DataFrame) -> DataFrame:
    """The unified adapter plus a stable ``transaction_id`` (the source
    ``event_id``) — the listing/detail REST routes need an addressable
    row id (reference ``backend/app/api/transactions.py:26-35`` serves
    ``GET .../<transaction_id>`` from the source table's PK), while the
    rule/analytics pipeline keeps the narrower canonical projection."""
    return events.select(
        F.col("event_id").alias("transaction_id"),
        F.col("user_id"),
        F.col("value").alias("amount"),
        F.col("ts").alias("transaction_date"),
        # deterministic merchant synth from the event id — the fixture
        # carries no merchant column, but the reference detail payload
        # (backend/app/models/transactions.py:17-28 to_dict) includes
        # merchant_name, so the adapter provides the field the same way
        # it provides transaction_type
        F.concat(F.lit("merchant_"), (F.col("event_id") % 97).cast("string")).alias(
            "merchant_name"
        ),
        F.col("event_type").alias("category"),
        (F.get_json_object(F.col("props"), "$.k").cast("int") % 4 + 1).alias("city_tier"),
        _events_transaction_type(F.col("event_id")).alias("transaction_type"),
    )


def unified_transactions_from_events(events: DataFrame) -> DataFrame:
    """Adapt the driver ``events`` table to the unified transaction schema.

    ``city_tier`` is derived from the JSON ``props`` payload with a
    JVM-side ``get_json_object`` (F9) — no Python UDF in the path, so the
    projection stays inside whole-stage codegen and the parquet scan still
    prunes to exactly the referenced columns.
    """
    return events.select(
        F.col("user_id"),
        F.col("value").alias("amount"),
        F.col("ts").alias("transaction_date"),
        F.col("event_type").alias("category"),
        (F.get_json_object(F.col("props"), "$.k").cast("int") % 4 + 1).alias("city_tier"),
        _events_transaction_type(F.col("event_id")).alias("transaction_type"),
    )


# DuckDB-side rendering of the same adapter, used to build oracle SQL for
# every rule-engine query (tools/check_oracle.py and __spark_entry__.py).
EVENTS_AS_TRANSACTIONS_SQL = """
SELECT user_id,
       value AS amount,
       ts AS transaction_date,
       event_type AS category,
       CAST(json_extract_string(props, '$.k') AS INTEGER) % 4 + 1 AS city_tier,
       CASE WHEN event_id % 5 < 3 THEN 'UPI' ELSE 'CREDIT_CARD' END AS transaction_type
FROM events
"""
