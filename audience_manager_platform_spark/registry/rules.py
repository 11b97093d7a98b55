"""Rule-engine query family (SURVEY.md §2.2 P3-P7, §2.4 A1/A2/A10, §2.7
U2-U6), exercised on the driver's ``events`` fixture through the
events→transactions adapter.

Every entry returns the fixed segment schema ``(user_id,
total_transactions, total_spent, transaction_types)`` with ``total_spent``
rounded to 2dp on both sides (see registry docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.segments import combine_segments
from ..plans import RuleCompiler
from ..sources import load_table, unified_transactions_from_events
from ..sources.transactions import EVENTS_AS_TRANSACTIONS_SQL

# Representative rule payloads mirroring the reference's live rules
# (FIXTURES.md §A3) mapped onto events columns.
RULE_PAYLOADS: dict[str, list[dict]] = {
    "rule_amount_gt": [
        {"field": "transaction_amount", "operator": ">", "value": "120"}
    ],
    "rule_tier_eq": [{"field": "city_tier", "operator": "=", "value": "1", "value2": ""}],
    "rule_date_between": [
        {
            "field": "transaction_date",
            "operator": "BETWEEN",
            "value": "2024-01-10",
            "value2": "2024-01-20",
        }
    ],
    "rule_in_list": [
        {"field": "category", "operator": "IN", "value": ["purchase", "view"]}
    ],
    "rule_not_in": [{"field": "city_tier", "operator": "NOT IN", "value": [3, 4]}],
    "rule_having_spend": [{"field": "total_spend", "operator": ">", "value": 4000}],
    "rule_mixed": [
        {"field": "transaction_amount", "operator": ">=", "value": "100"},
        {"field": "category", "operator": "!=", "value": "error"},
        {"field": "transaction_count", "operator": ">", "value": 10},
    ],
}

# HAVING-only payloads over identical groups: their set-algebra compositions
# are non-degenerate (same WHERE -> identical per-user aggregates, so
# full-row ops behave like keyed ops on a meaningful subset).
_SEG_A = [{"field": "total_spend", "operator": ">", "value": 3300}]
_SEG_B = [{"field": "transaction_count", "operator": ">=", "value": 67}]


def _segment(spark: SparkSession, sf_dir: str, payload: list[dict]) -> DataFrame:
    txns = unified_transactions_from_events(load_table(spark, sf_dir, "events"))
    seg = RuleCompiler().compile(payload).dataframe(txns)
    return seg.select(
        "user_id",
        "total_transactions",
        F.round("total_spent", 2).alias("total_spent"),
        "transaction_types",
    )


def _segment_sql(payload: list[dict]) -> str:
    inner = RuleCompiler().compile(payload).to_sql(
        EVENTS_AS_TRANSACTIONS_SQL, dialect="duckdb"
    )
    return (
        "SELECT user_id, total_transactions, ROUND(total_spent, 2) AS total_spent,"
        f" transaction_types FROM ({inner}) seg"
    )


def _rule_query(payload: list[dict]):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _segment(spark, sf_dir, payload)

    return run


def _setop_query(operation: str, on=None):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        a = _segment(spark, sf_dir, _SEG_A)
        b = _segment(spark, sf_dir, _SEG_B)
        return combine_segments([a, b], operation, on=on)

    return run


QUERIES = {name: _rule_query(payload) for name, payload in RULE_PAYLOADS.items()}
QUERIES.update(
    {
        "segment_union": _setop_query("UNION"),
        "segment_intersection": _setop_query("INTERSECTION"),
        "segment_difference": _setop_query("DIFFERENCE"),
        "segment_intersection_keyed": _setop_query("INTERSECTION", on="user_id"),
        "segment_difference_keyed": _setop_query("DIFFERENCE", on="user_id"),
    }
)

ORACLES = {name: _segment_sql(payload) for name, payload in RULE_PAYLOADS.items()}
ORACLES.update(
    {
        "segment_union": (
            f"{_segment_sql(_SEG_A)} UNION {_segment_sql(_SEG_B)}"
        ),
        "segment_intersection": (
            f"{_segment_sql(_SEG_A)} INTERSECT {_segment_sql(_SEG_B)}"
        ),
        "segment_difference": (
            f"{_segment_sql(_SEG_A)} EXCEPT {_segment_sql(_SEG_B)}"
        ),
        "segment_intersection_keyed": (
            f"SELECT * FROM ({_segment_sql(_SEG_A)}) a WHERE a.user_id IN"
            f" (SELECT user_id FROM ({_segment_sql(_SEG_B)}) b)"
        ),
        "segment_difference_keyed": (
            f"SELECT * FROM ({_segment_sql(_SEG_A)}) a WHERE a.user_id NOT IN"
            f" (SELECT user_id FROM ({_segment_sql(_SEG_B)}) b)"
        ),
    }
)
