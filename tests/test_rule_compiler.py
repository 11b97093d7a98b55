"""Rule DSL: validation, predicate compilation, and differential checks of
the compiled segment plan against DuckDB running the compiler's own SQL
rendering (the reference's debug_query.py oracle pattern, SURVEY.md §5)."""

import pytest

from audience_manager_platform_spark.plans import (
    Condition,
    ConditionError,
    RuleCompiler,
    parse_conditions,
)
from audience_manager_platform_spark.sources import (
    load_table,
    unified_transactions_from_events,
)
from audience_manager_platform_spark.sources.transactions import (
    EVENTS_AS_TRANSACTIONS_SQL,
)

from .helpers import assert_matches_oracle


# ------------------------------------------------------------- validation
def test_parse_valid_conditions():
    conds = parse_conditions(
        [
            {"field": "transaction_amount", "operator": ">", "value": "500"},
            {"field": "city_tier", "operator": "IN", "value": [1, 2]},
            {"field": "total_spend", "operator": ">=", "value": 1000},
        ]
    )
    assert [c.field for c in conds] == ["transaction_amount", "city_tier", "total_spend"]
    assert conds[2].is_aggregate


def test_strict_rejects_unknown_field():
    with pytest.raises(ConditionError, match="unknown field"):
        parse_conditions([{"field": "bogus", "operator": ">", "value": 1}])


def test_strict_rejects_bad_operator_and_missing_value():
    with pytest.raises(ConditionError, match="unknown operator"):
        parse_conditions([{"field": "city_tier", "operator": "LIKE", "value": 1}])
    with pytest.raises(ConditionError, match="missing value"):
        parse_conditions([{"field": "city_tier", "operator": ">"}])
    with pytest.raises(ConditionError, match="requires a list"):
        parse_conditions([{"field": "city_tier", "operator": "IN", "value": 1}])
    with pytest.raises(ConditionError, match="requires value2"):
        parse_conditions([{"field": "transaction_date", "operator": "BETWEEN", "value": "2024-01-01"}])


def test_lenient_skips_like_reference():
    # Q8 parity: reference drops malformed conditions with a warning
    conds = parse_conditions(
        [
            {"field": "bogus", "operator": ">", "value": 1},
            {"field": "city_tier", "operator": "=", "value": "1"},
        ],
        lenient=True,
    )
    assert len(conds) == 1 and conds[0].field == "city_tier"


def test_where_having_split():
    q = RuleCompiler().compile(
        [
            {"field": "transaction_amount", "operator": ">", "value": "500"},
            {"field": "total_spend", "operator": ">", "value": 10000},
            {"field": "transaction_count", "operator": ">=", "value": 5},
        ]
    )
    assert [c.field for c in q.where] == ["transaction_amount"]
    assert [c.field for c in q.having] == ["total_spend", "transaction_count"]


def test_canonical_form_stable():
    a = Condition("city_tier", "IN", [1, 2])
    b = Condition("city_tier", "IN", (1, 2))
    assert a.canonical() == b.canonical()


# --------------------------------------------- differential vs DuckDB
RULES = {
    "amount_gt": [{"field": "transaction_amount", "operator": ">", "value": "500"}],
    "tier_eq": [{"field": "city_tier", "operator": "=", "value": "1", "value2": ""}],
    "date_between": [
        {
            "field": "transaction_date",
            "operator": "BETWEEN",
            "value": "2024-01-10",
            "value2": "2024-01-20",
        }
    ],
    "in_list": [{"field": "category", "operator": "IN", "value": ["purchase", "view"]}],
    "not_in": [{"field": "city_tier", "operator": "NOT IN", "value": [3, 4]}],
    "having_spend": [{"field": "total_spend", "operator": ">", "value": 5000}],
    "having_count": [{"field": "transaction_count", "operator": ">=", "value": 50}],
    "mixed": [
        {"field": "transaction_amount", "operator": ">=", "value": "100"},
        {"field": "category", "operator": "!=", "value": "error"},
        {"field": "transaction_count", "operator": ">", "value": 10},
    ],
    "empty_conditions": [],
}


@pytest.mark.parametrize("name", sorted(RULES))
def test_rule_matches_duckdb_oracle(spark, sf_dir, duck, name):
    compiler = RuleCompiler()
    query = compiler.compile(RULES[name])
    txns = unified_transactions_from_events(load_table(spark, sf_dir, "events"))
    seg = query.dataframe(txns)
    oracle = query.to_sql(EVENTS_AS_TRANSACTIONS_SQL, dialect="duckdb")
    assert_matches_oracle(seg, duck, oracle)


def test_date_between_compat_vs_calendar(spark, sf_dir):
    txns = unified_transactions_from_events(load_table(spark, sf_dir, "events"))
    payload = [
        {
            "field": "transaction_date",
            "operator": "BETWEEN",
            "value": "2024-01-10",
            "value2": "2024-01-20",
        }
    ]
    compat = RuleCompiler(date_between_mode="compat").compile(payload)
    calendar = RuleCompiler(date_between_mode="calendar").compile(payload)
    n_compat = compat.dataframe(txns).count()
    n_calendar = calendar.dataframe(txns).count()
    # calendar mode includes all of Jan 20; compat excludes it entirely (Q2)
    assert n_calendar >= n_compat


def test_spark_sql_rendering_runs(spark, sf_dir):
    """The spark-dialect SQL rendering must produce the same result as the
    DataFrame plan (both go through Catalyst)."""
    from audience_manager_platform_spark.sources.tables import table_path

    query = RuleCompiler().compile(RULES["mixed"])
    spark.read.parquet(table_path(sf_dir, "events")).createOrReplaceTempView("events")
    source_sql = """
        SELECT user_id, value AS amount, ts AS transaction_date,
               event_type AS category,
               CAST(get_json_object(props, '$.k') AS INT) % 4 + 1 AS city_tier,
               CASE WHEN event_id % 5 < 3 THEN 'UPI' ELSE 'CREDIT_CARD' END AS transaction_type
        FROM events
    """
    via_sql = spark.sql(query.to_sql(source_sql, dialect="spark"))
    txns = unified_transactions_from_events(
        spark.read.parquet(table_path(sf_dir, "events"))
    )
    via_df = query.dataframe(txns)
    assert sorted(via_sql.collect()) == sorted(via_df.collect())


def test_money_decimal_mode(spark, sf_dir):
    """Q3: decimal mode emits DECIMAL(20,2) totals (the reference's
    declared segment-output type) and agrees with rounded double mode."""
    from decimal import Decimal

    txns = unified_transactions_from_events(load_table(spark, sf_dir, "events"))
    payload = [{"field": "transaction_amount", "operator": ">", "value": "120"}]
    dec = RuleCompiler(money_type="decimal").compile(payload).dataframe(txns)
    assert dict(dec.dtypes)["total_spent"].startswith("decimal(")
    dbl = RuleCompiler().compile(payload).dataframe(txns)
    dec_rows = {r.user_id: r.total_spent for r in dec.collect()}
    dbl_rows = {r.user_id: round(r.total_spent, 2) for r in dbl.collect()}
    for uid, v in dbl_rows.items():
        assert abs(float(dec_rows[uid]) - v) < 0.011  # per-row cast rounding drift
