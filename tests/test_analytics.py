"""Analytics operators on discriminating fixtures (the reference's
seed_filter_test_data.py pattern: rows constructed on both sides of every
boundary)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from audience_manager_platform_spark.operators import analytics as A


@pytest.fixture(scope="module")
def txns(spark):
    rows = [
        # user 1: 3 txns in Electronics (2) / Dining (1), days 1,1,4
        (1, 100.0, datetime(2024, 3, 1, 10), "Electronics", 1, "UPI"),
        (1, 200.0, datetime(2024, 3, 1, 11), "Electronics", 1, "UPI"),
        (1, 50.0, datetime(2024, 3, 4, 9), "Dining", 2, "CREDIT_CARD"),
        # user 2: tie between Dining and Travel (1 each) -> Dining wins alphabetically
        (2, 75.0, datetime(2024, 3, 2, 8), "Dining", 3, "UPI"),
        (2, 80.0, datetime(2024, 3, 4, 8), "Travel", 3, "UPI"),
        # user 3: null category only
        (3, 10.0, datetime(2024, 3, 3, 8), None, 4, "UPI"),
    ]
    return spark.createDataFrame(
        rows,
        "user_id long, amount double, transaction_date timestamp,"
        " category string, city_tier int, transaction_type string",
    )


def test_category_totals_skips_null(txns):
    out = {r.category: (r.transaction_count, r.total_amount) for r in A.category_totals(txns).collect()}
    assert out == {
        "Electronics": (2, 300.0),
        "Dining": (2, 125.0),
        "Travel": (1, 80.0),
    }


def test_daily_totals_zero_fills_gap(txns):
    rows = {str(r.day): (r.transaction_count, r.total_amount) for r in A.daily_totals(txns).collect()}
    # spine covers Mar 1..Mar 4 — 4 days, none missing
    assert len(rows) == 4
    assert rows["2024-03-01"] == (2, 300.0)
    assert rows["2024-03-02"] == (1, 75.0)
    # Mar 3 has only the null-category row -> still counted (count is per txn)
    assert rows["2024-03-03"] == (1, 10.0)


def test_daily_totals_zero_row_day(spark):
    df = spark.createDataFrame(
        [
            (1, 10.0, datetime(2024, 1, 1), "A", 1, "UPI"),
            (1, 20.0, datetime(2024, 1, 3), "A", 1, "UPI"),
        ],
        "user_id long, amount double, transaction_date timestamp,"
        " category string, city_tier int, transaction_type string",
    )
    rows = {str(r.day): r.transaction_count for r in A.daily_totals(df).collect()}
    assert rows == {"2024-01-01": 1, "2024-01-02": 0, "2024-01-03": 1}


def test_summary(txns):
    row = A.summary(txns).collect()[0]
    assert row.total_transactions == 6
    assert row.total_amount == 515.0
    assert row.unique_users == 3


def test_top_categories_deterministic_ties(spark):
    df = spark.createDataFrame(
        [(1, 10.0, datetime(2024, 1, 1), c, 1, "UPI") for c in ["B", "A", "C"]],
        "user_id long, amount double, transaction_date timestamp,"
        " category string, city_tier int, transaction_type string",
    )
    # equal totals -> alphabetical tiebreak
    assert [r.category for r in A.top_categories(df, n=2).collect()] == ["A", "B"]


def test_favorite_category_tiebreak(txns):
    out = {r.user_id: r.favorite_category for r in A.favorite_category(txns).collect()}
    assert out[1] == "Electronics"  # majority
    assert out[2] == "Dining"  # tie -> alphabetical
    assert 3 not in out  # all-null category user has no favorite


def test_user_search_pagination(txns):
    page1 = A.user_search(txns, min_transactions=1, page=1, per_page=2).collect()
    page2 = A.user_search(txns, min_transactions=1, page=2, per_page=2).collect()
    assert [r.user_id for r in page1] == [1, 2]
    assert [r.user_id for r in page2] == [3]


def test_user_search_filters(txns):
    out = A.user_search(txns, min_amount=100.0, min_transactions=2).collect()
    assert len(out) == 1 and out[0].user_id == 1 and out[0].transaction_count == 2


def test_trailing_rollups_window_boundaries(txns):
    # anchor = 2024-03-04; 2-day window covers (Mar 2, Mar 4]; 30-day all
    out = A.trailing_rollups(txns, windows=(2, 30)).collect()
    by_key = {(r.user_id, r.window_days): r for r in out}
    # user 1 in 2-day window: only the Mar 4 txn (Mar 1 txns outside)
    r = by_key[(1, 2)]
    assert r.total_transactions == 1 and r.total_amount == 50.0
    assert r.favorite_category == "Dining"
    r30 = by_key[(1, 30)]
    assert r30.total_transactions == 3 and r30.favorite_category == "Electronics"
    # period_start exclusive: user 2's Mar 2 txn is NOT in the 2-day window
    assert by_key[(2, 2)].total_transactions == 1
    # null-category user still gets totals, favorite is null
    assert by_key[(3, 30)].favorite_category is None
