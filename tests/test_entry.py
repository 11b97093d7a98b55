"""Driver-contract smoke: entry() returns rows with a stable schema; every
queries() key resolves; oracle coverage is tracked."""

import __spark_entry__ as e


def test_entry_returns_rows(spark):
    df = e.entry(spark)
    assert df.columns == [
        "user_id",
        "total_transactions",
        "total_spent",
        "transaction_types",
    ]
    assert df.count() > 0


def test_queries_and_oracles_aligned():
    qs, oracles = e.queries(), e.oracle_sql()
    assert qs, "no queries registered"
    missing = set(oracles) - set(qs)
    assert not missing, f"oracles without queries: {missing}"
