"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``audience_manager_platform_spark``; this module
stays a thin adapter. See ``audience_manager_platform_spark/registry`` for
the per-family query/oracle definitions.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from audience_manager_platform_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's core
    capability — a rule (WHERE + HAVING conditions) compiled to a per-user
    segment aggregate over the unified transaction stream."""
    from audience_manager_platform_spark.registry.rules import _rule_query

    flagship = [
        {"field": "transaction_amount", "operator": ">=", "value": "100"},
        {"field": "category", "operator": "!=", "value": "error"},
        {"field": "transaction_count", "operator": ">", "value": 5},
    ]
    return _rule_query(flagship)(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query."""
    return registry.oracle_sql()
