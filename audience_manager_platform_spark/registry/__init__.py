"""Registry of every implemented query/operator, exposed to the driver via
``__spark_entry__.py``.

Each family module defines ``QUERIES: dict[str, Callable[[SparkSession,
str], DataFrame]]`` and ``ORACLES: dict[str, str]`` (ANSI SQL for DuckDB
over the fixture views). Names are shared between the two dicts; a query
without an oracle gets the driver's weaker rows-only check (reserved for
genuinely non-SQL-expressible operators).

Conventions that keep the driver's hash compare stable:

- every aggregate/computed column is aliased identically in both the Spark
  plan and the oracle SQL;
- double-typed aggregates are rounded (2dp money, 6dp ratios) on BOTH
  sides, so independent floating-point summation orders can't flip a hash;
- any top-k / limit query carries a total order with a unique tiebreaker.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import rules


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        out.update(mod.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(mod.ORACLES)
    return out


def _modules():
    mods = [rules]
    for name in (
        "analytics",
        "tpch",
        "textops",
        "similarity",
        "windows",
        "streaming",
        "relational",
        "tpch_extra",
        "tpch_wave3",
        "warehouse",
    ):
        try:
            mods.append(__import__(f"{__name__}.{name}", fromlist=[name]))
        except ImportError as exc:  # degrade to the importable families,
            # but never silently: a broken module would otherwise just
            # vanish from the correctness gate
            import sys

            print(
                f"registry: SKIPPING family '{name}' (import failed: {exc})",
                file=sys.stderr,
            )
    return mods
