"""Registry-wide plan enforcement: every one of the ~190 queries'
physical plans is scanned for 100 TB red flags (row-at-a-time Python,
undeclared cartesian/nested-loop joins, undeclared Python kernels) —
the allowlists in tools/audit_plans.py are the single source of truth,
so a new operator with a scale-hostile plan fails CI instead of
shipping. Runs at sf0.001 (plan SHAPE is sf-independent)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))


def test_registry_plans_have_no_undeclared_red_flags(spark):
    from audit_plans import audit

    rows, violations = audit(spark, "/root/testdata/sf0.001")
    assert len(rows) >= 185  # the whole registry was actually scanned
    assert not violations, violations


def test_allowlists_contain_no_stale_names():
    """Every allowlisted name must still exist in the registry — a
    renamed query would otherwise silently lose its enforcement."""
    from audience_manager_platform_spark import registry
    from audit_plans import (
        ARROW_ALLOWED,
        GLOBAL_WINDOW_ALLOWED,
        NESTED_LOOP_ALLOWED,
    )

    names = set(registry.queries())
    stale = (
        NESTED_LOOP_ALLOWED | ARROW_ALLOWED | GLOBAL_WINDOW_ALLOWED
    ) - names
    assert not stale, stale


def test_global_window_bounds_cover_exactly_the_allowlist():
    from audit_plans import GLOBAL_WINDOW_ALLOWED, GLOBAL_WINDOW_BOUNDS

    assert frozenset(GLOBAL_WINDOW_BOUNDS) == GLOBAL_WINDOW_ALLOWED
    # every bound is far below the sf0.01 fact sizes it exists to exclude
    assert all(0 < b <= 2048 for b in GLOBAL_WINDOW_BOUNDS.values())


def test_global_window_input_measurement_sees_data_sized_inputs(spark):
    """The r10 bound enforcement is only as good as its measurement: a
    deliberately data-sized global window must be measured at its true
    input row count (this is the failure a wrong refactor produces —
    the audit then trips the per-name bound instead of riding the
    allowlist)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from audit_plans import global_window_input_counts

    def fake(s, d):
        df = s.range(5000).select(F.col("id").alias("v"))
        return df.withColumn(
            "rn", F.row_number().over(Window.orderBy("v"))
        )

    counts = global_window_input_counts(spark, "unused", fake)
    assert counts == [5000]
