#!/usr/bin/env python
"""End-to-end walkthrough of the engine: the reference's full workflow
(create rules -> dependency rewrite -> scheduled execution -> lineage ->
analytics) in one script.

Run: python examples/demo.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audience_manager_platform_spark.catalog import Catalog
from audience_manager_platform_spark.engine import AudienceEngine
from audience_manager_platform_spark.operators import analytics as A
from audience_manager_platform_spark.scheduler import Scheduler
from audience_manager_platform_spark.session import get_spark
from audience_manager_platform_spark.sources import (
    load_table,
    unified_transactions_from_events,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main():
    spark = get_spark("demo")
    txns = unified_transactions_from_events(load_table(spark, SF_DIR, "events"))
    workdir = tempfile.mkdtemp(prefix="amps_demo_")
    engine = AudienceEngine(spark, Catalog(workdir), lambda: txns)
    scheduler = Scheduler(engine)

    print("== create rules (dependency planner runs at create time)")
    r1 = engine.create_rule(
        "big_spenders",
        [{"field": "transaction_amount", "operator": ">", "value": "120"}],
        schedule="DAILY",
    )
    r2 = engine.create_rule(
        "tier1_users",
        [{"field": "city_tier", "operator": "=", "value": "1"}],
        schedule="DAILY",
    )
    r3 = engine.create_rule(
        "big_tier1",  # covered by r1+r2 -> rewritten to an intersection
        [
            {"field": "transaction_amount", "operator": ">", "value": "120"},
            {"field": "city_tier", "operator": "=", "value": "1"},
        ],
        schedule="DAILY",
    )
    print(f"   rule {r3.rule_id} rewritten: depends_on={r3.depends_on} op={r3.operation}")

    print("== scheduled run (dependency-ordered)")
    for rid, n in scheduler.run_due().items():
        print(f"   segment_output_{rid}: {n} users")

    print("== lineage")
    print("  ", engine.catalog.lineage(r3.rule_id))

    print("== segment sample")
    for row in engine.sample_segment(r3.rule_id, n=3):
        print("  ", row)

    print("== analytics over the same unified stream")
    A.top_categories(txns, n=3).show()
    A.trailing_rollups(txns, windows=(7, 30)).orderBy("user_id", "window_days").show(6)
    spark.stop()


if __name__ == "__main__":
    main()
