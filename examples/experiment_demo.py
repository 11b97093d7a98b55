#!/usr/bin/env python
"""Experiment-analytics walkthrough: the A/B readout pipeline composed
the way a metrics platform runs it — sanity gates first, then the
omnibus test, then pairwise drill-down under multiple-testing control,
then effect sizing, variance reduction, robust metrics, and design
feedback for the next experiment.

Run: python examples/experiment_demo.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audience_manager_platform_spark.operators import analytics as A
from audience_manager_platform_spark.session import get_spark
from audience_manager_platform_spark.sources import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def show(title, df, n=10):
    print(f"\n=== {title}")
    df.show(n, truncate=False)


def main():
    spark = get_spark("experiment-demo")
    events = load_table(spark, SF_DIR, "events")

    # 1. sanity gates: is the assignment itself broken?
    show("sample-ratio mismatch check", A.ab_srm_check(events))
    show("covariate balance (pre-period SMD)", A.ab_smd_balance(events))

    # 2. omnibus: does ANY arm differ?
    show("one-way ANOVA F across arms", A.anova_oneway_arms(events))
    show("Kruskal-Wallis H (rank-based)", A.kruskal_wallis_arms(events))

    # 3. which pairs? — under multiple-testing control
    show("pairwise Welch t", A.welch_pairwise_arms(events))
    show("Benjamini-Hochberg step-up over the pairs", A.welch_bh_fdr(events))

    # 4. effect estimation: variance-reduced and confounding-adjusted
    show("CUPED adjustment", A.cuped_adjustment(events))
    show("stratified (IPW-equivalent) ATE", A.stratified_ate(events))

    # 5. uncertainty + robustness of the headline metric
    show("Poisson-bootstrap 95% CI for mean spend",
         A.poisson_bootstrap_ci(events))
    show("winsorized / trimmed mean (whale defense)",
         A.winsorized_mean(events))

    # 6. design the NEXT experiment
    show("minimum detectable effect per pair", A.mde_power_arms(events))

    spark.stop()


if __name__ == "__main__":
    main()
