"""Analytics query family (SURVEY.md A3-A8, O1-O4, J1) on the events
fixture through the transactions adapter."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import analytics as A
from ..sources import load_table, unified_transactions_from_events
from ..sources.transactions import EVENTS_AS_TRANSACTIONS_SQL

_T = f"WITH t AS ({EVENTS_AS_TRANSACTIONS_SQL})"


def _txns(spark: SparkSession, sf_dir: str) -> DataFrame:
    return unified_transactions_from_events(load_table(spark, sf_dir, "events"))


def _category_totals(spark, sf_dir):
    return A.category_totals(_txns(spark, sf_dir))


def _day_as_str(df):
    # DATE-typed outputs land as python `date` objects from Spark but
    # datetime64 from DuckDB -> hash-unstable across engines. The contract
    # renders calendar days as ISO strings on both sides.
    from pyspark.sql import functions as F

    return df.withColumn("day", F.date_format("day", "yyyy-MM-dd"))


def _daily_totals(spark, sf_dir):
    return _day_as_str(A.daily_totals(_txns(spark, sf_dir)))


def _daily_totals_sparse(spark, sf_dir):
    return _day_as_str(
        A.daily_totals(A.filter_transactions(_txns(spark, sf_dir), min_amount=300.0))
    )


def _summary(spark, sf_dir):
    return A.summary(_txns(spark, sf_dir))


def _top_categories(spark, sf_dir):
    return A.top_categories(_txns(spark, sf_dir), n=3)


def _user_search(spark, sf_dir):
    return A.user_search(
        _txns(spark, sf_dir),
        min_amount=50.0,
        city_tier=2,
        min_transactions=5,
        page=2,
        per_page=10,
    )


def _favorite_category(spark, sf_dir):
    return A.favorite_category(_txns(spark, sf_dir))


def _trailing_rollups(spark, sf_dir):
    from pyspark.sql import functions as F

    df = A.trailing_rollups(_txns(spark, sf_dir), windows=(7, 14, 30))
    return df.withColumn(
        "period_start", F.date_format("period_start", "yyyy-MM-dd")
    ).withColumn("period_end", F.date_format("period_end", "yyyy-MM-dd"))


def _segment_overlap_matrix(spark, sf_dir):
    from pyspark.sql import functions as F

    from ..operators.segments import segment_overlap_matrix

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.round(
            F.sum(
                F.when(F.col("event_type") == "purchase", F.col("value"))
                .otherwise(F.lit(0.0))
            ),
            2,
        ).alias("spend"),
        F.count("*").alias("n_events"),
        F.max((F.col("event_type") == "signup").cast("int")).alias("has_signup"),
        F.max((F.col("event_type") == "error").cast("int")).alias("has_error"),
    )
    segs = (
        "CASE WHEN spend > 300 THEN 'big_spender' END",
        "CASE WHEN n_events >= 70 THEN 'high_activity' END",
        "CASE WHEN has_signup = 1 THEN 'registered' END",
        "CASE WHEN has_error = 1 THEN 'error_prone' END",
    )
    memberships = per_user.select(
        "user_id",
        F.explode(
            F.expr(f"filter(array({', '.join(segs)}), x -> x IS NOT NULL)")
        ).alias("segment"),
    )
    return segment_overlap_matrix(memberships)


QUERIES = {
    "analytics_category_totals": _category_totals,
    "analytics_daily_totals": _daily_totals,
    "analytics_daily_totals_sparse": _daily_totals_sparse,
    "analytics_summary": _summary,
    "analytics_top_categories": _top_categories,
    "analytics_user_search": _user_search,
    "analytics_favorite_category": _favorite_category,
    "analytics_trailing_rollups": _trailing_rollups,
    "analytics_cohort_retention": lambda s, d: A.cohort_retention(_txns(s, d)),
    # r6 queue: cumulative LTV per acquisition cohort by week age
    "analytics_ltv_cohort_curve": lambda s, d: A.ltv_cohort_curve(
        load_table(s, d, "events")
    ),
    "analytics_daily_anomalies": lambda s, d: A.daily_anomalies(
        load_table(s, d, "events")
    ),
    # r4: last-touch attribution — one LOCF window per user, no
    # purchases⋈clicks self-join
    "analytics_last_touch_attribution": lambda s, d: A.last_touch_attribution(
        load_table(s, d, "events")
    ),
    # r4 window: RFM segmentation, session-path mining, linear attribution —
    # the audience-platform trio (quantile-threshold scoring, gaps-and-
    # islands paths, RANGE-frame multi-touch credit)
    "analytics_rfm_segments": lambda s, d: A.rfm_segments(
        load_table(s, d, "events")
    ),
    "analytics_top_session_paths": lambda s, d: A.top_session_paths(
        load_table(s, d, "events")
    ),
    "analytics_linear_attribution": lambda s, d: A.linear_attribution(
        load_table(s, d, "events")
    ),
    # r5 (deferred window): pairwise audience overlap — the campaign-
    # planning matrix; one membership derivation, user-keyed self-join
    "segment_overlap_matrix": _segment_overlap_matrix,
    # r5 (deferred window): the engagement-dashboard session table
    "analytics_session_metrics": lambda s, d: A.session_metrics(
        load_table(s, d, "events")
    ),
    # r5 (deferred window): funnel time-to-convert percentile bands
    "analytics_funnel_latency": lambda s, d: A.funnel_latency(
        load_table(s, d, "events")
    ),
    # r5 (deferred window): Markov transitions + bot-burst profile
    "analytics_event_transitions": lambda s, d: A.event_transitions(
        load_table(s, d, "events")
    ),
    # r5 wave 4: two-proportion A/B conversion z-test
    "analytics_ab_conversion_ztest": lambda s, d: A.ab_conversion_ztest(
        load_table(s, d, "events")
    ),
    "analytics_burst_stats": lambda s, d: A.burst_stats(
        load_table(s, d, "events")
    ),
    # r5 wave 12: freshness-weighted ranking on the exact weekly-halving
    # integer grid (no libm pow in the contract)
    "analytics_decayed_popularity": lambda s, d: A.decayed_popularity(
        load_table(s, d, "events")
    ),
    # r5 wave 14: U-shaped attribution — exact integer ppm credits,
    # conservation by construction
    "analytics_position_attribution": lambda s, d: A.position_attribution(
        load_table(s, d, "events")
    ),
    # r5 wave 14: top-k users covering 80% of revenue (Pareto check)
    "analytics_pareto_coverage": lambda s, d: A.pareto_coverage(
        load_table(s, d, "events")
    ),
    # r5 wave 15: Kaplan-Meier retention (censoring-aware churn curve)
    "analytics_survival_km": lambda s, d: A.survival_retention(
        load_table(s, d, "events")
    ),
    # r7 wave 29 (r8 queue): diff-in-differences exposure uplift on the
    # exact cents/micro grid (pre columns = the parallel-trends check)
    "analytics_exposure_uplift": lambda s, d: A.exposure_uplift(
        load_table(s, d, "events")
    ),
    # r7 wave 29 (r8 queue): in-sample order-1 vs order-2 majority
    # next-event predictor accuracy — the sequence-memory diagnostic
    "analytics_markov_order2_lift": lambda s, d: A.markov_order2_lift(
        load_table(s, d, "events")
    ),
    # r7 wave 32 (r8 queue): exact-rational Simpson concentration
    # bands (the ln-free diversity measure)
    "analytics_simpson_diversity": lambda s, d: A.simpson_diversity_bands(
        load_table(s, d, "events")
    ),
    # r7 wave 33 (r8 queue): inter-event gap distribution — the
    # empirical sessionization-threshold chooser
    "analytics_intervent_gap_bands": lambda s, d: A.interevent_gap_bands(
        load_table(s, d, "events")
    ),
    # r7 wave 36 (r8 queue): sample-ratio-mismatch gate (chi-square
    # 1df in exact milli units over the hash-assigned arms)
    "analytics_ab_srm_check": lambda s, d: A.ab_srm_check(
        load_table(s, d, "events")
    ),
    # r7 wave 37 (r8 queue): nth-purchase survival curve (exact ppm
    # stage-to-stage return rates)
    "analytics_repeat_purchase_curve": lambda s, d: (
        A.repeat_purchase_curve(load_table(s, d, "events"))
    ),
    # r7 wave 38 (r8 queue): weekly new/retained/resurrected/churned
    # decomposition + exact quick ratio (arithmetic week buckets)
    "analytics_growth_accounting": lambda s, d: A.growth_accounting(
        load_table(s, d, "events")
    ),
    # r7 wave 39 (r8 queue): day-over-day spike decomposition by type
    "analytics_delta_attribution": lambda s, d: A.delta_attribution(
        load_table(s, d, "events")
    ),
    # r7 wave 40 (r8 queue): Oaxaca mix/rate decomposition of the
    # period-over-period average change (exact pico grid)
    "analytics_mix_rate_decomposition": lambda s, d: (
        A.mix_rate_decomposition(load_table(s, d, "events"))
    ),
    # r8 wave 41: difference-in-differences readout — hash-arm x
    # midpoint-period 2x2 cell means in exact micro-cents, the causal
    # estimate that cancels level differences and shared trends
    "analytics_diff_in_diff": lambda s, d: A.diff_in_diff(
        load_table(s, d, "events")
    ),
    # r8 wave 42 (r9 queue): CUPED variance reduction — theta from
    # mean-centered exact-integer Cov/Var, per-arm raw vs adjusted means
    "analytics_cuped_adjustment": lambda s, d: A.cuped_adjustment(
        load_table(s, d, "events")
    ),
    # r8 wave 42 (r9 queue): Wald SPRT daily monitor — exact bigint LLR
    # on the 1e-9 grid (inlined ln constants), valid-at-every-look
    "analytics_sprt_monitor": lambda s, d: A.sprt_monitor(
        load_table(s, d, "events")
    ),
    # r8 wave 42 (r9 queue): uplift-by-decile / Qini curve grading the
    # pre-period-spend targeting score against the hash arms
    "analytics_qini_uplift": lambda s, d: A.qini_uplift_deciles(
        load_table(s, d, "events")
    ),
    # r5 (deferred window): WAU / trailing-4-week MAU stickiness
    "analytics_stickiness": lambda s, d: A.stickiness(
        load_table(s, d, "events")
    ),
    # r5 (deferred window): revenue concentration + acquisition split
    "analytics_revenue_gini": lambda s, d: A.revenue_gini(
        load_table(s, d, "events")
    ),
    "analytics_new_vs_returning": lambda s, d: A.new_vs_returning(
        load_table(s, d, "events")
    ),
    # r5 (deferred window): robust anomaly flags + percentile tiering
    "analytics_daily_anomalies_robust": lambda s, d: A.daily_anomalies_robust(
        load_table(s, d, "events")
    ),
    "analytics_spend_percentile_rank": lambda s, d: A.spend_percentile_rank(
        load_table(s, d, "events")
    ),
    # r9 wave 47: feature-scoring audits (WOE/IV + chi-square over the
    # modal pre-period feature) and the A/B covariate-balance SMD check
    "feature_woe_iv_event_mix": lambda s, d: A.woe_iv_feature(
        load_table(s, d, "events")
    ),
    "feature_chi2_conversion": lambda s, d: A.chi2_feature_conversion(
        load_table(s, d, "events")
    ),
    "analytics_ab_smd_balance": lambda s, d: A.ab_smd_balance(
        load_table(s, d, "events")
    ),
    # r9 wave 48: multi-arm experiment readouts — one-way ANOVA F and
    # the rank-based Kruskal-Wallis H (midranks via the sharded rank)
    "analytics_anova_arms": lambda s, d: A.anova_oneway_arms(
        load_table(s, d, "events")
    ),
    "analytics_kruskal_wallis": lambda s, d: A.kruskal_wallis_arms(
        load_table(s, d, "events")
    ),
    # r10 wave 49: per-pair Welch t drill-down of the ANOVA omnibus F
    "analytics_welch_pairwise": lambda s, d: A.welch_pairwise_arms(
        load_table(s, d, "events")
    ),
    # r10 wave 50: the experiment-ops completion arc — multiple-testing
    # control over the Welch pairs, design-side MDE/power, and the
    # stratified (per-stratum-propensity IPW) ATE under a synthetically
    # confounded treatment
    "analytics_welch_bh_fdr": lambda s, d: A.welch_bh_fdr(
        load_table(s, d, "events")
    ),
    "analytics_mde_power": lambda s, d: A.mde_power_arms(
        load_table(s, d, "events")
    ),
    "analytics_stratified_ate": lambda s, d: A.stratified_ate(
        load_table(s, d, "events")
    ),
    # r10 wave 51: deterministic Poisson-bootstrap CI for the mean —
    # cluster-scale resampling as weighted map-side sums, never copies
    "analytics_poisson_bootstrap_ci": lambda s, d: A.poisson_bootstrap_ci(
        load_table(s, d, "events")
    ),
    # r10 wave 51: exact winsorized/trimmed means via the sharded rank
    "analytics_winsorized_mean": lambda s, d: A.winsorized_mean(
        load_table(s, d, "events")
    ),
    # r10 wave 53: mixture-SPRT always-valid p per pair (peeking-proof)
    "analytics_msprt_always_valid": lambda s, d: A.msprt_always_valid(
        load_table(s, d, "events")
    ),
}

_DAILY_TOTALS_TMPL = """
{base},
d AS (
  SELECT CAST(transaction_date AS DATE) AS day,
         COUNT(*) AS transaction_count,
         ROUND(SUM(amount), 2) AS total_amount
  FROM src WHERE transaction_date IS NOT NULL GROUP BY 1
),
bounds AS (
  SELECT MIN(CAST(transaction_date AS DATE)) AS lo,
         MAX(CAST(transaction_date AS DATE)) AS hi
  FROM src
),
spine AS (
  SELECT CAST(UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds
)
SELECT strftime(spine.day, '%Y-%m-%d') AS day,
       COALESCE(d.transaction_count, 0) AS transaction_count,
       COALESCE(d.total_amount, 0.0) AS total_amount
FROM spine LEFT JOIN d USING (day)
"""

ORACLES = {
    "analytics_ltv_cohort_curve": A.ltv_cohort_curve_sql(),
    "analytics_cohort_retention": f"""
        {_T},
        active AS (
          SELECT DISTINCT user_id,
                 date_diff('day', DATE '1970-01-01',
                           CAST(transaction_date AS DATE)) // 7 AS week_num
          FROM t WHERE transaction_date IS NOT NULL
        ),
        cohorts AS (
          SELECT user_id, MIN(week_num) AS cohort_week FROM active GROUP BY user_id
        )
        SELECT strftime(DATE '1970-01-01' + CAST(cohort_week * 7 AS INTEGER),
                        '%Y-%m-%d') AS cohort_week_start,
               week_num - cohort_week AS week_offset,
               COUNT(*) AS n_users
        FROM active JOIN cohorts USING (user_id)
        GROUP BY cohort_week, week_offset
    """,
    "analytics_category_totals": f"""
        {_T}
        SELECT category,
               COUNT(*) AS transaction_count,
               ROUND(SUM(amount), 2) AS total_amount
        FROM t WHERE category IS NOT NULL GROUP BY category
    """,
    "analytics_daily_totals": _DAILY_TOTALS_TMPL.format(
        base=f"{_T}, src AS (SELECT * FROM t)"
    ),
    "analytics_daily_totals_sparse": _DAILY_TOTALS_TMPL.format(
        base=f"{_T}, src AS (SELECT * FROM t WHERE amount >= 300.0)"
    ),
    "analytics_summary": f"""
        {_T}
        SELECT COUNT(*) AS total_transactions,
               ROUND(SUM(amount), 2) AS total_amount,
               ROUND(AVG(amount), 2) AS avg_amount,
               COUNT(DISTINCT user_id) AS unique_users
        FROM t
    """,
    "analytics_top_categories": f"""
        {_T}
        SELECT category,
               COUNT(*) AS transaction_count,
               ROUND(SUM(amount), 2) AS total_amount
        FROM t WHERE category IS NOT NULL GROUP BY category
        ORDER BY total_amount DESC, category ASC LIMIT 3
    """,
    "analytics_user_search": f"""
        {_T}
        SELECT user_id,
               COUNT(*) AS transaction_count,
               ROUND(SUM(amount), 2) AS total_amount
        FROM t WHERE amount >= 50.0 AND city_tier = 2
        GROUP BY user_id HAVING COUNT(*) >= 5
        ORDER BY user_id LIMIT 10 OFFSET 10
    """,
    "analytics_favorite_category": f"""
        {_T},
        cc AS (
          SELECT user_id, category, COUNT(*) AS cnt
          FROM t WHERE category IS NOT NULL GROUP BY user_id, category
        )
        SELECT user_id, category AS favorite_category
        FROM (
          SELECT *, ROW_NUMBER() OVER (
            PARTITION BY user_id ORDER BY cnt DESC, category ASC) AS rn
          FROM cc
        ) ranked WHERE rn = 1
    """,
    "analytics_trailing_rollups": f"""
        {_T},
        anchor AS (SELECT MAX(CAST(transaction_date AS DATE)) AS period_end FROM t),
        w AS (SELECT UNNEST([7, 14, 30]) AS window_days),
        spec AS (
          SELECT window_days,
                 period_end - window_days AS period_start,
                 period_end
          FROM anchor CROSS JOIN w
        ),
        tagged AS (
          SELECT t.*, spec.window_days, spec.period_start, spec.period_end
          FROM t JOIN spec
            ON CAST(t.transaction_date AS DATE) > spec.period_start
           AND CAST(t.transaction_date AS DATE) <= spec.period_end
        ),
        totals AS (
          SELECT user_id, window_days, period_start, period_end,
                 COUNT(*) AS total_transactions,
                 ROUND(CAST(SUM(CAST(amount AS DECIMAL(18,4))) AS DOUBLE), 2)
                   AS total_amount,
                 MAX(transaction_date) AS last_transaction_date,
                 MAX(city_tier) AS city_tier
          FROM tagged
          GROUP BY user_id, window_days, period_start, period_end
        ),
        cc AS (
          SELECT user_id, window_days, category, COUNT(*) AS cnt
          FROM tagged WHERE category IS NOT NULL
          GROUP BY user_id, window_days, category
        ),
        fav AS (
          SELECT user_id, window_days, category AS favorite_category
          FROM (
            SELECT *, ROW_NUMBER() OVER (
              PARTITION BY user_id, window_days
              ORDER BY cnt DESC, category ASC) AS rn
            FROM cc
          ) ranked WHERE rn = 1
        )
        SELECT totals.user_id, totals.window_days, totals.total_transactions,
               totals.total_amount, totals.last_transaction_date,
               fav.favorite_category, totals.city_tier,
               strftime(totals.period_start, '%Y-%m-%d') AS period_start,
               strftime(totals.period_end, '%Y-%m-%d') AS period_end
        FROM totals LEFT JOIN fav USING (user_id, window_days)
    """,
    "analytics_daily_anomalies": A.daily_anomalies_sql(),
    "analytics_last_touch_attribution": A.last_touch_attribution_sql(),
    "analytics_rfm_segments": A.rfm_segments_sql(),
    "analytics_top_session_paths": A.top_session_paths_sql(),
    "analytics_linear_attribution": A.linear_attribution_sql(),
    "analytics_session_metrics": A.session_metrics_sql(),
    "analytics_funnel_latency": A.funnel_latency_sql(),
    "analytics_event_transitions": A.event_transitions_sql(),
    "analytics_ab_conversion_ztest": A.ab_conversion_ztest_sql(),
    "analytics_burst_stats": A.burst_stats_sql(),
    "analytics_decayed_popularity": A.decayed_popularity_sql(),
    "analytics_position_attribution": A.position_attribution_sql(),
    "analytics_pareto_coverage": A.pareto_coverage_sql(),
    "analytics_survival_km": A.survival_retention_sql(),
    "analytics_exposure_uplift": A.exposure_uplift_sql(),
    "analytics_markov_order2_lift": A.markov_order2_lift_sql(),
    "analytics_simpson_diversity": A.simpson_diversity_bands_sql(),
    "analytics_intervent_gap_bands": A.interevent_gap_bands_sql(),
    "analytics_windowed_funnel": A.windowed_funnel_sql(),
    "analytics_ab_srm_check": A.ab_srm_check_sql(),
    "analytics_repeat_purchase_curve": A.repeat_purchase_curve_sql(),
    "analytics_growth_accounting": A.growth_accounting_sql(),
    "analytics_delta_attribution": A.delta_attribution_sql(),
    "analytics_mix_rate_decomposition": A.mix_rate_decomposition_sql(),
    "analytics_diff_in_diff": A.diff_in_diff_sql(),
    "analytics_cuped_adjustment": A.cuped_adjustment_sql(),
    "analytics_sprt_monitor": A.sprt_monitor_sql(),
    "analytics_qini_uplift": A.qini_uplift_deciles_sql(),
    "analytics_stickiness": A.stickiness_sql(),
    "analytics_revenue_gini": A.revenue_gini_sql(),
    "analytics_new_vs_returning": A.new_vs_returning_sql(),
    "analytics_daily_anomalies_robust": A.daily_anomalies_robust_sql(),
    "analytics_spend_percentile_rank": A.spend_percentile_rank_sql(),
    "feature_woe_iv_event_mix": A.woe_iv_feature_sql(),
    "feature_chi2_conversion": A.chi2_feature_conversion_sql(),
    "analytics_ab_smd_balance": A.ab_smd_balance_sql(),
    "analytics_anova_arms": A.anova_oneway_arms_sql(),
    "analytics_kruskal_wallis": A.kruskal_wallis_arms_sql(),
    "analytics_welch_pairwise": A.welch_pairwise_arms_sql(),
    "analytics_welch_bh_fdr": A.welch_bh_fdr_sql(),
    "analytics_mde_power": A.mde_power_arms_sql(),
    "analytics_stratified_ate": A.stratified_ate_sql(),
    "analytics_poisson_bootstrap_ci": A.poisson_bootstrap_ci_sql(),
    "analytics_winsorized_mean": A.winsorized_mean_sql(),
    "analytics_msprt_always_valid": A.msprt_always_valid_sql(),
    "segment_overlap_matrix": """
        WITH per_user AS (
          SELECT user_id,
                 ROUND(SUM(CASE WHEN event_type = 'purchase'
                                THEN value ELSE 0.0 END), 2) AS spend,
                 COUNT(*) AS n_events,
                 MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                   AS has_signup,
                 MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                   AS has_error
          FROM events GROUP BY user_id
        ),
        m AS (
          SELECT 'big_spender' AS segment, user_id FROM per_user
          WHERE spend > 300
          UNION ALL
          SELECT 'high_activity', user_id FROM per_user WHERE n_events >= 70
          UNION ALL
          SELECT 'registered', user_id FROM per_user WHERE has_signup = 1
          UNION ALL
          SELECT 'error_prone', user_id FROM per_user WHERE has_error = 1
        )
        SELECT x.segment AS seg_a, y.segment AS seg_b,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM m x JOIN m y
          ON x.user_id = y.user_id AND x.segment <= y.segment
        GROUP BY 1, 2
    """,
}
