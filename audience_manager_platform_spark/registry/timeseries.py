"""Time-series resampling queries + deterministic fixed-size sampling.

``sample_fixed_n_events`` is the distributed replacement for reservoir
sampling: rank every row by a salted content hash (md5 — identical hex in
both engines) and keep the global top-n. Spark executes it as
TakeOrderedAndProject — per-partition top-n then a driver merge of n-row
heads — so no partition ever materializes more than n rows: the classic
"reservoir without coordination" at any scale, and (unlike rand()-based
sampling) replayable byte-for-byte from the salt.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import timeseries as TS
from ..sources import load_table

SAMPLE_N = 100
SAMPLE_SALT = "r3"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def _sample_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    key = F.md5(F.concat(F.col("event_id").cast("string"), F.lit(SAMPLE_SALT)))
    return (
        ev.select(
            "event_id",
            "user_id",
            "event_type",
            F.round("value", 2).alias("value"),
            key.alias("sample_key"),
        )
        .orderBy("sample_key")
        .limit(SAMPLE_N)
    )


QUERIES = {
    "ts_resample_locf": lambda s, d: TS.resample_locf(_events(s, d)),
    "ts_interpolate_linear": lambda s, d: TS.interpolate_linear(_events(s, d)),
    "ts_ohlc_daily": lambda s, d: TS.ohlc_daily(_events(s, d)),
    "ts_ewma_smooth": lambda s, d: TS.ewma_smooth(_events(s, d)),
    # r5 (deferred window): daily tail-latency bands
    "ts_daily_percentiles": lambda s, d: TS.daily_percentiles(_events(s, d)),
    # r5: ISO day-of-week seasonal index (deseasonalization baseline)
    "ts_seasonality_profile": lambda s, d: TS.seasonality_profile(
        _events(s, d)
    ),
    # r7 wave 28 (r8 queue): classical additive trend/seasonal/residual
    # split on the exact integer micro-grid
    "ts_seasonal_decompose": lambda s, d: TS.seasonal_decompose(
        _events(s, d)
    ),
    "sample_fixed_n_events": _sample_fixed,
    # r5: sliding two-window mean-shift scan (top-k candidate
    # changepoint days per event_type series)
    "ts_changepoint_mean_shift": lambda s, d: TS.changepoint_mean_shift(
        _events(s, d)
    ),
    # r6 queue: rolling OLS slope + r² per series (trend extraction)
    # r6 queue: the week-seasonal forecast floor + MAPE/bias grading
    "ts_seasonal_naive_backtest": lambda s, d: TS.seasonal_naive_backtest(
        _events(s, d)
    ),
    # r6 queue: ACF per series from exact integer-cent sums
    "ts_autocorrelation": lambda s, d: TS.autocorrelation(_events(s, d)),
    # r5 wave 12: Holt level+trend one-step backtest — dyadic halving
    # recurrence replayed by a recursive-CTE twin
    "ts_holt_linear_backtest": lambda s, d: TS.holt_linear_backtest(
        _events(s, d)
    ),
    "ts_rolling_regression": lambda s, d: TS.rolling_regression(
        _events(s, d)
    ),
    # wave 17: lead/lag CCF — does one series drive the other, and with
    # how many days' delay (the x == y special case is ts_autocorrelation)
    "ts_crosscorr_lead_lag": lambda s, d: TS.crosscorr_lead_lag(
        _events(s, d)
    ),
    # wave 24: point anomalies vs a one-step-ahead EWMA baseline (the
    # alert rule beside the changepoint scan's level-shift detection)
    "ts_ewma_anomaly": lambda s, d: TS.ewma_anomaly(_events(s, d)),
    # r7 wave 29 (r8 queue): distribution-free uncertainty bands —
    # split-conformal qhat on calibration, coverage graded on test
    "ts_conformal_interval": lambda s, d: TS.conformal_interval_backtest(
        _events(s, d)
    ),
    # r7 wave 33 (r8 queue): sequential drift detection — prefix-sum
    # closed form of the one-sided CUSUM recurrences
    "ts_cusum_alarm": lambda s, d: TS.cusum_alarm(_events(s, d)),
    # r7 wave 36 (r8 queue): peak-to-trough drawdown per revenue series
    "ts_max_drawdown": lambda s, d: TS.max_drawdown(_events(s, d)),
    # r7 wave 38 (r8 queue): median-of-pairwise-slopes robust trend on
    # the aggregated day table (exact micro slopes)
    "ts_theilsen_trend": lambda s, d: TS.theilsen_trend(_events(s, d)),
    # r10 wave 52: Mann-Kendall monotone-trend TEST (tie-corrected S/z)
    # beside the Theil-Sen slope ESTIMATE, same aggregated-day bound
    "ts_mann_kendall": lambda s, d: TS.mann_kendall_trend(_events(s, d)),
    # r7 wave 39 (r8 queue): Hyndman seasonal/trend strength over the
    # exact decomposition (forecaster-selection gate)
    "ts_seasonal_strength": lambda s, d: TS.seasonal_strength(
        _events(s, d)
    ),
}

ORACLES = {
    "ts_resample_locf": TS.resample_locf_sql(),
    "ts_interpolate_linear": TS.interpolate_linear_sql(),
    "ts_ohlc_daily": TS.ohlc_daily_sql(),
    "ts_ewma_smooth": TS.ewma_smooth_sql(),
    "ts_daily_percentiles": TS.daily_percentiles_sql(),
    "ts_seasonality_profile": TS.seasonality_profile_sql(),
    "ts_seasonal_decompose": TS.seasonal_decompose_sql(),
    "ts_changepoint_mean_shift": TS.changepoint_mean_shift_sql(),
    "ts_rolling_regression": TS.rolling_regression_sql(),
    "ts_seasonal_naive_backtest": TS.seasonal_naive_backtest_sql(),
    "ts_autocorrelation": TS.autocorrelation_sql(),
    "ts_crosscorr_lead_lag": TS.crosscorr_lead_lag_sql(),
    "ts_holt_linear_backtest": TS.holt_linear_backtest_sql(),
    "ts_ewma_anomaly": TS.ewma_anomaly_sql(),
    "ts_conformal_interval": TS.conformal_interval_backtest_sql(),
    "ts_cusum_alarm": TS.cusum_alarm_sql(),
    "ts_max_drawdown": TS.max_drawdown_sql(),
    "ts_theilsen_trend": TS.theilsen_trend_sql(),
    "ts_mann_kendall": TS.mann_kendall_trend_sql(),
    "ts_seasonal_strength": TS.seasonal_strength_sql(),
    "sample_fixed_n_events": f"""
        SELECT event_id, user_id, event_type, ROUND(value, 2) AS value,
               MD5(CAST(event_id AS VARCHAR) || '{SAMPLE_SALT}') AS sample_key
        FROM events
        ORDER BY sample_key
        LIMIT {SAMPLE_N}
    """,
}
