"""Skew-safe aggregation (SURVEY.md §7 / scale posture: "skewed keys →
salting or AQE skew-join").

AQE handles skewed *joins* automatically; a skewed *aggregation* key (one
user with 100M events) still funnels a whole key into one reduce task.
Two-phase salted aggregation bounds per-task load for algebraic
aggregates: partial-aggregate on (key, salt), then final-aggregate on key.
Results are exactly equal to the direct groupBy — only the shuffle
topology changes — so the same SQL oracle applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame, key: str, value_col: str, salt_buckets: int = 16
) -> DataFrame:
    """count + sum per key, salted. Algebraic aggregates only (sum/count/
    min/max compose across partials; avg = sum/count at the end)."""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))
    )
    partial = salted.groupBy(key, "_salt").agg(
        F.count("*").alias("_cnt"), F.sum(value_col).alias("_sum")
    )
    return partial.groupBy(key).agg(
        F.sum("_cnt").alias("n"),
        F.round(F.sum("_sum"), 2).alias("total"),
    )
