"""Window-function surface (SURVEY.md §2.5, O1-O4 generalized).

The reference uses no window functions directly — its one windowing-shaped
computation (per-user argmax) is a correlated subquery we decorrelate in
:mod:`.analytics`. The engine still exposes the standard surface because
segment rules of the form "top-N per user" / "running spend" need it.

Determinism rule for anything that ranks or pages: the ORDER BY must be a
total order (unique tiebreaker column), otherwise results are
partition-order-dependent under distributed execution.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_n_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    n: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-N rows per group via ``row_number`` — one shuffle on the
    partition keys; no global sort."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= n)
    )


def running_total(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    value_col: str,
    out_col: str = "running_total",
) -> DataFrame:
    """Cumulative sum per group, frame = unbounded preceding..current row.
    The frame order is the summation order on every engine, so results are
    bitwise deterministic given a total order."""
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out_col, F.sum(value_col).over(w))
