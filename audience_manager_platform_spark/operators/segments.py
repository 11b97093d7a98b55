"""Compound-segment set algebra (SURVEY.md §2.7, U2-U6).

The reference combines parent segments with UNION / INTERSECTION /
DIFFERENCE over the full 4-column rows
(``backend/app/processor/segment_operations.py:13-50``). Two quirks this
module fixes deliberately:

- Q6: the reference's UNION path calls ``segments[0].unionAll(list)``
  which is not valid PySpark and would raise for >=2 parents; the intent
  (distinct union) is implemented here as a fold + ``dropDuplicates``.
- Q5: full-row INTERSECTION almost never matches (parents disagree on
  ``total_spent``; live segment 4 = 0 rows from 100/100/98-user parents).
  The documented intent is user-set intersection, so both variants ship:
  ``on=None`` reproduces reference behavior, ``on='user_id'`` (or any key
  list) uses semi/anti joins keyed on user.

Scale notes: ``intersect``/``subtract`` are distinct-izing set ops — one
shuffle on all columns. The keyed variants shuffle only on the key (or
broadcast when one side is small), and preserve the left parent's rows
without a distinct, so they are both semantically-intended and cheaper.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame

OPERATIONS = ("UNION", "INTERSECTION", "DIFFERENCE")


def combine_segments(
    segments: Sequence[DataFrame],
    operation: str,
    on: str | Sequence[str] | None = None,
) -> DataFrame:
    """Fold parent segments with a set operation.

    Mirrors ``SegmentOperations.combine_segments`` dispatch: single parent
    passes through (U5), unknown operation raises (U6), operation name is
    case-insensitive.
    """
    if not segments:
        raise ValueError("no parent segments to combine")
    if len(segments) == 1:
        return segments[0]  # U5 pass-through
    op = operation.upper()
    if op not in OPERATIONS:
        raise ValueError(f"unknown segment operation {operation!r}")
    keys = [on] if isinstance(on, str) else list(on) if on else None

    if op == "UNION":
        # Q6 fixed: fold unionByName, then distinct. Keyed mode dedups on
        # the key only (first-parent row wins is NOT guaranteed; set
        # semantics on the key).
        combined = reduce(DataFrame.unionByName, segments)
        return combined.dropDuplicates(keys) if keys else combined.dropDuplicates()

    if op == "INTERSECTION":
        if keys is None:
            return reduce(DataFrame.intersect, segments)  # U3 full-row
        # Keyed: rows of the first parent whose key appears in every other
        # parent — chained left-semi joins; each later parent is reduced to
        # its key columns so the join side is narrow (broadcastable).
        return reduce(
            lambda acc, df: acc.join(df.select(*keys), on=keys, how="left_semi"),
            segments[1:],
            segments[0],
        )

    # DIFFERENCE: first parent minus the rest
    if keys is None:
        return reduce(DataFrame.subtract, segments)  # U4 (EXCEPT DISTINCT)
    return reduce(
        lambda acc, df: acc.join(df.select(*keys), on=keys, how="left_anti"),
        segments[1:],
        segments[0],
    )


def segment_overlap_matrix(
    memberships: "DataFrame", user_col: str = "user_id"
) -> "DataFrame":
    """Audience overlap matrix — the campaign-planning report every
    audience platform ships: for each pair of segments, how many users
    belong to BOTH (the diagonal is each segment's size). Input is the
    long membership table ``(segment, user)``.

    Shape: one distinct pass, then a self-join keyed on the USER —
    cost Σ (segments-per-user)², never |users|² and never
    |segments|²·|users| — with ``seg_a <= seg_b`` keeping one triangle
    plus the diagonal. Segments-per-user is bounded by the segment
    count, so the join fan-out is a small constant per user; the
    membership table feeds both sides and is materialized once (the
    aliased-branch exchange-reuse gap, as in the dedup family)."""
    from pyspark.sql import functions as F

    from .partitioning import materialize

    m = materialize(
        memberships.select(F.col("segment"), F.col(user_col).alias("_u")).distinct()
    )
    return (
        m.alias("x")
        .join(m.alias("y"), "_u")
        .filter(F.col("x.segment") <= F.col("y.segment"))
        .groupBy(
            F.col("x.segment").alias("seg_a"),
            F.col("y.segment").alias("seg_b"),
        )
        .agg(F.count("*").cast("long").alias("n_users"))
    )
