"""Shared column-expression helpers (SURVEY.md §2.8).

Everything here is built from ``pyspark.sql.functions`` — JVM-side,
codegen'd, no Python in the row path. Helpers exist to pin down semantics
the reference leaves unspecified (SURVEY.md §4.3 quirks) in one place.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def group_concat_distinct(col: str | Column, sep: str = ",") -> Column:
    """Deterministic replacement for SQLite ``GROUP_CONCAT(DISTINCT x)``
    (reference ``backend/app/utils/rule_parser.py:120``; quirk Q4).

    SQLite's concat order is unspecified; we sort, so output is stable
    across partitionings and retries — a must once the aggregation runs
    distributed.
    """
    return F.concat_ws(sep, F.sort_array(F.collect_set(col)))


def stable_long_hash(col: Column, salt: str = "") -> Column:
    """Portable 60-bit hash of a string column: first 15 hex digits of
    md5, parsed base-16.

    Used by MinHash/fingerprint operators instead of ``xxhash64`` so an
    external SQL oracle (DuckDB: ``CAST(('0x' || substr(md5(x),1,15)) AS
    BIGINT)``) can reproduce values bit-for-bit. Stays in codegen
    (md5/substring/conv are JVM built-ins).
    """
    salted = F.concat(F.lit(salt), col) if salt else col
    return F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("long")


# The canonical SQL twins of :func:`stable_long_hash` — ONE definition
# for every operator family's oracle, so a change to the hash (width,
# salt handling) cannot silently split the Spark and DuckDB sides.
# ``{x}`` is the already-salted string expression.
HASH60_SPARK_SQL = "cast(conv(substring(md5({x}), 1, 15), 16, 10) as bigint)"
HASH60_DUCK_SQL = "CAST(('0x' || substr(md5({x}), 1, 15)) AS BIGINT)"


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity of two ``array<double>`` columns, computed with
    higher-order functions (``zip_with`` + ``aggregate``) — vectorized in
    the JVM, no UDF, scales linearly with array length."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    norm_a = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    norm_b = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (norm_a * norm_b)


def money_round(col: Column, scale: int = 2) -> Column:
    """2dp rounding for money display (reference
    ``backend/app/utils/aggregates.py:45,104,118``; quirk Q3 — we compute
    in double and round at the edge, documenting the divergence from the
    reference's FLOAT-vs-DECIMAL inconsistency)."""
    return F.round(col, scale)
