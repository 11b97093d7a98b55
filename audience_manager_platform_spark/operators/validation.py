"""Declarative data-quality expectations (the deequ/Great-Expectations
capability a warehouse runs before publishing a table).

One constraint list compiles to ONE aggregate over the table — a single
scan with map-side partial aggregation regardless of how many
expectations are attached — and the per-constraint verdict rows are
produced Spark-side with ``stack`` (no driver collect). The reference's
only validation is the rule-DSL identifier guard (SURVEY.md §2.2 P10);
table-level expectations are part of the warehouse extension mandated by
BASELINE.json.

Supported constraints:

- ``("not_null", col)``          — observed = null count, pass iff 0
- ``("unique", col)``            — observed = rows - distinct non-null
  values, pass iff 0 (NULL rows count toward the deficit; pair with
  ``not_null`` to tell the two failure modes apart)
- ``("range", col, lo, hi)``     — observed = count outside [lo, hi]
- ``("accepted_values", col, values)`` — observed = count outside set
- ``("min_rows", n)``            — observed = row count, pass iff >= n

Scale note: ``unique`` uses an exact COUNT(DISTINCT); several distinct
constraints in one list make Catalyst plan an Expand (one duplicate of
the scan's rows per distinct column) — the standard trade for exact
multi-distinct. For monitoring at 100 TB you'd swap it for
``approx_count_distinct`` per the HLL pattern already gated in
``approx_distinct_users``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _agg_and_verdicts(constraints: Sequence[tuple]) -> tuple[list, list]:
    """Compile constraints into (aggregate expressions, stack rows).
    Each stack row is (constraint_kind, col_name, observed, passed) referencing
    the aggregate's output columns."""
    aggs: list = [F.count("*").alias("_rows")]
    rows: list[tuple[str, str, str, str]] = []
    for i, c in enumerate(constraints):
        kind = c[0]
        slot = f"_m{i}"
        if kind == "not_null":
            _, col = c
            aggs.append(
                F.coalesce(
                    F.sum(F.col(col).isNull().cast("long")), F.lit(0)
                ).alias(slot)
            )
            rows.append((kind, col, slot, f"{slot} = 0"))
        elif kind == "unique":
            _, col = c
            aggs.append(F.count_distinct(F.col(col)).alias(slot))
            rows.append((kind, col, f"_rows - {slot}", f"_rows - {slot} = 0"))
        elif kind == "range":
            _, col, lo, hi = c
            aggs.append(
                F.coalesce(
                    F.sum(
                        (
                            F.col(col).isNull()
                            | (F.col(col) < lo)
                            | (F.col(col) > hi)
                        ).cast("long")
                    ),
                    F.lit(0),
                ).alias(slot)
            )
            rows.append((kind, col, slot, f"{slot} = 0"))
        elif kind == "accepted_values":
            _, col, values = c
            # NULL is never accepted: isin(NULL) yields NULL, which would
            # vanish from the sum — coalesce it to a violation
            aggs.append(
                F.coalesce(
                    F.sum(
                        F.coalesce(
                            ~F.col(col).isin(list(values)), F.lit(True)
                        ).cast("long")
                    ),
                    F.lit(0),
                ).alias(slot)
            )
            rows.append((kind, col, slot, f"{slot} = 0"))
        elif kind == "min_rows":
            _, n = c
            rows.append((kind, "*", "_rows", f"_rows >= {n}"))
        else:
            raise ValueError(f"unknown constraint kind: {kind}")
    return aggs, rows


def validate_table(df: DataFrame, constraints: Sequence[tuple]) -> DataFrame:
    """Evaluate every expectation in one scan; returns one row per
    constraint: (constraint_kind, col_name, observed, passed)."""
    aggs, rows = _agg_and_verdicts(constraints)
    summary = df.agg(*aggs)
    stacked = ", ".join(
        f"'{kind}', '{col}', cast({obs} as bigint), ({passed})"
        for kind, col, obs, passed in rows
    )
    return summary.selectExpr(
        f"stack({len(rows)}, {stacked}) as (constraint_kind, col_name, observed, passed)"
    )


def validate_table_sql(src: str, constraints: Sequence[tuple]) -> str:
    """DuckDB twin: the same single-aggregate + verdict-row shape."""
    aggs = ["COUNT(*) AS _rows"]
    rows: list[str] = []
    for i, c in enumerate(constraints):
        kind = c[0]
        slot = f"_m{i}"
        if kind == "not_null":
            _, col = c
            aggs.append(
                f"COALESCE(SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END), 0) AS {slot}"
            )
            rows.append(
                f"SELECT 'not_null' AS constraint_kind, '{col}' AS col_name, "
                f"CAST({slot} AS BIGINT) AS observed, {slot} = 0 AS passed FROM s"
            )
        elif kind == "unique":
            _, col = c
            aggs.append(f"COUNT(DISTINCT {col}) AS {slot}")
            rows.append(
                f"SELECT 'unique', '{col}', CAST(_rows - {slot} AS BIGINT), "
                f"_rows - {slot} = 0 FROM s"
            )
        elif kind == "range":
            _, col, lo, hi = c
            aggs.append(
                f"COALESCE(SUM(CASE WHEN {col} IS NULL OR {col} < {lo} "
                f"OR {col} > {hi} THEN 1 ELSE 0 END), 0) AS {slot}"
            )
            rows.append(
                f"SELECT 'range', '{col}', CAST({slot} AS BIGINT), {slot} = 0 FROM s"
            )
        elif kind == "accepted_values":
            _, col, values = c
            # numerics render unquoted so the DuckDB comparison stays
            # typed, matching the Spark side's typed ``isin``
            inlist = ", ".join(
                str(v) if isinstance(v, (int, float)) and not isinstance(v, bool)
                else f"'{v}'"
                for v in values
            )
            aggs.append(
                f"COALESCE(SUM(CASE WHEN {col} NOT IN ({inlist}) OR {col} IS NULL "
                f"THEN 1 ELSE 0 END), 0) AS {slot}"
            )
            rows.append(
                f"SELECT 'accepted_values', '{col}', CAST({slot} AS BIGINT), "
                f"{slot} = 0 FROM s"
            )
        elif kind == "min_rows":
            _, n = c
            rows.append(
                f"SELECT 'min_rows', '*', CAST(_rows AS BIGINT), _rows >= {n} FROM s"
            )
        else:
            raise ValueError(f"unknown constraint kind: {kind}")
    union = "\n          UNION ALL ".join(rows)
    return f"""
        WITH s AS (SELECT {", ".join(aggs)} FROM {src})
        {union}
    """
