"""Compile rule conditions into segment query plans.

The reference generates one SQL string per rule (template at
``backend/app/utils/rule_parser.py:96-135``):

    WITH all_transactions AS (UNION ALL of the two sources),
         filtered_transactions AS (SELECT * ... WHERE <row conds>)
    SELECT user_id,
           COUNT(user_id)                      AS total_transactions,
           SUM(amount)                         AS total_spent,
           GROUP_CONCAT(DISTINCT transaction_type) AS transaction_types
    FROM filtered_transactions GROUP BY user_id HAVING <agg conds>

and pushes the whole thing into SQLite via JDBC. Here the same logical
plan is declared with the DataFrame API and Catalyst owns the physical
strategy: row-level filters are pushed below the union into both parquet
scans, the group-by is a hash aggregate with map-side partial aggregation,
and the HAVING is a filter above the aggregate. One shuffle total (on
``user_id``) — the minimum the semantics allow.

``to_sql`` renders the equivalent SQL in either the ``spark`` or ``duckdb``
dialect: the former for debuggability/catalog storage (the reference
stores ``sql_query`` in ``segment_catalog``), the latter as the
differential-test oracle (SURVEY.md §5).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime
from functools import reduce
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import group_concat_distinct
from .conditions import Condition, ConditionError, parse_conditions


def _parse_ts(value: Any) -> datetime:
    s = str(value)
    for fmt in ("%Y-%m-%d %H:%M:%S.%f", "%Y-%m-%d %H:%M:%S", "%Y-%m-%d"):
        try:
            return datetime.strptime(s, fmt)
        except ValueError:
            continue
    raise ConditionError(f"unparseable timestamp literal {value!r}")


def _is_date_only(value: Any) -> bool:
    return len(str(value)) == 10


def _typed_literal(cond: Condition, value: Any) -> Any:
    """Type the literal against the column's declared type (quirk Q1): the
    literal is converted, never the column, so parquet pushdown survives."""
    t = cond.sql_type
    if t == "double":
        return float(value)
    if t in ("int", "bigint"):
        return int(value)
    if t == "timestamp":
        return _parse_ts(value)
    return str(value)


@dataclass(frozen=True)
class SegmentQuery:
    """A compiled rule: WHERE-class and HAVING-class condition ASTs plus
    the semantics flags they were compiled under."""

    where: tuple[Condition, ...]
    having: tuple[Condition, ...]
    date_between_mode: str = "compat"  # 'compat' | 'calendar' (quirk Q2)
    # Quirk Q3: the reference computes sums in FLOAT but declares segment
    # outputs DECIMAL(20,2). 'double' (default) computes in double;
    # 'decimal' computes and emits DECIMAL(20,2) end-to-end (exact,
    # summation-order independent — the right choice on a real cluster).
    money_type: str = "double"  # 'double' | 'decimal'

    # ------------------------------------------------------------- Spark
    def _predicate(self, cond: Condition, col: Column) -> Column:
        op = cond.operator
        if op == "BETWEEN":
            lo = _typed_literal(cond, cond.value)
            hi = _typed_literal(cond, cond.value2)
            if cond.sql_type == "timestamp" and _is_date_only(cond.value2):
                if self.date_between_mode == "compat":
                    # Reference behavior (Q2): SQLite string-compare makes a
                    # date-only upper bound exclusive of the entire day
                    # ('2025-06-30 00:00:00' > '2025-06-30' as strings).
                    return (col >= F.lit(lo)) & (col < F.lit(hi))
                # calendar mode: include all of value2's day
                return (col >= F.lit(lo)) & (col < F.lit(hi) + F.expr("INTERVAL 1 DAY"))
            return (col >= F.lit(lo)) & (col <= F.lit(hi))
        if op in ("IN", "NOT IN"):
            values = [_typed_literal(cond, v) for v in cond.value]
            pred = col.isin(values)
            return ~pred if op == "NOT IN" else pred
        value = _typed_literal(cond, cond.value)
        if op == ">":
            return col > value
        if op == "<":
            return col < value
        if op == ">=":
            return col >= value
        if op == "<=":
            return col <= value
        if op == "=":
            return col == value
        if op == "!=":
            return col != value
        raise ConditionError(f"unknown operator {op!r}")

    def dataframe(self, transactions: DataFrame) -> DataFrame:
        """Build the segment plan over a unified-transactions DataFrame.

        Output schema (fixed, reference
        ``backend/app/processor/spark_processor.py:191``):
        ``user_id, total_transactions, total_spent, transaction_types``.
        """
        df = transactions.filter(F.col("user_id").isNotNull())  # P7
        preds = [self._predicate(c, F.col(c.column)) for c in self.where]
        if preds:
            df = df.filter(reduce(lambda a, b: a & b, preds))  # P6: implicit AND
        amount = (
            F.col("amount").cast("decimal(20,2)")
            if self.money_type == "decimal"
            else F.col("amount")
        )
        seg = df.groupBy("user_id").agg(
            F.count("user_id").alias("total_transactions"),  # A1
            F.sum(amount).alias("total_spent"),
            group_concat_distinct("transaction_type").alias("transaction_types"),
        )
        having = [self._predicate(c, F.col(c.column)) for c in self.having]  # A2
        if having:
            seg = seg.filter(reduce(lambda a, b: a & b, having))
        return seg

    # --------------------------------------------------------------- SQL
    def _sql_literal(self, cond: Condition, value: Any) -> str:
        t = cond.sql_type
        if t == "timestamp":
            ts = _parse_ts(value)
            return f"TIMESTAMP '{ts.strftime('%Y-%m-%d %H:%M:%S')}'"
        if t in ("double", "int", "bigint"):
            return repr(_typed_literal(cond, value))
        escaped = str(value).replace("'", "''")
        return f"'{escaped}'"

    def _sql_predicate(self, cond: Condition) -> str:
        col, op = cond.column, cond.operator
        if op == "BETWEEN":
            lo = self._sql_literal(cond, cond.value)
            hi = self._sql_literal(cond, cond.value2)
            if cond.sql_type == "timestamp" and _is_date_only(cond.value2):
                if self.date_between_mode == "compat":
                    return f"({col} >= {lo} AND {col} < {hi})"
                return f"({col} >= {lo} AND {col} < {hi} + INTERVAL 1 DAY)"
            return f"({col} BETWEEN {lo} AND {hi})"
        if op in ("IN", "NOT IN"):
            items = ", ".join(self._sql_literal(cond, v) for v in cond.value)
            return f"{col} {op} ({items})"
        return f"{col} {op} {self._sql_literal(cond, cond.value)}"

    def to_sql(self, source_sql: str, dialect: str = "duckdb") -> str:
        """Render the compiled plan as SQL over ``source_sql`` (a SELECT
        producing the unified-transaction columns)."""
        if dialect == "duckdb":
            concat = (
                "string_agg(DISTINCT transaction_type, ',' ORDER BY transaction_type)"
            )
        else:  # spark
            concat = "concat_ws(',', sort_array(collect_set(transaction_type)))"
        where_clauses = ["user_id IS NOT NULL"] + [
            self._sql_predicate(c) for c in self.where
        ]
        sql = (
            f"WITH all_transactions AS ({source_sql}),\n"
            f"filtered_transactions AS (\n"
            f"  SELECT * FROM all_transactions WHERE {' AND '.join(where_clauses)}\n"
            f")\n"
            f"SELECT user_id,\n"
            f"       COUNT(user_id) AS total_transactions,\n"
            f"       SUM(amount) AS total_spent,\n"
            f"       {concat} AS transaction_types\n"
            f"FROM filtered_transactions\nGROUP BY user_id"
        )
        if self.having:
            sql += "\nHAVING " + " AND ".join(self._sql_predicate(c) for c in self.having)
        return sql


class RuleCompiler:
    """Front half of the query lifecycle (SURVEY.md §3.1): JSON conditions
    -> validated AST -> WHERE/HAVING split -> :class:`SegmentQuery`."""

    def __init__(
        self,
        *,
        lenient: bool = False,
        date_between_mode: str = "compat",
        money_type: str = "double",
    ):
        if date_between_mode not in ("compat", "calendar"):
            raise ValueError(f"bad date_between_mode {date_between_mode!r}")
        if money_type not in ("double", "decimal"):
            raise ValueError(f"bad money_type {money_type!r}")
        self.lenient = lenient
        self.date_between_mode = date_between_mode
        self.money_type = money_type

    def compile(self, conditions_payload: list[dict[str, Any]] | None) -> SegmentQuery:
        conds = parse_conditions(conditions_payload, lenient=self.lenient)
        # WHERE vs HAVING routing by field class
        # (reference backend/app/utils/rule_parser.py:85-92)
        where = tuple(c for c in conds if not c.is_aggregate)
        having = tuple(c for c in conds if c.is_aggregate)
        return SegmentQuery(
            where=where,
            having=having,
            date_between_mode=self.date_between_mode,
            money_type=self.money_type,
        )
