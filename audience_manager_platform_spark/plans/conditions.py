"""Condition AST for the rule DSL (SURVEY.md §1.4).

A rule's ``conditions`` payload is a JSON list of predicates, implicitly
ANDed (reference ``backend/app/utils/rule_parser.py:126-129``):

    {"field": ..., "operator": ..., "value": ..., "value2": ...}

Fields split into two classes (``rule_parser.py:12-20``):

- row-level  -> WHERE  : transaction_amount, city_tier, transaction_date
- aggregate  -> HAVING : total_spend (SUM(amount)),
                         transaction_count (COUNT(user_id))

Operators (``rule_parser.py:50``): > < = >= <= != IN "NOT IN" BETWEEN.

Semantics decisions vs. the reference (SURVEY.md §4.3):

- Q1: the reference string-quotes every literal ("amount > '500'") and
  leans on SQLite type affinity. We type literals against the target
  column's declared type at compile time — the literal is cast, never the
  column, so parquet predicate pushdown still applies.
- Q2: ``transaction_date BETWEEN d1 AND d2`` on a timestamp column. In
  ``compat`` mode the upper bound is ``d2 00:00:00`` (the reference's
  observed string-compare behavior — June 30 rows after midnight are
  excluded; live segment 3 has 98 not 100 users). In ``calendar`` mode the
  upper bound is the *end* of d2's day (``< d2 + 1 day``).
- Q8: the reference silently skips malformed conditions with a warning
  (``rule_parser.py:46-58``; live rule 4 degenerated to scan-everything).
  Default here is strict (raise); ``lenient=True`` restores parity.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field as dc_field
from typing import Any

logger = logging.getLogger(__name__)

# logical field -> (physical column, spark/duckdb type) for row-level fields
# (reference backend/app/utils/rule_parser.py:12-18)
ROW_FIELDS: dict[str, tuple[str, str]] = {
    "transaction_amount": ("amount", "double"),
    "city_tier": ("city_tier", "int"),
    "transaction_date": ("transaction_date", "timestamp"),
    "category": ("category", "string"),
    "transaction_type": ("transaction_type", "string"),
}

# logical field -> (output aggregate alias, type) for HAVING-class fields
# (reference backend/app/utils/rule_parser.py:20,85-90)
AGGREGATE_FIELDS: dict[str, tuple[str, str]] = {
    "total_spend": ("total_spent", "double"),
    "transaction_count": ("total_transactions", "bigint"),
}

COMPARISON_OPS = (">", "<", "=", ">=", "<=", "!=")
LIST_OPS = ("IN", "NOT IN")
OPERATORS = COMPARISON_OPS + LIST_OPS + ("BETWEEN",)


class ConditionError(ValueError):
    """Raised in strict mode for malformed/unknown conditions (Q8)."""


@dataclass(frozen=True)
class Condition:
    field: str
    operator: str
    value: Any
    value2: Any = None

    @property
    def is_aggregate(self) -> bool:
        return self.field in AGGREGATE_FIELDS

    @property
    def column(self) -> str:
        if self.is_aggregate:
            return AGGREGATE_FIELDS[self.field][0]
        return ROW_FIELDS[self.field][0]

    @property
    def sql_type(self) -> str:
        if self.is_aggregate:
            return AGGREGATE_FIELDS[self.field][1]
        return ROW_FIELDS[self.field][1]

    def canonical(self) -> tuple:
        """Hashable canonical form, used by the dependency planner to
        compare condition sets across rules (reference
        ``backend/app/utils/dependency_finder.py:9-17``)."""
        value = tuple(self.value) if isinstance(self.value, (list, tuple)) else self.value
        return (self.field, self.operator.upper(), str(value), str(self.value2))


def parse_conditions(
    payload: list[dict[str, Any]] | None, *, lenient: bool = False
) -> list[Condition]:
    """Validate and normalize a JSON conditions payload into ASTs.

    Mirrors ``RuleParser.parse_conditions`` behavior with strictness
    inverted by default (Q8).
    """
    result: list[Condition] = []
    for raw in payload or []:
        problem = _validate(raw)
        if problem:
            if lenient:
                logger.warning("skipping condition %r: %s", raw, problem)
                continue
            raise ConditionError(f"invalid condition {raw!r}: {problem}")
        op = str(raw["operator"]).upper()
        result.append(
            Condition(
                field=str(raw["field"]),
                operator=op,
                value=raw.get("value"),
                value2=raw.get("value2"),
            )
        )
    return result


def _validate(raw: Any) -> str | None:
    if not isinstance(raw, dict):
        return "not an object"
    field = raw.get("field")
    op = str(raw.get("operator", "")).upper()
    if field not in ROW_FIELDS and field not in AGGREGATE_FIELDS:
        return f"unknown field {field!r}"
    if op not in OPERATORS:
        return f"unknown operator {op!r}"
    value = raw.get("value")
    if value is None:
        return "missing value"
    if op in LIST_OPS and not isinstance(value, (list, tuple)):
        return f"{op} requires a list value"
    if op == "BETWEEN" and raw.get("value2") in (None, ""):
        return "BETWEEN requires value2"
    if op == "BETWEEN" and field in AGGREGATE_FIELDS:
        return "BETWEEN not supported on aggregate fields"
    return None
