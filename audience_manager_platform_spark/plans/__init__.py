"""Rule DSL: condition AST, validation, compilation to DataFrame plans,
SQL rendering, and the dependency planner (MV reuse)."""

from .conditions import (
    AGGREGATE_FIELDS,
    ROW_FIELDS,
    Condition,
    ConditionError,
    parse_conditions,
)
from .rule_compiler import RuleCompiler, SegmentQuery

__all__ = [
    "Condition",
    "ConditionError",
    "parse_conditions",
    "ROW_FIELDS",
    "AGGREGATE_FIELDS",
    "RuleCompiler",
    "SegmentQuery",
]
