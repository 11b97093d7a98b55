"""Materialized-view reuse: the dependency planner (SURVEY.md §4.1, M2).

The one piece of custom optimizer logic the reference has: when a new rule
arrives, find existing rules whose condition sets are subsets of the new
rule's set, rewrite the new rule as INTERSECTION(parent segments...) plus a
residual base query (reference ``backend/app/utils/dependency_finder.py:
19-74``). Algorithm semantics preserved exactly:

- conditions canonicalize to a set of hashable tuples;
- candidate rules are scanned in DESCENDING order of condition count
  (greedy, largest-first — ``:38``);
- a candidate is claimed iff its set is a subset of the *remaining*
  (not yet covered) conditions (``:57``), so claimed parents never
  overlap;
- profitable only if >=1 dependency was claimed AND >=1 condition was
  covered (``:65``); otherwise the rule stays a base rule.

This is a pure-Python pre-pass over the rule catalog — it runs before any
Spark plan is built, exactly as in the reference; no custom Catalyst rule
is needed.

One deliberate improvement: canonicalization goes through the parsed
:class:`Condition` AST, so ``"500"`` and ``500`` (or list vs tuple IN
values) compare equal; the reference compares raw JSON dicts and misses
those matches.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Sequence

from .conditions import parse_conditions


def conditions_to_set(conditions: list[dict[str, Any]] | None) -> frozenset | None:
    """Canonical, hashable form of a conditions payload; None if unparseable
    (mirrors ``_conditions_to_set`` returning None on bad input)."""
    try:
        parsed = parse_conditions(conditions)
    except Exception:  # noqa: BLE001 — unparseable == not a reuse candidate
        return None
    return frozenset(c.canonical() for c in parsed)


@dataclass(frozen=True)
class DependencyRewrite:
    depends_on: tuple[int, ...]
    operation: str  # always 'intersection', like the reference
    remaining_conditions: tuple[dict, ...]


def find_best_dependency(
    new_conditions: list[dict[str, Any]],
    existing_rules: Sequence[tuple[int, list[dict[str, Any]]]],
    rule_id_to_exclude: int | None = None,
) -> DependencyRewrite | None:
    """Greedy largest-first subset cover over the rule catalog.

    ``existing_rules`` is (rule_id, conditions_payload) for every active
    rule; ordering is imposed here (condition count descending, then
    rule_id for determinism — the reference's DB ordering is unspecified
    on ties).
    """
    all_set = conditions_to_set(new_conditions)
    if not all_set:
        return None

    candidates = sorted(
        (r for r in existing_rules if r[0] != rule_id_to_exclude),
        key=lambda r: (-(len(r[1]) if isinstance(r[1], list) else 0), r[0]),
    )

    found: list[int] = []
    remaining = set(all_set)
    for rule_id, conditions in candidates:
        if not remaining:
            break
        cand_set = conditions_to_set(conditions)
        if not cand_set:
            continue
        if cand_set.issubset(remaining):
            found.append(rule_id)
            remaining -= cand_set

    # Profitability gate (reference :65): at least one dependency claimed
    # and at least one condition actually covered.
    if found and len(all_set) > len(remaining):
        residual = tuple(
            cond
            for cond in new_conditions
            if conditions_to_set([cond]) and next(iter(conditions_to_set([cond]))) in remaining
        )
        return DependencyRewrite(
            depends_on=tuple(found), operation="intersection", remaining_conditions=residual
        )
    return None
