"""Dependency planner fidelity (SURVEY.md §4.1; reference
``verify_segment_reuse.py`` assertion pattern)."""

from audience_manager_platform_spark.plans.dependency_finder import (
    conditions_to_set,
    find_best_dependency,
)

AMT = {"field": "transaction_amount", "operator": ">", "value": "500"}
TIER = {"field": "city_tier", "operator": "=", "value": "1"}
DATE = {
    "field": "transaction_date",
    "operator": "BETWEEN",
    "value": "2025-06-01",
    "value2": "2025-06-30",
}
SPEND = {"field": "total_spend", "operator": ">", "value": 10000}


def test_exact_cover_two_parents():
    rewrite = find_best_dependency([AMT, TIER], [(1, [AMT]), (2, [TIER]), (3, [DATE])])
    assert rewrite is not None
    assert sorted(rewrite.depends_on) == [1, 2]
    assert rewrite.operation == "intersection"
    assert rewrite.remaining_conditions == ()


def test_partial_cover_keeps_residual():
    rewrite = find_best_dependency([AMT, SPEND], [(1, [AMT])])
    assert rewrite is not None
    assert rewrite.depends_on == (1,)
    assert rewrite.remaining_conditions == (SPEND,)


def test_no_match_returns_none():
    assert find_best_dependency([DATE], [(1, [AMT]), (2, [TIER])]) is None
    assert find_best_dependency([], [(1, [AMT])]) is None


def test_superset_candidate_not_claimed():
    # candidate has MORE conditions than the new rule -> not a subset
    assert find_best_dependency([AMT], [(1, [AMT, TIER])]) is None


def test_greedy_largest_first():
    # rule 3 covers {AMT,TIER} in one shot; greedy takes it before the
    # single-condition rules, which then cover nothing extra
    rewrite = find_best_dependency(
        [AMT, TIER, DATE], [(1, [AMT]), (2, [TIER]), (3, [AMT, TIER])]
    )
    assert rewrite is not None
    assert rewrite.depends_on[0] == 3
    # after claiming rule 3, AMT/TIER are no longer "remaining": rules 1,2
    # are not subsets of {DATE}, so only rule 3 is claimed
    assert rewrite.depends_on == (3,)
    assert rewrite.remaining_conditions == (DATE,)


def test_no_double_claim_of_overlapping_candidates():
    # both candidates contain AMT; once the first is claimed the second is
    # no longer a subset of the remaining set
    rewrite = find_best_dependency(
        [AMT, TIER, DATE], [(1, [AMT, TIER]), (2, [AMT, DATE])]
    )
    assert rewrite is not None
    assert rewrite.depends_on == (1,)
    assert rewrite.remaining_conditions == (DATE,)


def test_self_exclusion_on_update():
    assert find_best_dependency([AMT], [(7, [AMT])], rule_id_to_exclude=7) is None


def test_canonicalization_tolerates_value_types():
    # "500" vs 500 and list vs tuple compare equal through the AST
    a = conditions_to_set([{"field": "transaction_amount", "operator": ">", "value": "500"}])
    b = conditions_to_set([{"field": "transaction_amount", "operator": ">", "value": 500}])
    assert a == b
    c = conditions_to_set([{"field": "city_tier", "operator": "IN", "value": [1, 2]}])
    d = conditions_to_set([{"field": "city_tier", "operator": "IN", "value": (1, 2)}])
    assert c == d


def test_unparseable_conditions_skipped():
    assert conditions_to_set("not a list") is None  # type: ignore[arg-type]
    # candidate with malformed conditions is skipped, not fatal
    rewrite = find_best_dependency([AMT, TIER], [(1, "garbage"), (2, [AMT])])
    assert rewrite is not None and rewrite.depends_on == (2,)
