"""Driver-contract invariants: the registry must stay coherent no matter
how families evolve — every query oracle-paired, the rotation a clean
permutation, and the deferred/credited bookkeeping free of typos (a
misspelled name would silently change which queries the driver's
50-entry correctness window verifies)."""

import __spark_entry__ as e
from audience_manager_platform_spark import registry


def test_every_query_has_an_oracle_and_vice_versa():
    qs, os_ = e.queries(), e.oracle_sql()
    assert set(qs) == set(os_), (
        set(qs) ^ set(os_)
    )  # symmetric difference shows the offender


def test_rotation_is_a_permutation():
    qs = e.queries()
    names = list(qs)
    assert len(names) == len(set(names))
    raw = {}
    for mod in registry._modules():
        raw.update(mod.QUERIES)
    assert set(names) == set(raw)


def test_rotation_bookkeeping_names_exist():
    raw = {}
    for mod in registry._modules():
        raw.update(mod.QUERIES)
    missing_credited = registry._DRIVER_CREDITED - set(raw)
    missing_deferred = set(registry._DEFER_TO_NEXT_ROUND) - set(raw)
    assert not missing_credited, missing_credited
    assert not missing_deferred, missing_deferred
    # no name both credited and deferred (deferral would silently win)
    assert not registry._DRIVER_CREDITED & set(registry._DEFER_TO_NEXT_ROUND)


def test_rotation_front_is_uncredited_then_deferred_then_credited():
    names = list(e.queries())
    seen_deferred = seen_credited = False
    for n in names:
        if n in registry._DRIVER_CREDITED:
            seen_credited = True
            continue
        assert not seen_credited, f"uncredited {n} after a credited entry"
        if n in registry._DEFER_TO_NEXT_ROUND:
            seen_deferred = True
        else:
            assert not seen_deferred, f"window entry {n} after a deferred one"
