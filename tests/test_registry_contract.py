"""Driver-contract invariants: the registry must stay coherent no matter
how families evolve — every query oracle-paired, the rotation a clean
permutation, and the deferred/credited bookkeeping free of typos (a
misspelled name would silently change which queries the driver's
50-entry correctness window verifies)."""

import __spark_entry__ as e
from audience_manager_platform_spark import registry


# Queries whose semantics genuinely cannot be re-expressed in DuckDB SQL
# (the driver records its weaker rows-only check for these). Additions
# need a justification here — the default contract is oracle-paired.
ROWS_ONLY = {
    # 64-bit DCT perceptual hash over decoded BMP binaries: a SQL twin
    # would hinge on bit-level libm sin/cos and summation-order parity
    # inside the 32x32 DCT — exactly the float-boundary class the
    # determinism contracts ban. Planted-twin recall is pytest-pinned
    # instead (tests/test_r6_operators.py).
    "multimodal_phash_neardup",
}


def test_every_query_has_an_oracle_and_vice_versa():
    qs, os_ = e.queries(), e.oracle_sql()
    assert set(qs) - set(os_) == ROWS_ONLY, (
        set(qs) ^ set(os_) ^ ROWS_ONLY
    )  # symmetric difference shows the offender
    assert not set(os_) - set(qs), set(os_) - set(qs)


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


def test_driver_credited_derives_from_committed_correctness_files():
    """_DRIVER_CREDITED must equal the union of green rows across the
    committed CORRECTNESS_r*.json artifacts — the derivation replaced a
    hand-maintained frozenset, and this pins the semantics so a change to
    the loader can't silently shrink or inflate the credited set."""
    import json
    from pathlib import Path

    root = Path(registry.__file__).resolve().parents[2]
    expect: set[str] = set()
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        for name, row in json.loads(path.read_text()).items():
            if (
                isinstance(row, dict)
                and not row.get("err")
                and row.get("rows_match")
                and row.get("schema_match", True)
                and row.get("hash_match") in (True, None)
            ):
                expect.add(name)
    assert registry._DRIVER_CREDITED == frozenset(expect)


def test_uncredited_queries_fit_in_driver_window():
    """A never-credited query outside the driver's 50-entry correctness
    window ships another round without hard driver evidence. That is
    only acceptable when it was CONSCIOUSLY queued via
    _DEFER_TO_NEXT_ROUND (more uncredited names than slots); silent
    overflow — an undeferraled window entry pushed past slot 50 — is a
    bookkeeping bug."""
    names = list(e.queries())
    uncredited = [n for n in names if n not in registry._DRIVER_CREDITED]
    overflow = [n for n in uncredited if names.index(n) >= 50]
    silent = [n for n in overflow if n not in registry._DEFER_TO_NEXT_ROUND]
    assert not silent, (
        f"{len(uncredited)} uncredited queries; these overflow the 50-entry "
        f"window WITHOUT being deferred: {silent}"
    )
    if overflow:
        # deferral must be the reason the window overflows at all
        assert len(uncredited) > 50, (
            f"window has spare slots yet these are deferred: {overflow}"
        )


def test_window_pin_names_exist_and_lead_the_rotation():
    """_WINDOW_PIN protects the driver window from registry-growth
    reshuffling — but only if every pinned name actually resolves (a
    typo would silently shrink the window) and the rotation really
    leads with the uncredited pinned names in pin order."""
    raw = {}
    for mod in registry._modules():
        raw.update(mod.QUERIES)
    missing = set(registry._WINDOW_PIN) - set(raw)
    assert not missing, missing
    assert len(set(registry._WINDOW_PIN)) == len(registry._WINDOW_PIN)
    expected_lead = [
        k for k in registry._WINDOW_PIN if k not in registry._DRIVER_CREDITED
    ]
    names = list(e.queries())
    assert names[: len(expected_lead)] == expected_lead
