"""Segment set-algebra (U2-U6, quirks Q5/Q6)."""

import pytest

from audience_manager_platform_spark.operators.segments import combine_segments


@pytest.fixture(scope="module")
def segs(spark):
    a = spark.createDataFrame(
        [(1, 10, 100.0), (2, 20, 200.0), (3, 30, 300.0)],
        "user_id long, total_transactions long, total_spent double",
    )
    b = spark.createDataFrame(
        [(2, 20, 200.0), (3, 99, 999.0), (4, 40, 400.0)],
        "user_id long, total_transactions long, total_spent double",
    )
    return a, b


def test_union_distinct(segs):
    a, b = segs
    out = combine_segments([a, b], "union")
    assert out.count() == 5  # (2,20,200) deduped; 3 appears twice (differs)


def test_union_keyed(segs):
    a, b = segs
    out = combine_segments([a, b], "UNION", on="user_id")
    assert sorted(r.user_id for r in out.collect()) == [1, 2, 3, 4]


def test_intersection_full_row_vs_keyed(segs):
    a, b = segs
    # Q5: full-row intersection only matches rows identical in ALL columns
    full = combine_segments([a, b], "INTERSECTION")
    assert [(r.user_id) for r in full.collect()] == [2]
    # keyed: user 3 is in both parents despite differing aggregates;
    # left parent's rows are preserved
    keyed = combine_segments([a, b], "INTERSECTION", on="user_id")
    rows = {r.user_id: r.total_spent for r in keyed.collect()}
    assert rows == {2: 200.0, 3: 300.0}


def test_difference_full_row_vs_keyed(segs):
    a, b = segs
    full = combine_segments([a, b], "DIFFERENCE")
    assert sorted(r.user_id for r in full.collect()) == [1, 3]
    keyed = combine_segments([a, b], "DIFFERENCE", on="user_id")
    assert sorted(r.user_id for r in keyed.collect()) == [1]


def test_three_way_fold(segs):
    a, b = segs
    c = a.limit(1)  # just user 1's row... limit not deterministic in general; filter instead
    c = a.filter("user_id = 1")
    out = combine_segments([a, b, c], "DIFFERENCE", on="user_id")
    assert out.count() == 0  # a minus b-keys {2,3,4} minus c-keys {1}


def test_single_parent_passthrough(segs):
    a, _ = segs
    assert combine_segments([a], "INTERSECTION") is a


def test_unknown_operation_raises(segs):
    a, b = segs
    with pytest.raises(ValueError, match="unknown segment operation"):
        combine_segments([a, b], "XOR")
    with pytest.raises(ValueError, match="no parent segments"):
        combine_segments([], "UNION")
