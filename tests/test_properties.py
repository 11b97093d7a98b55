"""Property-based checks (hypothesis): the condition DSL's Spark plan and
its own generated DuckDB SQL agree on arbitrary rules, and the dependency
planner maintains its set-cover invariants on arbitrary catalogs."""

from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from audience_manager_platform_spark.plans import RuleCompiler
from audience_manager_platform_spark.plans.dependency_finder import (
    conditions_to_set,
    find_best_dependency,
)

# ----------------------------------------------------------- strategies
_amount = st.one_of(
    st.integers(min_value=-10, max_value=260),
    st.floats(min_value=0, max_value=260, allow_nan=False).map(lambda x: round(x, 2)),
)
_comparison = st.sampled_from([">", "<", "=", ">=", "<=", "!="])


def _date_str(days):
    return (datetime(2024, 1, 1) + timedelta(days=days)).strftime("%Y-%m-%d")


_condition = st.one_of(
    st.builds(
        lambda op, v: {"field": "transaction_amount", "operator": op, "value": v},
        _comparison,
        _amount,
    ),
    st.builds(
        lambda op, v: {"field": "city_tier", "operator": op, "value": v},
        _comparison,
        st.integers(min_value=0, max_value=5),
    ),
    st.builds(
        lambda vs: {"field": "city_tier", "operator": "IN", "value": vs},
        st.lists(st.integers(min_value=1, max_value=4), min_size=1, max_size=4),
    ),
    st.builds(
        lambda vs: {"field": "category", "operator": "NOT IN", "value": vs},
        st.lists(
            st.sampled_from(["click", "view", "purchase", "signup", "error"]),
            min_size=1,
            max_size=3,
        ),
    ),
    st.builds(
        lambda a, b: {
            "field": "transaction_date",
            "operator": "BETWEEN",
            "value": _date_str(min(a, b)),
            "value2": _date_str(max(a, b)),
        },
        st.integers(min_value=0, max_value=35),
        st.integers(min_value=0, max_value=35),
    ),
    st.builds(
        lambda op, v: {"field": "total_spend", "operator": op, "value": v},
        _comparison,
        st.integers(min_value=0, max_value=8000),
    ),
    st.builds(
        lambda op, v: {"field": "transaction_count", "operator": op, "value": v},
        _comparison,
        st.integers(min_value=0, max_value=100),
    ),
)


@pytest.fixture(scope="module")
def duck_small(spark, sf_dir):
    """Small unified-transactions frame registered in both engines."""
    import duckdb

    from audience_manager_platform_spark.sources import (
        load_table,
        unified_transactions_from_events,
    )

    txns = unified_transactions_from_events(load_table(spark, sf_dir, "events"))
    pdf = txns.toPandas()
    con = duckdb.connect()
    con.register("base_transactions", pdf)
    txns.createOrReplaceTempView("_prop_txns")
    yield spark, con
    con.close()


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(payload=st.lists(_condition, min_size=0, max_size=4))
def test_dsl_spark_matches_own_duckdb_rendering(duck_small, payload):
    spark, con = duck_small
    query = RuleCompiler().compile(payload)
    spark_rows = {
        (r.user_id, r.total_transactions, round(r.total_spent, 2), r.transaction_types)
        for r in query.dataframe(spark.table("_prop_txns")).collect()
    }
    duck_rows = {
        (u, n, round(t, 2), ty)
        for u, n, t, ty in con.execute(
            query.to_sql("SELECT * FROM base_transactions", dialect="duckdb")
        ).fetchall()
    }
    assert spark_rows == duck_rows


# ------------------------------------------- dependency planner invariants
_cond_pool = [
    {"field": "transaction_amount", "operator": ">", "value": v} for v in (100, 200, 300)
] + [
    {"field": "city_tier", "operator": "=", "value": v} for v in (1, 2)
] + [
    {"field": "total_spend", "operator": ">", "value": 5000},
    {"field": "transaction_count", "operator": ">=", "value": 10},
]


@settings(max_examples=200, deadline=None)
@given(
    new_idx=st.lists(st.integers(min_value=0, max_value=6), min_size=0, max_size=5),
    catalog=st.lists(
        st.lists(st.integers(min_value=0, max_value=6), min_size=1, max_size=4),
        min_size=0,
        max_size=6,
    ),
)
def test_dependency_finder_invariants(new_idx, catalog):
    new = [_cond_pool[i] for i in set(new_idx)]
    rules = [(rid + 1, [_cond_pool[i] for i in set(idxs)]) for rid, idxs in enumerate(catalog)]
    rewrite = find_best_dependency(new, rules)
    if rewrite is None:
        return
    all_set = conditions_to_set(new)
    residual = conditions_to_set(list(rewrite.remaining_conditions)) or frozenset()
    covered = set()
    by_id = dict(rules)
    for rid in rewrite.depends_on:
        cand = conditions_to_set(by_id[rid])
        # claimed parents never overlap each other or the residual
        assert cand.isdisjoint(covered)
        assert cand.isdisjoint(residual)
        covered |= cand
    # exact partition: parents + residual == the new rule's condition set
    assert covered | residual == all_set
    # profitability: at least one condition was actually covered
    assert covered
    assert rewrite.operation == "intersection"


# -------------------------------------------- trailing rollups (A8) model
_txn_row = st.tuples(
    st.integers(min_value=1, max_value=4),          # user_id
    st.integers(min_value=1, max_value=30000),      # amount cents
    st.integers(min_value=0, max_value=40),         # days after 2024-01-01
    st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),  # category
    st.integers(min_value=1, max_value=4),          # city_tier
)


def _rollup_model(rows, windows):
    """Pure-python reference for trailing_rollups: per window, users with
    >=1 txn in (anchor-d, anchor]; favorite = max count, tie lowest
    category, None if all categories null."""
    from collections import Counter, defaultdict
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)
    anchor = max(base + timedelta(days=d) for _, _, d, _, _ in rows).date()
    out = {}
    for w in windows:
        start = anchor - timedelta(days=w)
        per_user = defaultdict(list)
        for uid, cents, d, cat, tier in rows:
            ts = base + timedelta(days=d, hours=uid % 12)
            if start < ts.date() <= anchor:
                per_user[uid].append((cents, ts, cat, tier))
        for uid, txns in per_user.items():
            cats = Counter(c for _, _, c, _ in txns if c is not None)
            fav = (
                min(sorted(cats), key=lambda c: (-cats[c], c)) if cats else None
            )
            out[(uid, w)] = (
                len(txns),
                round(sum(c for c, _, _, _ in txns) / 100.0, 2),
                max(t for _, t, _, _ in txns),
                fav,
                max(tr for _, _, _, tr in txns),
            )
    return out


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(_txn_row, min_size=1, max_size=40))
def test_trailing_rollups_matches_model(spark, rows):
    from datetime import datetime, timedelta

    from audience_manager_platform_spark.operators.analytics import trailing_rollups

    base = datetime(2024, 1, 1)
    data = [
        (
            uid,
            cents / 100.0,
            base + timedelta(days=d, hours=uid % 12),
            cat,
            tier,
            "UPI",
        )
        for uid, cents, d, cat, tier in rows
    ]
    txns = spark.createDataFrame(
        data,
        "user_id long, amount double, transaction_date timestamp,"
        " category string, city_tier int, transaction_type string",
    )
    got = {
        (r.user_id, r.window_days): (
            r.total_transactions,
            float(r.total_amount),
            r.last_transaction_date,
            r.favorite_category,
            r.city_tier,
        )
        for r in trailing_rollups(txns, windows=(7, 30)).collect()
    }
    assert got == _rollup_model(rows, (7, 30))


# ------------------------------------------- validate_table model check
_vt_row = st.tuples(
    st.one_of(st.none(), st.integers(min_value=0, max_value=6)),   # id
    st.one_of(st.none(), st.sampled_from(["a", "b", "c", "zzz"])),  # kind
    st.one_of(st.none(), st.floats(min_value=-50, max_value=150,
                                   allow_nan=False).map(lambda x: round(x, 2))),
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(_vt_row, min_size=0, max_size=30))
def test_validate_table_matches_model(spark, rows):
    """The one-scan compiled expectations agree with a brute-force Python
    evaluation on arbitrary (null-riddled) frames."""
    from audience_manager_platform_spark.operators.validation import validate_table

    df = spark.createDataFrame(rows, "id long, kind string, v double")
    out = {
        (r.constraint_kind, r.col_name): (r.observed, r.passed)
        for r in validate_table(
            df,
            [
                ("not_null", "id"),
                ("unique", "id"),
                ("range", "v", 0.0, 100.0),
                ("accepted_values", "kind", ["a", "b", "c"]),
                ("min_rows", 5),
            ],
        ).collect()
    }
    ids = [r[0] for r in rows]
    n = len(rows)
    nn = sum(1 for i in ids if i is None)
    assert out[("not_null", "id")] == (nn, nn == 0)
    deficit = n - len({i for i in ids if i is not None})
    assert out[("unique", "id")] == (deficit, deficit == 0)
    vr = sum(1 for r in rows if r[2] is None or r[2] < 0.0 or r[2] > 100.0)
    assert out[("range", "v")] == (vr, vr == 0)
    av = sum(1 for r in rows if r[1] is None or r[1] not in ("a", "b", "c"))
    assert out[("accepted_values", "kind")] == (av, av == 0)
    assert out[("min_rows", "*")] == (n, n >= 5)


# -------------------------------------------- round-5 operator invariants
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    counts=st.lists(
        st.tuples(st.integers(0, 6), st.integers(1, 40)),
        min_size=1,
        max_size=6,
        unique_by=lambda t: t[0],
    ),
    probes=st.lists(st.integers(0, 9), min_size=1, max_size=4, unique=True),
)
def test_cms_never_undercounts_any_key(spark, counts, probes):
    """CMS one-sided error: estimate >= truth for every probed key,
    whatever the data distribution."""
    from audience_manager_platform_spark.operators.skew import cms_estimate

    rows = [
        (i, key, "x")
        for key, n in counts
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "row_id long, user_id long, s string")
    got = cms_estimate(df, "user_id", probes).collect()
    truth = {key: n for key, n in counts}
    assert {r.user_id for r in got} == set(probes)
    for r in got:
        assert r.true_count == truth.get(r.user_id, 0)
        assert r.cms_est >= r.true_count
        assert r.overcount == r.cms_est - r.true_count


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from([f"w{i}" for i in range(8)]),
            min_size=16,
            max_size=48,
        ).map(" ".join),
        min_size=1,
        max_size=8,
    )
)
def test_line_dedup_conservation(spark, texts):
    """Line-dedup invariants on arbitrary corpora: kept <= total per
    doc, every distinct line text kept EXACTLY once corpus-wide, and
    stats/rewrite agree on the kept count."""
    from audience_manager_platform_spark.operators import dedup as D

    docs = spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    stats = {r.doc_id: r for r in D.line_dedup_stats(docs).collect()}
    rewrite = {r.doc_id: r for r in D.line_dedup_rewrite(docs).collect()}
    assert set(stats) == set(rewrite) == set(range(len(texts)))
    total_kept = sum(r.n_kept for r in stats.values())
    # distinct 16-token windows across the corpus == total kept
    distinct_lines = set()
    for t in texts:
        toks = t.split()
        for s0 in range(0, len(toks), 16):
            piece = toks[s0:s0 + 16]
            if piece:
                distinct_lines.add(" ".join(piece))
    assert total_kept == len(distinct_lines)
    for d, r in stats.items():
        assert 0 <= r.n_kept <= r.n_lines
        assert rewrite[d].n_kept == r.n_kept


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from([f"w{i}" for i in range(10)]),
            min_size=1,
            max_size=20,
        ).map(" ".join),
        min_size=1,
        max_size=8,
    )
)
def test_dsir_zero_when_target_equals_raw(spark, texts):
    """DSIR identity: when the target slice IS the whole corpus, the
    target and raw distributions coincide and every document's
    importance log-weight is exactly 0 (the integer-quantized λ makes
    this exact, not approximate)."""
    from audience_manager_platform_spark.operators.corpus import dsir_weights

    docs = spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = dsir_weights(docs, target_lang="en").collect()
    assert {r.doc_id for r in got} == set(range(len(texts)))
    for r in got:
        assert r.dsir_logw == 0.0
        assert r.n_tokens == len(texts[r.doc_id].split())


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(
                ["the", "and", "for", "quick", "brown", "fox", "zq1", "zq2"]
            ),
            min_size=0,
            max_size=40,
        ).map(" ".join),
        min_size=1,
        max_size=10,
    )
)
def test_filter_funnel_chain_invariants(spark, texts):
    """Funnel conservation on arbitrary corpora: stages chain (entered
    of stage i+1 == survivors of stage i), counts are monotone
    non-increasing, and stage 1 enters the whole corpus."""
    from audience_manager_platform_spark.operators.corpus import filter_funnel

    docs = spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = sorted(filter_funnel(docs).collect(), key=lambda r: r.stage)
    assert [r.stage for r in rows] == [1, 2, 3]
    assert rows[0].entered == len(texts)
    for prev, cur in zip(rows, rows[1:]):
        assert cur.entered == prev.survivors
    for r in rows:
        assert 0 <= r.survivors <= r.entered
        assert r.dropped == r.entered - r.survivors


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from([f"w{i}" for i in range(6)]),
            min_size=0,
            max_size=30,
        ).map(" ".join),
        min_size=1,
        max_size=12,
    )
)
def test_pack_efficiency_conserves_docs_and_bounds_fill(spark, texts):
    """Packing-report conservation: every document lands in exactly one
    bin band (Σ n_docs == |docs|), fills are in (0, 1], and overflow
    bins only appear in the top band."""
    from audience_manager_platform_spark.operators.corpus import (
        pack_efficiency,
    )

    docs = spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = pack_efficiency(docs, token_budget=16).collect()
    assert sum(r.n_docs for r in rows) == len(texts)
    for r in rows:
        assert 0 <= r.fill_band <= 10
        assert 0.0 <= r.avg_fill <= 1.0
        assert r.overflow_bins <= r.n_bins
        if r.fill_band < 10:
            assert r.overflow_bins == 0


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 20),              # user
            st.integers(0, 13),              # day offset
            st.floats(0.5, 100.0, allow_nan=False),
        ),
        min_size=2,
        max_size=60,
    )
)
def test_seasonality_index_weighted_mean_is_one(spark, rows):
    """Seasonal-index identity: the event-weighted mean of the index is
    1 by construction (Σ n_d·idx_d == N), whatever the distribution."""
    from datetime import datetime

    from audience_manager_platform_spark.operators.timeseries import (
        seasonality_profile,
    )

    ev = spark.createDataFrame(
        [
            (i, datetime(2024, 3, 1 + d), u, "view", float(v), "{}")
            for i, (u, d, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    got = seasonality_profile(ev).collect()
    n_total = sum(r.n_events for r in got)
    weighted = sum(r.n_events * r.seasonal_idx for r in got)
    assert n_total == len(rows)
    assert abs(weighted / n_total - 1.0) < 1e-4


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from([f"w{i}" for i in range(6)]),
            min_size=0,
            max_size=25,
        ).map(" ".join),
        min_size=1,
        max_size=8,
    )
)
def test_bigram_logprob_counts_and_sign(spark, texts):
    """Bigram-LM invariants: a doc emits max(0, tokens-1) bigrams (docs
    under 2 tokens drop out) and every smoothed log-prob is negative."""
    from audience_manager_platform_spark.operators.text import bigram_logprob

    docs = spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r.doc_id: r for r in bigram_logprob(docs).collect()}
    for i, t in enumerate(texts):
        n = len(t.split())
        if n >= 2:
            assert got[i].n_bigrams == n - 1
            assert got[i].avg_logprob < 0
        else:
            assert i not in got


# --------------------------------------------- wave-12+ contract math
# Pure-Python twins of the integer contracts behind the new operators —
# hypothesis fuzzes the MATH (bound proofs, conservation identities) at
# volumes a Spark-per-example property could never afford; the Spark
# plans themselves are pinned by the example tests and DuckDB oracles.


def _qbuckets(c: int) -> tuple[int, int, int]:
    blen = c.bit_length()
    base = 1 << (blen - 1)
    sub = ((c - base) * 8) // base
    est16 = 16 * base + (2 * sub + 1) * base
    return base, sub, est16


@given(
    st.lists(st.integers(min_value=1, max_value=10**9), min_size=1, max_size=400),
    st.sampled_from([50, 90, 99]),
)
@settings(max_examples=300, deadline=None)
def test_quantile_sketch_bound_holds_for_arbitrary_positive_values(
    cents, q_pct
):
    """The DDSketch-style contract: the picked sub-bucket midpoint is
    within base/16 of the exact rank value, for ANY data."""
    cents = sorted(cents)
    n = len(cents)
    rank = (q_pct * n + 99) // 100
    exact = cents[rank - 1]
    # histogram pick: first bucket (by (blen, sub)) whose cum >= rank
    from collections import Counter

    hist = Counter()
    for c in cents:
        base, sub, _ = _qbuckets(c)
        hist[(base.bit_length(), sub)] += 1
    cum = 0
    for key in sorted(hist):
        cum += hist[key]
        if cum >= rank:
            blen, sub = key
            base = 1 << (blen - 1)
            est16 = 16 * base + (2 * sub + 1) * base
            break
    assert abs(est16 - exact * 16) <= base
    # and the bound really is <= 1/16 relative error
    assert abs(est16 / 16 - exact) <= exact / 16


@given(st.integers(min_value=1, max_value=10**6))
@settings(max_examples=500, deadline=None)
def test_position_attribution_ppm_conserves_for_any_touch_count(n):
    """first + last + (n-2)*mid + rem == 1,000,000 exactly, for any n."""
    if n == 1:
        first, last, mid, rem = 1000000, 0, 0, 0
    elif n == 2:
        first, last, mid, rem = 500000, 500000, 0, 0
    else:
        first, last = 400000, 400000
        mid = 200000 // (n - 2)
        rem = 200000 % (n - 2)
    assert first + last + max(0, n - 2) * mid + rem == 1000000


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),
            st.integers(min_value=0, max_value=50),
        ),
        min_size=1,
        max_size=60,
    ).filter(lambda rows: sum(d + c for d, c in rows) > 0)
)
@settings(max_examples=300, deadline=None)
def test_kaplan_meier_curve_is_monotone_in_unit_interval(rows):
    """S(t) stays in [0, 1] and never increases, for any life table."""
    rows = [(d, c) for d, c in rows if d + c > 0]
    if not rows:
        return
    remaining = sum(d + c for d, c in rows)
    s = 1.0
    prev = 1.0
    for d, c in rows:
        s = s * (1.0 - (float(d) / float(remaining)))
        assert 0.0 <= s <= prev + 1e-15
        prev = s
        remaining -= d + c


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),   # score (small grid => ties)
            st.booleans(),                            # label
        ),
        min_size=2,
        max_size=120,
    ).filter(
        lambda rows: any(l for _, l in rows) and any(not l for _, l in rows)
    )
)
@settings(max_examples=400, deadline=None)
def test_auc_rank_sum_equals_pairwise_definition(rows):
    """The grouped doubled rank-sum (u2 = 2*R_pos - n_pos*(n_pos+1))
    equals 2*wins + ties from the O(n^2) pairwise AUC definition, for
    ANY score/label multiset — the identity auc_exact relies on."""
    from collections import Counter

    pos = [s for s, l in rows if l]
    neg = [s for s, l in rows if not l]
    wins = sum(1 for p in pos for n in neg if p > n)
    ties = sum(1 for p in pos for n in neg if p == n)
    # grouped midrank formula, exactly as the operator computes it
    per = Counter()
    for s, l in rows:
        g = per.setdefault(s, [0, 0])
        g[0 if l else 1] += 1
    a = 0
    u2 = 0
    for s in sorted(per):
        pos_g, neg_g = per[s]
        u2 += pos_g * (2 * a + pos_g + neg_g + 1)
        a += pos_g + neg_g
    u2 -= len(pos) * (len(pos) + 1)
    assert u2 == 2 * wins + ties


@given(
    st.lists(st.integers(min_value=1, max_value=30), min_size=1, max_size=80),
    st.lists(st.integers(min_value=1, max_value=30), min_size=1, max_size=80),
)
@settings(max_examples=400, deadline=None)
def test_ks_cross_multiplied_gap_equals_brute_force(old, new):
    """max |cum_o*n_new - cum_n*n_old| over the merged value grid equals
    the brute-force two-sample KS numerator, for ANY pair of samples."""
    from fractions import Fraction

    n_o, n_n = len(old), len(new)
    grid = sorted(set(old) | set(new))
    # operator's integer form
    best = 0
    for v in grid:
        cum_o = sum(1 for x in old if x <= v)
        cum_n = sum(1 for x in new if x <= v)
        best = max(best, abs(cum_o * n_n - cum_n * n_o))
    # textbook D as an exact rational
    d = max(
        abs(
            Fraction(sum(1 for x in old if x <= v), n_o)
            - Fraction(sum(1 for x in new if x <= v), n_n)
        )
        for v in grid
    )
    assert Fraction(best, n_o * n_n) == d
    if sorted(old) == sorted(new):
        assert best == 0


@given(
    st.lists(
        st.floats(min_value=0.001, max_value=1000.0, allow_nan=False),
        min_size=1,
        max_size=20,
    ),
    st.integers(min_value=0, max_value=5000),
)
@settings(max_examples=400, deadline=None)
def test_largest_remainder_allocation_invariants(weights, budget):
    """Largest-remainder integerization: sums EXACTLY to budget and each
    allocation is its floor base or base+1, for ANY weights."""
    import math

    w_tot = sum(weights)
    raw = [budget * w / w_tot for w in weights]
    base = [math.floor(x) for x in raw]
    rem = [math.floor((x - math.floor(x)) * 1e9 + 0.5) for x in raw]
    deficit = budget - sum(base)
    assert 0 <= deficit <= len(weights)
    order = sorted(range(len(weights)), key=lambda i: (-rem[i], i))
    alloc = list(base)
    for i in order[:deficit]:
        alloc[i] += 1
    assert sum(alloc) == budget
    assert all(b <= a <= b + 1 for a, b in zip(alloc, base))


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1000),  # old_n
            st.integers(min_value=0, max_value=1000),  # new_n
        ),
        min_size=1,
        max_size=50,
    )
)
@settings(max_examples=400, deadline=None)
def test_psi_term_zero_iff_shares_equal_under_identical_totals(buckets):
    """With old totals == new totals, a bucket's e9 PSI term is 0 exactly
    when its counts match (p == q => (p-q)*ln(p/q) == 0.0 in IEEE), and
    the add-one smoothing keeps every term finite otherwise."""
    import math

    o_tot = sum(o for o, _ in buckets)
    n_tot = o_tot  # identical-traffic scenario
    b = len(buckets)
    for o, _ in buckets:
        p = (o + 1) / float(o_tot + b)
        q = (o + 1) / float(n_tot + b)
        term = math.floor((p - q) * math.log(p / q) * 1e9 + 0.5)
        assert term == 0
    for o, n in buckets:
        p = (o + 1) / float(o_tot + b)
        q = (n + 1) / float(o_tot + b)
        assert math.isfinite((p - q) * math.log(p / q))


@given(
    st.lists(
        st.integers(min_value=0, max_value=500),
        min_size=1,
        max_size=30,
    ).filter(lambda xs: sum(xs) > 0)
)
@settings(max_examples=300, deadline=None)
def test_chi2_homogeneity_zero_iff_identical_halves(counts):
    """mix_drift's contract: with new counts == old counts, every
    chi-square term is exactly 0 (expected cells equal observed)."""
    import math

    o_tot = n_tot = sum(counts)
    for c in counts:
        row = 2 * c
        exp_old = row * (o_tot / (o_tot + n_tot))
        exp_new = row * (n_tot / (o_tot + n_tot))
        term = math.floor(
            ((c - exp_old) ** 2 / exp_old + (c - exp_new) ** 2 / exp_new)
            * 1e6 + 0.5
        ) if row else 0
        assert term == 0


@given(
    st.lists(
        st.integers(min_value=0, max_value=10),  # graded relevance 0..k
        min_size=1,
        max_size=10,
    )
)
@settings(max_examples=300, deadline=None)
def test_ndcg_bounds_and_perfect_ranking(rels):
    """DCG with the inlined e9 discounts never exceeds the IDCG of its
    own sorted gains, and equals it exactly when already sorted."""
    from audience_manager_platform_spark.operators.similarity import (
        NDCG_DISCOUNT_E9,
    )

    dcg = sum(r * NDCG_DISCOUNT_E9[i + 1] for i, r in enumerate(rels))
    ideal = sum(
        r * NDCG_DISCOUNT_E9[i + 1]
        for i, r in enumerate(sorted(rels, reverse=True))
    )
    assert dcg <= ideal
    if rels == sorted(rels, reverse=True):
        assert dcg == ideal


# ------------------------------------------- wave-24 operator invariants
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    sizes=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),   # event_type index
            st.integers(min_value=1, max_value=9),   # day
            st.integers(min_value=0, max_value=400), # props length
        ),
        min_size=1,
        max_size=40,
    ),
    target=st.sampled_from([200, 1000, 5000]),
)
def test_compaction_plan_conservation_and_contiguity(spark, sizes, target):
    """Next-fit-over-FFD invariants on arbitrary inputs: every file lands
    in exactly one bin (rows/bytes/files conserved), kept files are >=
    target while packed files are < target, and packed bin ids are
    contiguous from 0 (each small file advances the running sum by less
    than one target, so no bin index can be skipped)."""
    from audience_manager_platform_spark.operators.maintenance import (
        COMPACT_ROW_OVERHEAD,
        compaction_plan,
    )

    rows = [
        (i, f"2024-01-0{d} 10:00:00", 1, f"t{t}", 1.0, "x" * plen)
        for i, (t, d, plen) in enumerate(sizes)
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts_s string, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts_s AS TIMESTAMP) AS ts", "user_id",
        "event_type", "value", "props",
    )
    out = compaction_plan(events, target_bytes=target).collect()
    # conservation against an independently-computed file table
    import collections

    files = collections.Counter()
    fbytes = collections.Counter()
    for t, d, plen in sizes:
        key = (t, d)
        files[key] += 1
        fbytes[key] += plen + 2 + COMPACT_ROW_OVERHEAD  # len('t0') == 2
    n_groups = len(files)
    assert sum(r.n_files for r in out) == n_groups
    assert sum(r.tot_rows for r in out) == len(sizes)
    assert sum(r.tot_bytes for r in out) == sum(fbytes.values())
    packed_ids = sorted(r.bin_id for r in out if r.bin_id >= 0)
    assert packed_ids == list(range(len(packed_ids)))
    for r in out:
        assert r.fill_ppm == r.tot_bytes * 1_000_000 // target


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    counts=st.lists(
        st.integers(min_value=0, max_value=5), min_size=1, max_size=20
    ),
)
def test_partition_completeness_grid_and_verdicts(spark, counts):
    """The dense grid spans exactly [first, last] observed day; warmup
    iff fewer than 7 prior grid days; missing iff 0 rows post-warmup;
    low iff 2n < the trailing median; total rows conserved."""
    from audience_manager_platform_spark.operators.validation import (
        partition_completeness,
    )

    # day i (1-based) gets counts[i-1] rows; interior zero days stay in
    # the grid because the span is anchored by the non-zero endpoints
    if not any(counts):
        counts = counts + [1]
    rows = []
    eid = 0
    for i, n in enumerate(counts, start=1):
        for _ in range(n):
            rows.append((eid, f"2024-01-{i:02d} 05:00:00", 1, "e", 1.0, None))
            eid += 1
    events = spark.createDataFrame(
        rows,
        "event_id long, ts_s string, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts_s AS TIMESTAMP) AS ts", "user_id",
        "event_type", "value", "props",
    )
    out = sorted(partition_completeness(events).collect(), key=lambda r: r.day)
    first = next(i for i, n in enumerate(counts, start=1) if n > 0)
    last = max(i for i, n in enumerate(counts, start=1) if counts[i - 1] > 0)
    assert len(out) == last - first + 1
    assert sum(r.n_rows for r in out) == sum(counts)
    for idx, r in enumerate(out):
        assert r.n_rows == counts[first - 1 + idx]
        if idx < 7:
            assert r.verdict == "warmup" and r.trail_med7 is None
        else:
            window = sorted(x.n_rows for x in out[idx - 7 : idx])
            med = window[3]
            assert r.trail_med7 == med
            if r.n_rows == 0:
                assert r.verdict == "missing"
            elif 2 * r.n_rows < med:
                assert r.verdict == "low"
            else:
                assert r.verdict == "ok"


# --------------------------- sharded global rank: randomized bit-parity
# The r10 escalation levels (width buckets, hot-shard value re-bucket,
# constant-value tiebreak surrogate, explicit NULL shards) must be
# BIT-IDENTICAL to the unpartitioned ANSI window on ARBITRARY value
# distributions — not just the hand-picked pins in test_r10_operators.
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    values=st.lists(
        st.one_of(
            st.none(),
            st.integers(min_value=-5, max_value=5),  # heavy ties
            st.integers(min_value=-10_000, max_value=10_000),
        ),
        min_size=1,
        max_size=120,
    ),
    descending=st.booleans(),
    hot=st.booleans(),
)
def test_global_row_positions_random_distributions(
    spark, values, descending, hot
):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from audience_manager_platform_spark.operators.partitioning import (
        global_row_positions,
    )

    df = spark.createDataFrame(
        [(v, i) for i, v in enumerate(values)], "v long, k long"
    )
    kwargs = {"hot_shard_rows": 8, "n_sub": 4} if hot else {}
    got = global_row_positions(
        df, "v", ["k"], descending=descending, **kwargs
    ).select("v", "k", "_gpos")
    order = (
        [F.desc_nulls_last("v"), F.asc("k")]
        if descending
        else [F.asc_nulls_first("v"), F.asc("k")]
    )
    exp = df.select(
        "v",
        "k",
        F.row_number().over(Window.orderBy(*order)).cast("long").alias(
            "_gpos"
        ),
    )
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0
