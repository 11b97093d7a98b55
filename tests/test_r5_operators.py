"""Round-5 operator semantics on hand-built inputs: RFM segmentation,
session-path mining, linear multi-touch attribution, line-level dedup."""

from datetime import datetime

from audience_manager_platform_spark.operators import dedup as D
from audience_manager_platform_spark.operators.analytics import (
    linear_attribution,
    rfm_segments,
    top_session_paths,
)

_EVENTS_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, ts, uid, et, val, "{}") for i, (ts, uid, et, val) in enumerate(rows)],
        _EVENTS_SCHEMA,
    )


def test_rfm_scores_rank_the_planted_extremes(spark):
    # u1: 1 early cheap purchase (worst R, F, M); u3: 5 recent expensive
    # ones (best all three); u2 in between.
    rows = []
    rows += [(datetime(2024, 1, 1), 1, "purchase", 10.0)]
    rows += [(datetime(2024, 1, 10), 2, "purchase", 50.0)] * 2
    rows += [(datetime(2024, 1, 20 + i), 3, "purchase", 500.0) for i in range(5)]
    got = {r.user_id: r for r in rfm_segments(_events(spark, rows)).collect()}
    assert got[3].r_score > got[1].r_score
    assert got[3].f_score > got[1].f_score
    assert got[3].m_score > got[1].m_score
    assert got[3].rfm_cell == f"{got[3].r_score}-{got[3].f_score}-{got[3].m_score}"
    assert got[1].recency_days == 23 and got[3].recency_days == 0
    assert got[2].frequency == 2 and got[2].monetary == 100.0


def test_rfm_only_counts_purchases(spark):
    rows = [
        (datetime(2024, 1, 1), 1, "purchase", 10.0),
        (datetime(2024, 1, 2), 1, "click", 99.0),
        (datetime(2024, 1, 3), 2, "view", 5.0),
    ]
    got = rfm_segments(_events(spark, rows)).collect()
    assert {r.user_id for r in got} == {1}
    assert got[0].frequency == 1 and got[0].monetary == 10.0


def test_session_paths_split_on_gap_and_order_events(spark):
    rows = [
        # u1 session 1: view > click (1 min apart)
        (datetime(2024, 1, 1, 10, 0), 1, "view", 0.0),
        (datetime(2024, 1, 1, 10, 1), 1, "click", 0.0),
        # u1 session 2 after a 2h gap: purchase alone
        (datetime(2024, 1, 1, 12, 30), 1, "purchase", 0.0),
        # u2: one session with the same view>click shape
        (datetime(2024, 1, 2, 9, 0), 2, "view", 0.0),
        (datetime(2024, 1, 2, 9, 10), 2, "click", 0.0),
    ]
    got = {r.path: r.n_sessions for r in
           top_session_paths(_events(spark, rows), gap_minutes=30).collect()}
    assert got == {"view>click": 2, "purchase": 1}


def test_session_paths_cap_bounds_bot_sessions(spark):
    rows = [(datetime(2024, 1, 1, 10, 0, i), 1, "view", 0.0) for i in range(30)]
    got = top_session_paths(_events(spark, rows), max_path_len=5).collect()
    assert len(got) == 1
    assert got[0].path == ">".join(["view"] * 5)


def test_linear_attribution_splits_credit_inside_window(spark):
    rows = [
        (datetime(2024, 1, 1), 1, "click", 0.0),     # 9 days out: excluded
        (datetime(2024, 1, 5), 1, "click", 0.0),     # in window
        (datetime(2024, 1, 9), 1, "click", 0.0),     # in window
        (datetime(2024, 1, 10), 1, "purchase", 30.0),
        (datetime(2024, 1, 11), 2, "purchase", 5.0),  # no clicks at all
    ]
    got = {r.user_id: r for r in
           linear_attribution(_events(spark, rows), max_gap_days=7).collect()}
    assert got[1].n_touches == 2 and got[1].credit_per_touch == 0.5
    assert got[2].n_touches == 0 and got[2].credit_per_touch is None


def test_line_dedup_drops_repeats_keeps_first(spark):
    line_a = " ".join(f"tok{i}" for i in range(16))        # shared boilerplate
    line_b = " ".join(f"other{i}" for i in range(16))
    line_c = " ".join(f"unique{i}" for i in range(16))
    docs = spark.createDataFrame(
        [
            (0, f"{line_a} {line_b}", "en", "web", 1),
            (1, f"{line_a} {line_c}", "en", "web", 1),   # repeats line_a
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r.doc_id: r for r in D.line_dedup_stats(docs).collect()}
    assert got[0].n_lines == 2 and got[0].n_kept == 2      # first occurrence keeps
    assert got[1].n_lines == 2 and got[1].n_kept == 1      # its copy of line_a drops
    assert got[1].kept_ratio == 0.5


def test_bm25_ranks_matching_docs_and_normalizes_length(spark):
    from audience_manager_platform_spark.operators.text import bm25_topk

    docs = _docs5(spark, [
        "spark join window spark join",          # dense in query terms
        "spark " + "filler " * 50,               # one hit, long doc
        "nothing relevant here at all",
        "join window",                           # short, two hits
    ])
    got = bm25_topk(docs, ["spark", "join", "window"], k=10).collect()
    ids = [r.doc_id for r in got]
    assert 2 not in ids                          # no matching term, no row
    assert ids[0] == 0                           # densest doc wins
    by_id = {r.doc_id: r for r in got}
    assert by_id[0].n_matched_terms == 3
    assert by_id[1].n_matched_terms == 1
    # length normalization: the short two-term doc outranks the long one-hit doc
    assert by_id[3].bm25 > by_id[1].bm25


def _docs5(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_k_anonymity_flags_small_classes(spark):
    from audience_manager_platform_spark.operators.validation import (
        k_anonymity_audit,
    )

    rows = [("US", "gold")] * 6 + [("US", "silver")] * 2 + [("DE", "gold")]
    df = spark.createDataFrame(rows, "country string, tier string")
    got = {(r.country, r.tier): r for r in
           k_anonymity_audit(df, ["country", "tier"], k=5).collect()}
    assert got[("US", "gold")].class_size == 6
    assert not got[("US", "gold")].at_risk
    assert got[("US", "silver")].at_risk and got[("DE", "gold")].at_risk


def test_hybrid_rrf_fuses_both_rankings(spark):
    from audience_manager_platform_spark.operators.hybrid import (
        hybrid_search_rrf,
    )

    docs = _docs5(spark, [
        "spark join window",          # lexical hit
        "spark spark join join",      # lexical hit
        "unrelated words entirely",   # semantic-only candidate
        "query doc text",             # the query's own doc
    ])
    import math

    # embeddings: id 2 is nearly parallel to the query vector (id 3),
    # ids 0/1 are near-orthogonal
    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.05]),
        (3, [0.0, 1.0, 0.0]),
    ]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in vecs],
        "vec_id long, embedding array<float>, label int",
    )
    got = hybrid_search_rrf(
        docs, emb, ["spark", "join"], query_vec_id=3, k=4, pool=3
    ).collect()
    by_id = {r.id: r for r in got}
    # doc 2: no lexical rank, best semantic rank
    assert by_id[2].rank_lex is None and by_id[2].rank_sem == 1
    # docs 0/1: lexical ranks present
    assert by_id[0].rank_lex is not None and by_id[1].rank_lex is not None
    # every fused score is the sum of the rank contributions
    for r in got:
        want = sum(
            1.0 / (60 + x) for x in (r.rank_lex, r.rank_sem) if x is not None
        )
        assert math.isclose(r.rrf, round(want, 6))
    # a doc present in BOTH rankings outranks one present in a single
    # ranking at similar depth
    both = [r for r in got if r.rank_lex and r.rank_sem]
    if both:
        single = [r for r in got if (r.rank_lex is None) != (r.rank_sem is None)]
        assert all(b.rrf > s.rrf for b in both for s in single
                   if (b.rank_lex or 99) <= (s.rank_lex or s.rank_sem))


def test_jl_distortion_exact_on_basis_vector(spark):
    from audience_manager_platform_spark.operators.similarity import (
        EMBED_DIM,
        jl_distortion,
    )

    # e_0: every projected coordinate is +-1/sqrt(k), so the projected
    # norm is exactly 1 and distortion is exactly 1.0
    basis = [1.0] + [0.0] * (EMBED_DIM - 1)
    emb = spark.createDataFrame(
        [(0, basis, 0)], "vec_id long, embedding array<float>, label int"
    )
    row = jl_distortion(emb).collect()[0]
    assert row.norm_orig == 1.0
    assert row.norm_jl == 1.0
    assert row.distortion == 1.0


def test_jl_distortion_concentrates_near_one(spark, sf_dir):
    from audience_manager_platform_spark.operators.similarity import jl_distortion
    from audience_manager_platform_spark.sources import load_table

    rows = jl_distortion(load_table(spark, sf_dir, "embeddings")).collect()
    ds = [r.distortion for r in rows]
    # JL with k=16: distortion concentrates around 1 +- O(1/sqrt(k));
    # generous band, but catches a broken projection (0 or >> 1)
    assert all(0.3 < d < 1.9 for d in ds)
    mean = sum(ds) / len(ds)
    assert 0.8 < mean < 1.2


def test_quality_logit_orders_clean_text_above_junk(spark):
    from audience_manager_platform_spark.operators.text import quality_logit

    docs = _docs5(spark, [
        "the quick brown fox and the lazy dog were a fine pair of animals",
        "zzzz 123 ### $$$ 999 @@@@ xxxx 42 %%% !!!",
    ])
    got = {r.doc_id: r for r in quality_logit(docs).collect()}
    assert got[0].p_keep > got[1].p_keep
    assert got[0].logit > got[1].logit
    # probability is the sigmoid of the (rounded) logit
    import math

    for r in got.values():
        assert math.isclose(
            r.p_keep, round(1.0 / (1.0 + math.exp(-r.logit)), 6), abs_tol=1e-6
        )


def test_kcenter_picks_the_planted_extremes(spark):
    from audience_manager_platform_spark.operators.similarity import (
        EMBED_DIM,
        kcenter_select,
    )

    # three tight clusters along different axes; k=3 must pick one
    # representative per cluster (farthest-point property)
    def vec(axis, eps):
        v = [0.0] * EMBED_DIM
        v[axis] = 1.0
        v[(axis + 1) % EMBED_DIM] = eps
        return v

    rows = []
    for cluster, axis in enumerate((0, 20, 40)):
        for j in range(4):
            rows.append((cluster * 10 + j, vec(axis, 0.01 * j), cluster))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = kcenter_select(emb, k=3).collect()
    centers = {r.center_id for r in got}
    assert len(centers) == 3
    # one center per planted cluster
    assert {c // 10 for c in centers} == {0, 1, 2}
    by_id = {r.vec_id: r for r in got}
    # members assign to their own cluster's center with near-zero distance
    for vid, r in by_id.items():
        assert r.center_id // 10 == vid // 10
        assert r.dist < 0.01
        assert r.is_center == (vid == r.center_id)


def test_line_rewrite_strips_repeats_preserves_order(spark):
    line_a = " ".join(f"tok{i}" for i in range(16))
    line_b = " ".join(f"other{i}" for i in range(16))
    line_c = " ".join(f"unique{i}" for i in range(16))
    docs = spark.createDataFrame(
        [
            (0, f"{line_a} {line_b}", "en", "web", 1),
            (1, f"{line_a} {line_c}", "en", "web", 1),
            (2, line_a, "en", "web", 1),          # pure boilerplate
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r.doc_id: r for r in D.line_dedup_rewrite(docs).collect()}
    assert got[0].clean_text == f"{line_a} {line_b}"
    assert got[1].clean_text == line_c        # its copy of line_a removed
    assert got[2].clean_text == "" and got[2].n_kept == 0


def test_cms_never_undercounts_and_is_exact_without_collisions(spark):
    from audience_manager_platform_spark.operators.skew import cms_estimate

    rows = [(i, i % 7, "t") for i in range(700)]  # keys 0..6, 100 each
    df = spark.createDataFrame(rows, "event_id long, user_id long, x string")
    got = {r.user_id: r for r in
           cms_estimate(df, "user_id", [0, 3, 6, 999]).collect()}
    for k in (0, 3, 6):
        assert got[k].true_count == 100
        assert got[k].cms_est >= 100 and got[k].overcount >= 0
    # absent key: truth 0, estimate >= 0 (collisions only)
    assert got[999].true_count == 0 and got[999].overcount == got[999].cms_est


def test_scd2_temporal_enrich_stamps_asof_state(spark):
    from audience_manager_platform_spark.registry.relational import (
        _scd2_temporal_enrich,
    )
    # not a fixture-path test: drive the composition directly
    rows = [
        (datetime(2024, 1, 1, 9), 1, "signup", 0.0),
        (datetime(2024, 1, 2, 9), 1, "view", 0.0),
        (datetime(2024, 1, 2, 12), 1, "purchase", 10.0),  # after view
        (datetime(2024, 1, 3, 9), 2, "purchase", 5.0),    # no prior change
    ]
    ev = _events(spark, rows)  # event_ids 0..3 in list order

    import audience_manager_platform_spark.registry.relational as R
    orig = R._events
    R._events = lambda s, d: ev
    try:
        got = {r.event_id: r for r in _scd2_temporal_enrich(spark, "").collect()}
    finally:
        R._events = orig
    assert got[2].asof_state == "view"
    assert got[2].asof_valid_from == datetime(2024, 1, 2, 9)
    assert got[3].asof_state is None and got[3].asof_valid_from is None


def test_phash_finds_planted_image_twins(spark):
    from audience_manager_platform_spark.operators.multimodal import (
        phash64,
        phash_hamming_pairs,
        synthesize_textured_bmp,
    )

    docs = spark.createDataFrame(
        [(i, "t", "en", "web", 1) for i in range(30)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    media = synthesize_textured_bmp(docs)  # doc 10 twins 9, 20 twins 19
    pairs = {(r.doc_a, r.doc_b): r.hamming
             for r in phash_hamming_pairs(media, max_hamming=6).collect()}
    assert (9, 10) in pairs and (19, 20) in pairs
    assert all(h <= 6 for h in pairs.values())
    # fingerprints are 63-bit ints and deterministic
    hashes = {r.doc_id: r.phash for r in phash64(media).collect()}
    assert all(0 <= h < (1 << 63) for h in hashes.values())
    again = {r.doc_id: r.phash for r in phash64(media).collect()}
    assert hashes == again


def test_phash_identical_images_hash_equal(spark):
    from audience_manager_platform_spark.operators.multimodal import (
        phash64,
        synthesize_textured_bmp,
    )

    docs = spark.createDataFrame(
        [(7, "t", "en", "web", 1), (7, "t", "en", "web", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = [r.phash for r in phash64(synthesize_textured_bmp(docs)).collect()]
    assert got[0] == got[1]


def test_geo_cells_deterministic_and_bounded(spark, sf_dir):
    from audience_manager_platform_spark.operators.geo import (
        GEO_LAT_CELLS,
        GEO_LON_CELLS,
        geo_cell_rollup,
    )
    from audience_manager_platform_spark.sources import load_table

    got = geo_cell_rollup(load_table(spark, sf_dir, "events"), k=20).collect()
    assert got and all(0 <= r.lat_cell < GEO_LAT_CELLS for r in got)
    assert all(0 <= r.lon_cell < GEO_LON_CELLS for r in got)
    # Morton key decodes back to the cell pair
    for r in got:
        lat = sum(((r.cell_id >> (2 * i)) & 1) << i for i in range(9))
        lon = sum(((r.cell_id >> (2 * i + 1)) & 1) << i for i in range(9))
        assert (lat, lon) == (r.lat_cell, r.lon_cell)


def test_profile_drift_flags_planted_changes(spark):
    from audience_manager_platform_spark.operators.validation import (
        profile_drift,
    )

    old = spark.createDataFrame(
        [(i, float(i % 10)) for i in range(100)], "id long, v double"
    )
    new = spark.createDataFrame(
        [(i, None if i % 2 == 0 else float(i % 3)) for i in range(100)],
        "id long, v double",
    )
    got = {r.col_name: r for r in
           profile_drift(old, new, [("id", "num"), ("v", "num")]).collect()}
    assert got["v"].nulls_delta == 50           # planted null spike
    assert got["v"].ndv_delta == 3 - 10         # NDV collapse 10 -> 3
    assert got["id"].nulls_delta == 0 and got["id"].ndv_delta == 0


def test_segment_overlap_matrix_counts(spark):
    from audience_manager_platform_spark.operators.segments import (
        segment_overlap_matrix,
    )

    rows = [("a", 1), ("a", 2), ("a", 3), ("b", 2), ("b", 3), ("c", 9)]
    m = spark.createDataFrame(rows, "segment string, user_id long")
    got = {(r.seg_a, r.seg_b): r.n_users
           for r in segment_overlap_matrix(m).collect()}
    assert got[("a", "a")] == 3 and got[("b", "b")] == 2 and got[("c", "c")] == 1
    assert got[("a", "b")] == 2                 # users 2 and 3
    assert ("a", "c") not in got                # disjoint pairs absent


def test_unigram_logprob_ranks_common_text_higher(spark):
    from audience_manager_platform_spark.operators.text import unigram_logprob

    # doc 0 uses only corpus-frequent tokens; doc 2 is all hapaxes
    common = "the data table " * 10
    docs = _docs5(spark, [
        common,
        common + " rare1 rare2",
        "zzq1 zzq2 zzq3 zzq4 zzq5 zzq6",
    ])
    got = {r.doc_id: r for r in unigram_logprob(docs).collect()}
    assert got[0].avg_logprob > got[1].avg_logprob > got[2].avg_logprob
    assert got[0].n_tokens == 30 and got[2].n_tokens == 6


def test_hash_embed_identical_texts_identical_vectors(spark):
    from audience_manager_platform_spark.operators.text import hash_embed

    docs = _docs5(spark, [
        "spark join window table scan filter",
        "spark join window table scan filter",   # exact dup
        "completely different content here now",
    ])
    vecs = {r.vec_id: list(r.embedding) for r in hash_embed(docs).collect()}
    assert vecs[0] == vecs[1]
    assert vecs[0] != vecs[2]
    assert len(vecs[0]) == 64
    # signed counts: total mass equals token count in L1 terms or less
    # (sign cancellation only within a bucket)
    assert sum(abs(x) for x in vecs[0]) <= 6


def test_semantic_text_dedup_drops_hashed_twin(spark):
    from audience_manager_platform_spark.operators.similarity import (
        semantic_dedup,
    )
    from audience_manager_platform_spark.operators.text import hash_embed

    texts = [f"doc number {i} unique tokens t{i} u{i} v{i} w{i}" for i in range(12)]
    texts[7] = texts[3]          # plant an exact twin: ids 3 and 7
    docs = _docs5(spark, texts)
    got = {r.vec_id: r for r in
           semantic_dedup(hash_embed(docs), threshold=0.9, iters=1).collect()}
    assert got[3].is_kept
    assert not got[7].is_kept    # keep-min-id drops the higher twin
    dropped = [v for v, r in got.items() if not r.is_kept]
    assert dropped == [7]


def test_pca_variance_finds_planted_axis(spark):
    from audience_manager_platform_spark.operators.similarity import (
        EMBED_DIM,
        pca_variance,
    )

    # variance concentrated on axis 5: x5 ~ wide spread, others tiny
    rows = []
    for i in range(200):
        v = [0.001 * ((i * 7 + j) % 11 - 5) for j in range(EMBED_DIM)]
        v[5] = (i % 21 - 10) * 1.0
        rows.append((i, v, 0))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    comps = pca_variance(emb, k=4)
    assert comps[0][0] == 0
    # the planted axis dominates: first component carries >90% of variance
    assert comps[0][2] > 0.9
    assert abs(sum(r for _, _, r in pca_variance(emb, k=EMBED_DIM)) - 1.0) < 1e-6
    # eigenvalues descend
    evs = [e for _, e, _ in comps]
    assert evs == sorted(evs, reverse=True)


def test_session_metrics_facts(spark):
    from audience_manager_platform_spark.operators.analytics import (
        session_metrics,
    )

    rows = [
        (datetime(2024, 1, 1, 10, 0), 1, "view", 0.0),
        (datetime(2024, 1, 1, 10, 5), 1, "purchase", 9.0),
        (datetime(2024, 1, 1, 13, 0), 1, "view", 0.0),    # new session, bounce
        (datetime(2024, 1, 2, 9, 0), 2, "click", 0.0),    # bounce, no convert
    ]
    got = {(r.user_id, r.session_id): r
           for r in session_metrics(_events(spark, rows)).collect()}
    s1 = got[(1, 1)]
    assert s1.n_events == 2 and s1.duration_seconds == 300
    assert not s1.is_bounce and s1.converted
    assert got[(1, 2)].is_bounce and not got[(1, 2)].converted
    assert got[(2, 1)].is_bounce


def test_brand_lift_normalizes_popularity(spark):
    from audience_manager_platform_spark.operators.relational import (
        basket_brand_lift,
    )

    # brands P and Q co-occur in every one of their orders (perfect
    # association); brands X and Y are popular but independent
    li, pt = [], []
    part_ids = {"P": 1, "Q": 2, "X": 3, "Y": 4}
    for b, pk in part_ids.items():
        pt.append((pk, b))
    order = 0
    for _ in range(6):            # P+Q always together
        order += 1
        li += [(order, 1), (order, 2)]
    for _ in range(12):           # X alone
        order += 1
        li += [(order, 3)]
    for _ in range(12):           # Y alone
        order += 1
        li += [(order, 4)]
    for _ in range(6):            # X+Y together sometimes
        order += 1
        li += [(order, 3), (order, 4)]
    lineitem = spark.createDataFrame(li, "l_orderkey long, l_partkey long")
    part = spark.createDataFrame(pt, "p_partkey long, p_brand string")
    got = {(r.brand_a, r.brand_b): r.lift
           for r in basket_brand_lift(lineitem, part, min_orders=2).collect()}
    # P,Q: n_both=6, na=nb=6, N=36 -> lift 6.0 ; X,Y: 6*36/(18*18)=0.67
    assert abs(got[("P", "Q")] - 6.0) < 1e-6
    assert got[("P", "Q")] > got[("X", "Y")]
    assert got[("X", "Y")] < 1.1


def test_daily_percentiles_orders_bands(spark, sf_dir):
    from audience_manager_platform_spark.operators.timeseries import (
        daily_percentiles,
    )
    from audience_manager_platform_spark.sources import load_table

    rows = daily_percentiles(load_table(spark, sf_dir, "events")).collect()
    assert rows
    for r in rows:
        assert r.p50 <= r.p95 <= r.p99
        assert r.n > 0


def test_funnel_latency_uses_first_view_first_purchase(spark):
    from audience_manager_platform_spark.operators.analytics import (
        funnel_latency,
    )

    rows = [
        (datetime(2024, 1, 1, 10, 0), 1, "view", 0.0),
        (datetime(2024, 1, 1, 10, 10), 1, "purchase", 5.0),   # 600s
        (datetime(2024, 1, 2, 9, 0), 2, "view", 0.0),
        (datetime(2024, 1, 2, 9, 20), 2, "purchase", 5.0),    # 1200s
        (datetime(2024, 1, 3, 8, 0), 3, "purchase", 5.0),     # purchase first
        (datetime(2024, 1, 3, 9, 0), 3, "view", 0.0),         # -> excluded
        (datetime(2024, 1, 4, 9, 0), 4, "view", 0.0),         # never converts
    ]
    got = funnel_latency(_events(spark, rows)).collect()[0]
    assert got.n_converted == 2
    assert got.p50_s == 900.0                    # midpoint of 600 and 1200
    assert got.p99_s <= 1200.0


def test_event_transitions_probabilities(spark):
    from audience_manager_platform_spark.operators.analytics import (
        event_transitions,
    )

    rows = [
        (datetime(2024, 1, 1, 10, 0), 1, "view", 0.0),
        (datetime(2024, 1, 1, 10, 1), 1, "click", 0.0),
        (datetime(2024, 1, 1, 10, 2), 1, "view", 0.0),
        (datetime(2024, 1, 1, 10, 3), 1, "click", 0.0),
        (datetime(2024, 1, 1, 10, 4), 1, "purchase", 0.0),
    ]
    got = {(r.from_type, r.to_type): r for r in
           event_transitions(_events(spark, rows)).collect()}
    assert got[("view", "click")].n == 2 and got[("view", "click")].p == 1.0
    assert got[("click", "view")].p == 0.5
    assert got[("click", "purchase")].p == 0.5
    # cross-user pairs never appear
    assert all(k[0] != "purchase" for k in got)


def test_burst_stats_finds_the_planted_burst(spark):
    from audience_manager_platform_spark.operators.analytics import burst_stats

    rows = [(datetime(2024, 1, 1, 10, 0, s), 1, "view", 0.0) for s in range(30)]
    rows += [(datetime(2024, 1, 1, h, 0), 2, "view", 0.0) for h in range(10, 15)]
    got = {r.user_id: r for r in burst_stats(_events(spark, rows)).collect()}
    assert got[1].peak_per_window == 30      # 30 events inside one minute
    assert got[2].peak_per_window == 1       # spread out hourly


def test_zipf_fit_recovers_planted_power_law(spark):
    from audience_manager_platform_spark.operators.text import zipf_fit

    # corpus where term w_r appears ~ 1000/r times: slope should be ~ -1
    words = []
    for r in range(1, 51):
        words += [f"w{r:03d}"] * (1000 // r)
    text = " ".join(words)
    docs = _docs5(spark, [text])
    got = zipf_fit(docs, top_n=50).collect()[0]
    assert got.n_terms == 50
    assert -1.15 < got.slope < -0.85


def test_stickiness_distinct_mau_not_sum(spark):
    from audience_manager_platform_spark.operators.analytics import stickiness

    # the same single user active in 4 consecutive weeks: WAU=1 each
    # week and MAU must be 1 (distinct), never 4 (summed weeklies)
    rows = [(datetime(2024, 1, 1 + 7 * w, 12), 1, "view", 0.0) for w in range(4)]
    got = {r.week: r for r in stickiness(_events(spark, rows)).collect()}
    weeks = sorted(got)
    assert got[weeks[-1]].wau == 1
    assert got[weeks[-1]].mau == 1
    assert got[weeks[-1]].stickiness == 1.0


def test_revenue_gini_bounds_and_equality_case(spark):
    from audience_manager_platform_spark.operators.analytics import revenue_gini

    # perfectly equal spenders: Gini == 0
    rows = [(datetime(2024, 1, 1 + u), u, "purchase", 100.0) for u in range(10)]
    got = revenue_gini(_events(spark, rows)).collect()[0]
    assert got.n_users == 10 and got.total_revenue == 1000.0
    assert abs(got.gini) < 1e-9

    # one whale: Gini approaches (n-1)/n
    rows2 = [(datetime(2024, 1, 1 + u), u, "purchase",
              10000.0 if u == 0 else 0.01) for u in range(10)]
    g2 = revenue_gini(_events(spark, rows2)).collect()[0].gini
    assert g2 > 0.85


def test_new_vs_returning_split(spark):
    from audience_manager_platform_spark.operators.analytics import (
        new_vs_returning,
    )

    rows = [
        (datetime(2024, 1, 1), 1, "view", 0.0),    # week w0: user1 new
        (datetime(2024, 1, 8), 1, "view", 0.0),    # w1: user1 returning
        (datetime(2024, 1, 8), 2, "view", 0.0),    # w1: user2 new
    ]
    got = {r.week: r for r in new_vs_returning(_events(spark, rows)).collect()}
    weeks = sorted(got)
    assert got[weeks[0]].new_users == 1 and got[weeks[0]].returning_users == 0
    assert got[weeks[1]].new_users == 1 and got[weeks[1]].returning_users == 1


def test_label_separation_detects_collapse(spark):
    from audience_manager_platform_spark.operators.similarity import (
        EMBED_DIM,
        label_centroid_separation,
    )

    def vec(axis, jitter):
        v = [0.0] * EMBED_DIM
        v[axis] = 1.0
        v[(axis + 1) % EMBED_DIM] = jitter
        return v

    rows = []
    for i in range(10):
        rows.append((i, vec(0, 0.01 * i), 0))          # label 0 on axis 0
        rows.append((100 + i, vec(0, 0.01 * i), 1))    # label 1 COLLAPSED onto 0
        rows.append((200 + i, vec(30, 0.01 * i), 2))   # label 2 orthogonal
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = {(r.label_a, r.label_b): r.centroid_cosine
           for r in label_centroid_separation(emb).collect()}
    assert got[(0, 1)] > 0.999          # collapse detected
    assert got[(0, 2)] < 0.1 and got[(1, 2)] < 0.1


def test_robust_anomaly_immune_to_its_own_spike(spark):
    from audience_manager_platform_spark.operators.analytics import (
        daily_anomalies_robust,
    )

    # 20 quiet days at ~100 plus one 100x spike: median/MAD flags ONLY
    # the spike (a mean/std detector would inflate sigma by the spike)
    rows = []
    for d in range(20):
        rows.append((datetime(2024, 1, 1 + d, 12), 1, "view", 100.0 + d % 3))
    rows.append((datetime(2024, 1, 25, 12), 1, "view", 10000.0))
    got = {r.day: r for r in
           daily_anomalies_robust(_events(spark, rows)).collect()}
    flagged = [d for d, r in got.items() if r.is_anomaly]
    assert flagged == ["2024-01-25"]


def test_spend_percentile_rank_orders(spark):
    from audience_manager_platform_spark.operators.analytics import (
        spend_percentile_rank,
    )

    rows = [(datetime(2024, 1, 1 + u), u, "purchase", float(10 * (u + 1)))
            for u in range(5)]
    got = {r.user_id: r.spend_pct_rank
           for r in spend_percentile_rank(_events(spark, rows)).collect()}
    assert got[0] == 0.0 and got[4] == 1.0
    assert got[2] == 0.5


def test_duplicate_spans_finds_planted_verbatim_repeat(spark):
    """Two docs sharing one verbatim 10-token passage (surrounded by
    unique text) must each report exactly one span covering ~10 tokens;
    a doc with no repeats must not appear."""
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = _docs5(spark, [
        "unique one two three " + shared + " tail aaa bbb ccc",
        "different opening words here " + shared + " other ending xyz",
        "completely unrelated text with no repeated passage at all okay",
    ])
    got = {r.doc_id: r for r in D.duplicate_ngram_spans(docs, k=8).collect()}
    assert set(got) == {0, 1}
    for r in got.values():
        assert r.n_spans == 1
        assert r.longest_span == 10  # the shared passage, exactly
        assert 0 < r.dup_ratio < 1


def test_duplicate_spans_merges_adjacent_positions(spark):
    """A doc repeated VERBATIM yields one maximal span covering the
    whole doc (every position duplicated -> single island), not one
    span per gram position."""
    text = "one two three four five six seven eight nine ten eleven twelve"
    docs = _docs5(spark, [text, text])
    got = D.duplicate_ngram_spans(docs, k=8).collect()
    assert len(got) == 2
    for r in got:
        assert r.n_spans == 1
        assert r.dup_tokens == 12
        assert r.dup_ratio == 1.0


def test_duplicate_spans_same_doc_repetition_counts(spark):
    """min_occurrences counts GLOBAL occurrences, so a passage repeated
    twice INSIDE one doc is duplicated (the Lee et al. semantics —
    self-repetition is still wasted training signal)."""
    eight = "p1 p2 p3 p4 p5 p6 p7 p8"
    docs = _docs5(spark, [
        f"start {eight} middle words go here {eight} finish",
        "some other totally unrelated document text without any repeats",
    ])
    got = {r.doc_id: r for r in D.duplicate_ngram_spans(docs, k=8).collect()}
    assert set(got) == {0}
    assert got[0].n_spans == 2


def test_dedup_recall_eval_counts(spark):
    """On a corpus with one exact-duplicate pair and unrelated rest, the
    exact and estimated sets both contain exactly that pair -> perfect
    precision/recall; the full-join bookkeeping must not double count."""
    text = "the quick brown fox jumps over the lazy dog again and again"
    docs = _docs5(spark, [
        text,
        text,
        "entirely different content about spark dataframes and shuffles",
        "yet another unrelated string of words for the control group",
    ])
    row = D.dedup_recall_eval(docs, threshold=0.5).collect()[0]
    assert row.n_true == 1 and row.n_est == 1 and row.n_hit == 1
    assert row.precision == 1.0 and row.recall == 1.0


def test_bpe_train_learns_expected_merges(spark):
    """Hand-checkable corpus: 'abab' x3 and 'cd' x2. Pair counts round 1:
    (a,b)=6, (b,a)=3, (c,d)=2 -> merge (a,b). Round 2: words are
    [ab, ab] x3 and [c, d] x2 -> (ab,ab)=3 beats (c,d)=2."""
    from audience_manager_platform_spark.operators.text import bpe_train

    docs = _docs5(spark, ["abab abab abab", "cd cd"])
    rows = [(r.merge_rank, r.left_sym, r.right_sym, r.pair_count)
            for r in bpe_train(docs, n_merges=3).collect()]
    assert rows[0] == (1, "a", "b", 6)
    assert rows[1] == (2, "ab", "ab", 3)
    assert rows[2][:3] == (3, "c", "d")


def test_bpe_self_pair_merges_greedy_left_to_right(spark):
    """'aaaa' x2 with merge (a,a): greedy left-to-right takes positions
    (1,2) and (3,4) -> each word becomes [aa, aa], so round 2's top
    pair is (aa,aa) with count 2 - the exact overlap rule real BPE
    uses (taking (2,3) too would be the bug)."""
    from audience_manager_platform_spark.operators.text import bpe_train

    docs = _docs5(spark, ["aaaa aaaa"])
    rows = [(r.merge_rank, r.left_sym, r.right_sym, r.pair_count)
            for r in bpe_train(docs, n_merges=2).collect()]
    # 'aaaa' has 3 adjacent (a,a) pairs, word freq 2 -> count 6
    assert rows[0] == (1, "a", "a", 6)
    assert rows[1] == (2, "aa", "aa", 2)


def test_bpe_vocab_stats_compression(spark):
    """'abab' x3: chars = 4*3 = 12. After 2 merges ('ab', then 'abab')
    each word is ONE symbol -> tokens = 3, chars_per_token = 4.0,
    vocab = {'abab'}."""
    from audience_manager_platform_spark.operators.text import bpe_vocab_stats

    docs = _docs5(spark, ["abab abab abab"])
    row = bpe_vocab_stats(docs, n_merges=2).collect()[0]
    assert row.total_chars == 12
    assert row.total_tokens == 3
    assert row.vocab_symbols == 1
    assert row.chars_per_token == 4.0


def test_dp_noisy_counts_calibration(spark):
    """The released counts differ from the truth by seeded Laplace(1/eps)
    noise: nonzero, reproducible across calls, scale-calibrated (|noise|
    for eps=10 strictly smaller than for eps=0.1 at the same seed), and
    the true count never escapes."""
    from audience_manager_platform_spark.operators.validation import (
        dp_noisy_counts,
    )

    rows = [(datetime(2024, 1, 1), u, "view", 1.0) for u in range(100)]
    rows += [(datetime(2024, 1, 1), u, "purchase", 1.0) for u in range(40)]
    ev = _events(spark, rows)
    a = {r[0]: r.noisy_count for r in dp_noisy_counts(ev, "event_type").collect()}
    b = {r[0]: r.noisy_count for r in dp_noisy_counts(ev, "event_type").collect()}
    assert a == b  # seeded noise: bit-reproducible
    assert a["view"] != 100.0 and a["purchase"] != 40.0
    assert abs(a["view"] - 100.0) < 20  # eps=1 noise is single-digit scale
    tight = {r[0]: r.noisy_count
             for r in dp_noisy_counts(ev, "event_type", epsilon=10.0).collect()}
    loose = {r[0]: r.noisy_count
             for r in dp_noisy_counts(ev, "event_type", epsilon=0.1).collect()}
    for k in a:
        true = 100.0 if k == "view" else 40.0
        assert abs(tight[k] - true) < abs(loose[k] - true)
    cols = set(dp_noisy_counts(ev, "event_type").columns)
    assert cols == {"event_type", "noisy_count", "epsilon"}


def test_duplicate_spans_empty_on_unique_corpus(spark):
    docs = _docs5(spark, [
        "first completely unique document body alpha beta one",
        "second entirely different words gamma delta two three",
    ])
    assert D.duplicate_ngram_spans(docs, k=8).count() == 0


def test_bpe_train_short_words_only(spark):
    """Single-char words have no pairs: training emits zero merges and
    vocab stats still hold (tokens == chars)."""
    from audience_manager_platform_spark.operators.text import (
        bpe_train,
        bpe_vocab_stats,
    )

    docs = _docs5(spark, ["a b c a b a"])
    assert bpe_train(docs, n_merges=3).count() == 0
    row = bpe_vocab_stats(docs, n_merges=0).collect()[0]
    assert row.total_chars == row.total_tokens == 6
    assert row.chars_per_token == 1.0


def test_dsir_weights_favor_target_distribution(spark):
    # Target = 'en' docs about "alpha beta"; the raw pool adds 'de' docs
    # about "gamma delta". A doc written in target vocabulary must score
    # strictly above one written in the off-target vocabulary.
    from audience_manager_platform_spark.operators.corpus import dsir_weights

    # terms chosen collision-free under HASH60 % 128 (alpha/gamma DO
    # collide at bucket 123 — a collided pair blends the distributions)
    rows = [
        (0, "omega beta omega beta omega", "en"),
        (1, "omega beta beta omega beta", "en"),
        (2, "kappa delta kappa delta kappa", "de"),
        (3, "kappa delta delta kappa delta", "de"),
    ]
    docs = spark.createDataFrame(
        [(i, t, lang, "web", len(t)) for i, t, lang in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r.doc_id: r for r in dsir_weights(docs).collect()}
    assert got[0].n_tokens == 5
    # target-vocab docs score positive, off-target negative
    assert got[0].dsir_logw > 0 > got[2].dsir_logw
    assert min(got[0].dsir_logw, got[1].dsir_logw) > max(
        got[2].dsir_logw, got[3].dsir_logw
    )


def test_dsir_weights_zero_token_docs_drop(spark):
    from audience_manager_platform_spark.operators.corpus import dsir_weights

    docs = spark.createDataFrame(
        [(0, "alpha", "en", "web", 5), (1, "", "en", "web", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = dsir_weights(docs).collect()
    assert {r.doc_id for r in got} == {0}


def test_dup_rate_by_source_cross_source_syndication(spark):
    # srcA: 2 unique docs; srcB: one copy of A's first doc (cross-source
    # dup) + one internal pair of identical docs.
    from audience_manager_platform_spark.operators.corpus import (
        dup_rate_by_source,
    )

    rows = [
        (0, "the quick brown fox", "srcA"),
        (1, "lorem ipsum dolor sit", "srcA"),
        (2, "The quick   brown FOX", "srcB"),  # normalizes equal to doc 0
        (3, "copy pasta twice over", "srcB"),
        (4, "copy pasta twice over", "srcB"),
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", src, len(t)) for i, t, src in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r.source: r for r in dup_rate_by_source(docs).collect()}
    assert got["srcA"].n_docs == 2 and got["srcB"].n_docs == 3
    # doc 0 is duplicated (by doc 2); doc 1 unique
    assert got["srcA"].n_dup_docs == 1 and got["srcA"].n_cross_source == 1
    # docs 2 (cross) + 3 + 4 (internal pair) are all dup members
    assert got["srcB"].n_dup_docs == 3 and got["srcB"].n_cross_source == 1
    assert got["srcB"].dup_rate == 1.0


def test_chunk_maxsim_finds_planted_chunk_in_long_doc(spark):
    # doc 1 buries an EXACT copy of the query text after 32 filler
    # tokens — its best chunk must score cosine 1.0 and win; doc 2 has
    # only mild uniform overlap. Max-pooling is what finds the needle.
    from audience_manager_platform_spark.operators.hybrid import (
        chunk_maxsim_topk,
    )

    query_txt = "omega beta " * 8                       # 16 tokens
    filler = " ".join(f"fill{i}" for i in range(32))    # 32 tokens
    docs = spark.createDataFrame(
        [
            (0, query_txt.strip(), "en", "web", 1),      # the query doc
            (1, f"{filler} {query_txt.strip()}", "en", "web", 1),
            (2, "omega " + " ".join(f"x{i}" for i in range(15)), "en", "web", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = chunk_maxsim_topk(docs, [0], k=5, chunk=32, stride=16).collect()
    assert all(r.query_id == 0 for r in got)
    assert all(r.doc_id != 0 for r in got)               # self excluded
    by_rank = {r.rank: r for r in got}
    assert by_rank[1].doc_id == 1 and by_rank[1].maxsim == 1.0
    # the winning chunk is the pure planted window (tokens 33..48)
    assert by_rank[1].best_chunk_idx == 2
    assert by_rank[2].doc_id == 2 and by_rank[2].maxsim < 1.0


def test_minhash_accuracy_exact_dup_and_estimator_sanity(spark):
    # An exact duplicate pair must show est == true == 1.0; a partial
    # overlap pair keeps the true Jaccard in [0, 1] alongside the
    # estimate from signature agreement.
    base = " ".join(f"w{i}" for i in range(40))
    near = " ".join(f"w{i}" for i in range(35)) + " q1 q2 q3 q4 q5"
    docs = spark.createDataFrame(
        [
            (0, base, "en", "web", 1),
            (1, base, "en", "web", 1),          # exact dup of 0
            (2, near, "en", "web", 1),          # high-overlap near dup
            (3, "totally different content here now", "en", "web", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    from audience_manager_platform_spark.operators.dedup import (
        minhash_accuracy,
    )

    got = {(r.doc_a, r.doc_b): r for r in
           minhash_accuracy(docs, est_threshold=0.5).collect()}
    assert (0, 1) in got
    assert got[(0, 1)].est_jaccard == 1.0 and got[(0, 1)].true_jaccard == 1.0
    for r in got.values():
        assert 0.0 <= r.true_jaccard <= 1.0
        assert 0.5 <= r.est_jaccard <= 1.0


def test_seasonality_profile_planted_weekday_effect(spark):
    # Mondays carry value 20, all other days 10 → Monday's index > 1,
    # others < 1; ISO numbering (1=Mon) pinned.
    from audience_manager_platform_spark.operators.timeseries import (
        seasonality_profile,
    )

    rows = []
    # 2024-01-01 is a Monday
    for d in range(14):
        day = datetime(2024, 1, 1 + d, 12, 0)
        val = 20.0 if day.weekday() == 0 else 10.0
        rows.append((day, 1, "purchase", val))
    got = {r.iso_dow: r for r in
           seasonality_profile(_events(spark, rows)).collect()}
    assert set(got) == set(range(1, 8))
    assert got[1].avg_value == 20.0 and got[1].seasonal_idx > 1.0
    for d in range(2, 8):
        assert got[d].avg_value == 10.0 and got[d].seasonal_idx < 1.0


def test_longest_streak_islands(spark):
    # u1 active on days 1,2,3, then 5,6 → longest 3, active 5
    from audience_manager_platform_spark.registry.windows import (
        window_longest_streak,
    )
    import os
    import tempfile

    rows = [(datetime(2024, 1, d, 10, 0), 1, "view", 1.0) for d in (1, 2, 3, 5, 6)]
    rows += [(datetime(2024, 1, 1, 11, 0), 1, "click", 1.0)]  # same-day dup
    rows += [(datetime(2024, 1, 9, 10, 0), 2, "view", 1.0)]
    with tempfile.TemporaryDirectory() as td:
        _events(spark, rows).write.parquet(os.path.join(td, "events.parquet"))
        got = {r.user_id: r for r in window_longest_streak(spark, td).collect()}
    assert got[1].longest_streak == 3 and got[1].active_days == 5
    assert got[2].longest_streak == 1 and got[2].active_days == 1


def test_ivf_probe_sweep_recall_monotone(spark):
    # Recall@k can only improve as more cells are probed; at probes ==
    # IVF_CENTROIDS the search is exhaustive so recall == 1.0.
    from audience_manager_platform_spark.operators.similarity import (
        IVF_CENTROIDS,
        ivf_probe_sweep,
    )

    import math

    vecs = []
    for i in range(40):
        a = 2 * math.pi * (i / 40.0)
        vecs.append((i, [math.cos(a), math.sin(a), 0.1 * (i % 3)], i % 2))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v], lab) for i, v, lab in vecs],
        "vec_id long, embedding array<float>, label int",
    )
    got = {r.n_probes: r for r in
           ivf_probe_sweep(emb, [20, 30], k=3,
                           probe_counts=(1, 2, IVF_CENTROIDS)).collect()}
    assert got[1].mean_recall <= got[2].mean_recall <= got[IVF_CENTROIDS].mean_recall
    assert got[IVF_CENTROIDS].mean_recall == 1.0
    assert all(r.n_queries == 2 for r in got.values())


def test_filter_funnel_cumulative_attrition(spark):
    # 3 docs: one healthy English doc, one exact copy of it (dedup
    # drop), one gibberish doc with no stopwords (gopher drop).
    from audience_manager_platform_spark.operators.corpus import filter_funnel

    # >=20 words, mean word length in [3,10], has stopwords, and
    # distinct enough to clear the dup-word-frac <= 0.6 gate
    healthy = (
        "the quick brown fox jumped over one lazy sleeping dog while "
        "and many other animals watched from nearby shaded benches "
        "with great interest during that warm quiet summer afternoon"
    )
    gibberish = " ".join(f"zqxv{i}" for i in range(60))
    docs = spark.createDataFrame(
        [
            (0, healthy, "en", "web", 1),
            (1, healthy, "en", "web", 1),
            (2, gibberish, "en", "web", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r.stage_name: r for r in filter_funnel(docs).collect()}
    assert got["language_id"].entered == 3
    # the gibberish doc may or may not clear langid; whatever survives
    # language_id enters gopher, and the funnel is monotone
    assert got["gopher_quality"].entered == got["language_id"].survivors
    assert got["exact_dedup"].entered == got["gopher_quality"].survivors
    assert got["exact_dedup"].survivors <= got["exact_dedup"].entered
    # the copy (doc 1) is dropped by dedup: of the two healthy copies
    # only one survives the final stage
    assert got["exact_dedup"].survivors == 1
    assert got["gopher_quality"].survivors == 2  # gibberish dropped
    for r in got.values():
        assert r.dropped == r.entered - r.survivors


def test_pack_efficiency_bands_and_overflow(spark):
    # budget 8: doc A (5 tok) + doc B (3 tok) exactly fill bin 0 of
    # shard 0; doc C (12 tok) overflows its own bin.
    from audience_manager_platform_spark.operators.corpus import (
        pack_efficiency,
    )

    docs = spark.createDataFrame(
        [
            (0, "a b c d e", "en", "web", 1),
            (32, "f g h", "en", "web", 1),           # same shard as 0 (id%32)
            (1, " ".join(f"t{i}" for i in range(12)), "en", "web", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r.fill_band: r for r in
           pack_efficiency(docs, token_budget=8, n_shards=32).collect()}
    # shard0 bin0: 5+3 = 8/8 -> band 10 full; shard1 doc C: 12 > 8 -> band 10 overflow
    assert got[10].n_bins == 2 and got[10].n_docs == 3
    assert got[10].overflow_bins == 1


def test_ab_ztest_detects_planted_lift(spark):
    # even users (variant A) never convert; odd users (variant B) all
    # convert -> rate_a=0, rate_b=1, z large and positive.
    from audience_manager_platform_spark.operators.analytics import (
        ab_conversion_ztest,
    )

    rows = []
    for u in range(20):
        et = "purchase" if u % 2 == 1 else "view"
        rows.append((datetime(2024, 1, 1 + (u % 5)), u, et, 10.0))
        rows.append((datetime(2024, 1, 2 + (u % 5)), u, "view", 1.0))
    got = ab_conversion_ztest(_events(spark, rows)).collect()[0]
    assert got.n_a == 10 and got.n_b == 10
    assert got.rate_a == 0.0 and got.rate_b == 1.0
    assert got.abs_lift == 1.0
    # z = 1 / sqrt(0.5*0.5*(0.1+0.1)) = sqrt(20) ~ 4.472136
    assert abs(got.z_score - 4.472136) < 1e-6


def test_ab_ztest_null_effect_is_zero(spark):
    from audience_manager_platform_spark.operators.analytics import (
        ab_conversion_ztest,
    )

    rows = [(datetime(2024, 1, 1), u, "purchase", 5.0) for u in range(8)]
    got = ab_conversion_ztest(_events(spark, rows)).collect()[0]
    assert got.rate_a == got.rate_b == 1.0
    # se is 0 when p==1; the z expression divides by zero -> inf/NaN is
    # unacceptable output: a degenerate pool must still emit a row
    assert got.abs_lift == 0.0


def test_pq_recall_eval_perfect_on_separable_vectors(spark):
    # Recall@1 of the PQ/ADC path against the exact L2 scan stays a
    # well-formed fraction for every query on a spread-out corpus.
    from audience_manager_platform_spark.operators.pq import pq_recall_eval
    from audience_manager_platform_spark.operators.similarity import EMBED_DIM

    import random

    rng = random.Random(7)
    # enough spread that every subspace keeps all 16 codewords populated
    vecs = [
        (i, [rng.uniform(-1, 1) for _ in range(EMBED_DIM)], i % 2)
        for i in range(200)
    ]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v], lab) for i, v, lab in vecs],
        "vec_id long, embedding array<float>, label int",
    )
    got = pq_recall_eval(emb, [0, 1, 2], k=1).collect()
    assert {r.query_id for r in got} == {0, 1, 2}
    for r in got:
        assert 0.0 <= r.recall_at_k <= 1.0
        assert r.hits <= 1


def test_bigram_logprob_flags_shuffled_word_salad(spark):
    # Natural repeated phrase vs the same words in scrambled order: the
    # scrambled doc's bigrams are unseen (count 0 before smoothing), so
    # its mean bigram log-prob is strictly lower.
    from audience_manager_platform_spark.operators.text import bigram_logprob

    natural = "the cat sat on the mat " * 4
    salad = "mat the on sat cat the " + "cat mat sat the on the " * 3
    docs = spark.createDataFrame(
        [
            (0, natural.strip(), "en", "web", 1),
            (1, natural.strip(), "en", "web", 1),
            (2, salad.strip(), "en", "web", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r.doc_id: r for r in bigram_logprob(docs).collect()}
    assert got[0].n_bigrams == 23
    assert got[0].avg_logprob == got[1].avg_logprob
    assert got[2].avg_logprob < got[0].avg_logprob


def test_dsir_weights_partition_invariant(spark):
    # The per-doc score is an exact bigint sum of integer micro-log-
    # ratios — it must be IDENTICAL whatever the input partitioning
    # (the property class whose absence produced the r4 driver-red PQ
    # rows).
    from audience_manager_platform_spark.operators.corpus import dsir_weights
    from audience_manager_platform_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    a = {
        r.doc_id: (r.n_tokens, r.dsir_logw)
        for r in dsir_weights(docs.repartition(1)).collect()
    }
    b = {
        r.doc_id: (r.n_tokens, r.dsir_logw)
        for r in dsir_weights(docs.repartition(13)).collect()
    }
    assert a == b


def test_chunk_maxsim_partition_invariant(spark):
    from audience_manager_platform_spark.operators.hybrid import (
        chunk_maxsim_topk,
    )
    from audience_manager_platform_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    key = lambda rows: sorted(  # noqa: E731
        (r.query_id, r.rank, r.doc_id, r.maxsim, r.best_chunk_idx)
        for r in rows
    )
    a = key(chunk_maxsim_topk(docs.repartition(1), [0, 10], k=3).collect())
    b = key(chunk_maxsim_topk(docs.repartition(7), [0, 10], k=3).collect())
    assert a == b


def test_neighbor_jaccard_planted_twins_and_hub_guard(spark):
    from audience_manager_platform_spark.operators.graph import (
        neighbor_jaccard,
    )

    # a1/a2 share all 3 neighbors (J=1); a3 shares none; hub neighbor
    # h is connected to everyone and must NOT create candidates once
    # capped out.
    rows = []
    for b in ("x", "y", "z"):
        rows += [(1, b), (2, b)]
    rows += [(3, "p"), (3, "q"), (3, "r")]
    rows += [(1, "h"), (2, "h"), (3, "h"), (4, "h")]
    df = spark.createDataFrame(rows, "a long, b string")
    got = {(r.a1, r.a2): r for r in
           neighbor_jaccard(df, "a", "b", threshold=0.5, max_nbr_df=3).collect()}
    # with the hub dropped, degrees are 3/3/3 and (1,2) is the only pair
    assert set(got) == {(1, 2)}
    assert got[(1, 2)].jaccard == 1.0 and got[(1, 2)].shared == 3
    # without the cap the hub links everyone but dilutes scores below 0.5
    uncapped = {(r.a1, r.a2) for r in
                neighbor_jaccard(df, "a", "b", threshold=0.5).collect()}
    assert (1, 2) in uncapped and (1, 4) not in uncapped


def test_fk_orphan_audit_finds_planted_orphans(spark):
    from audience_manager_platform_spark.operators.validation import (
        fk_orphan_audit,
    )

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, 99), (5, None)],
        "id long, fk long",
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    got = fk_orphan_audit(
        [("child->parent", child, "fk", parent, "pk")]
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert r.child_rows == 5 and r.null_keys == 1
    assert r.orphan_rows == 2 and r.orphan_keys == 1  # key 99 twice
    assert not r.intact


def test_key_skew_profile_planted_hot_key(spark):
    from audience_manager_platform_spark.operators.skew import key_skew_profile

    # key 999 carries half the rows; keys 0..19 carry 5 each; one NULL
    # row must be excluded entirely
    rows = [(999,)] * 100 + [(k,) for k in range(20) for _ in range(5)]
    rows += [(None,)]
    df = spark.createDataFrame(rows, "user_id long")
    got = {r.band: r for r in key_skew_profile(df, "user_id", bands=4).collect()}
    assert sorted(got) == [1, 2, 3, 4]
    # the hot key lands in band 1 and dominates its row share
    assert got[1].max_key_rows == 100
    assert sum(r.rows for r in got.values()) == 200  # NULL excluded
    assert abs(sum(r.rows_share for r in got.values()) - 1.0) < 1e-6
    assert got[1].rows_share > 0.5
    # 21 keys over 4 ntile bands: 6,5,5,5
    assert [got[b].n_keys for b in (1, 2, 3, 4)] == [6, 5, 5, 5]


def test_key_skew_profile_partition_invariant(spark):
    from audience_manager_platform_spark.operators.skew import key_skew_profile
    from audience_manager_platform_spark.sources import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    key = lambda df: {
        r.band: (r.n_keys, r.rows, r.max_key_rows, r.rows_share)
        for r in key_skew_profile(df, "user_id").collect()
    }
    assert key(ev.repartition(1)) == key(ev.repartition(13))


def test_ngram_novelty_planted_copies(spark):
    from audience_manager_platform_spark.operators.corpus import ngram_novelty

    originals = [
        "alpha beta gamma delta epsilon",
        "zeta eta theta iota kappa",
        "lambda mu nu xi omicron",
        "pi rho sigma tau upsilon",
    ]
    # docs 0-3: originals (bucket 0); docs 4-7: verbatim copies (bucket 1)
    got = {
        r.bucket: r
        for r in ngram_novelty(
            _docs5(spark, originals + originals), buckets=2
        ).collect()
    }
    assert got[0].novelty == 1.0  # every gram first seen here
    assert got[1].novelty == 0.0  # pure re-crawl: nothing new
    assert got[0].grams == got[1].grams
    assert got[1].new_grams == 0


def test_ngram_novelty_short_docs_drop(spark):
    from audience_manager_platform_spark.operators.corpus import ngram_novelty

    got = ngram_novelty(
        _docs5(spark, ["one two", "a fresh three gram doc"]), buckets=1
    ).collect()
    assert len(got) == 1
    assert got[0].n_docs == 1  # the 2-token doc has no 3-grams


def test_changepoint_mean_shift_finds_planted_step(spark):
    from datetime import datetime

    from audience_manager_platform_spark.operators.timeseries import (
        changepoint_mean_shift,
    )

    # 28 daily purchases: 10.0/day through Jan 14, 100.0/day from Jan 15
    rows = [
        (i, datetime(2024, 1, 1 + i), 1, "purchase",
         10.0 if i < 14 else 100.0, "{}")
        for i in range(28)
    ]
    df = spark.createDataFrame(rows, _EVENTS_SCHEMA)
    got = changepoint_mean_shift(df).collect()
    top = next(r for r in got if r.rk == 1)
    # the first day of the new regime wins with the full 90-point shift
    assert top.day == "2024-01-15"
    assert top.shift_score == 90.0
    assert top.trail_mean == 10.0 and top.lead_mean == 100.0
    # edge discipline: no day without full 7-day frames on both sides
    assert min(r.day for r in got) >= "2024-01-08"
    assert max(r.day for r in got) <= "2024-01-22"


def test_readability_scores_hand_computed(spark):
    from audience_manager_platform_spark.operators.text import (
        readability_scores,
    )

    got = {
        r.doc_id: r
        for r in readability_scores(
            _docs5(spark, ["the cat sat. it ran fast!", ""])
        ).collect()
    }
    r0 = got[0]
    assert r0.n_sentences == 2 and r0.n_words == 6 and r0.n_syllables == 6
    # flesch = 206.835 - 1.015*(6/2) - 84.6*(6/6)
    assert r0.flesch_ease == round(206.835 - 1.015 * 3 - 84.6, 4)
    assert r0.fk_grade == round(0.39 * 3 + 11.8 - 15.59, 4)
    # zero-word doc: counts zero, scores NULL (guarded division)
    r1 = got[1]
    assert r1.n_words == 0
    assert r1.flesch_ease is None and r1.fk_grade is None


def test_rake_scores_cooccurring_phrase_over_stray_words(spark):
    from audience_manager_platform_spark.operators.text import rake_keywords

    docs = [
        "the deep learning model and the deep learning data",
        "the deep learning model",
        "the pizza",
    ]
    got = {r.phrase: r for r in rake_keywords(_docs5(spark, docs)).collect()}
    # "deep learning model" occurs twice and its words co-occur in long
    # phrases -> top score; the isolated word scores its own tiny degree
    assert got["deep learning model"].n_occurrences == 2
    assert got["deep learning model"].score > got["pizza"].score
    # degree/frequency: deep appears in 3 phrases of len 3 -> deg 9,
    # freq 3 -> wscore 3; same for learning; model: deg 3+3=6? no -
    # model in 2 phrases len 3 -> deg 6, freq 2 -> 3. data: deg 3/1 = 3
    assert got["deep learning data"].score == 9.0
    assert got["pizza"].score == 1.0


def test_cross_corpus_contamination_flags_only_cross_side(spark):
    from audience_manager_platform_spark.operators.dedup import (
        cross_corpus_contamination,
    )

    text_a = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        # train side: doc 1 = the leaked doc, doc 2 unrelated
        (1, text_a, "en", "train", len(text_a)),
        (2, "one two three four five six seven eight", "en", "train", 40),
        # eval side: doc 10 duplicates train doc 1; doc 11 duplicates
        # ANOTHER EVAL doc only (no train match) -> must not appear
        (10, text_a, "en", "bench", len(text_a)),
        (11, "nine ten eleven twelve thirteen fourteen fifteen", "en", "bench", 48),
        (12, "nine ten eleven twelve thirteen fourteen fifteen", "en", "bench", 48),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = cross_corpus_contamination(docs, eval_source="bench").collect()
    assert {(r.eval_doc, r.train_doc) for r in got} == {(10, 1)}
    assert got[0].est_jaccard == 1.0


def test_label_propagation_components_with_self_vote(spark):
    from audience_manager_platform_spark.operators.graph import (
        label_propagation,
    )

    # two components: path 1-2-3 and pair 10-11 (symmetric edge lists)
    und = [(1, 2), (2, 3), (10, 11)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )
    got = {r.node: r.label for r in label_propagation(edges).collect()}
    # min-label fixed point per component; no cross-component leakage
    assert got[1] == got[2] == got[3] == 1
    assert got[10] == got[11] == 10


def test_l_diversity_catches_homogeneous_class(spark):
    from audience_manager_platform_spark.operators.validation import (
        l_diversity_audit,
    )

    rows = [("US", "gold")] * 6 + [("DE", "gold"), ("DE", "silver")]
    df = spark.createDataFrame(rows, "country string, tier string")
    got = {r.country: r for r in l_diversity_audit(
        df, ["country"], "tier", k=5, ell=2
    ).collect()}
    # US: big enough crowd (no k risk) but perfectly homogeneous (l risk)
    assert not got["US"].k_risk and got["US"].l_risk
    assert got["US"].distinct_sensitive == 1
    assert got["US"].top_value_share == 1.0
    # DE: diverse (no l risk) but only 2 members (k risk)
    assert got["DE"].k_risk and not got["DE"].l_risk
    assert got["DE"].top_value_share == 0.5


def test_snapshot_drift_planted_centroid_shift(spark):
    from audience_manager_platform_spark.operators.similarity import (
        EMBED_DIM,
        snapshot_drift,
    )

    def vec(x0):
        return [float(x0)] + [0.0] * (EMBED_DIM - 1)

    # label 0: old (even ids) at x=1, new (odd ids) at x=3 -> shift 2.0;
    # label 1: both snapshots identical -> shift 0
    rows = [
        (0, vec(1.0), 0), (2, vec(1.0), 0),
        (1, vec(3.0), 0), (3, vec(3.0), 0),
        (10, vec(5.0), 1), (11, vec(5.0), 1),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = {r.label: r for r in snapshot_drift(emb).collect()}
    assert got[0].n_old == 2 and got[0].n_new == 2
    assert got[0].centroid_shift == 2.0
    assert got[0].mean_norm_delta == 2.0
    assert got[1].centroid_shift == 0.0 and got[1].mean_norm_delta == 0.0


def test_epoch_budget_flags_over_repeated_slice(spark):
    from audience_manager_platform_spark.operators.corpus import epoch_budget

    rows = [
        (0, "one two three four", "a", "web", 18),
        (1, "five six seven eight", "a", "web", 20),
        (2, "nine ten", "b", "web", 8),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {r.lang: r for r in epoch_budget(
        docs, budget_tokens=30, alpha=0.5
    ).collect()}
    # shares 8/10 vs 2/10; sqrt-temperature -> weights exactly 2/3, 1/3
    assert got["a"].n_tokens == 8 and got["b"].n_tokens == 2
    assert got["a"].mixture_weight == round(2 / 3, 6)
    assert got["a"].epochs == 2.5 and not got["a"].repeat_risk
    assert got["b"].epochs == 5.0 and got["b"].repeat_risk


def test_snapshot_drift_partition_invariant(spark):
    # centroids/norms are floor-scaled integer sums -> the report must be
    # IDENTICAL under any input partitioning (the r4 PQ lesson applied
    # to every new model-state operator)
    from audience_manager_platform_spark.operators.similarity import (
        snapshot_drift,
    )
    from audience_manager_platform_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    key = lambda df: {
        r.label: (r.n_old, r.n_new, r.centroid_shift, r.mean_norm_delta)
        for r in snapshot_drift(df).collect()
    }
    assert key(emb.repartition(1)) == key(emb.repartition(13))


def test_trade_communities_partition_invariant(spark):
    from audience_manager_platform_spark.operators.graph import (
        _pairs_encoded,
        _sym_edges,
        label_propagation,
    )
    from audience_manager_platform_spark.sources import load_table

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    pairs = _pairs_encoded(orders, li)
    a = {
        r.node: r.label
        for r in label_propagation(_sym_edges(pairs).repartition(1)).collect()
    }
    b = {
        r.node: r.label
        for r in label_propagation(_sym_edges(pairs).repartition(13)).collect()
    }
    assert a == b


def test_source_jsd_orders_disjoint_above_identical(spark):
    from audience_manager_platform_spark.operators.corpus import (
        source_unigram_jsd,
    )

    same = "alpha beta gamma delta epsilon zeta"
    rows = (
        [(i, same, "en", "twin_a", 1) for i in range(5)]
        + [(100 + i, same, "en", "twin_b", 1) for i in range(5)]
        + [(200 + i, "omicron pi rho sigma tau upsilon", "en", "alien", 1)
           for i in range(5)]
    )
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {r.source: r.jsd for r in source_unigram_jsd(docs).collect()}
    # twins share the corpus-dominant vocabulary -> near-zero divergence;
    # the disjoint-vocab source stands clearly apart
    assert got["alien"] > got["twin_a"] + 0.05
    assert abs(got["twin_a"] - got["twin_b"]) < 1e-9
    assert 0.0 <= got["twin_a"] < 0.1


def test_rolling_regression_recovers_planted_slope(spark):
    from datetime import datetime

    from audience_manager_platform_spark.operators.timeseries import (
        rolling_regression,
    )

    rows = [
        (i, datetime(2024, 1, 1 + i), 1, "purchase", 10.0 * i, "{}")
        for i in range(20)
    ] + [
        (100 + i, datetime(2024, 1, 1 + i), 1, "view", 7.0, "{}")
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, _EVENTS_SCHEMA)
    got = rolling_regression(df).collect()
    purchase = [r for r in got if r.event_type == "purchase"]
    view = [r for r in got if r.event_type == "view"]
    # exact linear ramp: slope 10/day, perfect fit, full windows only
    assert purchase and all(r.slope == 10.0 and r.r2 == 1.0 for r in purchase)
    assert min(r.day for r in purchase) == "2024-01-14"
    # flat series: zero slope, r² undefined (zero variance -> NULL)
    assert view and all(r.slope == 0.0 and r.r2 is None for r in view)


def test_lsh_threshold_sweep_monotone_and_catches_exact_dup(spark):
    from audience_manager_platform_spark.operators.dedup import (
        lsh_threshold_sweep,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [base, base, "one two three four five six seven eight nine ten"]
    got = sorted(
        lsh_threshold_sweep(_docs5(spark, rows)).collect(),
        key=lambda r: r.threshold,
    )
    # flagged volume is non-increasing in the threshold, and the exact
    # duplicate pair survives even at threshold 1.0
    pairs = [r.n_pairs for r in got]
    assert pairs == sorted(pairs, reverse=True)
    assert got[-1].threshold == 1.0 and got[-1].n_pairs == 1
    assert got[-1].docs_in_pairs_ub == 2


def test_ngram_novelty_conserves_first_occurrences(spark):
    # every distinct corpus gram is first-seen in EXACTLY one doc, so
    # the bucketed new-gram counts must sum to |distinct grams|
    from pyspark.sql import functions as F

    from audience_manager_platform_spark.operators.corpus import ngram_novelty
    from audience_manager_platform_spark.operators.text import (
        tokens_col,
        word_ngrams_col,
    )
    from audience_manager_platform_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = ngram_novelty(docs).collect()
    assert all(0 <= r.new_grams <= r.grams for r in out)
    assert all(0.0 <= r.novelty <= 1.0 for r in out)
    distinct_grams = (
        docs.select("doc_id", tokens_col("text").alias("toks"))
        .select(F.explode(word_ngrams_col("toks", 3)).alias("gram"))
        .distinct()
        .count()
    )
    assert sum(r.new_grams for r in out) == distinct_grams


def test_source_jsd_within_theoretical_bounds(spark):
    import math

    from audience_manager_platform_spark.operators.corpus import (
        source_unigram_jsd,
    )
    from audience_manager_platform_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = source_unigram_jsd(docs).collect()
    assert out
    # JSD in nats is bounded by ln 2 (allow the 1e-9 floor-grid slack)
    for r in out:
        assert -1e-6 <= r.jsd <= math.log(2) + 1e-6


def test_bmp_resize_nearest_neighbor_on_gradient(spark):
    import struct

    from audience_manager_platform_spark.operators.multimodal import (
        decode_bmp_meta,
        resize_bmp,
    )

    # 4x2 gradient: pixel (x, row) = (r=10x, g=20*row, b=0); stride 12
    w_px, h_px = 4, 2
    rows_b = bytearray()
    for y in range(h_px):
        for x in range(w_px):
            rows_b += bytes((0, 20 * y, 10 * x))  # BGR
        # 3*4 = 12 bytes: no padding needed
    header = struct.pack("<2sIHHI", b"BM", 54 + len(rows_b), 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w_px, h_px, 1, 24, 0, len(rows_b), 2835, 2835, 0, 0
    )
    media = spark.createDataFrame(
        [(1, bytes(header + info + rows_b), "image/bmp")],
        "doc_id long, media binary, media_type string",
    )
    got = decode_bmp_meta(resize_bmp(media, 2, 1)).collect()[0]
    # pixel-center mapping picks sx in {1, 3}, sy = 1:
    # colors (r=10, g=20) and (r=30, g=20) -> means (20, 20, 0)
    assert (got.width, got.height) == (2, 1)
    assert (got.mean_r, got.mean_g, got.mean_b) == (20.0, 20.0, 0.0)


def test_soft_dedup_weights_conserve_distinct_supply(spark):
    from audience_manager_platform_spark.operators.dedup import (
        soft_dedup_weights,
    )

    docs = spark.createDataFrame(
        [
            (1, "the cat sat", "a"),
            (2, "the cat sat", "a"),   # exact dup of 1
            (3, "THE cat   sat", "a"), # normalized dup of 1
            (4, "something else entirely", "b"),
        ],
        "doc_id long, text string, source string",
    )
    rows = {r.doc_id: r for r in soft_dedup_weights(docs).collect()}
    assert rows[1].group_size == 3 and rows[4].group_size == 1
    assert rows[4].weight == 1.0
    # each weight is round(1/n, 6); the group's weights sum to ~1
    grp_w = rows[1].weight + rows[2].weight + rows[3].weight
    assert abs(grp_w - 1.0) < 1e-5
    # effective tokens: each distinct text contributes ~one copy of its
    # 3-token count ("the cat sat" / "something else entirely")
    eff = sum(r.eff_tokens for r in rows.values())
    assert abs(eff - 6.0) < 1e-4


def test_kmeans_quality_orders_overlap_above_separation(spark):
    from audience_manager_platform_spark.operators.similarity import (
        EMBED_DIM,
        kmeans_quality,
    )

    # three planted blobs on coordinate axes: clusters around e0 and a
    # slightly-rotated e0 overlap; the e1 blob is far from both
    rows = []
    blobs = ((0, 0.0), (0, 0.35), (1, 0.0))
    # interleave blobs so the vec_id < k seed rule picks one seed per blob
    for j in range(20):
        for b, (base_axis, tilt) in enumerate(blobs):
            v = [0.0] * EMBED_DIM
            v[base_axis] = 1.0
            v[2] = tilt  # tilts blob 2 toward blob 1 without joining it
            v[3 + (j % 4)] = 0.05 * ((j % 3) - 1)  # small jitter
            rows.append((j * 3 + b, v))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    out = {r.cluster_id: r for r in kmeans_quality(emb, k=3, iters=2).collect()}
    assert len(out) == 3
    for r in out.values():
        assert r.scatter >= 0.0 and r.db_component is not None
    # the far blob (axis e1) must have the LOWEST db component; the two
    # overlapping e0 blobs must both exceed it
    far = min(out.values(), key=lambda r: r.db_component)
    others = [r for r in out.values() if r.cluster_id != far.cluster_id]
    assert all(r.db_component > far.db_component for r in others)


def test_hard_negatives_exclude_planted_twin(spark):
    from audience_manager_platform_spark.operators.similarity import (
        NEAR_DUP_ID_OFFSET,
        cosine_topk,
        hard_negatives,
        plant_near_dups,
    )
    from audience_manager_platform_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    planted = plant_near_dups(emb)
    # without the positive cut, the planted twin IS the top neighbor
    top = cosine_topk(planted, [0], k=1).collect()[0]
    assert top.neighbor_id == NEAR_DUP_ID_OFFSET and top.cosine > 0.9
    # the miner must exclude it and return only sub-threshold negatives
    negs = hard_negatives(planted, [0], k=5, pos_threshold=0.9).collect()
    assert len(negs) == 5
    ids = {r.neighbor_id for r in negs}
    assert NEAR_DUP_ID_OFFSET not in ids
    assert all(r.cosine < 0.9 for r in negs)
    # ranks are a contiguous total order
    assert sorted(r.rank for r in negs) == [1, 2, 3, 4, 5]


def test_bigram_pmi_ranks_phrase_above_boilerplate(spark):
    from audience_manager_platform_spark.operators.text import bigram_pmi

    # "los angeles": words only ever together -> high PMI.
    # "the end": both words everywhere -> frequent but low PMI.
    rows = []
    for i in range(10):
        rows.append((i, "los angeles is the place the end", "a"))
    for i in range(10, 20):
        rows.append((i, "the start the middle the end", "a"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = bigram_pmi(docs, k=50, min_count=5).collect()
    by = {r.bigram: r for r in out}
    assert "los angeles" in by and "the end" in by
    assert by["los angeles"].pmi > by["the end"].pmi
    assert by["los angeles"].n_ab == 10 and by["los angeles"].n_a == 10


def test_vocab_growth_monotone_and_bounded(spark):
    from audience_manager_platform_spark.operators.text import (
        vocab_growth_audit,
    )
    from audience_manager_platform_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = {r.n: r for r in vocab_growth_audit(docs).collect()}
    assert set(out) == {1, 2, 3}
    # natural-ish text: vocabulary grows with n, totals shrink with n
    assert out[1].exact_distinct < out[2].exact_distinct < out[3].exact_distinct
    assert out[1].total_grams > out[2].total_grams > out[3].total_grams
    # TTR rises toward 1 as grams get rarer; sketches within 4 sigma
    assert out[1].ttr < out[2].ttr < out[3].ttr
    assert all(r.within_bound for r in out.values())


# ------------------------------------------------------ wave 9: ER
def test_er_fuzzy_pairs_blocked_and_thresholded(spark):
    from audience_manager_platform_spark.operators.er import (
        fuzzy_blocked_pairs,
    )

    df = spark.createDataFrame(
        [
            (1, "alpha bravo", "B1"),   # matches 2 (dist 1, same block+brand)
            (2, "alpha bravo x", "B1"),
            (3, "alpha bravo", "B2"),   # brand disagrees with 1/2 -> no pair
            (4, "alpha bravo", "B1"),   # exact dup of 1 -> dist 0 excluded
            (5, "zeta bravo x", "B1"),  # different block -> never compared
            (6, "alpha completely different", "B1"),  # dist > 3 excluded
        ],
        "k long, name string, brand string",
    )
    got = {
        (r.a_key, r.b_key): r
        for r in fuzzy_blocked_pairs(
            df, "k", "name", agree_col="brand", max_distance=3
        ).collect()
    }
    assert set(got) == {(1, 2), (2, 4)}
    pair = got[(1, 2)]
    assert pair.edit_distance == 2  # " x" appended
    assert abs(pair.similarity - (1 - 2 / 13)) < 1e-6  # 6dp-rounded


def test_er_fuzzy_pairs_orders_keys(spark):
    from audience_manager_platform_spark.operators.er import (
        fuzzy_blocked_pairs,
    )

    df = spark.createDataFrame(
        [(9, "m n", "B"), (2, "m o", "B")], "k long, name string, brand string"
    )
    rows = fuzzy_blocked_pairs(df, "k", "name", agree_col="brand").collect()
    assert len(rows) == 1 and rows[0].a_key == 2 and rows[0].b_key == 9


# ------------------------------------------- wave 9: triangle counting
def test_triangle_participation_counts_planted_clique(spark):
    from audience_manager_platform_spark.operators.graph import (
        triangle_participation,
    )

    # contexts 1..2 make items (10, 11, 12) pairwise co-occur twice (a
    # triangle); item 13 co-occurs with 10 once only (below support).
    rows = [(c, i) for c in (1, 2) for i in (10, 11, 12)] + [(3, 13), (3, 10)]
    df = spark.createDataFrame(rows, "ctx long, item long")
    got = {
        r.node: r.triangles
        for r in triangle_participation(df, "ctx", "item", min_cooc=2).collect()
    }
    assert got == {10: 1, 11: 1, 12: 1}


def test_triangle_participation_k4_has_three_per_node(spark):
    from audience_manager_platform_spark.operators.graph import (
        triangle_participation,
    )

    # K4: every pair of the 4 items shares 2 contexts -> C(3,2)=3
    # triangles per node, 4 triangles total.
    rows = [(c, i) for c in (1, 2) for i in (10, 11, 12, 13)]
    df = spark.createDataFrame(rows, "ctx long, item long")
    got = {
        r.node: r.triangles
        for r in triangle_participation(df, "ctx", "item", min_cooc=2).collect()
    }
    assert got == {10: 3, 11: 3, 12: 3, 13: 3}


# ---------------------------------------------- wave 9: t-closeness
def test_t_closeness_zero_when_class_mirrors_global(spark):
    from audience_manager_platform_spark.operators.validation import (
        t_closeness_audit,
    )

    # both classes have the identical 50/50 sensitive split -> t == 0
    rows = [(g, s) for g in ("a", "b") for s in ("x", "y") for _ in range(5)]
    df = spark.createDataFrame(rows, "grp string, sens string")
    got = t_closeness_audit(df, ["grp"], "sens", t=0.35, k=5).collect()
    assert all(r.t_closeness == 0.0 and not r.t_risk for r in got)


def test_t_closeness_flags_skewed_class(spark):
    from audience_manager_platform_spark.operators.validation import (
        t_closeness_audit,
    )

    # class a: all x; class b: all y; global 50/50 -> TVD = 0.5 for both
    rows = [("a", "x")] * 10 + [("b", "y")] * 10
    df = spark.createDataFrame(rows, "grp string, sens string")
    got = {r.grp: r for r in t_closeness_audit(df, ["grp"], "sens").collect()}
    assert got["a"].t_closeness == 0.5 and got["a"].t_risk
    assert got["b"].t_closeness == 0.5 and got["b"].t_risk
    assert got["a"].class_size == 10 and not got["a"].k_risk


def test_t_closeness_counts_missing_global_values(spark):
    from audience_manager_platform_spark.operators.validation import (
        t_closeness_audit,
    )

    # class a never sees sensitive value z (global mass 1/3): the LEFT
    # join must still charge |0 - 1/3| for z.
    rows = [("a", "x")] * 4 + [("a", "y")] * 4 + [("b", "z")] * 4
    df = spark.createDataFrame(rows, "grp string, sens string")
    got = {r.grp: r for r in t_closeness_audit(df, ["grp"], "sens").collect()}
    # class a: p=(1/2,1/2,0) vs q=(1/3,1/3,1/3) -> TVD = 1/3
    assert abs(got["a"].t_closeness - 1 / 3) < 1e-6
    # class b: p=(0,0,1) vs q -> TVD = 2/3
    assert abs(got["b"].t_closeness - 2 / 3) < 1e-6


def test_er_entity_clusters_merge_transitively(spark):
    from audience_manager_platform_spark.operators.er import entity_clusters

    # chain: 1≈2 (dist 2), 2≈3 (dist 2), but 1 vs 3 is dist 4 (> max) —
    # the entity must still merge all three via transitive closure.
    df = spark.createDataFrame(
        [
            (1, "alpha bbbb", "B"),
            (2, "alpha bbdd", "B"),
            (3, "alpha dddd", "B"),
            (4, "alpha zzzz", "B"),  # > 3 from everyone: stays singleton
            (5, "other name", "B"),
        ],
        "k long, name string, brand string",
    )
    got = entity_clusters(df, "k", "name", agree_col="brand").collect()
    assert len(got) == 1
    ent = got[0]
    assert ent.entity_id == 1 and ent.n_members == 3 and ent.n_names == 3
    assert ent.canonical_name == "alpha bbbb"


# --------------------------------- wave 9: margin-based bitext mining
def test_margin_mutual_knn_mines_planted_pair(spark):
    from audience_manager_platform_spark.operators.similarity import (
        margin_mutual_knn,
    )

    # even ids = side A, odd ids = side B. Vectors 0 and 1 are aligned
    # (same direction); everything else is near-orthogonal noise.
    # (zero-padded to the engine's EMBED_DIM — the scorer's unrolled
    # codegen chain addresses all 64 positions)
    base = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [0.99, 0.14, 0.0, 0.0], 0),
        (2, [0.0, 1.0, 0.0, 0.0], 1),
        (3, [0.0, 0.9, 0.44, 0.0], 1),
        (4, [0.0, 0.0, 1.0, 0.0], 2),
        (5, [0.0, 0.1, 0.99, 0.0], 2),
        (6, [0.0, 0.0, 0.0, 1.0], 3),
        (7, [0.3, 0.0, 0.0, 0.95], 3),
    ]
    rows = [(i, v + [0.0] * 60, lab) for i, v, lab in base]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long"
    )
    got = margin_mutual_knn(emb, k=2, threshold=1.0).collect()
    pairs = {(r.a_id, r.b_id) for r in got}
    assert (0, 1) in pairs
    by = {(r.a_id, r.b_id): r for r in got}
    assert by[(0, 1)].cosine > 0.98
    assert by[(0, 1)].margin > 1.0
    # mutual-argmax property: each side id appears at most once
    assert len({a for a, _ in pairs}) == len(pairs)
    assert len({b for _, b in pairs}) == len(pairs)


def test_cluster_safe_split_never_straddles_planted_twins(spark):
    from audience_manager_platform_spark.operators.corpus import (
        cluster_safe_split,
    )

    # 40 twin pairs sharing the same 8-token prefix; with doc-id-hash
    # splitting at 50/50 some pairs WILL straddle; cluster-safe never.
    rows = []
    for i in range(40):
        body = f"alpha bravo charlie delta echo foxtrot golf hotel tail{i}"
        rows.append((2 * i, body + " one", "en", "web", len(body)))
        rows.append((2 * i + 1, body + " two", "en", "web", len(body)))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = cluster_safe_split(
        docs, weights={"train": 0.5, "test": 0.5}
    ).collect()
    by = {}
    for r in got:
        by.setdefault(r.strategy, set()).add(r.straddling_groups)
    assert by["cluster_safe"] == {0}
    # all 40 twin pairs share ONE prefix-8 family here (same first 8
    # tokens) -> naive splitting straddles that family with near
    # certainty (80 docs split 50/50); assert it was detected
    (naive_straddle,) = by["doc_id_hash"]
    assert naive_straddle >= 1


def test_incremental_lsh_probe_equals_restricted_full_pass(spark):
    from audience_manager_platform_spark.operators.dedup import (
        incremental_lsh_probe,
        minhash_lsh_pairs,
    )

    body = ("the quick brown fox jumps over the lazy dog again and again "
            "while seven wizards brew strong potions at midnight ")
    rows = []
    for i in range(30):
        if i % 3 == 0:
            rows.append((i, body + f"variant {i % 2}", "en", "web", 10))
        else:
            rows.append((i, f"unique document number {i} with its own "
                            f"content entirely {i*7} {i*13}", "en", "web", 10))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    full = {
        (r.doc_a, r.doc_b): r.est_jaccard
        for r in minhash_lsh_pairs(docs, est_threshold=0.5).collect()
    }
    restricted = {
        k: v for k, v in full.items() if k[0] % 10 == 7 or k[1] % 10 == 7
    }
    probe = {
        (r.doc_a, r.doc_b): r.est_jaccard
        for r in incremental_lsh_probe(docs, est_threshold=0.5).collect()
    }
    assert probe == restricted
    assert len(full) > len(restricted) > 0  # both regimes exercised


def test_bfs_distances_on_planted_path(spark):
    from audience_manager_platform_spark.operators.graph import bfs_distances

    # path 1-2-3-4-5 via shared contexts (each adjacent pair shares 2
    # contexts); node 9 is isolated from the path's component.
    rows = []
    ctx = 0
    for a, b in [(1, 2), (2, 3), (3, 4), (4, 5)]:
        for _ in range(2):
            rows += [(ctx, a), (ctx, b)]
            ctx += 1
    rows += [(ctx, 9), (ctx + 1, 9)]
    df = spark.createDataFrame(rows, "ctx long, item long")
    got = {
        r.node: r.distance
        for r in bfs_distances(df, "ctx", "item", min_cooc=2, max_depth=3).collect()
    }
    # source = min node (1); node 5 is 4 hops away -> outside max_depth;
    # 9 unreachable
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}


def test_wav_downsample_roundtrip_and_aliasing(spark):
    import io
    import wave

    from audience_manager_platform_spark.operators.multimodal import (
        downsample_wav,
        synthesize_wav,
    )

    docs = spark.createDataFrame(
        [(7, "x", "en", "web", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = downsample_wav(synthesize_wav(docs), factor=2).collect()[0]
    w = wave.open(io.BytesIO(bytes(out.media)), "rb")
    # doc 7: rate 8000+1000*(7%3)=9000 -> 4500; frames 64+2*7=78 -> 39
    assert w.getframerate() == 4500 and w.getnframes() == 39
    import struct

    samples = struct.unpack("<39h", w.readframes(39))
    w.close()
    amp = 500 + 30 * 7
    # decimating the +A/-A alternation by 2 keeps only the +A phase
    assert set(samples) == {amp}


def test_kcore_peels_tail_keeps_clique(spark):
    from audience_manager_platform_spark.operators.graph import kcore_nodes

    # K4 clique on 10-13 (each pair shares 2 contexts) + a pendant path
    # 13-20-21: the path peels away at k=2... use core_k=3: only the
    # clique survives (degree 3 within it).
    rows = [(c, i) for c in (1, 2) for i in (10, 11, 12, 13)]
    rows += [(3, 13), (3, 20), (4, 13), (4, 20), (5, 20), (5, 21), (6, 20), (6, 21)]
    df = spark.createDataFrame(rows, "ctx long, item long")
    got = {
        r.node: r.core_degree
        for r in kcore_nodes(df, "ctx", "item", core_k=3, min_cooc=2).collect()
    }
    assert got == {10: 3, 11: 3, 12: 3, 13: 3}


def test_filtered_topk_excludes_disallowed_labels(spark):
    from audience_manager_platform_spark.operators.similarity import (
        filtered_cosine_topk,
    )

    rows = [
        (i, [1.0 if j == i % 4 else 0.1 for j in range(4)] + [0.0] * 60, i % 4)
        for i in range(12)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long"
    )
    got = filtered_cosine_topk(emb, [0], allowed_labels=[1, 3], k=5).collect()
    assert all(r.label in (1, 3) for r in got)
    assert len(got) == 5


def test_ltv_cohort_curve_cumulates_per_cohort(spark):
    from datetime import datetime

    from audience_manager_platform_spark.operators.analytics import (
        ltv_cohort_curve,
    )

    rows = [
        # cohort of week 2024-01-01 (Mon): u1 spends 10 then 20 a week later
        (0, datetime(2024, 1, 2), 1, "purchase", 10.0, "{}"),
        (1, datetime(2024, 1, 9), 1, "purchase", 20.0, "{}"),
        # cohort of week 2024-01-08: u2 spends 5 in week age 0
        (2, datetime(2024, 1, 10), 2, "purchase", 5.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    got = {
        (r.cohort_week, r.week_age): r for r in ltv_cohort_curve(ev).collect()
    }
    a0 = got[("2024-01-01", 0)]
    a1 = got[("2024-01-01", 1)]
    b0 = got[("2024-01-08", 0)]
    assert a0.cohort_size == 1 and a0.cum_revenue == 10.0
    assert a1.cum_revenue == 30.0 and a1.cum_ltv_per_user == 30.0
    assert b0.cohort_size == 1 and b0.cum_ltv_per_user == 5.0


def test_interleave_schedule_tracks_uneven_weights(spark):
    from audience_manager_platform_spark.operators.corpus import (
        interleave_schedule,
    )

    # 300 big-source docs vs 100 small-source docs: every prefix of the
    # schedule must hold ~75/25 (stride scheduling), not luck.
    rows = [(i, f"text {i}", "en", "big" if i < 300 else "small", 6)
            for i in range(400)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {r.source: r for r in interleave_schedule(docs, first_n=100).collect()}
    assert got["big"].target_share == 0.75
    assert got["big"].on_schedule and got["small"].on_schedule
    assert abs(got["big"].in_first_100 - 75) <= 2
    assert abs(got["small"].in_first_100 - 25) <= 2


def test_salted_join_equals_plain_join_and_spreads_hot_key(spark):
    from audience_manager_platform_spark.operators.skew import salted_join

    # hot key 7 carries 500 of 520 fact rows
    fact = spark.createDataFrame(
        [(7 if i < 500 else i % 20, float(i)) for i in range(520)],
        "k long, v double",
    )
    dim = spark.createDataFrame(
        [(i, f"d{i}") for i in range(20)], "k long, name string"
    )
    got = salted_join(fact, dim, "k", salt_buckets=4)
    plain = fact.join(dim, "k")
    assert got.count() == plain.count() == 520
    assert got.exceptAll(plain).count() == 0
    assert plain.exceptAll(got).count() == 0
    # the hot key's fact rows really spread over multiple salt buckets
    from pyspark.sql import functions as F

    salted = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(4))
    )
    n_buckets = (
        salted.filter(F.col("k") == 7).select("_salt").distinct().count()
    )
    assert n_buckets == 4


def test_quantile_histogram_bound_and_exact_on_planted_data(spark):
    from audience_manager_platform_spark.operators.skew import quantile_histogram

    # 100 rows of value i+1 cents/100: exact p50 = row 50 -> 0.50
    rows = [(float((i + 1)) / 100,) for i in range(100)]
    df = spark.createDataFrame(rows, "v double")
    got = {r.q_label: r for r in quantile_histogram(df, "v").collect()}
    assert set(got) == {"p50", "p90", "p99"}
    assert got["p50"].exact_value == 0.50
    assert got["p90"].exact_value == 0.90
    assert got["p99"].exact_value == 0.99
    for r in got.values():
        assert r.within_bound
        # the documented DDSketch-style bound: <= 1/16 relative error
        assert abs(r.est_value - r.exact_value) <= r.exact_value / 16 + 1e-9


def test_quantile_histogram_partition_invariant(spark):
    from audience_manager_platform_spark.operators.skew import quantile_histogram

    rows = [(float(i % 997 + 1),) for i in range(5000)]
    df1 = spark.createDataFrame(rows, "v double").repartition(1)
    df32 = spark.createDataFrame(rows, "v double").repartition(32)
    a = [tuple(r) for r in quantile_histogram(df1, "v").collect()]
    b = [tuple(r) for r in quantile_histogram(df32, "v").collect()]
    assert a == b


def test_decayed_popularity_recency_beats_volume(spark):
    from audience_manager_platform_spark.operators.analytics import (
        decayed_popularity,
    )

    # "old" type: 8 events of value 10, 10 weeks ago; "new" type: 2
    # events of value 10 this week — decay must rank new above old
    # (8 * 2^-10 = 0.0078 << 2 * 2^0 = 2) while raw counts say otherwise.
    rows = []
    for i in range(8):
        rows.append((i, "2024-01-01 00:00:00", 1, "old", 10.0, "{}"))
    for i in range(2):
        rows.append((100 + i, "2024-03-11 00:00:00", 1, "new", 10.0, "{}"))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", __import__("pyspark.sql.functions", fromlist=["F"]).to_timestamp("ts"))
    got = decayed_popularity(ev).collect()
    assert [r.event_type for r in got] == ["new", "old"]
    by = {r.event_type: r for r in got}
    assert by["new"].n_events == 2 and by["old"].n_events == 8
    assert by["new"].decayed_score == 20.0  # age 0: full value
    assert abs(by["old"].decayed_score - 80.0 / 1024) < 1e-9  # 10 weeks


def test_holt_backtest_tracks_planted_linear_trend(spark):
    from audience_manager_platform_spark.operators.timeseries import (
        holt_linear_backtest,
    )

    # y_t = 100 + 10t cents for 40 days: Holt's trend state must
    # converge to ~10 cents/day (0.1 dollars) and MAPE must be small.
    import datetime

    rows = []
    for t in range(40):
        day = datetime.datetime(2024, 1, 1) + datetime.timedelta(days=t)
        rows.append((t, day, 1, "steady", (100 + 10 * t) / 100.0, "{}"))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = holt_linear_backtest(ev).collect()
    assert len(got) == 1
    r = got[0]
    assert r.n_days == 40 and r.n_scored == 39
    assert abs(r.final_trend - 0.10) < 0.01
    assert r.mape < 0.05


def test_bpe_encode_heldout_compression_and_coverage_gap(spark):
    from audience_manager_platform_spark.operators.text import (
        bpe_encode_stats,
    )

    # train half (even ids): "aa bb" repeated -> merges learn aa, bb.
    # held-out half (odd ids): same words compress 2 chars -> 1 token;
    # 'z' never appears in training -> new_symbols >= 1.
    rows = [
        (0, "aa bb aa bb aa", "en", "s", 14),
        (2, "aa bb aa", "en", "s", 8),
        (1, "aa bb z", "en", "s", 7),
        (3, "aa aa", "en", "s", 5),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = bpe_encode_stats(docs, n_merges=2).collect()[0]
    # held-out: words aa(x3), bb(x1), z(x1): chars=3*2+2+1=9
    assert got.heldout_chars == 9
    # aa/bb each become one merged token; z stays single
    assert got.heldout_tokens == 5
    assert got.merged_token_share == round(4 / 5, 6)
    assert got.new_symbols == 1  # 'z' unseen in training


def test_canary_scan_counts_occurrences_and_reports_zero_hits(spark):
    from audience_manager_platform_spark.operators.corpus import canary_scan

    docs = spark.createDataFrame(
        [
            (1, "clean text with nothing", "en", "s", 23),
            (2, "CANARY-X here and CANARY-X again", "en", "s", 32),
            (3, "one CANARY-X only", "en", "s", 17),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r.canary: r for r in canary_scan(
        docs, canaries=("CANARY-X", "absent-guid")
    ).collect()}
    assert got["CANARY-X"].n_docs == 2
    assert got["CANARY-X"].total_occurrences == 3
    assert got["CANARY-X"].first_doc_id == 2
    assert got["absent-guid"].n_docs == 0
    assert got["absent-guid"].total_occurrences == 0
    assert got["absent-guid"].first_doc_id is None


def test_unique_key_audit_flags_planted_duplicate(spark):
    from audience_manager_platform_spark.operators.validation import (
        unique_key_audit,
    )

    clean = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    dirty = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "c"), (2, "d")], "id long, v string"
    )
    got = {r.table_name: r for r in unique_key_audit(
        [("clean", clean, ["id"]), ("dirty", dirty, ["id"])]
    ).collect()}
    assert got["clean"].is_unique and got["clean"].dup_keys == 0
    assert not got["dirty"].is_unique
    assert got["dirty"].n_rows == 4 and got["dirty"].n_keys == 2
    assert got["dirty"].dup_keys == 1 and got["dirty"].max_multiplicity == 3


def test_survivorship_elects_majority_value_with_min_tiebreak(spark):
    from audience_manager_platform_spark.operators.er import survivorship

    # three near-duplicate names in one block ('acme corp' family, edit
    # distance 1, same brand): brand vote unanimous, color vote 2-1,
    # size vote 1-1-1 ties -> min wins
    rows = [
        (1, "acme corpA", "B1", "red", 10),
        (2, "acme corpB", "B1", "red", 30),
        (3, "acme corpC", "B1", "blue", 20),
        (9, "other thing", "B2", "green", 5),
    ]
    df = spark.createDataFrame(
        rows, "pk long, name string, brand string, color string, size int"
    )
    got = survivorship(
        df, "pk", "name", ("brand", "color", "size"), agree_col="brand"
    ).collect()
    assert len(got) == 1  # the singleton never becomes an entity
    r = got[0]
    assert r.entity_id == 1 and r.n_members == 3
    assert r.canonical_name == "acme corpA"
    assert r.brand_survivor == "B1"
    assert r.color_survivor == "red"
    assert r.size_survivor == 10  # 1-1-1 tie -> smallest value


def test_position_attribution_conserves_exact_ppm(spark):
    from pyspark.sql import functions as F

    from audience_manager_platform_spark.operators.analytics import (
        position_attribution,
    )

    import datetime

    base = datetime.datetime(2024, 1, 10, 12, 0, 0)
    rows = []
    # user 1: 5 clicks then purchase -> 40/40/20 with 200000 % 3 = 2 rem
    for i in range(5):
        rows.append((i, base + datetime.timedelta(hours=i), 1, "click", 0.0, "{}"))
    rows.append((10, base + datetime.timedelta(hours=6), 1, "purchase", 9.99, "{}"))
    # user 2: single click then purchase -> 100% to first
    rows.append((20, base, 2, "click", 0.0, "{}"))
    rows.append((21, base + datetime.timedelta(hours=1), 2, "purchase", 5.0, "{}"))
    # user 3: purchase with NO clicks -> dropped
    rows.append((30, base, 3, "purchase", 1.0, "{}"))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {r.user_id: r for r in position_attribution(ev).collect()}
    assert set(got) == {1, 2}
    r1 = got[1]
    assert r1.n_touches == 5
    assert r1.first_ppm == 400000 and r1.last_ppm == 400000
    assert r1.mid_each_ppm == 66666 and r1.mid_rem_ppm == 2
    assert (
        r1.first_ppm + r1.last_ppm + 3 * r1.mid_each_ppm + r1.mid_rem_ppm
        == 1000000
    )
    assert r1.secs_since_first_touch == 6 * 3600
    assert r1.secs_since_last_touch == 2 * 3600
    r2 = got[2]
    assert r2.n_touches == 1 and r2.first_ppm == 1000000 and r2.last_ppm == 0


def test_pareto_coverage_planted_concentration(spark):
    from audience_manager_platform_spark.operators.analytics import (
        pareto_coverage,
    )

    # one whale with 800 of 1000 total -> a single user covers 80%
    rows = [(0, "2024-01-01 00:00:00", 99, "purchase", 800.0, "{}")]
    for i in range(20):
        rows.append((i + 1, "2024-01-01 00:00:00", i, "purchase", 10.0, "{}"))
    from pyspark.sql import functions as F

    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    r = pareto_coverage(ev).collect()[0]
    assert r.n_users == 21
    assert r.n_users_80pct == 1
    assert r.total_revenue == 1000.0


def test_interval_overlap_join_exact_days_and_emit_once(spark):
    from pyspark.sql import functions as F

    from audience_manager_platform_spark.operators.relational import (
        interval_overlap_state_promos,
    )

    import datetime

    # user 1 stays in state 'view' from Jan 5 to Feb 20 (one long
    # period spanning two promo windows: Jan 1-8 overlap 3 days
    # [5,6,7], Feb 1-8 overlap full 7) then 'click' until Mar 2.
    rows = [
        (1, datetime.datetime(2024, 1, 5), 1, "view", 0.0, "{}"),
        (2, datetime.datetime(2024, 2, 20), 1, "click", 0.0, "{}"),
        (3, datetime.datetime(2024, 3, 2), 1, "click", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {r.state: r for r in interval_overlap_state_promos(ev).collect()}
    # view period: [Jan5, Feb20): Jan promo overlap = Jan5..Jan8 = 3
    # days; Feb promo = Feb1..Feb8 = 7 days -> 2 periods rows? one
    # period, two windows -> counted once per overlapping pair
    assert got["view"].n_overlapping_periods == 2
    assert got["view"].total_overlap_days == 10
    # click period: [Feb20, Mar3): only the Mar 1-8 promo overlaps,
    # Mar1..Mar3 = 2 days
    assert got["click"].n_overlapping_periods == 1
    assert got["click"].total_overlap_days == 2


def test_quantile_rollup_merged_row_matches_bucket_sums(spark):
    from pyspark.sql import functions as F

    from audience_manager_platform_spark.operators.skew import quantile_rollup

    import datetime

    rows = []
    eid = 0
    # two days with disjoint value ranges: day1 ~ 1.00..1.99,
    # day2 ~ 64.00..64.99 -> the merged p50 must sit at the boundary
    for day, lo in ((1, 100), (2, 6400)):
        for i in range(100):
            rows.append(
                (eid, datetime.datetime(2024, 3, day), i, "view",
                 (lo + i) / 100.0, "{}")
            )
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = quantile_rollup(ev).collect()
    by = {(r.day, r.q_label): r for r in got}
    assert set(d for d, _ in by) == {"2024-03-01", "2024-03-02", "ALL"}
    for r in got:
        assert r.within_bound, r
    # per-day p99 sits inside that day's range; merged p99 in day2's
    assert 1.0 <= by[("2024-03-01", "p99")].exact_value < 2.0
    assert 64.0 <= by[("ALL", "p99")].exact_value < 65.0
    # merged p50 = 200th of 200 sorted values' midpoint -> day1's top
    assert by[("ALL", "p50")].exact_value < 2.0


def test_survival_km_censors_recent_users(spark):
    from audience_manager_platform_spark.operators.analytics import (
        survival_retention,
    )

    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # 4 users: lifetimes 10d (churned long before the end), 10d
    # (ending at maxday -> censored), 0d churned, 0d censored-at-end
    for uid, (start, life) in enumerate(
        [(0, 10), (20, 10), (5, 0), (30, 0)]
    ):
        for d in (0, life):
            rows.append(
                (eid, base + datetime.timedelta(days=start + d), uid,
                 "view", 1.0, "{}")
            )
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {r.t_days: r for r in survival_retention(ev).collect()}
    # t=0: 4 at risk, 1 churned (user 2), 1 censored (user 3)
    assert got[0].n_risk == 4
    assert got[0].n_churned == 1 and got[0].n_censored == 1
    assert abs(got[0].survival - 0.75) < 1e-12
    # t=10: 2 at risk, 1 churned, 1 censored -> S = 0.75 * 0.5
    assert got[10].n_risk == 2
    assert got[10].n_churned == 1 and got[10].n_censored == 1
    assert abs(got[10].survival - 0.375) < 1e-12


def test_wav_vad_hand_built_silence_pattern(spark):
    import io
    import struct
    import wave

    from audience_manager_platform_spark.operators.multimodal import (
        wav_vad_segments,
    )

    # 48 samples at 8kHz: active [0,16), silence [16,32), active [32,48)
    samples = [100] * 16 + [0] * 16 + [100] * 16
    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(1)
    w.setsampwidth(2)
    w.setframerate(8000)
    w.writeframes(struct.pack("<48h", *samples))
    w.close()
    media = spark.createDataFrame(
        [(1, bytearray(buf.getvalue()), "audio/wav")],
        "doc_id long, media binary, media_type string",
    )
    r = wav_vad_segments(media).collect()[0]
    assert r.n_samples == 48 and r.n_vad_frames == 6
    assert r.active_frames == 4
    assert r.n_segments == 2
    assert r.silence_us == 16 * 1_000_000 // 8000


def test_blocking_quality_counts_missed_cross_block_match(spark):
    from audience_manager_platform_spark.operators.er import blocking_quality

    # rows 1/2: same block ('acme'), distance 1 -> truth + found.
    # rows 3/4: distance 1 but DIFFERENT first token -> truth, missed.
    # row 9: unrelated.
    rows = [
        (1, "acme corpA", "B"),
        (2, "acme corpB", "B"),
        (3, "zeta9 works", "B"),
        (4, "zeta8 works", "B"),
        (9, "other thing", "B"),
    ]
    df = spark.createDataFrame(rows, "pk long, name string, brand string")
    r = blocking_quality(
        df, "pk", "name", agree_col="brand", sample_n=100
    ).collect()[0]
    assert r.sample_rows == 5
    assert r.truth_pairs == 2
    assert r.found_pairs == 1
    assert r.pair_completeness == 0.5
    # blocks: acme(2) zeta9(1) zeta8(1) other(1) -> 1 candidate pair
    assert r.candidate_pairs == 1
    assert r.all_pairs == 10
    assert r.reduction_ratio == 0.9


def test_psi_drift_detects_planted_shift(spark):
    from audience_manager_platform_spark.operators.validation import (
        psi_value_drift,
    )

    # first half of the window: values near 10; second half: near 80.
    # Split date for Jan 1..Jan 30 is Jan 15 (floor(29/2)=14 days in).
    rows = [
        (i, f"2024-01-{(i % 14) + 1:02d} 12:00:00", 10.0 + (i % 5))
        for i in range(200)
    ] + [
        (1000 + i, f"2024-01-{16 + (i % 14):02d} 12:00:00", 80.0 + (i % 5))
        for i in range(200)
    ]
    ev = spark.createDataFrame(rows, "event_id long, ts string, value double")
    got = psi_value_drift(ev).collect()
    assert got, "expected non-empty bucket grid"
    # exact-integer bucket counts: totals reconcile to the input halves
    assert sum(r.old_n for r in got) == 200
    assert sum(r.new_n for r in got) == 200
    # disjoint value ranges => every bucket is one-sided => large PSI
    assert all(r.old_n == 0 or r.new_n == 0 for r in got)
    total_psi = sum(r.psi_term_e9 for r in got) / 1e9
    assert total_psi > 0.2, f"planted shift must read as actionable: {total_psi}"
    # identical halves => PSI ~ 0 (only smoothing noise)
    same = spark.createDataFrame(
        [(i, f"2024-01-{(i % 28) + 1:02d} 12:00:00", 10.0 + (i % 5))
         for i in range(400)],
        "event_id long, ts string, value double",
    )
    flat = psi_value_drift(same).collect()
    assert sum(abs(r.psi_term_e9) for r in flat) / 1e9 < 0.05


def test_psi_drift_partition_invariant(spark):
    from audience_manager_platform_spark.operators.validation import (
        psi_value_drift,
    )

    rows = [
        (i, f"2024-01-{(i % 28) + 1:02d} 12:00:00", float(1 + (i * 37) % 500))
        for i in range(300)
    ]
    ev = spark.createDataFrame(rows, "event_id long, ts string, value double")
    a = [tuple(r) for r in psi_value_drift(ev.coalesce(1)).collect()]
    b = [tuple(r) for r in psi_value_drift(ev.repartition(13)).collect()]
    assert a == b, "PSI terms must be bit-identical under any partitioning"


def test_ks_drift_exact_on_disjoint_and_identical_halves(spark):
    from audience_manager_platform_spark.operators.validation import (
        ks_value_drift,
    )

    # disjoint supports => at the boundary the ECDF gap is exactly 1
    rows = [
        (i, f"2024-01-{(i % 14) + 1:02d} 12:00:00", 10.0) for i in range(60)
    ] + [
        (100 + i, f"2024-01-{16 + (i % 14):02d} 12:00:00", 90.0)
        for i in range(40)
    ]
    ev = spark.createDataFrame(rows, "event_id long, ts string, value double")
    r = ks_value_drift(ev).collect()[0]
    assert (r.n_old, r.n_new) == (60, 40)
    assert r.ks_at_cents == 1000          # the gap peaks at the old mass
    assert r.ks_num == 60 * 40            # cum_o*n_new - 0 = full cross product
    assert r.ks_d_e6 == 1_000_000
    # identical halves => D = 0 at every point; min-cents tiebreak wins
    # every day carries the same value multiset -> identical ECDFs
    same = spark.createDataFrame(
        [(i, f"2024-01-{(i % 28) + 1:02d} 12:00:00", float(1 + (i // 28) % 3))
         for i in range(280)],
        "event_id long, ts string, value double",
    )
    r0 = ks_value_drift(same).collect()[0]
    assert r0.ks_num == 0 and r0.ks_d_e6 == 0 and r0.ks_at_cents == 100


def test_ks_drift_partition_invariant(spark):
    from audience_manager_platform_spark.operators.validation import (
        ks_value_drift,
    )

    rows = [
        (i, f"2024-01-{(i % 28) + 1:02d} 12:00:00",
         float(1 + (i * 37) % 211) / 7.0)
        for i in range(300)
    ]
    ev = spark.createDataFrame(rows, "event_id long, ts string, value double")
    a = tuple(ks_value_drift(ev.coalesce(1)).collect()[0])
    b = tuple(ks_value_drift(ev.repartition(13)).collect()[0])
    assert a == b


def test_benford_audit_flags_constant_prices(spark):
    from audience_manager_platform_spark.operators.validation import (
        benford_digit_audit,
        BENFORD_E9,
    )

    # fabricated: every amount starts with 5 -> all mass on one digit
    fab = spark.createDataFrame(
        [(i, 5000.0 + i) for i in range(500)], "id long, amt double"
    )
    got = {r.digit: r for r in benford_digit_audit(fab, "amt").collect()}
    assert set(got) == set(range(1, 10))          # zero-count digits report
    assert got[5].n == 500 and got[5].obs_ppm == 1_000_000
    assert all(got[d].n == 0 for d in range(1, 10) if d != 5)
    assert all(got[d].exp_ppb == BENFORD_E9[d] for d in range(1, 10))
    # the digit-5 chi2 term alone: (500 - 500*p5)^2 / (500*p5), e6-scaled
    exp5 = 500 * BENFORD_E9[5] / 1e9
    import math
    want = math.floor((500 - exp5) ** 2 / exp5 * 1e6 + 0.5)
    assert got[5].chi2_term_e6 == want
    # sub-1 and negative amounts are excluded from the audit
    assert benford_digit_audit(
        spark.createDataFrame([(1, 0.5), (2, -30.0)], "id long, amt double"),
        "amt",
    ).collect()[0].n == 0


def test_crosscorr_planted_lead(spark):
    from audience_manager_platform_spark.operators.timeseries import (
        crosscorr_lead_lag,
    )

    # purchases copy views with a 2-day delay -> CCF at lag +2 is 1.0
    views = [
        (i, f"2024-01-{d + 1:02d} 08:00:00", "view",
         float(10 + ((d * 7) % 13)))
        for d in range(26) for i in [d]
    ]
    buys = [
        (100 + d, f"2024-01-{d + 3:02d} 20:00:00", "purchase",
         float(10 + ((d * 7) % 13)))
        for d in range(26)
    ]
    ev = spark.createDataFrame(
        views + buys, "event_id long, ts string, event_type string, value double"
    )
    got = {r.lag: r for r in crosscorr_lead_lag(ev).collect()}
    assert got[2].ccf == 1.0
    assert got[2].n_pairs == 26
    assert all(abs(got[l].ccf) < 1.0 for l in got if l != 2)


def test_ndcg_eval_perfect_when_ivf_matches_exact(spark):
    from audience_manager_platform_spark.operators.similarity import (
        ndcg_eval,
        recall_eval,
        NDCG_DISCOUNT_E9,
    )
    from audience_manager_platform_spark.sources import load_table

    sf_dir = "/root/testdata/sf0.001"
    emb = load_table(spark, sf_dir, "embeddings")
    got = {r.query_id: r for r in ndcg_eval(emb, [0, 1, 2], k=10).collect()}
    rec = {r.query_id: r for r in
           recall_eval(emb, [0, 1, 2], k=10).collect()}
    idcg = sum((11 - i) * NDCG_DISCOUNT_E9[i] for i in range(1, 11))
    for q, r in got.items():
        assert 0 <= r.ndcg_e6 <= 1_000_000
        assert r.graded_hits == rec[q].hits      # same compare, order-aware
        if r.graded_hits == 10 and r.ndcg_e6 == 1_000_000:
            assert r.dcg_e9 == idcg              # perfect ranking pins IDCG
        # scrambled-but-complete must score below perfect
        if r.graded_hits == 10:
            assert r.dcg_e9 <= idcg


def test_auc_exact_hand_computed_with_ties(spark):
    from audience_manager_platform_spark.operators.validation import auc_exact

    # scores: pos {3, 2, 2}, neg {2, 1}.
    # ranks: 1 -> 1; the three 2s share midrank 3; 3 -> 5.
    # R_pos = 3 + 3 + 5 = 11; U = 11 - 3*4/2 = 5; AUC = 5 / (3*2).
    df = spark.createDataFrame(
        [(3, 1), (2, 1), (2, 1), (2, 0), (1, 0)], "score int, label int"
    )
    r = auc_exact(df, "score", "label").collect()[0]
    assert (r.n_pos, r.n_neg, r.n_scores) == (3, 2, 3)
    assert r.u2 == 10                      # 2*U
    assert r.auc_e6 == 833_333             # floor(5/6 * 1e6 + 0.5)
    # perfect separation and pure noise
    sep = spark.createDataFrame(
        [(i + 10, 1) for i in range(5)] + [(i, 0) for i in range(5)],
        "score int, label int",
    )
    assert auc_exact(sep, "score", "label").collect()[0].auc_e6 == 1_000_000
    tie = spark.createDataFrame(
        [(7, 1)] * 4 + [(7, 0)] * 4, "score int, label int"
    )
    assert auc_exact(tie, "score", "label").collect()[0].auc_e6 == 500_000


def test_auc_exact_partition_invariant(spark):
    from audience_manager_platform_spark.operators.validation import auc_exact

    rows = [((i * 17) % 23, 1 if (i * 13) % 3 == 0 else 0) for i in range(400)]
    df = spark.createDataFrame(rows, "score int, label int")
    a = tuple(auc_exact(df.coalesce(1), "score", "label").collect()[0])
    b = tuple(auc_exact(df.repartition(11), "score", "label").collect()[0])
    assert a == b


def test_pruning_audit_zorder_prunes_both_dims(spark):
    from audience_manager_platform_spark.operators.maintenance import (
        pruning_audit,
    )

    # a 64x32 (user x day) grid: ingestion order is day-major, so the
    # natural layout clusters days perfectly and users not at all
    rows = [
        (d * 64 + u, u + 1, f"2024-01-{d % 28 + 1:02d} 12:00:00")
        for d in range(32) for u in range(64)
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts string")
    got = {(r.layout, r.probe_id): r
           for r in pruning_audit(ev, n_buckets=16).collect()}
    assert all(r.n_files == 16 for r in got.values())
    # natural: every file spans all 64 users -> user band scans 100%
    assert got[("natural", "ub_band")].scan_ppm == 1_000_000
    # natural: day-major order prunes the day band hard
    assert got[("natural", "doy_band")].files_scanned < 16
    # zorder: the user band must actually prune now
    assert got[("zorder", "ub_band")].files_scanned < 16
    # and the day band must not degrade to a full scan
    assert got[("zorder", "doy_band")].files_scanned < 16


def test_pruning_audit_partition_invariant(spark):
    from audience_manager_platform_spark.operators.maintenance import (
        pruning_audit,
    )

    rows = [
        (i, (i * 13) % 100 + 1, f"2024-01-{(i * 7) % 28 + 1:02d} 09:00:00")
        for i in range(600)
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts string")
    a = sorted(tuple(r) for r in pruning_audit(ev.coalesce(1)).collect())
    b = sorted(tuple(r) for r in pruning_audit(ev.repartition(9)).collect())
    assert a == b


def test_mmr_rerank_demotes_near_duplicate(spark):
    from audience_manager_platform_spark.operators.similarity import (
        EMBED_DIM,
        mmr_rerank_topk,
        cosine_topk,
    )

    def vec(**coords):
        v = [0.0] * EMBED_DIM
        for i, x in coords.items():
            v[int(i)] = x
        return v

    rows = [
        (0, vec(**{"0": 1.0})),                       # the query
        (1, vec(**{"0": 0.95, "1": 0.3122})),         # best hit
        (2, vec(**{"0": 0.95, "1": 0.3122, "3": 0.01})),  # near-dup of 1
        (3, vec(**{"0": 0.8, "1": -0.6})),            # diverse hit
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    # plain cosine ranks the near-dup second...
    plain = [r.neighbor_id for r in
             cosine_topk(emb, [0], k=3).orderBy("rank").collect()]
    assert plain == [2, 1, 3] or plain == [1, 2, 3]
    # ...MMR's redundancy penalty pushes it below the diverse hit
    got = (
        mmr_rerank_topk(emb, [0], k=3, pool=3)
        .orderBy("pick_rank")
        .collect()
    )
    picks = [r.neighbor_id for r in got]
    assert picks[0] in (1, 2)                 # relevance leads
    assert picks[1] == 3                      # diversity beats the copy
    assert picks[2] in (1, 2) and picks[2] != picks[0]
    assert [r.pick_rank for r in got] == [1, 2, 3]
    # greedy scores are integers and non-increasing is NOT required by
    # MMR, but the first pick is pure relevance (7 * sim_e6)
    assert got[0].score10_e6 % 7 == 0


def test_neyman_allocation_exact_budget_and_optimality(spark):
    from audience_manager_platform_spark.operators.corpus import (
        neyman_allocation,
    )

    # stratum A: high variance (values alternate 1 and 999), stratum B:
    # zero variance, stratum C: mild variance; equal sizes.
    rows = (
        [(i, "A", 1.0 if i % 2 == 0 else 999.0) for i in range(100)]
        + [(200 + i, "B", 50.0) for i in range(100)]
        + [(400 + i, "C", 50.0 + (i % 50) * 5) for i in range(100)]
    )
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, value double"
    )
    got = {r.event_type: r for r in neyman_allocation(ev, budget=90).collect()}
    # the allocation sums EXACTLY to the budget (largest remainder)
    assert sum(r.alloc_n for r in got.values()) == 90
    # zero-variance stratum gets ~nothing, high-variance the lion's share
    assert got["B"].alloc_n == 0
    assert got["A"].alloc_n > got["C"].alloc_n > got["B"].alloc_n
    assert got["A"].alloc_n >= 70           # S_A ~ 499, S_C ~ 72
    assert all(r.n_rows == 100 for r in got.values())


def test_neyman_allocation_partition_invariant(spark):
    from audience_manager_platform_spark.operators.corpus import (
        neyman_allocation,
    )

    rows = [
        (i, f"t{i % 4}", float(1 + (i * 29) % 97)) for i in range(800)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, value double"
    )
    a = [tuple(r) for r in neyman_allocation(ev.coalesce(1)).collect()]
    b = [tuple(r) for r in neyman_allocation(ev.repartition(7)).collect()]
    assert a == b


def test_token_fertility_hand_computed(spark):
    from audience_manager_platform_spark.operators.text import token_fertility

    docs = spark.createDataFrame(
        [
            (1, "Hello, world!", "en"),      # 2 ws words, 2 tokens, 13 chars
            (2, "a b-c d", "en"),            # 3 ws words, 4 tokens, 7 chars
            (3, "uno dos", "es"),            # 2 ws words, 2 tokens, 7 chars
        ],
        "doc_id long, text string, lang string",
    )
    got = {r.lang: r for r in token_fertility(docs).collect()}
    en = got["en"]
    assert (en.n_docs, en.ws_words, en.tokens, en.chars) == (2, 5, 6, 20)
    assert en.fertility_e6 == 1_200_000          # 6 tokens / 5 words
    assert en.chars_per_token_e6 == 3_333_333
    es = got["es"]
    assert es.fertility_e6 == 1_000_000 and es.n_docs == 1


def test_mix_drift_detects_category_tilt(spark):
    from audience_manager_platform_spark.operators.validation import mix_drift

    # old half: 90% view / 10% purchase; new half: 50/50
    rows = (
        [(i, f"2024-01-{(i % 14) + 1:02d} 10:00:00",
          "view" if i % 10 else "purchase") for i in range(200)]
        + [(1000 + i, f"2024-01-{16 + (i % 14):02d} 10:00:00",
            "view" if i % 2 else "purchase") for i in range(200)]
    )
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string"
    )
    got = {r.category: r for r in mix_drift(ev).collect()}
    assert got["view"].old_n == 180 and got["view"].new_n == 100
    assert got["purchase"].old_n == 20 and got["purchase"].new_n == 100
    total_chi2 = sum(r.chi2_term_e6 for r in got.values()) / 1e6
    assert total_chi2 > 3.841, total_chi2     # chi2(1) 95% critical value
    # identical mixes => every term 0
    same = spark.createDataFrame(
        [(i, f"2024-01-{(i % 28) + 1:02d} 10:00:00",
          "view" if (i // 28) % 2 else "click") for i in range(280)],
        "event_id long, ts string, event_type string",
    )
    flat = mix_drift(same).collect()
    assert all(r.chi2_term_e6 == 0 for r in flat)


def test_mix_drift_partition_invariant(spark):
    from audience_manager_platform_spark.operators.validation import mix_drift

    rows = [
        (i, f"2024-01-{(i % 28) + 1:02d} 10:00:00", f"t{(i * 13) % 5}")
        for i in range(400)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string"
    )
    a = [tuple(r) for r in mix_drift(ev.coalesce(1)).collect()]
    b = [tuple(r) for r in mix_drift(ev.repartition(11)).collect()]
    assert a == b


def test_prf_expansion_rescues_seed_invisible_doc(spark):
    from audience_manager_platform_spark.operators.text import (
        prf_expanded_topk,
    )

    rows = (
        # feedback set: seed term 'alpha' strongly co-occurring with
        # 'omega' (high feedback tf; per-doc filler words can't compete)
        [(i, f"alpha omega omega omega filler{i}", "en")
         for i in range(1, 6)]
        # the doc the seed query CANNOT see (no 'alpha' at all)
        + [(10, "omega omega omega pure expansion target", "en")]
        # filler
        + [(100 + i, f"noise filler{i} unrelated text", "en")
           for i in range(20)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = prf_expanded_topk(
        docs, ["alpha"], k=10, fb_docs=5, fb_terms=2
    ).collect()
    by_id = {r.doc_id: r for r in got}
    assert 10 in by_id, "expansion must surface the alpha-less doc"
    assert "omega" in got[0].expansion.split(",")
    # seed docs still rank (they match both seed and expansion terms)
    assert any(d in by_id for d in range(1, 6))
    assert by_id[10].n_matched_terms >= 1


def test_item_knn_ranks_strong_companion_first(spark):
    from audience_manager_platform_spark.operators.relational import (
        item_knn_cosine,
    )

    # brands A+B co-occur in every basket; C co-occurs with A half the
    # time; D is popular alone (high support, no co-occurrence)
    baskets = []
    pid = {"A": 1, "B": 2, "C": 3, "D": 4}
    for o in range(20):
        baskets += [(o, pid["A"]), (o, pid["B"])]
        if o % 2 == 0:
            baskets.append((o, pid["C"]))
    for o in range(100, 140):
        baskets.append((o, pid["D"]))
    li = spark.createDataFrame(baskets, "l_orderkey long, l_partkey long")
    part = spark.createDataFrame(
        [(v, k) for k, v in pid.items()], "p_partkey long, p_brand string"
    )
    got = {(r.brand, r.rank): r
           for r in item_knn_cosine(li, part, n_neighbors=2,
                                    min_orders=5).collect()}
    assert got[("A", 1)].neighbor == "B"       # perfect companion first
    assert got[("A", 1)].cosine_e6 == 1_000_000
    assert got[("A", 2)].neighbor == "C"
    # cos(A,C) = 10 / sqrt(20*10)
    import math
    assert got[("A", 2)].cosine_e6 == math.floor(
        10 / math.sqrt(200) * 1e6 + 0.5
    )
    # D never co-occurs above the floor -> no neighbor rows at all
    assert not any(b == "D" for b, _ in got)


def test_bmp_channel_stats_hand_checked_gradient_and_flat(spark):
    from audience_manager_platform_spark.operators.multimodal import (
        bmp_channel_stats,
        synthesize_bmp_shaded,
    )

    docs = spark.createDataFrame([(0,), (1,)], "doc_id long")
    got = {r.doc_id: r for r in
           bmp_channel_stats(synthesize_bmp_shaded(docs)).collect()}
    # doc 0: w=4, h=4, base_r=0, shaded value = x + 2y over the grid
    r0 = got[0]
    assert r0.n_pixels == 16 and not r0.is_flat
    vals = [x + 2 * y for x in range(4) for y in range(4)]
    import math
    assert r0.mean_r_e6 == math.floor(sum(vals) / 16 * 1e6 + 0.5)
    exp_var = (16 * sum(v * v for v in vals) - sum(vals) ** 2) / 256
    assert r0.var_r_e6 == math.floor(exp_var * 1e6 + 0.5)
    # doc 1: odd -> constant fill -> zero variance, flagged flat
    r1 = got[1]
    assert r1.is_flat and r1.var_r_e6 == 0 and r1.var_g_e6 == 0
    assert r1.mean_r_e6 == 1_000_000        # base_r = 1 % 200 = 1


def test_drift_ops_degrade_gracefully_on_single_day_window(spark):
    """All mass on one side (a single-day table): PSI and chi-square
    report zero evidence; KS reports NULL (undefined), never an error."""
    from audience_manager_platform_spark.operators.validation import (
        ks_value_drift,
        mix_drift,
        psi_value_drift,
    )

    one_day = spark.createDataFrame(
        [(i, "2024-01-05 10:00:00", float(1 + i % 3), f"t{i % 2}")
         for i in range(30)],
        "event_id long, ts string, value double, event_type string",
    )
    ks = ks_value_drift(one_day).collect()[0]
    assert ks.n_new == 0 and ks.ks_d_e6 is None
    assert all(r.psi_term_e9 == 0 for r in psi_value_drift(one_day).collect())
    assert all(r.chi2_term_e6 == 0 for r in mix_drift(one_day).collect())


def test_allocation_and_auc_degenerate_inputs(spark):
    from audience_manager_platform_spark.operators.corpus import (
        neyman_allocation,
    )
    from audience_manager_platform_spark.operators.validation import auc_exact

    # all-zero-variance strata -> proportional allocation, exact budget
    flat = spark.createDataFrame(
        [(i, "a" if i < 30 else "b", 5.0) for i in range(90)],
        "event_id long, event_type string, value double",
    )
    got = {r.event_type: r.alloc_n
           for r in neyman_allocation(flat, budget=30).collect()}
    assert got == {"a": 10, "b": 20}
    # single-class labels -> AUC undefined (NULL), never an error
    one_class = spark.createDataFrame(
        [(i % 5, 1) for i in range(20)], "score int, label int"
    )
    r = auc_exact(one_class, "score", "label").collect()[0]
    assert r.n_neg == 0 and r.auc_e6 is None
