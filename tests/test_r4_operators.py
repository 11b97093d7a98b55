"""Round-4 operator semantics on hand-built inputs: SimHash hamming
pairs, n-gram containment, weighted priority sampling, degree
histogram, length bands, bigram top-k, cosine range search, norm
profile, last-touch attribution."""

from datetime import datetime

from pyspark.sql import functions as F

from audience_manager_platform_spark.operators import dedup as D
from audience_manager_platform_spark.operators import similarity as S
from audience_manager_platform_spark.operators import text as T
from audience_manager_platform_spark.operators.analytics import (
    last_touch_attribution,
)
from audience_manager_platform_spark.operators.corpus import (
    weighted_priority_sample,
)
from audience_manager_platform_spark.operators.graph import degree_histogram


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_simhash_hamming_finds_near_identical(spark):
    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    docs = _docs(spark, [base, base + " extra", "completely different words " * 8])
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in
             D.simhash_hamming_pairs(docs, max_hamming=3).collect()}
    assert (0, 1) in pairs
    assert all(h <= 3 for h in pairs.values())
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_simhash_hamming_identical_is_zero(spark):
    docs = _docs(spark, ["same text here for both documents"] * 2)
    rows = D.simhash_hamming_pairs(docs).collect()
    assert [(r.doc_a, r.doc_b, r.hamming) for r in rows] == [(0, 1, 0)]


def test_containment_is_directed(spark):
    small = "alpha beta gamma delta epsilon zeta"
    big = small + " eta theta iota kappa " * 10
    docs = _docs(spark, [small, big])
    got = {(r.doc_a, r.doc_b): r.containment for r in
           D.ngram_containment_pairs(docs, threshold=0.8).collect()}
    # every 3-gram of the small doc appears in the big one -> containment
    # 1.0 in the small->big direction ONLY
    assert got[(0, 1)] == 1.0
    assert (1, 0) not in got


def test_weighted_sample_deterministic_and_sized(spark):
    df = spark.createDataFrame(
        [(i, float(i % 10)) for i in range(500)], "event_id long, value double"
    )
    a = weighted_priority_sample(df, F.col("value") + 1.0, "event_id", n=50)
    b = weighted_priority_sample(df, F.col("value") + 1.0, "event_id", n=50)
    ra, rb = a.collect(), b.collect()
    assert [r.event_id for r in ra] == [r.event_id for r in rb]
    assert len(ra) == 50
    # weight bias: the sampled mean weight must exceed the population's
    pop_mean = 1.0 + sum(i % 10 for i in range(500)) / 500
    got_mean = sum(r.value + 1.0 for r in ra) / 50
    assert got_mean > pop_mean


def test_degree_histogram_counts_nodes_per_degree(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "a"), ("c", "a")], "src string, dst string"
    )
    got = {r.degree: r.n_nodes for r in degree_histogram(edges).collect()}
    assert got == {2: 1, 1: 2}  # a has out-deg 2; b, c have 1


def test_length_bands_boundaries(spark):
    docs = spark.createDataFrame(
        [(0, 0), (1, 255), (2, 256), (3, 16383), (4, 16384), (5, 99999)],
        "doc_id long, n_chars long",
    )
    got = {r.band: (r.n_docs, r.total_chars) for r in T.length_bands(docs).collect()}
    assert got["0-255"] == (2, 255)
    assert got["256-1023"] == (1, 256)
    assert got["4096-16383"] == (1, 16383)
    assert got["16384+"] == (2, 16384 + 99999)


def test_bigram_topk_counts_multiset(spark):
    docs = _docs(spark, ["x y x y", "x y z"])
    got = {r.bigram: r.n for r in T.bigram_topk(docs, k=10).collect()}
    # "x y" appears twice in doc0 (positions 0,2) and once in doc1
    assert got["x y"] == 3
    assert got["y x"] == 1 and got["y z"] == 1


def test_range_search_matches_brute_force(spark, sf_dir):
    from audience_manager_platform_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    got = S.cosine_range_search(emb, [0, 1], threshold=0.2)
    brute = S.cosine_topk(emb, [0, 1], k=10**9).filter(F.col("cosine") >= 0.2)
    assert sorted((r.query_id, r.neighbor_id, r.cosine) for r in got.collect()) == sorted(
        (r.query_id, r.neighbor_id, r.cosine) for r in brute.collect()
    )


def test_norm_stats_hand_vectors(spark):
    rows = [(0, [3.0, 4.0] + [0.0] * 62, 1), (1, [6.0, 8.0] + [0.0] * 62, 1)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    r = S.norm_stats_by_label(emb).collect()[0]
    assert (r.label, r.n_vectors, r.min_norm, r.max_norm, r.avg_norm) == (
        1, 2, 5.0, 10.0, 7.5,
    )


def test_last_touch_attribution_semantics(spark):
    ev = spark.createDataFrame(
        [
            # user 1: click then purchase 60s later -> attributed
            (1, datetime(2024, 1, 1, 10, 0, 0), 1, "click", 0.0),
            (2, datetime(2024, 1, 1, 10, 1, 0), 1, "purchase", 9.0),
            # user 1: a second purchase still rides the SAME last click
            (3, datetime(2024, 1, 2, 10, 0, 0), 1, "purchase", 5.0),
            # user 2: click too old (8 days) -> unattributed
            (4, datetime(2024, 1, 1, 0, 0, 0), 2, "click", 0.0),
            (5, datetime(2024, 1, 9, 0, 0, 0), 2, "purchase", 7.0),
            # user 3: purchase with no click at all
            (6, datetime(2024, 1, 5, 0, 0, 0), 3, "purchase", 1.0),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    got = {r.event_id: (r.click_event_id, r.gap_seconds) for r in
           last_touch_attribution(ev).collect()}
    assert got[2] == (1, 60)
    assert got[3] == (1, 86400)  # exactly 1 day after the click
    assert got[5] == (None, None)
    assert got[6] == (None, None)


def test_oov_bands_partition_docs(spark):
    # 5 docs of common words + 1 doc of rare words; vocab_size=4 keeps
    # the common words in-vocab and pushes the rare doc into a high band
    docs = _docs(
        spark,
        ["aa bb cc dd"] * 5 + ["zz yy xx ww"],
    )
    got = {r.oov_band: (r.n_docs, r.total_toks, r.total_oov) for r in
           T.oov_rate_bands(docs, vocab_size=4).collect()}
    assert got[0] == (5, 20, 0)       # fully in-vocab
    assert got[9] == (1, 4, 4)        # fully OOV -> clamped top band
    assert sum(n for n, _, _ in got.values()) == 6


def test_basket_pairs_count_orders_not_lines(spark):
    from audience_manager_platform_spark.operators.relational import (
        basket_brand_pairs,
    )

    li = spark.createDataFrame(
        # order 1 holds brands A (twice -> must not double count) and B;
        # order 2 holds A and B; order 3 holds A only
        [(1, 10), (1, 11), (1, 20), (2, 10), (2, 21), (3, 10)],
        "l_orderkey long, l_partkey long",
    )
    part = spark.createDataFrame(
        [(10, "A"), (11, "A"), (20, "B"), (21, "B")],
        "p_partkey long, p_brand string",
    )
    got = [(r.brand_a, r.brand_b, r.n_orders) for r in
           basket_brand_pairs(li, part).collect()]
    assert got == [("A", "B", 2)]


# ---------------------------------------------------- scalar quantization
def _emb_df(spark, vecs):
    from audience_manager_platform_spark.operators.similarity import EMBED_DIM

    rows = []
    for i, v in enumerate(vecs):
        full = (list(v) + [0.0] * EMBED_DIM)[:EMBED_DIM]
        rows.append((i, [float(x) for x in full], "a"))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label string"
    )


def test_sq_encode_roundtrip_error_bounded_by_half_scale(spark):
    from audience_manager_platform_spark.operators import sq as Q

    emb = _emb_df(spark, [[0.0, 1.0], [0.5, -1.0], [1.0, 0.25], [0.125, 3.0]])
    model = Q.sq_fit_model(emb)
    enc = {r.vec_id: r.codes for r in Q.sq_encode(emb, model).collect()}
    raw = {r.vec_id: list(r.embedding) for r in emb.collect()}
    for vid, codes in enc.items():
        assert all(0 <= c <= 255 for c in codes)
        for d, c in enumerate(codes):
            rec = model.mins[d] + c * model.scales[d]
            # half-up rounding bounds reconstruction error by scale/2
            assert abs(rec - raw[vid][d]) <= model.scales[d] / 2 + 1e-9


def test_sq_constant_dim_uses_epsilon_scale(spark):
    from audience_manager_platform_spark.operators import sq as Q

    emb = _emb_df(spark, [[1.0, 7.5], [2.0, 7.5], [3.0, 7.5]])
    model = Q.sq_fit_model(emb)
    assert model.scales[1] == 1e-12  # constant dim -> epsilon guard
    codes = {r.vec_id: r.codes for r in Q.sq_encode(emb, model).collect()}
    # constant dim encodes to 0 everywhere (x - min == 0)
    assert all(c[1] == 0 for c in codes.values())


def test_sq_adc_agrees_with_exact_on_well_separated_vectors(spark):
    from audience_manager_platform_spark.operators import sq as Q

    # orthogonal-ish vectors: quantization noise can't flip the ranking
    emb = _emb_df(
        spark,
        [[10.0, 0.0, 0.0], [9.0, 1.0, 0.0], [0.0, 10.0, 0.0], [0.0, 0.0, 10.0]],
    )
    got = Q.sq_adc_topk(emb, [0], k=1).collect()
    assert [(r.query_id, r.neighbor_id) for r in got] == [(0, 1)]


def test_recall_eval_bounds_and_exact_self_recall(spark, sf_dir):
    from audience_manager_platform_spark.operators.similarity import recall_eval
    from audience_manager_platform_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    rows = recall_eval(emb, [0, 1, 2], k=3).collect()
    assert len(rows) == 3
    for r in rows:
        assert 0 <= r.hits <= 3
        assert abs(r.recall_at_k - r.hits / 3.0) < 1e-9


# ------------------------------------------- bloom-prefilter decontamination
def test_bloom_decontaminate_matches_exact_path(spark):
    from audience_manager_platform_spark.operators.corpus import (
        bloom_decontaminate,
        decontaminate,
    )

    corpus = _docs(
        spark,
        [
            "the quick brown fox jumps over the lazy dog",
            "totally unrelated content with no shared phrases here",
            "quick brown fox appears in this one too somewhere",
            "short",
        ],
    )
    bench = _docs(spark, ["watch the quick brown fox jumps high"])
    exact = sorted(
        (r.doc_id, r.n_shared_grams, r.contaminated)
        for r in decontaminate(corpus, bench).collect()
    )
    bloom = sorted(
        (r.doc_id, r.n_shared_grams, r.contaminated)
        for r in bloom_decontaminate(corpus, bench).collect()
    )
    assert bloom == exact
    assert any(c for _, _, c in bloom)  # at least one contaminated doc


def test_bloom_decontaminate_tiny_filter_still_exact(spark):
    # a deliberately saturated 64-bit bloom: every gram collides, so the
    # prefilter passes ~everything and correctness rests on the confirm
    # join — output must STILL equal the exact path
    from audience_manager_platform_spark.operators.corpus import (
        bloom_decontaminate,
        decontaminate,
    )

    corpus = _docs(
        spark,
        ["alpha beta gamma delta epsilon", "one two three four five six"],
    )
    bench = _docs(spark, ["gamma delta epsilon zeta eta"])
    exact = sorted(
        tuple(r) for r in decontaminate(corpus, bench).collect()
    )
    bloom = sorted(
        tuple(r)
        for r in bloom_decontaminate(corpus, bench, m_bits=64, k_hashes=2).collect()
    )
    assert bloom == exact


# --------------------------------- inverted index / source cap / profile
def test_inverted_postings_df_and_sample(spark):
    from audience_manager_platform_spark.operators.text import inverted_postings

    docs = _docs(
        spark,
        [
            "apple banana cherry",
            "apple banana",
            "apple date elderberry",
            "fig grape",
        ],
    )
    rows = {r.term: r for r in inverted_postings(docs, k=3, sample=2).collect()}
    assert rows["apple"].df == 3 and rows["apple"].rank == 1
    assert rows["apple"].top_doc_ids == "0,1"  # sample=2 lowest doc_ids
    assert rows["banana"].df == 2
    assert len(rows) == 3  # k=3


def test_source_cap_keeps_top_by_chars(spark):
    from audience_manager_platform_spark.operators.corpus import source_cap

    docs = spark.createDataFrame(
        [
            (0, "aaaa", "en", "s1", 4),
            (1, "aaa", "en", "s1", 3),
            (2, "aa", "en", "s1", 2),
            (3, "bbbbb", "en", "s2", 5),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r.doc_id: (r.source_rank, r.kept) for r in source_cap(docs, cap=2).collect()}
    assert got[0] == (1, True) and got[1] == (2, True)
    assert got[2] == (3, False)  # over the s1 cap
    assert got[3] == (1, True)


def test_table_profile_stats(spark):
    from audience_manager_platform_spark.operators.validation import table_profile

    df = spark.createDataFrame(
        [(1, 2.0, "x"), (2, None, "y"), (3, 4.5, None), (4, 4.5, "y")],
        "id long, v double, s string",
    )
    rows = {r.col_name: r for r in table_profile(
        df, [("id", "num"), ("v", "num"), ("s", "str")]
    ).collect()}
    assert rows["id"].n_nulls == 0 and rows["id"].ndv == 4
    assert rows["id"].min_num == 1.0 and rows["id"].max_num == 4.0
    assert rows["v"].n_nulls == 1 and rows["v"].ndv == 2
    assert rows["s"].n_nulls == 1 and rows["s"].ndv == 2
    assert rows["s"].min_str == "x" and rows["s"].max_str == "y"
    assert rows["s"].min_num is None


def test_hll_mergeable_rollup_exact_and_within(spark, sf_dir):
    from audience_manager_platform_spark.operators.skew import (
        hll_mergeable_rollup,
    )
    from audience_manager_platform_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    rows = hll_mergeable_rollup(ev).collect()
    by_day = {r.day: r for r in rows}
    assert "ALL" in by_day
    exact_all = ev.select("user_id").distinct().count()
    assert by_day["ALL"].exact_users == exact_all
    # HLL default lgConfigK=12 is well within 5% at fixture cardinalities
    assert all(r.within_bound for r in rows)
    # mergeability sanity: ALL >= any single day
    assert all(
        by_day["ALL"].exact_users >= r.exact_users
        for r in rows if r.day != "ALL"
    )
