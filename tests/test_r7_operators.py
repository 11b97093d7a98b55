"""Round-7 wave-26 operators: MERGE dry-run audit, algebraic rollup
maintenance, winsorized robust stats, and the pinned-fingerprint pHash
oracle plumbing. Hand-computed fixtures only — the sf0.01 oracle gate is
the volume check."""

import hashlib


def _events_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts_s string, user_id long, event_type string,"
        " value double",
    ).selectExpr(
        "event_id", "CAST(ts_s AS TIMESTAMP) AS ts", "user_id",
        "event_type", "value",
    )


def test_merge_upsert_actions_hand_computed(spark):
    """user 1 replays its snapshot payload -> nochange; user 2 changes
    state -> update; user 3 is batch-only -> insert; user 4 is
    snapshot-only -> untouched, NOT emitted (WHEN NOT MATCHED BY SOURCE
    do nothing)."""
    from audience_manager_platform_spark.operators.merge import (
        merge_upsert_actions,
    )

    rows = [
        # snapshot era (< cutoff)
        (0, "2024-01-01 10:00:00", 1, "view", 10.0),
        (1, "2024-01-02 10:00:00", 2, "click", 5.0),
        (2, "2024-01-03 10:00:00", 4, "error", 3.0),
        # batch era (>= cutoff); user 1's LATEST batch row replays the
        # snapshot payload (the earlier 9.0 row must lose the argmax)
        (3, "2024-02-01 10:00:00", 1, "view", 9.0),
        (4, "2024-02-02 10:00:00", 1, "view", 10.0),
        (5, "2024-02-01 11:00:00", 2, "purchase", 7.0),
        (6, "2024-02-01 12:00:00", 3, "signup", 1.0),
    ]
    out = {
        r.user_id: r
        for r in merge_upsert_actions(
            _events_df(spark, rows), cutoff="2024-02-01 00:00:00"
        ).collect()
    }
    assert set(out) == {1, 2, 3}  # user 4 untouched
    assert out[1].action == "nochange"
    assert out[1].prev_state == "view" and out[1].new_value == 10.0
    assert out[2].action == "update"
    assert out[2].prev_state == "click" and out[2].new_state == "purchase"
    assert out[3].action == "insert" and out[3].prev_state is None


def test_merge_upsert_null_value_counts_as_change(spark):
    """NULL payload equality is three-valued: a NULL on either side makes
    the nochange predicate non-TRUE, so the row classifies as update —
    identically in the DuckDB twin's CASE."""
    from audience_manager_platform_spark.operators.merge import (
        merge_upsert_actions,
    )

    rows = [
        (0, "2024-01-01 10:00:00", 1, "view", None),
        (1, "2024-02-01 10:00:00", 1, "view", None),
    ]
    out = merge_upsert_actions(
        _events_df(spark, rows), cutoff="2024-02-01 00:00:00"
    ).collect()
    assert len(out) == 1 and out[0].action == "update"


def test_algebraic_rollup_merge_equals_full_recompute(spark):
    """The lossless-maintenance contract on a hand-built split: groups
    touched on both sides of the cutoff merge counts/sums; one-sided
    groups pass through. Oracle semantics = plain GROUP BY over all."""
    from pyspark.sql import functions as F

    from audience_manager_platform_spark.operators.merge import (
        algebraic_rollup_merge,
    )

    orders = spark.createDataFrame(
        [
            # custkey 7, year 2000: entirely pre-cutoff
            (1, 7, "2000-03-01", 10.00),
            (2, 7, "2000-04-01", 20.00),
            # custkey 7, year 2001: straddles the 2001-01-01 cutoff
            # (o_orderdate >= cutoff is the delta)
            (3, 7, "2001-01-01", 5.50),
            # custkey 9, year 2001: delta-only group
            (4, 9, "2001-02-01", 7.25),
        ],
        "o_orderkey long, o_custkey long, d string, o_totalprice double",
    ).selectExpr(
        "o_orderkey", "o_custkey", "CAST(d AS TIMESTAMP) AS o_orderdate",
        "o_totalprice",
    )
    got = {
        (r.o_custkey, r.year): (r.n_orders, r.total_price)
        for r in algebraic_rollup_merge(orders).collect()
    }
    assert got == {
        (7, "2000"): (2, 30.00),
        (7, "2001"): (1, 5.50),
        (9, "2001"): (1, 7.25),
    }
    # contract: identical to the one-shot recompute
    full = {
        (r.o_custkey, r.year): (r.n_orders, r.total_price)
        for r in orders.groupBy(
            "o_custkey", F.date_format("o_orderdate", "yyyy").alias("year")
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .collect()
    }
    assert got == full


def test_algebraic_merge_straddling_group_sums_both_sides(spark):
    """A group with rows on BOTH sides of the cutoff must come out as
    prev ⊕ delta, not either side alone."""
    from audience_manager_platform_spark.operators.merge import (
        algebraic_rollup_merge,
    )

    orders = spark.createDataFrame(
        [
            (1, 5, "2000-12-31", 1.00),   # year 2000 prev — separate group
            (2, 5, "2001-06-01", 2.00),   # year 2001 delta
            (3, 5, "2001-01-01", 4.00),   # year 2001 delta (on the cutoff)
        ],
        "o_orderkey long, o_custkey long, d string, o_totalprice double",
    ).selectExpr(
        "o_orderkey", "o_custkey", "CAST(d AS TIMESTAMP) AS o_orderdate",
        "o_totalprice",
    )
    got = {
        (r.o_custkey, r.year): (r.n_orders, r.total_price)
        for r in algebraic_rollup_merge(orders).collect()
    }
    assert got == {(5, "2000"): (1, 1.00), (5, "2001"): (2, 6.00)}


def test_winsorize_stats_hand_computed(spark):
    """100 values 1..100 in one group: percentile_disc(.01)=1,
    percentile_disc(.99)=99 (smallest value whose cumulative dist
    reaches p), so only 100 clips high; winsorized mean =
    (sum(1..99) + 99) / 100 = 50.49."""
    from audience_manager_platform_spark.operators.validation import (
        winsorize_stats,
    )

    rows = [
        (i, "2024-01-01 00:00:00", 1, "click", float(i))
        for i in range(1, 101)
    ]
    out = winsorize_stats(_events_df(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.p_lo, r.p_hi) == (1.0, 99.0)
    assert (r.n_clip_lo, r.n_clip_hi) == (0, 1)
    assert r.n == 100
    assert r.win_mean == 50.49


def test_phash_pins_match_the_environment_canary():
    """registry/phash_pins.py must stay bit-identical to the pinned
    numpy/BLAS canary (tests/test_r6_operators.py pins the first 64
    fingerprints + a sha over them): if the canary re-pins after a
    library drift, the oracle pin table must be regenerated too —
    this test fails loudly if the two diverge."""
    from audience_manager_platform_spark.registry.phash_pins import (
        PHASH_SF001,
    )

    assert len(PHASH_SF001) == 500
    assert PHASH_SF001[0] == (0, 2008424753268054785)
    first64 = list(PHASH_SF001[:64])
    sha = hashlib.sha256(repr(first64).encode()).hexdigest()
    assert sha == (
        "8ba96e9e7d4ab95af3522d757065a65c238e5593428ba2240730b1a2ca40af60"
    )


def test_phash_oracle_sql_binds_to_fixture_doc_ids():
    """The inline pin table joins against the documents view, so the
    oracle stays correct on any fixture whose doc_ids are a subset of
    the pinned 500 (sf0.001 as well as the sf0.01 gate)."""
    import duckdb

    from audience_manager_platform_spark.registry.phash_pins import (
        phash_neardup_oracle_sql,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        "'/root/testdata/sf0.001/documents.parquet')"
    )
    small = con.execute(phash_neardup_oracle_sql()).df()
    con2 = duckdb.connect()
    con2.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        "'/root/testdata/sf0.01/documents.parquet')"
    )
    big = con2.execute(phash_neardup_oracle_sql()).df()
    n_docs_small = con.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
    assert set(small.columns) == {"doc_a", "doc_b", "hamming"}
    # every small-fixture pair involves only small-fixture docs, and is
    # a subset of the big fixture's pairs
    assert (small["doc_a"] < n_docs_small).all()
    assert (small["doc_b"] < n_docs_small).all()
    big_pairs = set(zip(big["doc_a"], big["doc_b"]))
    assert set(zip(small["doc_a"], small["doc_b"])) <= big_pairs
    assert (big["hamming"] <= 6).all()


# ---------------------------------------------------------- wave 27
def test_code_detect_hand_computed(spark):
    """doc 0 gets the shared code tail (6 '{}();=' symbols per '{', '}',
    '(', ')', ';', '=' occurrence + keywords def/return/var/class);
    doc 1 stays prose -> zero symbols, zero keywords."""
    from audience_manager_platform_spark.operators.text import code_detect

    docs = spark.createDataFrame(
        [
            (0, "plain words here", "en", "srcA", 16),
            (1, "more plain words", "en", "srcB", 16),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r.source: r for r in code_detect(docs).collect()}
    assert out["srcB"].n_code == 0 and out["srcB"].mean_sym_ppm == 0
    a = out["srcA"]
    # tail: " def load(x) { return x + 1; } var y = f(x); class T { y = 2; }"
    # symbols {}();= -> ( ) { ; } ( ) ; { ; } plus '=' x2 = count them:
    # load(x) ->2, {..} ->2, +1; ->1, var y = ->1, f(x) ->2, ; ->1,
    # { } ->2, y = 2 ->1, ; ->1  => 13 symbols, 64-char tail + 16 prose
    assert a.n_docs == 1 and a.n_code == 1 and a.code_ppm == 1_000_000
    full_len = 16 + len(
        " def load(x) { return x + 1; } var y = f(x); class T { y = 2; }"
    )
    assert a.mean_sym_ppm == 13 * 1_000_000 // full_len


def test_robust_scale_hand_computed(spark):
    """Values 1..9 plus an outlier 1000: median (disc, n=10) = 5,
    adev = {4,3,2,1,0,1,2,3,4,995}, MAD (disc) = lower-median
    of sorted {0,1,1,2,2,3,3,4,4,995} = 2; outliers: adev > 6
    -> 995 only."""
    from audience_manager_platform_spark.operators.validation import (
        robust_scale_stats,
    )

    vals = [float(i) for i in range(1, 10)] + [1000.0]
    rows = [
        (i, "2024-01-01 00:00:00", 1, "click", v)
        for i, v in enumerate(vals)
    ]
    out = robust_scale_stats(_events_df(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.med, r.mad) == (5.0, 2.0)
    assert r.n == 10 and r.n_outliers == 1 and r.outlier_ppm == 100_000


def test_partition_checksums_order_invariant(spark):
    """The per-day checksum must be identical under any row order /
    partitioning (bit_xor is commutative) and must move when a single
    value changes."""
    from audience_manager_platform_spark.operators.validation import (
        partition_checksums,
    )

    rows = [
        (1, "2024-01-01 01:00:00", 1, "view", 10.00),
        (2, "2024-01-01 02:00:00", 2, "click", 20.50),
        (3, "2024-01-02 01:00:00", 3, "view", 30.25),
    ]
    a = {r.day: (r.n_rows, r.checksum)
         for r in partition_checksums(_events_df(spark, rows)).collect()}
    shuffled = partition_checksums(
        _events_df(spark, rows[::-1]).repartition(7)
    )
    b = {r.day: (r.n_rows, r.checksum) for r in shuffled.collect()}
    assert a == b
    rows_mut = [rows[0], (2, "2024-01-01 02:00:00", 2, "click", 20.51),
                rows[2]]
    c = {r.day: (r.n_rows, r.checksum)
         for r in partition_checksums(_events_df(spark, rows_mut)).collect()}
    assert c["2024-01-01"] != a["2024-01-01"]
    assert c["2024-01-02"] == a["2024-01-02"]


def test_purged_time_split_hand_computed(spark):
    """10 days, k=5, embargo=2: folds of 2 days each; in every fold
    after the first, BOTH days lie within 2 days of the boundary
    (fold(idx-2) != fold(idx)), so both are embargoed; fold 0 has no
    prior fold -> nothing embargoed."""
    from audience_manager_platform_spark.operators.corpus import (
        purged_time_split,
    )

    rows = [
        (d * 10 + i, f"2024-01-{d + 1:02d} 06:00:00", 1, "view", 1.0)
        for d in range(10)
        for i in range(3)  # 3 rows/day
    ]
    out = {r.fold: r for r in
           purged_time_split(_events_df(spark, rows)).collect()}
    assert set(out) == {0, 1, 2, 3, 4}
    assert all(r.n_days == 2 and r.n_rows == 6 for r in out.values())
    assert out[0].n_embargo_rows == 0
    for f in (1, 2, 3, 4):
        assert out[f].n_embargo_rows == 6  # both days embargoed
    assert out[0].day_min == "2024-01-01" and out[4].day_max == "2024-01-10"


def test_phash_band_cap_drops_hot_bands_only(spark, sf_dir):
    """max_band_size semantics (the minhash_lsh_pairs contract on the
    image path): uncapped == a cap larger than any fixture band, and a
    tiny cap removes pairs without inventing new ones."""
    from pyspark.sql import functions as F

    from audience_manager_platform_spark.operators.multimodal import (
        phash_hamming_pairs,
        synthesize_textured_bmp,
    )
    from audience_manager_platform_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 60
    )
    media = synthesize_textured_bmp(docs)
    base = {(r.doc_a, r.doc_b)
            for r in phash_hamming_pairs(media).collect()}
    roomy = {(r.doc_a, r.doc_b)
             for r in phash_hamming_pairs(media, max_band_size=10_000)
             .collect()}
    assert roomy == base
    capped = {(r.doc_a, r.doc_b)
              for r in phash_hamming_pairs(media, max_band_size=1)
              .collect()}
    assert capped <= base


def test_checksum_fold_any_chunking_equals_batch(spark):
    """The monoid contract behind streaming_checksum_maintenance: folding
    the stream in ANY chunking yields exactly the one-shot batch table
    (counts add, checksums xor over disjoint row sets)."""
    from audience_manager_platform_spark.operators.validation import (
        partition_checksums,
    )
    from audience_manager_platform_spark.streaming.jobs import checksum_fold

    rows = [
        (i, f"2024-01-{(i % 3) + 1:02d} 0{i % 9}:00:00", i % 5, "view",
         float(i) + 0.25)
        for i in range(30)
    ]
    full = {r.day: (r.n_rows, r.checksum)
            for r in partition_checksums(_events_df(spark, rows)).collect()}
    # fold in 3 uneven chunks
    state = None
    for lo, hi in ((0, 7), (7, 19), (19, 30)):
        state = checksum_fold(state, _events_df(spark, rows[lo:hi]))
    folded = {r.day: (r.n_rows, r.checksum) for r in state.collect()}
    assert folded == full


# ---------------------------------------------------------- wave 28
def test_seasonal_decompose_hand_computed(spark):
    """14 days of 10.00/day with a 7.00 Sunday bump: interior trend is
    the 7-day mean (1100e6 micro-cents once a window straddles a
    Sunday), detrended is -1e8 on weekdays / +6e8 on the Sunday, so
    residuals vanish everywhere the trend exists; the 3 edge days each
    side carry NULL trend/residual."""
    from audience_manager_platform_spark.operators.timeseries import (
        seasonal_decompose,
    )

    rows = []
    eid = 0
    for d in range(1, 15):  # 2024-01-01 (Mon) .. 2024-01-14 (Sun)
        rows.append((eid, f"2024-01-{d:02d} 10:00:00", 1, "view", 10.00))
        eid += 1
        if d in (7, 14):  # Sundays
            rows.append((eid, f"2024-01-{d:02d} 11:00:00", 1, "view", 7.00))
            eid += 1
    out = {r.day: r for r in
           seasonal_decompose(_events_df(spark, rows)).collect()}
    assert len(out) == 14
    # edges: no centered window
    for d in ("2024-01-01", "2024-01-02", "2024-01-03",
              "2024-01-12", "2024-01-13", "2024-01-14"):
        assert out[d].trend_micro is None and out[d].resid_micro is None
    # interior: every 7-day window holds exactly one Sunday
    for d in range(4, 12):
        r = out[f"2024-01-{d:02d}"]
        assert r.trend_micro == 1_100_000_000
        assert r.resid_micro == 0
    assert out["2024-01-07"].iso_dow == 7
    assert out["2024-01-07"].seasonal_micro == 600_000_000
    assert out["2024-01-04"].seasonal_micro == -100_000_000


def test_source_overlap_matrix_hand_computed(spark):
    """A and B share one of their two 3-grams (containment 1/2,
    jaccard 1/3); C shares nothing and emits NO row (the gram join
    never sees the |sources|^2 cross product)."""
    from audience_manager_platform_spark.operators.corpus import (
        source_overlap_matrix,
    )

    docs = spark.createDataFrame(
        [
            (0, "a b c d", "en", "srcA", 7),
            (1, "a b c e", "en", "srcB", 7),
            (2, "x y z w", "en", "srcC", 7),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = source_overlap_matrix(docs).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.src_a, r.src_b, r.n_shared) == ("srcA", "srcB", 1)
    assert r.containment_ppm == 500_000
    assert r.jaccard_ppm == 333_333


def test_kanon_generalization_plan_hand_computed(spark):
    """Two k-violating sibling bands merge at level 1 -> generalize_1;
    a 6-row class releases; a singleton with no rescue suppresses; a
    negative balance bands by FLOOR (band_0 = -1) in both engines."""
    from audience_manager_platform_spark.operators.validation import (
        kanon_generalization_plan,
    )

    rows = []
    ck = 0
    for _ in range(3):
        rows.append((ck, 1, "A", 100.0)); ck += 1       # band0=0
    for _ in range(3):
        rows.append((ck, 1, "A", 2100.0)); ck += 1      # band0=1
    for _ in range(6):
        rows.append((ck, 2, "B", 500.0)); ck += 1       # release
    rows.append((ck, 3, "C", 9000.0)); ck += 1          # suppress
    for _ in range(5):
        rows.append((ck, 4, "D", -100.0)); ck += 1      # band0=-1 release
    customer = spark.createDataFrame(
        rows, "c_custkey long, c_nationkey long, c_mktsegment string,"
        " c_acctbal double",
    )
    out = {(r.c_nationkey, r.c_mktsegment, r.band_0): r
           for r in kanon_generalization_plan(customer).collect()}
    assert out[(1, "A", 0)].plan == "generalize_1"
    assert out[(1, "A", 1)].plan == "generalize_1"
    assert out[(2, "B", 0)].plan == "release"
    assert out[(3, "C", 4)].plan == "suppress"
    assert out[(4, "D", -1)].plan == "release"
    assert out[(4, "D", -1)].class_size == 5


def test_exposure_uplift_hand_computed(spark):
    """user 1 first-touches with a click pre-cutoff (treated): pre spend
    10.00, post 25.00 -> delta +1500 cents = 1.5e9 micro-cents. user 2 first-touches
    with a view (control): pre 20.00, post 5.00 -> delta -15.00 (floor
    division on a NEGATIVE total pinned). user 3 has no pre-cutoff
    events at all -> control."""
    from audience_manager_platform_spark.operators.analytics import (
        exposure_uplift,
    )

    rows = [
        (0, "2024-01-01 09:00:00", 1, "click", 1.0),
        (1, "2024-01-02 09:00:00", 1, "purchase", 10.00),
        (2, "2024-01-20 09:00:00", 1, "purchase", 25.00),
        (3, "2024-01-01 08:00:00", 2, "view", 1.0),
        (4, "2024-01-01 09:00:00", 2, "click", 1.0),   # clicks, but not FIRST
        (5, "2024-01-02 09:00:00", 2, "purchase", 20.00),
        (6, "2024-01-20 09:00:00", 2, "purchase", 5.00),
        (7, "2024-01-21 09:00:00", 3, "purchase", 7.00),
    ]
    out = {r.cohort: r for r in
           exposure_uplift(_events_df(spark, rows)).collect()}
    assert set(out) == {"treated", "control"}
    t = out["treated"]
    assert (t.n_users, t.pre_cents, t.post_cents) == (1, 1000, 2500)
    assert t.mean_delta_micro == 1_500_000_000
    c = out["control"]
    # users 2 and 3: pre 2000+0, post 500+700; delta total -800 cents
    # over 2 users -> floor(-800e6 / 2) = -400e6
    assert (c.n_users, c.pre_cents, c.post_cents) == (2, 2000, 1200)
    assert c.mean_delta_micro == -400_000_000


# ---------------------------------------------------------- wave 29
def test_conformal_interval_hand_computed(spark):
    """31 days, one event/day, cents = 100*d with a +2000-cent spike on
    days 27-31: the 24 scored days split 14 cal / 10 test at
    (24*3) div 5; calibration residuals are all 700 so qhat=700; test
    days 22-26 stay covered (resid 700) while the 5 spike days miss
    (resid 2700) -> coverage exactly 500000 ppm."""
    from audience_manager_platform_spark.operators.timeseries import (
        conformal_interval_backtest,
    )

    rows = []
    for d in range(1, 32):
        v = float(d + 20) if d >= 27 else float(d)
        rows.append((d, f"2024-01-{d:02d} 10:00:00", 1, "view", v))
    out = conformal_interval_backtest(_events_df(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.event_type, r.n_cal, r.n_test) == ("view", 14, 10)
    assert r.qhat_cents == 700
    assert r.n_covered == 5
    assert r.coverage_ppm == 500_000


def test_link_prediction_hand_computed(spark):
    """Path graph 1-2-3-4 (each edge from one shared order, min_cooc=1):
    the only wedge-closable non-edges are (1,3) via pivot 2 and (2,4)
    via pivot 3, both deg-2 pivots -> ra_micro 500000, cn 1; ties break
    on (u, v) so (1,3) ranks first. Adjacent pairs never appear."""
    from audience_manager_platform_spark.operators.graph import (
        link_prediction_scores,
    )

    pairs = spark.createDataFrame(
        [(10, 1), (10, 2), (20, 2), (20, 3), (30, 3), (30, 4)],
        "oid long, pid long",
    )
    out = link_prediction_scores(
        pairs, "oid", "pid", min_cooc=1, top_n=10
    ).collect()
    assert [(r.u, r.v, r.common_neighbors, r.ra_micro) for r in out] == [
        (1, 3, 1, 500_000),
        (2, 4, 1, 500_000),
    ]


def test_pseudonym_audit_matches_hashlib(spark):
    """Spark's sha2(..., 256) must equal hashlib over the same salted
    string; 40 users spread across first-nibble buckets with zero
    collisions, bucket counts and signed floor-division dev_ppm
    recomputed independently in Python."""
    import hashlib as _h

    from audience_manager_platform_spark.operators.validation import (
        PSEUDONYM_SALT,
        pseudonym_bucket_audit,
    )

    n_users = 40
    rows = [
        (i, "2024-01-01 10:00:00", i % n_users, "view", 1.0)
        for i in range(2 * n_users)  # duplicates: distinct() must dedup
    ]
    expected: dict[str, int] = {}
    for u in range(n_users):
        b = _h.sha256(f"{PSEUDONYM_SALT}{u}".encode()).hexdigest()[0]
        expected[b] = expected.get(b, 0) + 1
    out = pseudonym_bucket_audit(_events_df(spark, rows)).collect()
    assert {r.bucket: r.n_users for r in out} == expected
    for r in out:
        assert r.n_collisions == 0 and r.n_tokens == r.n_users
        d = (r.n_users * 16 - n_users) * 1_000_000
        assert r.dev_ppm == d // n_users  # Python // IS floor division


def test_markov_order2_lift_hand_computed(spark):
    """Sequence a x b c x d a x b c x d: after 'x' the next event is a
    2-2 tie (order-1 predicts 'b' lexicographically, missing both 'd'
    rows -> 8/10) while the order-2 contexts (a,x)->b and (c,x)->d are
    pure -> 10/10; lift exactly 200000 ppm."""
    from audience_manager_platform_spark.operators.analytics import (
        markov_order2_lift,
    )

    seq = ["a", "x", "b", "c", "x", "d", "a", "x", "b", "c", "x", "d"]
    rows = [
        (i, f"2024-01-01 10:{i:02d}:00", 1, t, 1.0)
        for i, t in enumerate(seq)
    ]
    out = markov_order2_lift(_events_df(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_eval, r.hits_order1, r.hits_order2) == (10, 8, 10)
    assert (r.acc1_ppm, r.acc2_ppm, r.lift_ppm) == (
        800_000, 1_000_000, 200_000,
    )


# ---------------------------------------------------------- wave 30
def test_late_arrival_audit_hand_computed(spark):
    """10 same-day events, planted delay (event_id % 5) hours: ids with
    id%5 in {3,4} exceed the 2h threshold -> 4/10 late, 400000 ppm,
    worst lag 4h. Batch execution of the same plan (withWatermark is a
    streaming-only hint) — the sf0.01 gate drives the REAL availableNow
    run."""
    from audience_manager_platform_spark.streaming.jobs import (
        late_arrival_audit,
    )

    rows = [
        (i, "2024-01-01 10:00:00", 1, "view", 1.0) for i in range(10)
    ]
    out = late_arrival_audit(_events_df(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.day, r.n_events, r.n_late) == ("2024-01-01", 10, 4)
    assert r.late_ppm == 400_000
    assert r.max_delay_s == 14_400


def test_target_encode_loo_hand_computed(spark):
    """Class A holds cents {100,200,300}, class B a singleton {400};
    prior = 250e6 micro, m=2: A rows encode to 250/225/200e6 (the row's
    own label fully excluded), and the singleton's LOO count is zero so
    it collapses to the prior exactly."""
    from audience_manager_platform_spark.operators.validation import (
        target_encode_loo,
    )

    rows = [
        (0, "2024-01-01 10:00:00", 1, "A", 1.0),
        (1, "2024-01-01 11:00:00", 1, "A", 2.0),
        (2, "2024-01-01 12:00:00", 1, "A", 3.0),
        (3, "2024-01-01 13:00:00", 1, "B", 4.0),
    ]
    out = {
        r.event_id: r
        for r in target_encode_loo(
            _events_df(spark, rows), smooth_m=2, sample_mod=1
        ).collect()
    }
    assert all(r.prior_micro == 250_000_000 for r in out.values())
    assert out[0].enc_micro == 250_000_000
    assert out[1].enc_micro == 225_000_000
    assert out[2].enc_micro == 200_000_000
    assert out[3].enc_micro == 250_000_000  # pure prior
    assert out[3].n_class == 1


def test_geo_neighbor_smoothing_matches_python_reference(spark):
    """Full independent Python reimplementation over 60 users x 1 cent
    event each: same hash-derived cells, same scatter/gather kernel,
    same truncating micro division and verdict."""
    from audience_manager_platform_spark.operators.geo import (
        GEO_A1, GEO_A2, GEO_B1, GEO_B2, GEO_LAT_CELLS, GEO_LON_CELLS,
        GEO_P, geo_neighbor_smoothing,
    )

    users = list(range(60))
    rows = [
        (i, "2024-01-01 10:00:00", u, "view", 1.0 + (i % 3))
        for i, u in enumerate(users)
    ]
    cells: dict[tuple[int, int], int] = {}
    for i, u in enumerate(users):
        la = ((GEO_A1 * (u % GEO_P) + GEO_B1) % GEO_P) % GEO_LAT_CELLS
        lo = ((GEO_A2 * (u % GEO_P) + GEO_B2) % GEO_P) % GEO_LON_CELLS
        cents = int((1.0 + (i % 3)) * 100)
        cells[(la, lo)] = cells.get((la, lo), 0) + cents
    gathered: dict[tuple[int, int], tuple[int, int]] = {}
    for (la, lo), c in cells.items():
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                k = (la + dx, lo + dy)
                if 0 <= k[0] < GEO_LAT_CELLS and 0 <= k[1] < GEO_LON_CELLS:
                    n, s = gathered.get(k, (0, 0))
                    gathered[k] = (n + 1, s + c)
    expected = {}
    for k, own in cells.items():
        n, s = gathered[k]
        smooth = s * 1_000_000 // n  # nonneg: trunc == floor
        verdict = (
            "hot" if own * 1_000_000 > smooth
            else "cool" if own * 1_000_000 < smooth else "flat"
        )
        expected[k] = (own, n, smooth, verdict)
    out = geo_neighbor_smoothing(_events_df(spark, rows)).collect()
    got = {
        (r.lat_cell, r.lon_cell):
        (r.cents, r.n_nbrs, r.smooth_micro, r.verdict)
        for r in out
    }
    assert got == expected


# ---------------------------------------------------------- wave 31
def test_bmp_tile_stats_hand_computed(spark):
    """doc 0: 4x4 shaded image (bases r=0 g=0 b=0, grad 1): value =
    x + 2y, quadrant sums computed by hand; doc 1: 5x5 constant fill
    (odd -> grad 0) with bases (1, 7, 13) — every tile mean equals the
    base exactly, and the odd width gives right tiles the extra
    column and bottom tiles the extra row (2x2 split of 5 = 2+3)."""
    from audience_manager_platform_spark.operators.multimodal import (
        bmp_tile_stats,
        synthesize_bmp_shaded,
    )

    docs = spark.createDataFrame(
        [(0, "t", "en", "s", 1), (1, "t", "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {
        (r.doc_id, r.tile_x, r.tile_y): r
        for r in bmp_tile_stats(synthesize_bmp_shaded(docs)).collect()
    }
    # doc 0: w=4, h=4, halves 2/2; value = x + 2y
    # tile(0,0): x,y in {0,1}: values 0,1,2,3 -> sum 6, n 4, mean 1.5
    assert out[(0, 0, 0)].n_pixels == 4
    assert out[(0, 0, 0)].mean_r_e6 == 1_500_000
    # tile(1,0): x in {2,3}, y in {0,1}: 2,3,4,5 -> mean 3.5
    assert out[(0, 1, 0)].mean_r_e6 == 3_500_000
    # tile(0,1): x in {0,1}, y in {2,3}: 4,5,6,7 -> mean 5.5
    assert out[(0, 0, 1)].mean_r_e6 == 5_500_000
    # tile(1,1): 6,7,8,9 -> mean 7.5
    assert out[(0, 1, 1)].mean_r_e6 == 7_500_000
    # doc 1: w=5 (half 2), h=5 (half 2), constant (1,7,13)
    assert out[(1, 0, 0)].n_pixels == 2 * 2
    assert out[(1, 1, 0)].n_pixels == 3 * 2
    assert out[(1, 0, 1)].n_pixels == 2 * 3
    assert out[(1, 1, 1)].n_pixels == 3 * 3
    for tx in (0, 1):
        for ty in (0, 1):
            r = out[(1, tx, ty)]
            assert (r.mean_r_e6, r.mean_g_e6, r.mean_b_e6) == (
                1_000_000, 7_000_000, 13_000_000,
            )


def test_snapshot_retention_plan_hand_computed(spark):
    """18 consecutive days ending Sun 2024-01-28 with keep_last=7: days
    22-28 keep_recent; older days thin to the newest per Mon-aligned
    week — 21st (week of Jan 15: rank>7 members 15..21 -> max 21),
    14th (week of Jan 8: members 11..14 -> max 14); everything else
    expires."""
    from audience_manager_platform_spark.operators.maintenance import (
        snapshot_retention_plan,
    )

    rows = [
        (d, f"2024-01-{d:02d} 10:00:00", 1, "view", 1.0)
        for d in range(11, 29)
    ]
    out = {r.day: r.action for r in
           snapshot_retention_plan(_events_df(spark, rows)).collect()}
    assert len(out) == 18
    for d in range(22, 29):
        assert out[f"2024-01-{d:02d}"] == "keep_recent"
    assert out["2024-01-21"] == "keep_weekly"
    assert out["2024-01-14"] == "keep_weekly"
    for d in (11, 12, 13, 15, 16, 17, 18, 19, 20):
        assert out[f"2024-01-{d:02d}"] == "expire"


def test_id_density_audit_hand_computed(spark):
    """ids 0..99 with planted residue 7 dropped in bucket size 10: every
    bucket has exactly one interior hole except bucket 9 is the same...
    bucket b spans [10b, 10b+9], missing 10b+7 (interior for all
    buckets) -> 10 buckets each n_missing=1. With plant disabled the
    audit is empty."""
    from audience_manager_platform_spark.operators.validation import (
        id_density_audit,
    )

    rows = [
        (i, "2024-01-01 10:00:00", 1, "view", 1.0) for i in range(100)
    ]
    df = _events_df(spark, rows)
    out = id_density_audit(df, bucket=10, plant_residue=7).collect()
    assert len(out) == 10
    for r in out:
        assert r.n_missing == 1
        assert r.n_rows == 9
        assert r.first_id == r.id_bucket * 10
        assert r.last_id == r.id_bucket * 10 + 9
    assert id_density_audit(df, bucket=10, plant_residue=None).count() == 0


# ---------------------------------------------------------- wave 32
def test_item_knn_hitrate_hand_computed(spark):
    """3 customers, leave-last-out: the train set is o1{B1,B2} o3{B2,B3}
    o5{B1}, so cos(B1,B2)=0.5, cos(B2,B3)=0.7071; cust1 and cust2 hit
    their held-out brand at rank 1, cust3's holdout brand B9 never
    co-occurs -> miss. hitrate = 2/3, MRR = (1e6+1e6) div 3."""
    from audience_manager_platform_spark.operators.relational import (
        item_knn_hitrate_eval,
    )

    orders = spark.createDataFrame(
        [
            (1, 1, "2024-01-01"), (2, 1, "2024-01-02"),
            (3, 2, "2024-01-01"), (4, 2, "2024-01-02"),
            (5, 3, "2024-01-01"), (6, 3, "2024-01-02"),
        ],
        "o_orderkey long, o_custkey long, o_orderdate string",
    )
    lineitem = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 3), (3, 2), (3, 3), (4, 1), (5, 1), (6, 9)],
        "l_orderkey long, l_partkey long",
    )
    part = spark.createDataFrame(
        [(1, "B1"), (2, "B2"), (3, "B3"), (9, "B9")],
        "p_partkey long, p_brand string",
    )
    out = item_knn_hitrate_eval(
        orders, lineitem, part, n_neighbors=2, min_orders=1, top_k=2
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_users, r.n_hits) == (3, 2)
    assert r.hitrate_ppm == 666_666
    assert r.mrr_e6 == 666_666


def test_simpson_diversity_hand_computed(spark):
    """u1 single-type -> exactly 1e6 (band 10); u2 a 2-2 mix -> 500000
    (band 5); u3 a 1-1-1 mix -> 333333 (band 3)."""
    from audience_manager_platform_spark.operators.analytics import (
        simpson_diversity_bands,
    )

    rows = (
        [(i, "2024-01-01 10:00:00", 1, "a", 1.0) for i in range(4)]
        + [(10, "2024-01-01 10:00:00", 2, "a", 1.0),
           (11, "2024-01-01 10:00:00", 2, "a", 1.0),
           (12, "2024-01-01 10:00:00", 2, "b", 1.0),
           (13, "2024-01-01 10:00:00", 2, "b", 1.0)]
        + [(20, "2024-01-01 10:00:00", 3, "a", 1.0),
           (21, "2024-01-01 10:00:00", 3, "b", 1.0),
           (22, "2024-01-01 10:00:00", 3, "c", 1.0)]
    )
    out = {r.band: r for r in
           simpson_diversity_bands(_events_df(spark, rows)).collect()}
    assert set(out) == {3, 5, 10}
    assert (out[10].n_users, out[10].mean_ppm) == (1, 1_000_000)
    assert (out[5].n_users, out[5].min_ppm, out[5].max_ppm) == (
        1, 500_000, 500_000,
    )
    assert out[3].mean_ppm == 333_333


def test_nearest_conversion_gap_hand_computed(spark):
    """User 1: purchase at 10:00:00; a click 10s before -> 'fwd' 10s, a
    click AT the purchase instant -> tie counts 'back' gap 0, a view
    30s after -> 'back' 30s. User 2 has no purchase -> 'none' with NULL
    gaps (count(gap) = 0 keeps the mean NULL, not a crash)."""
    from audience_manager_platform_spark.operators.relational import (
        nearest_conversion_gap,
    )

    rows = [
        (0, "2024-01-01 09:59:50", 1, "click", 1.0),
        (1, "2024-01-01 10:00:00", 1, "purchase", 9.0),
        (2, "2024-01-01 10:00:00", 1, "click", 1.0),
        (3, "2024-01-01 10:00:30", 1, "view", 1.0),
        (4, "2024-01-01 12:00:00", 2, "view", 1.0),
    ]
    out = {(r.event_type, r.direction): r for r in
           nearest_conversion_gap(_events_df(spark, rows)).collect()}
    assert out[("click", "fwd")].mean_gap_us == 10_000_000
    assert out[("click", "back")].mean_gap_us == 0
    assert out[("view", "back")].mean_gap_us == 30_000_000
    r_none = out[("view", "none")]
    assert r_none.n == 1
    assert r_none.mean_gap_us is None and r_none.p50_gap_us is None


# ---------------------------------------------------------- wave 33
def test_cusum_alarm_hand_computed(spark):
    """Baseline week at exactly 100.00/day (mu = 10000 cents, slack
    k = 5% = 500 cents, threshold h = 40% = 4000 cents), then a drift
    to 113.00/day: each drift day nets +800 cents of CUSUM, crossing h
    on the 6th drift day — every day's value AND verdict verified
    against a pure-Python fold of the textbook max(0, C+inc)
    recurrence (pinning the prefix-sum closed form, S_0 = 0 floor
    included)."""
    from audience_manager_platform_spark.operators.timeseries import (
        cusum_alarm,
    )

    rows = []
    for d in range(1, 22):  # 21 days
        v = 100.00 if d <= 7 else 113.00
        rows.append((d, f"2024-01-{d:02d} 10:00:00", 1, "view", v))
    out = {r.day: r for r in cusum_alarm(_events_df(spark, rows)).collect()}
    # textbook fold in python
    mu = 70_000 * 1_000_000 // 7  # 7 x 10000 cents -> 100.00/day micro
    k = (mu // 1_000_000) * 50_000
    h = (mu // 1_000_000) * 400_000
    c_up = 0
    expected = {}
    for d in range(1, 22):
        cents = 10000 if d <= 7 else 11300
        c_up = max(0, c_up + cents * 1_000_000 - mu - k)
        expected[f"2024-01-{d:02d}"] = (
            c_up, "alarm_up" if c_up > h else "ok"
        )
    for day, (cu, verdict) in expected.items():
        assert out[day].cusum_up_micro == cu, day
        assert out[day].verdict == verdict, day
    # sanity on the shape: baseline quiet, drift eventually alarms
    assert out["2024-01-07"].verdict == "ok"
    assert out["2024-01-21"].verdict == "alarm_up"


def test_duplicate_charge_audit_hand_computed(spark):
    """User 1 retries a 25.00 charge twice within the window (3 events
    -> 2 pair rows, never 3 pairs); a same-amount charge 10 minutes
    later and a different-amount charge are NOT flagged; views never
    enter."""
    from audience_manager_platform_spark.operators.validation import (
        duplicate_charge_audit,
    )

    rows = [
        (0, "2024-01-01 10:00:00", 1, "purchase", 25.00),
        (1, "2024-01-01 10:00:10", 1, "purchase", 25.00),
        (2, "2024-01-01 10:00:50", 1, "purchase", 25.00),
        (3, "2024-01-01 10:10:50", 1, "purchase", 25.00),  # outside 60s
        (4, "2024-01-01 10:00:05", 1, "purchase", 30.00),  # other amount
        (5, "2024-01-01 10:00:05", 1, "view", 25.00),      # not a charge
        (6, "2024-01-01 10:00:05", 2, "purchase", 25.00),  # other user
    ]
    out = duplicate_charge_audit(_events_df(spark, rows)).collect()
    assert [(r.event_id, r.prev_event_id, r.gap_us) for r in out] == [
        (1, 0, 10_000_000),
        (2, 1, 40_000_000),
    ]


def test_interevent_gap_bands_hand_computed(spark):
    """One user, gaps 10s/20s/30s attributed to the LATER event's type:
    clicks carry {10s, 30s} (p50 = the smaller actual value, disc
    semantics), the view carries {20s}; the first event has no gap."""
    from audience_manager_platform_spark.operators.analytics import (
        interevent_gap_bands,
    )

    rows = [
        (0, "2024-01-01 10:00:00", 1, "view", 1.0),
        (1, "2024-01-01 10:00:10", 1, "click", 1.0),
        (2, "2024-01-01 10:00:30", 1, "view", 1.0),
        (3, "2024-01-01 10:01:00", 1, "click", 1.0),
    ]
    out = {r.event_type: r for r in
           interevent_gap_bands(_events_df(spark, rows)).collect()}
    assert out["click"].n_gaps == 2
    assert out["click"].mean_gap_us == 20_000_000
    assert out["click"].p50_gap_us == 10_000_000
    assert out["click"].p99_gap_us == 30_000_000
    assert out["view"].n_gaps == 1
    assert out["view"].mean_gap_us == 20_000_000


# ---------------------------------------------------------- wave 34
def test_windowed_funnel_hand_computed(spark):
    """Deadline chaining with a 60s window: user 1 completes in order
    and in time; user 2's click lands AFTER the deadline -> stops at
    stage 1; user 3 purchases BEFORE clicking (order violated) ->
    stage 2 only; user 4 never views -> not even stage 1."""
    from audience_manager_platform_spark.operators.analytics import (
        windowed_funnel,
    )

    rows = [
        # user 1: view -> click(+10s) -> purchase(+20s): complete
        (0, "2024-01-01 10:00:00", 1, "view", 1.0),
        (1, "2024-01-01 10:00:10", 1, "click", 1.0),
        (2, "2024-01-01 10:00:30", 1, "purchase", 5.0),
        # user 2: click 2 minutes after view: outside the 60s hop
        (3, "2024-01-01 10:00:00", 2, "view", 1.0),
        (4, "2024-01-01 10:02:00", 2, "click", 1.0),
        # user 3: purchase BEFORE the click -> no eligible purchase
        (5, "2024-01-01 10:00:00", 3, "view", 1.0),
        (6, "2024-01-01 10:00:05", 3, "purchase", 5.0),
        (7, "2024-01-01 10:00:10", 3, "click", 1.0),
        # user 4: no view at all
        (8, "2024-01-01 10:00:00", 4, "click", 1.0),
        (9, "2024-01-01 10:00:10", 4, "purchase", 5.0),
    ]
    out = windowed_funnel(_events_df(spark, rows), deadline_s=60).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_stage1, r.n_stage2, r.n_stage3) == (3, 2, 1)
    assert r.conv12_ppm == 666_666
    assert r.conv23_ppm == 500_000
    assert r.overall_ppm == 333_333


def test_kendall_tau_hand_computed(spark):
    """3 brands: revenue ranks A>B>C while order-count ranks C>B>A — a
    complete reversal, so all 3 pairs are discordant and tau is exactly
    -1 (the truncating-division edge: (0*2-3)*1e6 div 3 = -1000000)."""
    from audience_manager_platform_spark.operators.relational import (
        kendall_tau_brand_ranks,
    )

    part = spark.createDataFrame(
        [(1, "A"), (2, "B"), (3, "C")], "p_partkey long, p_brand string"
    )
    # A: 300.00 over 1 order; B: 200.00 over 2 orders; C: 100.00 over
    # 3 orders -> revenue A,B,C; reach C,B,A
    lineitem = spark.createDataFrame(
        [
            (10, 1, 300.00),
            (11, 2, 100.00), (12, 2, 100.00),
            (13, 3, 40.00), (14, 3, 30.00), (15, 3, 30.00),
        ],
        "l_orderkey long, l_partkey long, l_extendedprice double",
    )
    out = kendall_tau_brand_ranks(lineitem, part).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_pairs, r.n_concordant, r.n_discordant) == (3, 0, 3)
    assert r.tau_ppm == -1_000_000


def test_phash_pin_table_matches_live_kernel_all_500(spark):
    """EVERY pinned fingerprint must equal the live kernel's output —
    not just the 64-entry canary prefix. Round-7 lesson: a sinusoid
    hoist flipped ONE borderline DCT bit on doc 105 (index > 64), the
    prefix canary stayed green, and the oracle went red two commits
    later. This test closes that hole: any future kernel or
    numpy/BLAS drift fails HERE, with the doc id in the message, and
    the fix is to regenerate registry/phash_pins.py in the same
    commit."""
    import pyspark.sql.functions as F

    from audience_manager_platform_spark.operators.multimodal import (
        phash64,
        synthesize_textured_bmp,
    )
    from audience_manager_platform_spark.registry.phash_pins import (
        PHASH_SF001,
    )

    docs = spark.range(500).select(F.col("id").alias("doc_id"))
    live = {
        r.doc_id: r.phash
        for r in phash64(synthesize_textured_bmp(docs)).collect()
    }
    drifted = [
        (d, live[d], pin) for d, pin in PHASH_SF001 if live[d] != pin
    ]
    assert drifted == [], f"pins stale for docs: {drifted[:5]}"


# ---------------------------------------------------------- wave 35
def test_flipbook_motion_hand_computed(spark):
    """doc 3 has n = 2 + 3%5 = 5 frames with seeds 303+17k: every
    consecutive jump recomputed by hand from the modular color
    formulas; the kernel must read the same numbers out of the real
    container bytes."""
    from audience_manager_platform_spark.operators.multimodal import (
        FLIP_MOTION_CUT,
        flipbook_motion_profile,
        synthesize_flipbook,
    )

    docs = spark.createDataFrame(
        [(3, "t", "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r.frame_idx: r for r in
           flipbook_motion_profile(synthesize_flipbook(docs)).collect()}
    assert set(out) == {1, 2, 3, 4}
    for k in range(1, 5):
        s_cur, s_prev = 101 * 3 + 17 * k, 101 * 3 + 17 * (k - 1)
        l1 = (
            abs(s_cur % 256 - s_prev % 256)
            + abs((s_cur * 7) % 256 - (s_prev * 7) % 256)
            + abs((s_cur * 13) % 256 - (s_prev * 13) % 256)
        )
        r = out[k]
        assert r.motion_l1 == l1, k
        assert r.verdict == ("cut" if l1 > FLIP_MOTION_CUT else "pan")
        assert r.width == 4 + s_cur % 5 and r.height == 4 + s_cur % 3


def test_bitemporal_restatements_hand_computed(spark):
    """T = max(recorded) - 10d. user 1: a late correction (event_id 50,
    recorded after T, effective before T) flips the belief at T from
    'view' to 'purchase' -> restated. user 2's history is all recorded
    before T -> identical beliefs, no row. user 3 exists ONLY through
    a late correction -> NULL-then backfill row."""
    from audience_manager_platform_spark.operators.merge import (
        bitemporal_restatements,
    )

    rows = [
        # T anchor: latest recorded ts 2024-01-20 -> T = 2024-01-10
        (1, "2024-01-20 00:00:00", 9, "view", 1.0),
        # user 1: normal row effective 01-05 (view), then a correction
        # recorded 01-12 (> T) with effective 01-09 (< T, wins argmax)
        (2, "2024-01-05 00:00:00", 1, "view", 1.0),
        (50, "2024-01-12 00:00:00", 1, "purchase", 1.0),  # eff 01-09
        # user 2: stable history, all recorded before T
        (3, "2024-01-04 00:00:00", 2, "click", 1.0),
        # user 3: exists only through a correction (recorded 01-13,
        # effective 01-10 == T boundary, <= keeps it)
        (100, "2024-01-13 00:00:00", 3, "signup", 1.0),
    ]
    out = {r.user_id: (r.state_then, r.state_now) for r in
           bitemporal_restatements(_events_df(spark, rows)).collect()}
    assert out == {
        1: ("view", "purchase"),
        3: (None, "signup"),
    }


def test_bucketized_range_join_matches_plain_range_join(spark):
    """The bucketize-then-residual composition must equal the naive
    range predicate exactly — checked on a hand fixture whose cents
    values sit ON band and grid boundaries (69,70,71 around the 70-cent
    band edge; 0 at the origin)."""
    from pyspark.sql import functions as F

    from audience_manager_platform_spark.operators.relational import (
        bucketized_range_join,
    )

    vals = [0.00, 0.69, 0.70, 0.71, 3.49, 3.50, 6.99, 699.99]
    rows = [
        (i, "2024-01-01 10:00:00", 1, "view", v)
        for i, v in enumerate(vals)
    ]
    df = _events_df(spark, rows)
    got = {r.band_mod: (r.n_rows, r.n_bands, r.sum_cents) for r in
           bucketized_range_join(df, n_bands=10_000).collect()}
    # naive reference: every cents value lands in band cents div 7
    import collections
    ref = collections.defaultdict(lambda: [0, set(), 0])
    for v in vals:
        cents = int(v * 100 + 0.5)
        band = cents // 7
        agg = ref[band % 97]
        agg[0] += 1
        agg[1].add(band)
        agg[2] += cents
    ref = {k: (n, len(b), s) for k, (n, b, s) in ref.items()}
    assert got == ref


# ---------------------------------------------------------- wave 36
def test_order_balance_audit_hand_computed(spark):
    """Order 1 balances exactly; order 2's header is 1 cent high
    (within the 0.5% band); order 3's lines overshoot by 20% ->
    'over'; order 4 has NO lines -> derived 0 -> 'under' with full
    drift. The line formula applies discount then tax in integer
    cents/ppm, matching the twins' operation order."""
    from audience_manager_platform_spark.operators.validation import (
        order_balance_audit,
    )

    orders = spark.createDataFrame(
        [(1, 100.00), (2, 100.01), (3, 100.00), (4, 50.00)],
        "o_orderkey long, o_totalprice double",
    )
    # line cents formula: cents * (1e6-d) div 1e6 * (1e6+t) div 1e6
    lineitem = spark.createDataFrame(
        [
            (1, 100.00, 0.0, 0.0),     # exact 10000 cents
            (2, 100.00, 0.0, 0.0),     # header 10001 -> within_tol
            (3, 100.00, 0.0, 0.20),    # 12000 cents vs 10000 -> over
        ],
        "l_orderkey long, l_extendedprice double, l_discount double,"
        " l_tax double",
    )
    out = {r.band: (r.n_orders, r.abs_drift_cents) for r in
           order_balance_audit(orders, lineitem).collect()}
    assert out == {
        "exact": (1, 0),
        "within_tol": (1, 1),
        "over": (1, 2000),
        "under": (1, 5000),
    }


def test_max_drawdown_hand_computed(spark):
    """A refund day makes the cumulative series non-monotone (all-
    positive dailies would pin drawdown at 0 everywhere): dailies
    100, 300, -350, 80, 400 cents give cums 100, 400, 50, 130, 530
    and drawdowns 0, 0, 350, 270, 0 — max 350 bottoming on day 3."""
    from audience_manager_platform_spark.operators.timeseries import (
        max_drawdown,
    )

    vals = [1.00, 3.00, -3.50, 0.80, 4.00]
    rows = [
        (i, f"2024-01-{i + 1:02d} 10:00:00", 1, "view", v)
        for i, v in enumerate(vals)
    ]
    out = max_drawdown(_events_df(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.trough_day == "2024-01-03"
    assert r.max_drawdown_cents == 350


def test_ab_srm_check_is_deterministic_and_balanced(spark):
    """The md5 arm assignment is replayable (same salt -> same split)
    and statistically sane on 2000 users (chi2 below the 3.841 cut);
    a deliberately skewed fake assignment would trip the verdict —
    pinned by recomputing chi2 from the returned counts."""
    from audience_manager_platform_spark.operators.analytics import (
        ab_srm_check,
    )

    rows = [
        (i, "2024-01-01 10:00:00", i % 2000, "view", 1.0)
        for i in range(4000)
    ]
    df = _events_df(spark, rows)
    r1 = ab_srm_check(df).collect()[0]
    r2 = ab_srm_check(df).collect()[0]
    assert (r1.n_a, r1.n_b) == (r2.n_a, r2.n_b)  # replayable
    assert r1.n_a + r1.n_b == 2000
    d = r1.n_a - r1.n_b
    assert r1.chi2_milli == d * d * 1000 // 2000
    assert r1.verdict == (
        "srm_detected" if r1.chi2_milli > 3841 else "ok"
    )


# ---------------------------------------------------------- wave 37
def test_cusum_streaming_fold_any_chunking(spark):
    """The additive half of the streaming CUSUM monitor: folding the
    daily cents state over 3 uneven chunks equals the one-shot daily
    table (the checksum-fold contract), so the read-time CUSUM over
    the settled state equals the batch operator exactly."""
    from audience_manager_platform_spark.operators.timeseries import (
        cusum_alarm,
        cusum_from_daily,
    )
    from audience_manager_platform_spark.streaming.jobs import (
        daily_cents_fold,
    )

    rows = [
        (i, f"2024-01-{(i % 9) + 1:02d} 10:00:00", 1,
         "view" if i % 2 else "click", float(i) + 0.25)
        for i in range(30)
    ]
    state = None
    for lo, hi in ((0, 7), (7, 19), (19, 30)):
        state = daily_cents_fold(state, _events_df(spark, rows[lo:hi]))
    folded = {(r.event_type, r.day, r.cusum_up_micro, r.verdict)
              for r in cusum_from_daily(state).collect()}
    batch = {(r.event_type, r.day, r.cusum_up_micro, r.verdict)
             for r in cusum_alarm(_events_df(spark, rows)).collect()}
    assert folded == batch


def test_salt_plan_hand_computed(spark):
    """Key 'hot' (2500 rows, budget 1000) gets ceil(2500/1000)=3 salts
    and 2500/3000 share; 'warm' (1000 rows) sits exactly AT budget ->
    excluded (only strictly-above keys need salting); 'cold' excluded."""
    from audience_manager_platform_spark.operators.skew import salt_plan

    rows = (
        [(i, "2024-01-01 10:00:00", 1, "hot", 1.0) for i in range(2500)]
        + [(3000 + i, "2024-01-01 10:00:00", 1, "warm", 1.0)
           for i in range(1000)]
        + [(5000 + i, "2024-01-01 10:00:00", 1, "cold", 1.0)
           for i in range(500)]
    )
    out = salt_plan(
        _events_df(spark, rows), "event_type", target_rows=1000
    ).collect()
    assert [(r.key, r.freq, r.salt_factor, r.share_ppm) for r in out] == [
        ("hot", 2500, 3, 2500 * 1_000_000 // 4000),
    ]


def test_repeat_purchase_curve_hand_computed(spark):
    """5 users with 3/2/2/1/1 purchases: stage counts 5,3,1; return
    rates 600000 then 333333 ppm; first stage has NULL (no prior)."""
    from audience_manager_platform_spark.operators.analytics import (
        repeat_purchase_curve,
    )

    counts = {1: 3, 2: 2, 3: 2, 4: 1, 5: 1}
    rows, eid = [], 0
    for u, k in counts.items():
        for j in range(k):
            rows.append(
                (eid, f"2024-01-0{j + 1} 10:00:00", u, "purchase", 5.0)
            )
            eid += 1
        rows.append((eid, "2024-01-09 10:00:00", u, "view", 1.0))
        eid += 1
    out = {r.nth_purchase: r for r in
           repeat_purchase_curve(_events_df(spark, rows)).collect()}
    assert {k: v.n_users for k, v in out.items()} == {1: 5, 2: 3, 3: 1}
    assert out[1].return_ppm is None
    assert out[2].return_ppm == 600_000
    assert out[3].return_ppm == 333_333


# ---------------------------------------------------------- wave 38
def test_growth_accounting_hand_computed(spark):
    """3 Mondays (weeks W, W+1, W+2): u1 active all three (retained);
    u2 active W then W+2 (churn reported on W+1, resurrected W+2);
    u3 joins W+1 (new). Quick ratio on W+1 = new 1 / churned 1 = 1e6;
    W+2 = resurrected 1 / churned 0 -> NULL."""
    from audience_manager_platform_spark.operators.analytics import (
        growth_accounting,
    )

    # 2024-01-01 / 08 / 15 are consecutive Mondays
    rows = [
        (0, "2024-01-01 10:00:00", 1, "view", 1.0),
        (1, "2024-01-08 10:00:00", 1, "view", 1.0),
        (2, "2024-01-15 10:00:00", 1, "view", 1.0),
        (3, "2024-01-01 11:00:00", 2, "view", 1.0),
        (4, "2024-01-15 11:00:00", 2, "view", 1.0),
        (5, "2024-01-08 12:00:00", 3, "view", 1.0),
    ]
    out = {r.week: r for r in
           growth_accounting(_events_df(spark, rows)).collect()}
    weeks = sorted(out)
    w0, w1, w2 = weeks
    assert (out[w0].n_new, out[w0].n_retained, out[w0].n_resurrected,
            out[w0].n_churned) == (2, 0, 0, 0)
    assert (out[w1].n_new, out[w1].n_retained, out[w1].n_resurrected,
            out[w1].n_churned) == (1, 1, 0, 1)
    assert out[w1].quick_ratio_ppm == 1_000_000
    assert (out[w2].n_new, out[w2].n_retained, out[w2].n_resurrected,
            out[w2].n_churned) == (0, 1, 1, 1)  # u3 churns on w2
    assert out[w2].quick_ratio_ppm == 1_000_000


def test_null_aware_anti_join_trap(spark):
    """With a NULL planted in the probe set, NOT IN matches NOTHING
    (three-valued logic) while NOT EXISTS keeps the genuinely
    unmatched rows — the operator's two rows pin both semantics."""
    from audience_manager_platform_spark.operators.relational import (
        null_aware_anti_join,
    )

    orders = spark.createDataFrame(
        [(1, 3, 10.00), (2, 30, 20.00), (3, 55, 40.00)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    # probe keys present: {NULL (from 0), 3}; order probe_keys are
    # custkey % 25 = {3, 5, 5}
    customer = spark.createDataFrame(
        [(1, 0), (2, 3)], "c_custkey long, c_nationkey long"
    )
    out = {r.semantics: (r.n_orders, r.total_cents) for r in
           null_aware_anti_join(orders, customer).collect()}
    assert out["not_in"] == (0, 0)          # NULL poisons NOT IN
    assert out["not_exists"] == (2, 6000)   # the two custkey%25==5 rows


def test_theilsen_trend_hand_computed(spark):
    """4 days with one spike day (cents 100, 200, 10000, 400): the 6
    pairwise micro-slopes are {100, 4950, 100, 9800, 100, -9600}e6;
    percentile_disc(0.5) picks the 3rd smallest = 100e6 — the robust
    +1.00/day trend, unmoved by the spike (an OLS fit lands ~+13/day
    wrongly... the median doesn't)."""
    from audience_manager_platform_spark.operators.timeseries import (
        theilsen_trend,
    )

    vals = [1.00, 2.00, 100.00, 4.00]
    rows = [
        (i, f"2024-01-{i + 1:02d} 10:00:00", 1, "view", v)
        for i, v in enumerate(vals)
    ]
    out = theilsen_trend(_events_df(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_pairs == 6
    assert r.slope_micro_p50 == 100_000_000


# ---------------------------------------------------------- wave 39
def test_delta_attribution_hand_computed(spark):
    """Day 2 is the spike (+500 vs day 1-2 deltas elsewhere smaller):
    views contribute +600, clicks -100 -> shares 1200000 and -200000
    ppm of the +500 move; a type present only on the spike day
    attributes its full value."""
    from audience_manager_platform_spark.operators.analytics import (
        delta_attribution,
    )

    rows = [
        # day 1: view 100, click 200   -> tot 300
        (0, "2024-01-01 10:00:00", 1, "view", 1.00),
        (1, "2024-01-01 11:00:00", 1, "click", 2.00),
        # day 2: view 700, click 100   -> tot 800 (delta +500, spike)
        (2, "2024-01-02 10:00:00", 1, "view", 7.00),
        (3, "2024-01-02 11:00:00", 1, "click", 1.00),
        # day 3: tot 700 (delta -100)
        (4, "2024-01-03 10:00:00", 1, "view", 7.00),
    ]
    out = {r.event_type: r for r in
           delta_attribution(_events_df(spark, rows)).collect()}
    assert all(r.spike_day == "2024-01-02" for r in out.values())
    assert (out["view"].cents_prev, out["view"].cents_cur) == (100, 700)
    assert out["view"].delta_cents == 600
    assert out["view"].share_ppm == 1_200_000
    assert out["click"].delta_cents == -100
    assert out["click"].share_ppm == -200_000


def test_seasonal_strength_flat_vs_seasonal(spark):
    """A perfectly week-periodic series with a CONSTANT level
    decomposes with zero residual wherever the trend exists ->
    seasonal strength exactly 1e6 ppm, while trend strength is 0 by
    the Var(trend+resid)=0 convention (a flat level IS no trend)."""
    from audience_manager_platform_spark.operators.timeseries import (
        seasonal_strength,
    )

    rows = []
    eid = 0
    for d in range(1, 22):
        rows.append((eid, f"2024-01-{d:02d} 10:00:00", 1, "view", 10.00))
        eid += 1
        if d % 7 == 0:  # Sunday bump, perfectly periodic
            rows.append((eid, f"2024-01-{d:02d} 11:00:00", 1, "view", 7.00))
            eid += 1
    out = seasonal_strength(_events_df(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_days == 15  # 21 days minus 3 NULL-trend edges each side
    assert r.seasonal_strength_ppm == 1_000_000
    assert r.trend_strength_ppm == 0


def test_growth_userweek_fold_any_chunking(spark):
    """The streaming growth ledger's set fold is IDEMPOTENT: folding 3
    uneven chunks — with one chunk REPLAYED — still equals the one-shot
    classification (the stronger-than-xor replay guarantee)."""
    from audience_manager_platform_spark.operators.analytics import (
        growth_accounting,
        growth_from_userweeks,
    )
    from audience_manager_platform_spark.streaming.jobs import (
        userweek_fold,
    )

    rows = [
        (i, f"2024-01-{(i % 21) + 1:02d} 10:00:00", i % 4, "view", 1.0)
        for i in range(30)
    ]
    state = None
    chunks = [(0, 7), (7, 19), (7, 19), (19, 30)]  # chunk 2 replayed
    for lo, hi in chunks:
        state = userweek_fold(state, _events_df(spark, rows[lo:hi]))
    folded = {tuple(r) for r in growth_from_userweeks(state).collect()}
    batch = {tuple(r) for r in
             growth_accounting(_events_df(spark, rows)).collect()}
    assert folded == batch


# ---------------------------------------------------------- wave 40
def test_kanon_utility_sweep_hand_computed(spark):
    """Classes of sizes 6, 3, 1 over one QI column: k=2 releases 9/10
    rows (2 classes), k=5 releases 6/10 (1 class), k=10 suppresses
    everything."""
    from audience_manager_platform_spark.operators.validation import (
        kanon_utility_sweep,
    )

    rows = (
        [(i, "2024-01-01 10:00:00", 1, "A", 1.0) for i in range(6)]
        + [(10 + i, "2024-01-01 10:00:00", 1, "B", 1.0) for i in range(3)]
        + [(20, "2024-01-01 10:00:00", 1, "C", 1.0)]
    )
    out = {r.k: r for r in kanon_utility_sweep(
        _events_df(spark, rows).select("event_type"),
        ["event_type"], ks=(2, 5, 10),
    ).collect()}
    assert (out[2].n_released, out[2].n_suppressed,
            out[2].n_classes_released) == (9, 1, 2)
    assert out[2].released_ppm == 900_000
    assert (out[5].n_released, out[5].released_ppm) == (6, 600_000)
    assert (out[10].n_released, out[10].n_suppressed) == (0, 10)


def test_mix_rate_decomposition_hand_computed(spark):
    """Two 2-day periods: period 1 has views 3x100c + clicks 1x400c
    (shares 750000/250000, rates 100e6/400e6); period 2 flips traffic
    to clicks (1x100c + 3x400c). Every effect term recomputed by hand
    on the exact pico grid; the terms reconcile: mix + rate +
    interaction = w2*r2 - w1*r1 per type."""
    from audience_manager_platform_spark.operators.analytics import (
        mix_rate_decomposition,
    )

    rows = [
        # period 1: days 1-2 (mid = day 2 inclusive)
        (0, "2024-01-01 10:00:00", 1, "view", 1.00),
        (1, "2024-01-01 11:00:00", 1, "view", 1.00),
        (2, "2024-01-02 10:00:00", 1, "view", 1.00),
        (3, "2024-01-02 11:00:00", 1, "click", 4.00),
        # period 2: days 3-4
        (4, "2024-01-03 10:00:00", 1, "view", 1.00),
        (5, "2024-01-03 11:00:00", 1, "click", 4.00),
        (6, "2024-01-04 10:00:00", 1, "click", 4.00),
        (7, "2024-01-04 11:00:00", 1, "click", 4.00),
    ]
    out = {r.event_type: r for r in
           mix_rate_decomposition(_events_df(spark, rows)).collect()}
    v = out["view"]
    assert (v.w1_ppm, v.w2_ppm) == (750_000, 250_000)
    assert (v.r1_micro, v.r2_micro) == (100_000_000, 100_000_000)
    assert v.mix_effect_pico == -500_000 * 100_000_000
    assert v.rate_effect_pico == 0 and v.interaction_pico == 0
    c = out["click"]
    assert (c.w1_ppm, c.w2_ppm) == (250_000, 750_000)
    assert c.mix_effect_pico == 500_000 * 400_000_000
    # reconciliation identity per type
    for r in out.values():
        assert (
            r.mix_effect_pico + r.rate_effect_pico + r.interaction_pico
            == r.w2_ppm * r.r2_micro - r.w1_ppm * r.r1_micro
        )


# ---------------------------------------------------------- wave 41
def test_langid_macro_f1_arithmetic_consistency(spark):
    """Black-box consistency over the real classifier on a small doc
    set: per-class rows obey the exact cross-multiplied definitions
    (recomputed from the confusion counts), tp <= min(n_true, n_pred),
    and the macro row is the integer mean of per-class ppm values."""
    from audience_manager_platform_spark.operators.text import (
        langid_confusion,
        langid_macro_f1,
    )

    docs_rows = [
        (i, t, lang, "s", len(t))
        for i, (t, lang) in enumerate([
            ("the quick brown fox and the lazy dog", "en"),
            ("the cat sat on the mat with the hat", "en"),
            ("der schnelle braune fuchs und der hund", "de"),
            ("le renard brun rapide et le chien", "fr"),
            ("el zorro marron rapido y el perro", "es"),
            ("the dog der hund le chien", "en"),
        ])
    ]
    docs = spark.createDataFrame(
        docs_rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    conf = langid_confusion(docs).collect()
    n_true = {}
    n_pred = {}
    tp = {}
    for r in conf:
        n_true[r.lang] = n_true.get(r.lang, 0) + r.n_docs
        n_pred[r.detected_lang] = (
            n_pred.get(r.detected_lang, 0) + r.n_docs
        )
        if r.lang == r.detected_lang:
            tp[r.lang] = r.n_docs
    out = {r.lang: r for r in langid_macro_f1(docs).collect()}
    macro = out.pop("__macro__")
    for lang, r in out.items():
        t, nt, np_ = tp.get(lang, 0), n_true.get(lang, 0), n_pred.get(lang, 0)
        assert (r.tp, r.n_true, r.n_pred) == (t, nt, np_), lang
        assert r.precision_ppm == (t * 1_000_000 // np_ if np_ else 0)
        assert r.recall_ppm == (t * 1_000_000 // nt if nt else 0)
        assert r.f1_ppm == (
            2 * t * 1_000_000 // (nt + np_) if nt + np_ else 0
        )
    k = len(out)
    assert macro.precision_ppm == (
        sum(r.precision_ppm for r in out.values()) // k
    )
    assert macro.f1_ppm == sum(r.f1_ppm for r in out.values()) // k
