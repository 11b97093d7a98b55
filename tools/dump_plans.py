#!/usr/bin/env python
"""Write PLANS.md: the formatted physical plans of the flagship queries
with the scale property each one is expected to exhibit — the human-
readable companion to tests/test_plans.py's machine assertions.

Usage: python tools/dump_plans.py [--sf-dir DIR]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHOWCASE = [
    (
        "rule_mixed",
        "Core segment rule: all predicates pushed to the parquet scan, ONE "
        "user_id shuffle with map-side partial aggregation.",
    ),
    (
        "tpch_q6_forecast_revenue",
        "Pushdown showcase: every filter reaches PushedFilters; scan reads "
        "only the 4 needed columns.",
    ),
    (
        "tpch_q5_local_supplier",
        "6-way join: bounded dims broadcast; fact-to-fact (lineitem-orders) "
        "shuffles on the shared order key.",
    ),
    (
        "tpch_q21_waiting_suppliers",
        "Decorrelated double-EXISTS: per-order aggregate joins back on the "
        "order key (shuffle, NOT broadcast - the aggregate is data-sized at "
        "warehouse scale).",
    ),
    (
        "analytics_trailing_rollups",
        "Single-pass conditional aggregation: one fact shuffle, no "
        "|windows|x row explosion (no Expand/Generate below the aggregate).",
    ),
    (
        "dedup_minhash_lsh_pairs",
        "Band-keyed candidate join (never all-pairs); max_band_size caps "
        "hot-band blowup; signatures computed once.",
    ),
    (
        "ann_lsh_near_pairs",
        "Bucket self-join carries only (vec_id, bucket); exact verification "
        "joins vectors back by id; shuffle_hash on bounded buckets.",
    ),
    (
        "kmeans_embedding_clusters",
        "Assignment is a SHUFFLE-FREE narrow map: the driver-side model is "
        "folded into the projection as literals (greatest() over per-"
        "centroid structs, two-stage so codegen can split the columns); "
        "the only exchange is the mean update, carrying at most K*dim "
        "doubles after partial aggregation.",
    ),
    (
        "heavy_hitters_value_bands",
        "Two-pass exact heavy hitters: O(k)-state Misra-Gries candidates per "
        "partition (ArrowEval, no shuffle), exact recount of the bounded "
        "candidate set.",
    ),
    (
        "corpus_curation_ledger",
        "Stage operators key-joined on doc_id; quality/token/split stages "
        "are pure projections folded into the probe sides.",
    ),
    (
        "dedup_semantic",
        "SemDeDup: pairwise cosine stage is an equi-join keyed on the "
        "k-means cell (cost sum(|cell|^2), never corpus^2); keep rule is "
        "one anti-join-shaped decision, no iterative closure.",
    ),
    (
        "validate_events_expectations",
        "All expectations compile to ONE aggregate scan (map-side "
        "partials); verdict rows come from stack over the 1-row summary "
        "- no second scan, no collect.",
    ),
    (
        "corpus_quality_bins",
        "Decile assignment without a global ntile sort: one exact-"
        "quantile aggregate, thresholds ride a 1-row broadcast, bin is "
        "a per-row expression.",
    ),
    (
        "ts_resample_locf",
        "Dense grid = sequence() exploded against a broadcast 1-row span "
        "(no collect, no second scan); LOCF is one window pass; two data "
        "exchanges end to end (compaction + window), grid join broadcast.",
    ),
    (
        "ann_pq_adc_topk",
        "ADC: per-query LUTs are constant arrays indexed by the code "
        "columns - candidate scoring is a narrow map (4 lookups + 3 adds "
        "per candidate); the only wide op is the final per-query top-k "
        "window.",
    ),
    (
        "pagerank_customer_supplier",
        "One equi-join + one dst-keyed aggregate per iteration (Pregel's "
        "data movement) on encoded bigint node ids; the materialized "
        "invariant (node, deg) state is the update-join carrier, so the "
        "unrolled loop is one LINEAR plan chain over two materialized "
        "leaves (r5: no per-iteration writes); AQE skew-join splits hub "
        "nodes.",
    ),
    (
        "rollup_incremental_refresh",
        "Churn-proportional maintenance: changed-day set broadcast into a "
        "semi-join (recompute) and an anti-join (carry-over); the base "
        "re-scan prunes to changed partitions on a day-partitioned table.",
    ),
    (
        "analytics_rfm_segments",
        "RFM scoring: purchases reduce to one row per user (single "
        "exchange); the anchor day and the 6 quantile thresholds ride "
        "1-row broadcasts; every score is a per-row expression after "
        "that.",
    ),
    (
        "text_bm25_topk",
        "BM25: the posting explode is FILTERED to the query's terms "
        "before aggregation — the (doc, term) shuffle carries matching "
        "postings only; N/avgdl/df are broadcasts; final top-k is "
        "TakeOrderedAndProject.",
    ),
    (
        "dedup_line_stats",
        "Line dedup: keeper election is a map-side-combinable MIN over "
        "bigint-encoded positions (hot boilerplate lines partial-"
        "aggregate before the shuffle); the join back reuses the "
        "line_text hash partitioning.",
    ),
    (
        "analytics_linear_attribution",
        "Multi-touch credit: ONE user-keyed RANGE-frame window over epoch "
        "seconds — no purchases-to-clicks self-join, so power users cost "
        "O(events), not O(purchases x clicks).",
    ),
    (
        "hybrid_search_rrf",
        "RRF fusion: both towers end in bounded top-pool results before "
        "the fusion join, which therefore touches at most 2*pool rows "
        "regardless of corpus size.",
    ),
    (
        "dedup_duplicate_spans",
        "Exact-substring dedup: positional k-gram hashes (gram strings "
        "never shuffle), map-side-combinable occurrence count, LEFT SEMI "
        "restriction with a distinct build side (hot grams cannot "
        "explode), islands merge as doc-partitioned windows.",
    ),
    (
        "skew_key_profile",
        "Shuffle-key skew diagnostics: the events collapse in a map-side-"
        "combinable per-key count FIRST; the single-partition ntile "
        "window (the documented exact-decile cost) runs over the |keys| "
        "table, never the fact rows.",
    ),
    (
        "dedup_cross_corpus",
        "Train x benchmark contamination: the band self-join is "
        "restricted to cross-side pairs, so the candidate exchange "
        "carries eval-side bands (a sliver) against colliding train "
        "bands — never the full band table squared.",
    ),
    (
        "graph_trade_communities",
        "LPA superstep chain: edges and per-level label state are "
        "materialized leaves; each superstep is one equi-join + one "
        "vote aggregate + a per-node top-1 window — the Pregel data "
        "movement with no 2^iters plan replay.",
    ),
    (
        "emb_margin_mutual_knn",
        "Margin-based bitext mining: the scored table is materialized "
        "ONCE and feeds all four downstream passes (two kNN denominators, "
        "two argmaxes) — keyed windows/aggregates over (id, id, cosine) "
        "triples; the exact bigint micro-cosine sums keep the margin "
        "order-free.",
    ),
    (
        "dedup_incremental_probe",
        "Nightly-delta LSH maintenance: delta band keys join the standing "
        "band table + each other; base-vs-base pairs never re-derived — "
        "candidate cost scales with |delta| band rows, not corpus².",
    ),
    (
        "ann_adc_rerank_topk",
        "Two-stage retrieval: the ADC scan shortlists 4k candidates per "
        "query (narrow LUT map), then the exact stage re-reads ONLY "
        "shortlist vectors via a neighbor_id-keyed join — model-scale, "
        "never corpus-scale.",
    ),
    (
        "table_bucketed_join",
        "Bucketed SMB layout: both sides written bucketBy(custkey) once; "
        "the join pairs bucket i with bucket i (zero Exchange below the "
        "join when broadcast is off — pinned in tests/test_plans.py); "
        "the rollup is the only shuffle.",
    ),
    (
        "corpus_cluster_safe_split",
        "Leakage-safe splitting: both split strategies are pure per-row "
        "hash projections (no shuffle); the straddle audit is a "
        "fingerprint-keyed aggregate — the same exchanges exact dedup "
        "already pays.",
    ),
    (
        "ann_chunk_maxsim_ivf_topk",
        "Gated late-interaction SERVING path: probe selection is a "
        "broadcast cross of |queries| x K cells; scoring is one cent_id "
        "equi-join against the prebuilt inverted lists (precomputed "
        "norms, codegen dots) touching ~n_probes/n_cells of the corpus; "
        "max-pool is a combinable struct-max aggregate; only the pooled "
        "table reaches the top-k window.",
    ),
    (
        "ann_hamming_topk",
        "Binary memory tier: the 64-bit sign-code scan does one "
        "xor+popcount per candidate (fused codegen); full vectors are "
        "re-fetched ONLY for the |queries| x shortlist re-rank join.",
    ),
    (
        "layout_compaction_plan",
        "OPTIMIZE costing step: one map-side-combinable (type, day) "
        "footprint aggregate; the bin-packing window runs over the "
        "|partitions|-row FILE-STATS table, never the raw rows — the "
        "plan's only data-sized stage is the scan.",
    ),
    (
        "validate_partition_completeness",
        "Ingest gate: per-day counts reduce map-side, the dense day grid "
        "comes from one broadcast 1-row span, and the trailing-median "
        "window rides the |days|-row table.",
    ),
    (
        "join_pit_features",
        "Feature-store PIT join: the as-of is ONE union-window pass on "
        "user_id (no per-label probe, no range explosion); the naive-join "
        "leakage audit adds exactly one more keyed shuffle.",
    ),
]


def main() -> None:
    from audience_manager_platform_spark import registry
    from audience_manager_platform_spark.session import get_spark

    sf_dir = "/root/testdata/sf0.01"
    if "--sf-dir" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf-dir") + 1]
    spark = get_spark("plans")
    queries = registry.queries()
    out = [
        "# PLANS — flagship physical plans (sf0.01, static/adaptive pre-run)",
        "",
        "Generated by `python tools/dump_plans.py`. The machine-checked",
        "versions of these properties live in `tests/test_plans.py`.",
        "",
    ]
    for name, note in SHOWCASE:
        df = queries[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("simple")
        out += [f"## {name}", "", note, "", "```", buf.getvalue().strip(), "```", ""]
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
