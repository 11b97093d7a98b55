#!/usr/bin/env python
"""Training-data curation walkthrough: the corpus operators composed the
way a pretraining pipeline would run them — quality gate, exact + fuzzy
dedup, decontamination, split assignment, token budgeting, packing —
ending in the per-document curation ledger and packed sequences.

Run: python examples/curation_demo.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from audience_manager_platform_spark.operators import corpus as C
from audience_manager_platform_spark.operators import dedup as D
from audience_manager_platform_spark.operators import similarity as S
from audience_manager_platform_spark.operators import text as T
from audience_manager_platform_spark.session import get_spark
from audience_manager_platform_spark.sources import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main():
    spark = get_spark("curation-demo")
    docs = load_table(spark, SF_DIR, "documents")
    emb = load_table(spark, SF_DIR, "embeddings")
    bench = docs.filter(F.col("doc_id") % 50 == 0)  # stand-in eval set

    print("== curation ledger (quality ∧ ¬dup ∧ ¬contaminated) ==")
    ledger = C.curation_ledger(docs, bench)
    ledger.groupBy("selected", "split").count().orderBy("selected", "split").show()

    print("== fuzzy dedup: MinHash-LSH pairs -> near-dup clusters ==")
    pairs = D.minhash_lsh_pairs(docs, est_threshold=0.5)
    clusters = D.cluster_canonical(docs, pairs)
    clusters.filter(~F.col("is_canonical")).show(5)

    print("== embedding near-dups at the honest 0.9 threshold ==")
    S.embedding_near_dup(S.plant_near_dups(emb), threshold=0.9).show(5)

    print("== exact-substring spans: verbatim repeats to trim (r5) ==")
    D.duplicate_ngram_spans(docs).orderBy(F.desc("dup_ratio")).show(5)

    print("== LSH dedup recall audit vs exact Jaccard (r5) ==")
    D.dedup_recall_eval(docs, threshold=0.5).show()

    print("== selected docs -> packed training sequences ==")
    keep = ledger.filter(F.col("selected")).select("doc_id")
    packed = C.pack_sequences(docs.join(keep, "doc_id"))
    packed.groupBy("shard", "bin_id").agg(
        F.count("*").alias("docs"), F.sum("n_tokens").alias("tokens")
    ).orderBy("shard", "bin_id").show(5)

    print("== BPE-budget view of the kept corpus ==")
    T.bpe_token_stats(docs.join(keep, "doc_id")).agg(
        F.sum("n_bpe_tokens").alias("total_bpe_tokens"),
        F.round(F.avg("fertility"), 4).alias("mean_fertility"),
    ).show()

    print("== learned BPE merges + corpus compression (r5) ==")
    T.bpe_train(docs.join(keep, "doc_id"), n_merges=6).show()
    T.bpe_vocab_stats(docs.join(keep, "doc_id"), n_merges=6).show()

    print("== language mixture: raw shares -> temperature-0.5 weights ==")
    C.mixture_weights(docs.join(keep, "doc_id"), "lang", alpha=0.5).orderBy(
        F.desc("n_docs")
    ).show()

    print("== quality deciles of the kept corpus (10 = best) ==")
    C.quality_bins(docs.join(keep, "doc_id")).groupBy("quality_bin").agg(
        F.count("*").alias("docs"),
        F.round(F.min("quality_score"), 4).alias("min_q"),
        F.round(F.max("quality_score"), 4).alias("max_q"),
    ).orderBy("quality_bin").show()

    print("== epoch-0 shuffle coordinates (deterministic, sharded) ==")
    C.shuffle_shards(docs.join(keep, "doc_id"), n_shards=4, salt="epoch-0").orderBy(
        "shard_id", "pos_in_shard"
    ).show(8)

    print("== filter funnel: where the corpus actually shrinks (r5 w4) ==")
    C.filter_funnel(docs).orderBy("stage").show()

    print("== DSIR importance weights toward the 'en' slice (r5 w4) ==")
    C.dsir_weights(docs).orderBy(F.desc("dsir_logw")).show(5)

    print("== per-source dup / syndication profile (r5 w4) ==")
    C.dup_rate_by_source(docs).orderBy(F.desc("dup_rate")).show(5)

    print("== context-window fill histogram of the packer (r5 w4) ==")
    C.pack_efficiency(docs.join(keep, "doc_id")).orderBy("fill_band").show()

    print("== MinHash estimator accuracy vs exact Jaccard (r5 w4) ==")
    D.minhash_accuracy(docs, est_threshold=0.5).orderBy(
        F.desc("est_jaccard")
    ).show(5)

    print("== n-gram novelty curve: is ingestion still adding info? (r5 w5) ==")
    C.ngram_novelty(docs).orderBy("bucket").show()

    print("== readability profile of the kept corpus (r5 w6) ==")
    T.readability_scores(docs.join(keep, "doc_id")).agg(
        F.round(F.avg("flesch_ease"), 2).alias("mean_flesch"),
        F.round(F.avg("fk_grade"), 2).alias("mean_fk_grade"),
    ).show()

    print("== RAKE corpus keyphrases (r5 w6) ==")
    T.rake_keywords(docs.join(keep, "doc_id"), k=10).show(truncate=False)

    print("== fuzzy benchmark contamination: src0 as held-out eval (r5 w6) ==")
    D.cross_corpus_contamination(docs, eval_source="src0").show(5)

    print("== epoch budget: who repeats past the 4-epoch knee? (r5 w7) ==")
    C.epoch_budget(docs.join(keep, "doc_id"), budget_tokens=200_000).orderBy(
        F.desc("epochs")
    ).show()


if __name__ == "__main__":
    main()
