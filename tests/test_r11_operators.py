"""Round-11 optimization pins: data-sized spread() targets and the
shared standing term-postings table (r10 verdict items #2/#3/#4)."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audience_manager_platform_spark.operators import text as T
from audience_manager_platform_spark.operators.partitioning import spread


def _n_parts(df):
    return df.rdd.getNumPartitions()


def test_spread_is_noop_on_multi_split_input(spark, tmp_path):
    """The 100 TB posture: a table whose scan already fans out at least
    defaultParallelism ways must NOT be repartitioned (the no-op guard,
    re-verified after the r11 data-sized-target change)."""
    para = spark.sparkContext.defaultParallelism
    path = str(tmp_path / "many")
    spark.range(0, 10_000).repartition(para).write.parquet(path)
    df = spark.read.parquet(path)
    assert len(df.inputFiles()) >= para
    out = spread(df)
    assert out is df  # identical handle: no repartition node was added


def test_spread_targets_data_size_not_core_count(spark, tmp_path):
    """r10 verdict #2: a tiny single-file input must get a DATA-SIZED
    task count (ceil(bytes / minBytesPerTask)), not defaultParallelism —
    the 32-way Arrow stage on a ~780 KB fixture was the round's one
    driver-measured regression."""
    path = str(tmp_path / "one")
    spark.range(0, 2_000).coalesce(1).write.parquet(path)
    df = spark.read.parquet(path)
    sz = sum(
        os.path.getsize(f.replace("file:", "")) for f in df.inputFiles()
    )
    para = spark.sparkContext.defaultParallelism
    floor = 128 << 10
    expect = min(para, max(1, -(-sz // floor)))
    out = spread(df)
    assert _n_parts(out) == expect
    assert _n_parts(out) <= para
    # a larger input still grows toward full parallelism
    big = str(tmp_path / "big")
    spark.range(0, 3_000_000).coalesce(1).write.parquet(big)
    bdf = spark.read.parquet(big)
    bsz = sum(
        os.path.getsize(f.replace("file:", "")) for f in bdf.inputFiles()
    )
    bexpect = min(para, max(1, -(-bsz // floor)))
    assert _n_parts(spread(bdf)) == bexpect
    assert bexpect > expect


def test_spread_floor_override_and_conf(spark, tmp_path):
    """Call-site floor_bytes overrides the session conf; the conf knob
    itself is honored (scale-parameterized setting, r11)."""
    path = str(tmp_path / "conf")
    spark.range(0, 2_000).coalesce(1).write.parquet(path)
    df = spark.read.parquet(path)
    sz = sum(
        os.path.getsize(f.replace("file:", "")) for f in df.inputFiles()
    )
    para = spark.sparkContext.defaultParallelism
    got = _n_parts(spread(df, floor_bytes=1))
    assert got == min(para, sz)  # 1-byte floor => old core-count target
    old = spark.conf.get("spark.amp.spread.minBytesPerTask", None)
    spark.conf.set("spark.amp.spread.minBytesPerTask", "1k")
    try:
        assert _n_parts(spread(df)) == min(para, max(1, -(-sz // 1024)))
    finally:
        if old is None:
            spark.conf.unset("spark.amp.spread.minBytesPerTask")
        else:
            spark.conf.set("spark.amp.spread.minBytesPerTask", old)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "spark join window spark aggregate"),
        (1, "window functions and join strategies in spark"),
        (2, "the quick brown fox"),
        (3, ""),  # zero-token doc: exercises the N(docs)/avgdl contract
        (4, "join join join window"),
        (5, "unrelated text about nothing in particular"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_postings_param_matches_inline_build(spark, docs):
    """Every consumer of the standing term-postings table must produce
    byte-identical output with and without it (r10 verdict #3: reuse the
    standing index tables; equivalence proven, not assumed)."""
    postings = T.term_postings(docs)

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    assert rows(T.tfidf_top_terms(docs, k=3)) == rows(
        T.tfidf_top_terms(docs, k=3, postings=postings)
    )
    assert rows(T.inverted_postings(docs, k=5, sample=3)) == rows(
        T.inverted_postings(docs, k=5, sample=3, postings=postings)
    )
    q = ["spark", "join", "window"]
    assert rows(T.bm25_topk(docs, q, k=6)) == rows(
        T.bm25_topk(docs, q, k=6, postings=postings)
    )
    assert rows(T.prf_expanded_topk(docs, q, k=6, fb_docs=2, fb_terms=2)) == rows(
        T.prf_expanded_topk(
            docs, q, k=6, fb_docs=2, fb_terms=2, postings=postings
        )
    )


def test_bm25_avgdl_counts_zero_token_docs(spark, docs):
    """avgdl = Σtf / N(all docs) — the zero-token doc must still be in
    the denominator on the postings path (it was in avg(dl) before)."""
    postings = T.term_postings(docs)
    got = T.bm25_topk(docs, ["spark"], k=6, postings=postings).collect()
    ref = T.bm25_topk(docs, ["spark"], k=6).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in ref]
