"""Hybrid search: reciprocal-rank fusion (RRF) of the lexical (BM25)
and semantic (exact-cosine ANN) retrieval paths.

This is the standard two-tower serving combination (Cormack et al.'s
RRF, the fusion most vector databases ship): each ranker contributes
``1 / (c + rank)`` for the documents it retrieved, and the fused
ranking is robust to the two scorers' incomparable score scales
because only RANKS cross the boundary.

Scale shape: both sub-retrievers already end in bounded top-``pool``
results (TakeOrderedAndProject / per-query windows), so the fusion
join touches at most ``2 * pool`` rows — driver-scale regardless of
corpus size. The heavy lifting stays inside the sub-operators, which
keep their own documented 100 TB postures (filtered-posting shuffle
for BM25, broadcast-query scan for cosine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import cosine_topk, cosine_topk_sql
from .text import bm25_topk, bm25_topk_sql

RRF_C = 60  # Cormack's constant; dampens the head of each ranking


def hybrid_search_rrf(
    docs: DataFrame,
    emb: DataFrame,
    query_terms: list[str],
    query_vec_id: int,
    k: int = 10,
    pool: int = 50,
    c: int = RRF_C,
) -> DataFrame:
    """Fuse BM25 top-``pool`` (over ``docs``) with exact-cosine
    top-``pool`` neighbors of ``query_vec_id`` (over ``emb``; the
    fixtures align doc_id == vec_id) and return the RRF top-``k``.

    Ranks are integers derived from already-quantized sub-scores, and
    ``1/(c + rank)`` is one IEEE division — the fused score is
    bit-identical across engines, so the oracle needs no tolerance."""
    lex = bm25_topk(docs, query_terms, k=pool).select(
        F.col("doc_id").alias("id"),
        F.row_number()
        .over(Window.orderBy(F.desc("bm25"), F.asc("doc_id")))
        .alias("rank_lex"),
    )
    sem = cosine_topk(emb, [query_vec_id], k=pool).select(
        F.col("neighbor_id").alias("id"), F.col("rank").alias("rank_sem")
    )
    contrib = lambda r: F.coalesce(  # noqa: E731
        F.lit(1.0) / (F.lit(c) + F.col(r)), F.lit(0.0)
    )
    return (
        lex.join(sem, "id", "full_outer")
        .select(
            "id",
            "rank_lex",
            "rank_sem",
            F.round(contrib("rank_lex") + contrib("rank_sem"), 6).alias("rrf"),
        )
        .orderBy(F.desc("rrf"), F.asc("id"))
        .limit(k)
    )


def hybrid_search_rrf_sql(
    query_terms: list[str],
    query_vec_id: int,
    k: int = 10,
    pool: int = 50,
    c: int = RRF_C,
    docs_src: str = "documents",
    emb_src: str = "embeddings",
) -> str:
    bm25 = bm25_topk_sql(query_terms, src=docs_src, k=pool)
    cosine = cosine_topk_sql([query_vec_id], k=pool, src=emb_src)
    return f"""
        WITH lex AS (
          SELECT doc_id AS id,
                 ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC)
                   AS rank_lex
          FROM ({bm25}) b
        ),
        sem AS (
          SELECT neighbor_id AS id, rank AS rank_sem FROM ({cosine}) s
        )
        SELECT id, rank_lex, rank_sem,
               ROUND(COALESCE(1.0 / ({c} + rank_lex), 0.0)
                     + COALESCE(1.0 / ({c} + rank_sem), 0.0), 6) AS rrf
        FROM lex FULL OUTER JOIN sem USING (id)
        ORDER BY rrf DESC, id ASC LIMIT {k}
    """
