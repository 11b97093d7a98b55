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


# --------------------------------------- late-interaction (MaxSim) search
CHUNK_ID_BASE = 1_000_000  # composite chunk id = doc_id * BASE + chunk_idx


def chunk_maxsim_topk(
    docs: DataFrame,
    query_ids: list[int],
    k: int = 5,
    chunk: int = 32,
    stride: int = 16,
    dim: int = 64,
) -> DataFrame:
    """Late-interaction retrieval (the ColBERT/long-doc serving shape):
    score a document by its BEST-MATCHING CHUNK instead of one pooled
    doc vector — max-pooling over sub-document similarities is what
    keeps a single relevant paragraph findable inside a 50-page
    document, where mean-pooled doc vectors wash it out.

    Pipeline: sliding-window chunking → hashing-trick chunk vectors (no
    trained encoder needed; swap :func:`~.text.hash_embed` for a real
    encoder output table at parity) → broadcast the query tower →
    cosine per (query, chunk) → per (query, doc) max-pool with the best
    chunk recorded → top-``k`` docs per query.

    Shape at scale: the query tower is O(|queries|·dim) and broadcast;
    chunk scoring is a map-side projection over the chunk-vector
    relation (no shuffle); max-pooling is ONE map-side-combinable
    aggregate keyed (query, doc) — an argmax via struct-max, never a
    window over the scored relation; only the |queries|×|docs| pooled
    table reaches the top-k window. Cosines are exact-integer dots in
    double (hash_embed weights are integers), 6dp-rounded before any
    ordering so ranks are engine-identical.
    """
    from .text import chunk_tokens, hash_embed
    from ..functions import cosine_similarity

    chunks = chunk_tokens(docs, chunk, stride).filter(
        F.col("chunk_tokens") > 0
    )
    cvec = hash_embed(
        chunks.select(
            (F.col("doc_id") * CHUNK_ID_BASE + F.col("chunk_idx")).alias(
                "doc_id"
            ),
            F.col("chunk_text").alias("text"),
        ),
        dim,
    ).select(
        F.expr(f"vec_id div {CHUNK_ID_BASE}").alias("doc_id"),
        (F.col("vec_id") % CHUNK_ID_BASE).alias("chunk_idx"),
        F.col("embedding").alias("cv"),
    )
    qvec = hash_embed(
        docs.filter(F.col("doc_id").isin(query_ids)), dim
    ).select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    norm2 = lambda c: F.aggregate(  # noqa: E731
        c, F.lit(0.0), lambda a, x: a + x * x
    )
    # norms computed ONCE per side (the generic cosine_similarity would
    # re-derive the chunk norm per query and the filter re-derived it
    # again: 6 HOF passes per chunk at 5 queries; now 1)
    cvec_n = cvec.select(
        "doc_id", "chunk_idx", "cv", F.sqrt(norm2(F.col("cv"))).alias("cn")
    ).filter(F.col("cn") > 0)
    qvec_n = qvec.select(
        "query_id", "qv", F.sqrt(norm2(F.col("qv"))).alias("qn")
    ).filter(F.col("qn") > 0)
    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("cv"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = (
        cvec_n.crossJoin(F.broadcast(qvec_n))
        .filter(F.col("doc_id") != F.col("query_id"))
        .select(
            "query_id",
            "doc_id",
            "chunk_idx",
            F.round(dot / (F.col("qn") * F.col("cn")), 6).alias("cos"),
        )
    )
    pooled = scored.groupBy("query_id", "doc_id").agg(
        F.max(F.struct(F.col("cos"), (-F.col("chunk_idx")).alias("nci"))).alias(
            "best"
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("maxsim"), F.asc("doc_id")
    )
    return (
        pooled.select(
            "query_id",
            "doc_id",
            F.col("best.cos").alias("maxsim"),
            (-F.col("best.nci")).cast("bigint").alias("best_chunk_idx"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def chunk_maxsim_topk_sql(
    query_ids: list[int],
    k: int = 5,
    chunk: int = 32,
    stride: int = 16,
    dim: int = 64,
    src: str = "documents",
) -> str:
    from .text import chunk_tokens_sql, hash_embed_sql

    ids = ", ".join(str(i) for i in query_ids)
    chunks_rel = (
        f"(SELECT doc_id * {CHUNK_ID_BASE} + chunk_idx AS doc_id, "
        f"chunk_text AS text FROM ({chunk_tokens_sql(src, chunk, stride)}) ck "
        "WHERE chunk_tokens > 0) cr"
    )
    queries_rel = f"(SELECT * FROM {src} WHERE doc_id IN ({ids})) qr"
    return f"""
        WITH cemb AS ({hash_embed_sql(chunks_rel, dim)}),
        cvec AS (
          SELECT vec_id // {CHUNK_ID_BASE} AS doc_id,
                 vec_id % {CHUNK_ID_BASE} AS chunk_idx,
                 embedding AS cv
          FROM cemb
          WHERE list_sum(list_transform(embedding, x -> x * x)) > 0
        ),
        qvec AS (
          SELECT vec_id AS query_id, embedding AS qv
          FROM ({hash_embed_sql(queries_rel, dim)}) qe
          WHERE list_sum(list_transform(embedding, x -> x * x)) > 0
        ),
        scored AS MATERIALIZED (
          SELECT query_id, doc_id, chunk_idx,
                 ROUND(list_cosine_similarity(qv, cv), 6) AS cos
          FROM cvec CROSS JOIN qvec
          WHERE doc_id != query_id
        ),
        pooledmax AS (
          SELECT query_id, doc_id, MAX(cos) AS maxsim
          FROM scored GROUP BY 1, 2
        ),
        pooled AS (
          SELECT s.query_id, s.doc_id, p.maxsim,
                 MIN(s.chunk_idx) AS best_chunk_idx
          FROM scored s
          JOIN pooledmax p
            ON s.query_id = p.query_id AND s.doc_id = p.doc_id
           AND s.cos = p.maxsim
          GROUP BY 1, 2, 3
        )
        SELECT query_id, doc_id, maxsim,
               CAST(best_chunk_idx AS BIGINT) AS best_chunk_idx, rank
        FROM (
          SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY maxsim DESC, doc_id ASC) AS rank
          FROM pooled
        ) r WHERE rank <= {k}
    """
