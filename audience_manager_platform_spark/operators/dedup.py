"""Deduplication operators for large-scale corpus curation
(BASELINE.json north star: exact, MinHash+LSH, SimHash, n-gram Jaccard).

Scale posture (100 TB):

- everything is expressed as explode → shuffle-on-key → aggregate; no
  driver-side state, no O(n²) all-pairs step. Candidate generation always
  goes through a key join (shared fingerprint / n-gram / band / bucket),
  so cost is proportional to colliding pairs, not all pairs.
- hash functions are md5-derived 60-bit ints (portable across engines —
  :func:`..functions.stable_long_hash`), so every operator here has an
  exact DuckDB oracle: same constants, same arithmetic, same results.
- hot n-grams (stop-gram skew) can be capped with ``max_gram_df`` — the
  classic skew guard when a gram appears in half the corpus.

Each Spark builder has a twin ``*_sql`` renderer generating the oracle
from the same constants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import HASH60_DUCK_SQL as _HASH60_DUCK
from ..functions import HASH60_SPARK_SQL as _HASH60_SPARK
from .partitioning import materialize, spread
from .text import tokens_col, tokens_sql, word_ngrams_col, word_ngrams_sql

# MinHash constants — shared verbatim by the Spark plan and the SQL oracle.
MINHASH_P = 2_147_483_647  # 2^31 - 1 (Mersenne prime)
NUM_HASHES = 16
BANDS = 4  # 4 bands x 4 rows
ROWS_PER_BAND = NUM_HASHES // BANDS


def _lcg(seed: int) -> int:
    # deterministic parameter generator (no RNG dependency)
    return (seed * 6_364_136_223_846_793_005 + 1_442_695_040_888_963_407) % (2**63)


MINHASH_A = [(_lcg(i * 2 + 1) % (MINHASH_P - 1)) + 1 for i in range(NUM_HASHES)]
MINHASH_B = [_lcg(i * 2 + 2) % MINHASH_P for i in range(NUM_HASHES)]

NGRAM_N = 3


# ------------------------------------------------------------ exact dedup
def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact (normalized) dedup: md5 fingerprint of token-normalized text,
    canonical row = min doc_id per fingerprint. One shuffle on the
    fingerprint — the hash-groupBy pattern. Emits every doc with its
    canonical id so downstream can either filter survivors
    (``is_duplicate = false``) or build a dup-group report."""
    norm = F.array_join(tokens_col("text"), " ")
    fp = docs.select("doc_id", F.md5(norm).alias("fingerprint"))
    w = Window.partitionBy("fingerprint")
    return fp.select(
        "doc_id",
        "fingerprint",
        F.min("doc_id").over(w).alias("canonical_id"),
        (F.col("doc_id") != F.min("doc_id").over(w)).alias("is_duplicate"),
    )


def exact_dedup_sql(src: str = "documents") -> str:
    t = tokens_sql("text")
    return f"""
        SELECT doc_id, fingerprint,
               MIN(doc_id) OVER (PARTITION BY fingerprint) AS canonical_id,
               doc_id != MIN(doc_id) OVER (PARTITION BY fingerprint) AS is_duplicate
        FROM (SELECT doc_id, md5(array_to_string({t}, ' ')) AS fingerprint
              FROM {src}) s
    """


# ----------------------------------------------------- n-gram jaccard
def _doc_grams(docs: DataFrame, n: int = NGRAM_N) -> DataFrame:
    """Tokenize ONCE into a real column before building n-grams: inlining
    the tokenizer inside the transform() lambda would re-run the regex
    split per gram position (O(tokens²) per doc — measured 30x slower).
    ``spread`` fans a single small input file across all cores but skips
    the shuffle when the scan is already multi-split."""
    toked = spread(docs).select("doc_id", tokens_col("text").alias("toks"))
    # MLlib's NGram transformer is JVM-compiled and ~3x faster than the
    # equivalent interpreted transform()+slice() higher-order expression;
    # output is identical (space-joined n-grams, empty for short docs)
    from pyspark.ml.feature import NGram

    grams = NGram(n=n, inputCol="toks", outputCol="grams").transform(toked)
    return grams.select(
        "doc_id", F.array_distinct("grams").alias("grams")
    ).select("doc_id", "grams", F.size("grams").alias("n_grams"))


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.6,
    n: int = NGRAM_N,
    max_gram_df: int | None = None,
) -> DataFrame:
    """Near-dup pairs by exact n-gram Jaccard, candidate-generated through
    a shared-gram equi-join (never an all-pairs cross join):

    explode grams → (gram, doc) ⋈ (gram, doc) on gram with doc_a < doc_b
    → count shared grams per pair → |A∩B| / (|A|+|B|-|A∩B|) >= threshold.

    ``max_gram_df`` drops grams occurring in more than that many docs
    (stop-gram skew guard). The Jaccard is then the TRUE Jaccard of the
    surviving gram sets: per-doc sizes are recomputed after the filter,
    so dropping a shared stop-gram shrinks numerator and denominator
    together instead of biasing the score low.

    The exploded gram table feeds both sides of the self-join, and
    Catalyst's exchange reuse does NOT fire across the differently-
    aliased branches (measured: the tokenize/gram map side ran twice,
    15.1 s vs 6.4 s at sf0.1) — so the table is
    :func:`~.partitioning.materialize`'d once, the same remedy the LSH
    bucket table uses. At warehouse scale the gram table would be a
    materialized artifact reused across dedup runs anyway; nothing stays
    in the block manager after the action."""
    grams = _doc_grams(docs, n)
    exploded = materialize(
        grams.select("doc_id", "n_grams", F.explode("grams").alias("gram"))
    )
    if max_gram_df is not None:
        df_counts = exploded.groupBy("gram").agg(F.count("*").alias("gram_df"))
        # the filtered table feeds the sizes aggregate AND both join
        # sides: materialize it too (8.3 s → 1.8 s at sf0.1)
        kept = materialize(
            exploded.join(
                df_counts.filter(F.col("gram_df") <= max_gram_df).select("gram"),
                "gram",
            ).drop("n_grams")
        )
        # true Jaccard over surviving grams: recompute the denominators
        # (grams are distinct per doc, so COUNT(*) is the set size)
        sizes = kept.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
        exploded = kept.join(sizes, "doc_id")
    a = exploded.select(
        F.col("doc_id").alias("doc_a"), F.col("n_grams").alias("na"), "gram"
    )
    b = exploded.select(
        F.col("doc_id").alias("doc_b"), F.col("n_grams").alias("nb"), "gram"
    )
    shared = (
        a.join(b, "gram")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.count("*").alias("inter"))
    )
    return (
        shared.withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.col("na") + F.col("nb") - F.col("inter")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def ngram_jaccard_pairs_sql(
    src: str = "documents",
    threshold: float = 0.6,
    n: int = NGRAM_N,
    max_gram_df: int | None = None,
) -> str:
    t = tokens_sql("text")
    g = word_ngrams_sql("toks", n)
    if max_gram_df is not None:
        cap = f"""
        raw AS (SELECT doc_id, UNNEST(grams) AS gram FROM grams),
        df_c AS (SELECT gram, COUNT(*) AS gram_df FROM raw GROUP BY gram),
        kept AS (SELECT raw.doc_id, raw.gram FROM raw
                 JOIN df_c USING (gram) WHERE gram_df <= {max_gram_df}),
        sized AS (SELECT doc_id, COUNT(*) AS n_grams FROM kept GROUP BY doc_id),
        ex AS (SELECT kept.doc_id, sized.n_grams, kept.gram
               FROM kept JOIN sized USING (doc_id)),"""
    else:
        cap = """
        sized AS (SELECT doc_id, grams, len(grams) AS n_grams FROM grams),
        ex AS (SELECT doc_id, n_grams, UNNEST(grams) AS gram FROM sized),"""
    return f"""
        WITH toks AS (SELECT doc_id, {t} AS toks FROM {src}),
        grams AS (SELECT doc_id, list_distinct({g}) AS grams FROM toks),
        {cap}
        shared AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 a.n_grams AS na, b.n_grams AS nb, COUNT(*) AS inter
          FROM ex a JOIN ex b ON a.gram = b.gram AND a.doc_id < b.doc_id
          GROUP BY 1, 2, 3, 4
        )
        SELECT doc_a, doc_b,
               ROUND(inter / CAST(na + nb - inter AS DOUBLE), 6) AS jaccard
        FROM shared
        WHERE ROUND(inter / CAST(na + nb - inter AS DOUBLE), 6) >= {threshold}
    """


# ------------------------------------------------- n-gram containment
def ngram_containment_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    n: int = NGRAM_N,
    max_gram_df: int | None = None,
) -> DataFrame:
    """Asymmetric near-dup detection by n-gram CONTAINMENT
    |A∩B| / |A| ≥ threshold: catches a small doc swallowed by a larger
    one (quote pages, article + boilerplate wrapper), which symmetric
    Jaccard misses because the union denominator dilutes the overlap.
    The standard companion to Jaccard in corpus curation (cf. Broder's
    resemblance/containment pair).

    Same scale shape as :func:`ngram_jaccard_pairs` — candidates come
    from the shared-gram equi-join, never all-pairs — but pairs are
    emitted DIRECTED (doc_a ≠ doc_b, containment measured of doc_a in
    doc_b), so one shared-gram aggregate feeds both directions.
    ``max_gram_df`` is the same stop-gram skew cap, with sizes
    recomputed so the score is the true containment of surviving sets.
    """
    grams = _doc_grams(docs, n)
    exploded = materialize(
        grams.select("doc_id", "n_grams", F.explode("grams").alias("gram"))
    )  # feeds both join sides + the sizes: one derivation (see jaccard)
    if max_gram_df is not None:
        df_counts = exploded.groupBy("gram").agg(F.count("*").alias("gram_df"))
        kept = materialize(
            exploded.join(
                df_counts.filter(F.col("gram_df") <= max_gram_df).select("gram"),
                "gram",
            ).drop("n_grams")
        )  # feeds sizes + both join sides (see jaccard)
        sizes = kept.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
        exploded = kept.join(sizes, "doc_id")
    a = exploded.select(
        F.col("doc_id").alias("doc_a"), F.col("n_grams").alias("na"), "gram"
    )
    b = exploded.select(F.col("doc_id").alias("doc_b"), "gram")
    shared = (
        a.join(b, "gram")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "na")
        .agg(F.count("*").alias("inter"))
    )
    return (
        shared.withColumn(
            "containment",
            F.round(F.col("inter") / F.col("na").cast("double"), 6),
        )
        .filter(F.col("containment") >= threshold)
        .select("doc_a", "doc_b", "containment")
    )


def ngram_containment_pairs_sql(
    src: str = "documents",
    threshold: float = 0.8,
    n: int = NGRAM_N,
    max_gram_df: int | None = None,
) -> str:
    t = tokens_sql("text")
    g = word_ngrams_sql("toks", n)
    if max_gram_df is not None:
        cap = f"""
        raw AS (SELECT doc_id, UNNEST(grams) AS gram FROM grams),
        df_c AS (SELECT gram, COUNT(*) AS gram_df FROM raw GROUP BY gram),
        kept AS (SELECT raw.doc_id, raw.gram FROM raw
                 JOIN df_c USING (gram) WHERE gram_df <= {max_gram_df}),
        sized AS (SELECT doc_id, COUNT(*) AS n_grams FROM kept GROUP BY doc_id),
        ex AS (SELECT kept.doc_id, sized.n_grams, kept.gram
               FROM kept JOIN sized USING (doc_id)),"""
    else:
        cap = """
        sized AS (SELECT doc_id, grams, len(grams) AS n_grams FROM grams),
        ex AS (SELECT doc_id, n_grams, UNNEST(grams) AS gram FROM sized),"""
    return f"""
        WITH toks AS (SELECT doc_id, {t} AS toks FROM {src}),
        grams AS (SELECT doc_id, list_distinct({g}) AS grams FROM toks),
        {cap}
        shared AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 a.n_grams AS na, COUNT(*) AS inter
          FROM ex a JOIN ex b ON a.gram = b.gram AND a.doc_id != b.doc_id
          GROUP BY 1, 2, 3
        )
        SELECT doc_a, doc_b,
               ROUND(inter / CAST(na AS DOUBLE), 6) AS containment
        FROM shared
        WHERE ROUND(inter / CAST(na AS DOUBLE), 6) >= {threshold}
    """


# ------------------------------------------------------------- minhash
def minhash_signatures(docs: DataFrame, n: int = NGRAM_N) -> DataFrame:
    """Per-doc MinHash signature: NUM_HASHES universal-hash minima over the
    doc's n-gram set. Shape: explode → project k hash columns → one
    hash-aggregate with k ``min``s (all codegen'd; no UDF)."""
    grams = _doc_grams(docs, n)
    h = F.expr(_HASH60_SPARK.format(x="gram")) % MINHASH_P
    exploded = grams.select("doc_id", F.explode("grams").alias("gram")).select(
        "doc_id", h.alias("h")
    )
    mins = [
        F.min((F.lit(MINHASH_A[i]) * F.col("h") + F.lit(MINHASH_B[i])) % MINHASH_P).alias(
            f"s{i}"
        )
        for i in range(NUM_HASHES)
    ]
    return exploded.groupBy("doc_id").agg(*mins)


def minhash_signatures_sql(src: str = "documents", n: int = NGRAM_N) -> str:
    t = tokens_sql("text")
    g = word_ngrams_sql("toks", n)
    hh = _HASH60_DUCK.format(x="gram")
    mins = ",\n               ".join(
        f"MIN(({MINHASH_A[i]} * h + {MINHASH_B[i]}) % {MINHASH_P}) AS s{i}"
        for i in range(NUM_HASHES)
    )
    return f"""
        WITH toks AS (SELECT doc_id, {t} AS toks FROM {src}),
        grams AS (SELECT doc_id, list_distinct({g}) AS grams FROM toks),
        ex AS (SELECT doc_id, UNNEST(grams) AS gram FROM grams),
        hashed AS (SELECT doc_id, {hh} % {MINHASH_P} AS h FROM ex)
        SELECT doc_id,
               {mins}
        FROM hashed GROUP BY doc_id
    """


def minhash_lsh_pairs(
    docs: DataFrame,
    est_threshold: float = 0.5,
    n: int = NGRAM_N,
    max_band_size: int | None = None,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """MinHash + LSH banding: signatures → band keys (md5 of each band's
    values) → candidate pairs = docs sharing any band key → estimated
    Jaccard = fraction of matching signature positions >= threshold.

    The band join is the scale path: only docs colliding in a band are
    ever paired, so the shuffle is keyed on band values, not doc count².

    ``max_band_size`` is the hot-band skew guard: a cluster of k
    identical documents (boilerplate pages, licence headers) puts all k
    in ONE band bucket and the self-join emits k²/2 candidates from a
    single task. Capping the bucket drops bands with more than
    ``max_band_size`` members before the join — candidate cost becomes
    O(Σ min(k, cap)²) with the documented recall trade: members of a
    dropped band still pair wherever they collide in an uncapped band,
    and a mega-cluster is better handled by exact dedup first (its
    members are identical or near-identical by construction).

    The signature table feeds three plan branches (banding + both sides
    of the pair join); exchange reuse does NOT fire across the aliased
    branches (measured: 7.2 s → 2.8 s at sf0.1 once checkpointed), so
    the NUM_HASHES-int-per-doc table is
    :func:`~.partitioning.materialize`'d once — at warehouse scale
    signatures would be a materialized table reused across dedup runs
    anyway; nothing stays in the block manager after the action.
    """
    if sigs is None:
        sigs = materialize(minhash_signatures(docs, n))
    bands_long = bands_of(sigs)
    if max_band_size is not None:
        small_bands = (
            bands_long.groupBy("band_key")
            .agg(F.count("*").alias("band_n"))
            .filter(F.col("band_n") <= max_band_size)
            .select("band_key")
        )
        bands_long = bands_long.join(small_bands, "band_key")
    cand = (
        bands_long.alias("x")
        .join(bands_long.alias("y"), "band_key")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )
    return score_candidates(cand, sigs, est_threshold)


def bands_of(sigs: DataFrame) -> DataFrame:
    """(doc_id, band_key) — the LSH band table of a signature table
    (md5 of each band's ROWS_PER_BAND signature values). Shared by the
    batch pair join and the incremental streaming detector."""
    band_cols = []
    for b in range(BANDS):
        parts = [f"s{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)]
        band_cols.append(
            F.md5(F.concat_ws(",", *[F.col(p).cast("string") for p in parts])).alias(
                f"band{b}"
            )
        )
    return sigs.select("doc_id", *band_cols).select(
        "doc_id",
        F.explode(
            F.array(*[F.col(f"band{b}") for b in range(BANDS)])
        ).alias("band_key"),
    )


def score_candidates(
    cand: DataFrame, sigs: DataFrame, est_threshold: float
) -> DataFrame:
    """Score (doc_a, doc_b) candidates with the estimated Jaccard
    (matching signature-position fraction), keeping >= threshold."""
    sa = sigs.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"s{i}").alias(f"a{i}") for i in range(NUM_HASHES)],
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"s{i}").alias(f"b{i}") for i in range(NUM_HASHES)],
    )
    matches = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(NUM_HASHES)
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(matches / F.lit(float(NUM_HASHES)), 6).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= est_threshold)
    )


def minhash_lsh_pairs_sql(
    src: str = "documents",
    est_threshold: float = 0.5,
    n: int = NGRAM_N,
    max_band_size: int | None = None,
) -> str:
    """SQL twin of :func:`minhash_lsh_pairs`, including the
    ``max_band_size`` hot-band guard so the oracle certifies the SAME
    (capped) plan the Spark path runs — an uncapped oracle would leave
    the skew guard uncertified on the driver-visible query."""
    sig_sql = minhash_signatures_sql(src, n)
    band_exprs = ", ".join(
        "md5(concat_ws(',', "
        + ", ".join(
            f"CAST(s{b * ROWS_PER_BAND + r} AS VARCHAR)" for r in range(ROWS_PER_BAND)
        )
        + f")) AS band{b}"
        for b in range(BANDS)
    )
    band_list = ", ".join(f"band{b}" for b in range(BANDS))
    match_expr = " + ".join(
        f"CASE WHEN sa.s{i} = sb.s{i} THEN 1 ELSE 0 END" for i in range(NUM_HASHES)
    )
    if max_band_size is not None:
        band_filter = f"""
        kept AS (
          SELECT band_key FROM bands_long
          GROUP BY band_key HAVING COUNT(*) <= {int(max_band_size)}
        ),
        bands_kept AS (
          SELECT bl.doc_id, bl.band_key
          FROM bands_long bl JOIN kept k ON bl.band_key = k.band_key
        ),"""
        cand_src = "bands_kept"
    else:
        band_filter = ""
        cand_src = "bands_long"
    return f"""
        WITH sigs AS ({sig_sql}),
        banded AS (SELECT doc_id, {band_exprs} FROM sigs),
        bands_long AS (
          SELECT doc_id, UNNEST([{band_list}]) AS band_key FROM banded
        ),{band_filter}
        cand AS (
          SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
          FROM {cand_src} x JOIN {cand_src} y
            ON x.band_key = y.band_key AND x.doc_id < y.doc_id
        )
        SELECT cand.doc_a, cand.doc_b,
               ROUND(({match_expr}) / {float(NUM_HASHES)}, 6) AS est_jaccard
        FROM cand
        JOIN sigs sa ON sa.doc_id = cand.doc_a
        JOIN sigs sb ON sb.doc_id = cand.doc_b
        WHERE ROUND(({match_expr}) / {float(NUM_HASHES)}, 6) >= {est_threshold}
    """


# ------------------------------------------------------------- simhash
SIMHASH_BITS = 60  # md5-derived hashes are 60-bit -> all bits well-defined


def simhash(docs: DataFrame) -> DataFrame:
    """60-bit SimHash over token multisets: each token votes ±1 on every
    bit of its 60-bit hash; the fingerprint sets bit j iff the vote sum is
    positive. Explode → 60 conditional sums in ONE aggregate (codegen'd)
    → recombine. Near-dup docs differ in a few bits (hamming distance)."""
    h = F.expr(_HASH60_SPARK.format(x="tok"))
    exploded = (
        spread(docs)
        .select("doc_id", F.explode(tokens_col("text")).alias("tok"))
        .select("doc_id", h.alias("h"))
    )
    votes = [
        F.sum(
            F.when(F.expr(f"(shiftright(h, {j}) & 1) = 1"), 1).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(SIMHASH_BITS)
    ]
    agg = exploded.groupBy("doc_id").agg(*votes)
    fingerprint = sum(
        F.when(F.col(f"v{j}") > 0, F.lit(2**j).cast("long")).otherwise(F.lit(0).cast("long"))
        for j in range(SIMHASH_BITS)
    )
    return agg.select("doc_id", fingerprint.alias("simhash"))


def simhash_sql(src: str = "documents") -> str:
    t = tokens_sql("text")
    hh = _HASH60_DUCK.format(x="tok")
    votes = ",\n               ".join(
        f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j in range(SIMHASH_BITS)
    )
    fp = " + ".join(
        f"CASE WHEN v{j} > 0 THEN CAST({2**j} AS BIGINT) ELSE 0 END"
        for j in range(SIMHASH_BITS)
    )
    return f"""
        WITH ex AS (
          SELECT doc_id, UNNEST({t}) AS tok FROM {src}
        ),
        hashed AS (SELECT doc_id, {hh} AS h FROM ex),
        votes AS (
          SELECT doc_id,
               {votes}
          FROM hashed GROUP BY doc_id
        )
        SELECT doc_id, {fp} AS simhash FROM votes
    """


# ---------------------------------------------- simhash hamming pairs
SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS  # 15


def simhash_hamming_pairs(
    docs: DataFrame, max_hamming: int = 3
) -> DataFrame:
    """Near-dup PAIRS from SimHash fingerprints: docs whose 60-bit
    fingerprints differ in at most ``max_hamming`` bits. Candidate
    generation is banded exactly like MinHash-LSH — the fingerprint is
    split into 4 disjoint 15-bit bands and only docs agreeing on AT
    LEAST ONE whole band are ever compared, so the join is keyed on
    (band_idx, band_value), never all-pairs. Pigeonhole gives perfect
    recall for max_hamming ≤ 3: 3 flipped bits cannot touch all 4
    bands. The survivor check is exact: bit_count(a XOR b) ≤ k.

    This is the Google web-crawl dedup layout (Manku et al., "Detecting
    Near-Duplicates for Web Crawling", WWW'07): fingerprint table sorted
    by rotated prefixes ≈ our band-keyed shuffle.

    The fingerprint table feeds both sides of the band self-join;
    exchange reuse does not fire across the aliased branches, so the
    (doc_id, simhash) table — two ints per doc — is
    :func:`~.partitioning.materialize`'d once (measured 14.9 s → 2.6 s
    end-to-end at sf0.1; the bit-vote fingerprint computation is the
    expensive map side)."""
    fps = materialize(simhash(docs))
    bands = fps.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.expr(
                            f"shiftright(simhash, {b * SIMHASH_BAND_BITS}) "
                            f"& {(1 << SIMHASH_BAND_BITS) - 1}"
                        ).alias("band_val"),
                    )
                    for b in range(SIMHASH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", "bk.band_idx", "bk.band_val")
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), ["band_idx", "band_val"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("x.simhash").alias("ha"),
            F.col("y.simhash").alias("hb"),
        )
        .distinct()
    )
    return cand.select(
        "doc_a",
        "doc_b",
        F.expr("bit_count(ha ^ hb)").cast("int").alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)


def simhash_hamming_pairs_sql(
    src: str = "documents", max_hamming: int = 3
) -> str:
    fp_sql = simhash_sql(src)
    band_structs = ", ".join(
        f"(({b}, (simhash >> {b * SIMHASH_BAND_BITS}) "
        f"& {(1 << SIMHASH_BAND_BITS) - 1}))"
        for b in range(SIMHASH_BANDS)
    )
    return f"""
        WITH fps AS ({fp_sql}),
        bands AS (
          SELECT doc_id, simhash,
                 UNNEST([{band_structs}]) AS bk
          FROM fps
        ),
        keyed AS (
          SELECT doc_id, simhash,
                 bk[1] AS band_idx, bk[2] AS band_val
          FROM bands
        ),
        cand AS (
          SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
                 x.simhash AS ha, y.simhash AS hb
          FROM keyed x JOIN keyed y
            ON x.band_idx = y.band_idx AND x.band_val = y.band_val
           AND x.doc_id < y.doc_id
        )
        SELECT doc_a, doc_b,
               CAST(bit_count(xor(ha, hb)) AS INTEGER) AS hamming
        FROM cand
        WHERE bit_count(xor(ha, hb)) <= {max_hamming}
    """


# ----------------------------------------------- connected components
def connected_components(
    pairs: DataFrame,
    nodes: DataFrame,
    max_iter: int = 50,
) -> DataFrame:
    """Connected components over a candidate-pair graph: every node gets
    ``cluster_id`` = the minimum node id reachable through pair edges.
    This is the top of a real dedup funnel — LSH/Jaccard emit PAIRS, but
    retention decisions need GROUPS (a 40-way near-dup cluster is one
    keep + 39 drops, not 780 independent pair decisions).

    Algorithm: iterative min-label propagation (the MapReduce CC
    classic — cf. Kiveris et al., "Connected Components in MapReduce and
    Beyond"). Each round every node takes the min label among itself and
    its neighbours:

        msgs      = edges ⋈ labels (on src)  → per-dst min incoming label
        labels'   = labels left ⋈ msgs       → least(own, incoming)

    and the loop stops when no label changed. Rounds = graph diameter;
    dedup graphs are unions of small near-clique clusters (diameter 1-3),
    so this converges in a handful of shuffles even at corpus scale. For
    adversarially long chains the large-star/small-star variant halves
    the diameter per round; not needed for near-dup graphs.

    Scale posture: per round ONE shuffle keyed on node id over a labels
    table of |V(edges)| rows — only nodes that appear in a candidate
    pair; the (vastly larger) isolated remainder of the corpus never
    enters the loop and is stitched back after convergence.
    ``pairs`` is consumed through a persisted edge list so candidate
    generation (the expensive LSH join) runs exactly once, not once per
    round; it is unpersisted before returning. Each round's labels go
    through :func:`..operators.partitioning.materialize` (temp parquet)
    — lineage is truncated so round N's plan doesn't replay rounds
    1..N-1, and nothing is pinned in the block manager, so a long-lived
    session stays cache-clean (audited by
    ``tests/test_textops.py::test_connected_components_cache_clean``).

    The reference has no grouping stage at all — its dedup story stops at
    segment set-algebra (SURVEY.md §2.4); this is part of the corpus-
    curation extension mandated by BASELINE.json.
    """
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .persist()
    )
    # propagate over EDGE-ENDPOINT nodes only: in a dedup graph the vast
    # majority of the corpus is isolated (no candidate pair) and an
    # isolated node's label never changes — iterating it is pure waste.
    # The labels table is |V(edges)|, not |corpus|; isolated docs are
    # stitched back with cluster_id = own id after convergence. (edges
    # carries both directions, so src alone covers every endpoint.)
    # Seed = the identity labelling ALREADY PROPAGATED ONCE: label(v) =
    # min(v, min incoming neighbour). This is exactly what round 0 of
    # the loop produced from the identity seed (msgs over identity
    # labels = min incoming src), computed as ONE join-free aggregate —
    # the identity-seed materialize plus a full join round are gone
    # (r10 optimization; symmetric edges, so dst covers every endpoint).
    labels = materialize(
        edges.groupBy(F.col("dst").alias("id"))
        .agg(F.min("src").alias("_m"))
        .select(
            "id", F.least(F.col("id"), F.col("_m")).alias("cluster_id")
        )
    )
    try:
        for _ in range(max_iter):
            msgs = (
                edges.join(labels, edges.src == labels.id)
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min("cluster_id").alias("incoming"))
            )
            updated = labels.join(msgs, "id", "left").select(
                "id",
                F.least(
                    F.col("cluster_id"), F.coalesce("incoming", "cluster_id")
                ).alias("cluster_id"),
                (
                    F.col("incoming").isNotNull()
                    & (F.col("incoming") < F.col("cluster_id"))
                ).alias("changed"),
            )
            # convergence metric rides the materialize WRITE job itself
            # (Dataset.observe): the former separate `filter(changed)
            # .count()` re-read doubled the job count of every round —
            # at fixture scale each round is fixed-overhead-dominated,
            # so this halves the loop's wall-clock (r10 optimization)
            from pyspark.sql import Observation

            obs = Observation()
            updated = materialize(
                updated.observe(
                    obs,
                    F.sum(F.col("changed").cast("long")).alias("n_changed"),
                )
            )
            n_changed = obs.get["n_changed"] or 0
            labels = updated.drop("changed")
            if n_changed == 0:
                break
        else:
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} rounds"
            )
    finally:
        edges.unpersist()
    return nodes.select(F.col("doc_id")).join(
        labels.withColumnRenamed("id", "doc_id"), "doc_id", "left"
    ).select(
        "doc_id", F.coalesce("cluster_id", "doc_id").alias("cluster_id")
    )


def cluster_canonical(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Cluster-level dedup decision: group docs into near-dup components
    and keep one canonical representative per component (the min doc_id —
    deterministic and join-free; a quality-score argmax would slot in the
    same shape). Docs in no pair are their own singleton cluster and are
    always kept."""
    comp = connected_components(pairs, docs.select("doc_id"))
    return comp.select(
        "doc_id",
        "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical"),
    )


def cluster_canonical_sql(
    src: str = "documents",
    est_threshold: float = 0.5,
    n: int = NGRAM_N,
    max_band_size: int | None = None,
) -> str:
    """Oracle: transitive closure by recursive CTE over the SAME LSH pair
    SQL, min reachable id per node. Exponential-closure-safe at fixture
    scale (closure rows = Σ component²)."""
    pairs_sql = minhash_lsh_pairs_sql(src, est_threshold, n, max_band_size)
    return f"""
        WITH RECURSIVE pairs AS ({pairs_sql}),
        edges AS (
          SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION
          SELECT doc_b, doc_a FROM pairs
        ),
        reach(id, seen) AS (
          SELECT doc_id, doc_id FROM {src}
          UNION
          SELECT r.id, e.dst FROM reach r JOIN edges e ON r.seen = e.src
        ),
        comp AS (SELECT id AS doc_id, MIN(seen) AS cluster_id FROM reach GROUP BY id)
        SELECT doc_id, cluster_id, doc_id = cluster_id AS is_canonical FROM comp
    """


# ----------------------------------------------------- line-level dedup
LINE_TOKENS = 16


def line_dedup_stats(docs: DataFrame, line_tokens: int = LINE_TOKENS) -> DataFrame:
    """Line-level (sub-document) dedup, the C4/RefinedWeb curation rule:
    repeated lines — navigation chrome, licence headers, boilerplate —
    are removed from every document EXCEPT their first occurrence, even
    when the documents as wholes are unique. The fixtures carry no
    newline structure, so "lines" are consecutive non-overlapping
    ``line_tokens``-token windows (the :func:`~.text.chunk_tokens` shape
    with stride = chunk).

    The keeper of each repeated line is the corpus-wide minimum
    (doc_id, line_idx), encoded as the single bigint ``doc_id * 1e6 +
    line_idx`` so keeper election is a plain ``min`` aggregate —
    MAP-SIDE COMBINABLE, which is what makes a mega-hot line (the same
    cookie banner in 100M documents) a non-event: each task reduces its
    share to one candidate before the shuffle, where a rank-window
    election would funnel every copy of the hot line into one task.
    (The encoding caps documents at 1e6 lines ≈ 16M tokens — far beyond
    any real document; a violation would need doc_ids dense enough to
    collide, and the gate's fixtures sit 8 orders of magnitude under
    it.) The join back to the line table reuses the aggregate's
    hash-partitioning on ``line_text``.

    Output is the per-document audit (total / kept lines + kept ratio),
    the statistic curation pipelines thresh on ("drop docs that are
    mostly boilerplate")."""
    from .text import chunk_tokens

    # the line table feeds keeper election AND the join-back branch;
    # exchange reuse does not fire across aliased branches, so without
    # truncation the tokenize+chunk pass runs TWICE (same remedy as the
    # gram/signature tables)
    lines = materialize(
        chunk_tokens(docs, chunk=line_tokens, stride=line_tokens).select(
            "doc_id",
            F.col("chunk_idx").alias("line_idx"),
            F.col("chunk_text").alias("line_text"),
        )
    )
    pos = (F.col("doc_id") * F.lit(1_000_000) + F.col("line_idx")).cast("long")
    keepers = (
        lines.select("line_text", pos.alias("_pos"))
        .groupBy("line_text")
        .agg(F.min("_pos").alias("_keeper"))
    )
    marked = lines.join(keepers, "line_text").withColumn(
        "_kept", (pos == F.col("_keeper")).cast("long")
    )
    return marked.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum("_kept").cast("long").alias("n_kept"),
        F.round(F.sum("_kept") / F.count("*"), 6).alias("kept_ratio"),
    )


def line_dedup_stats_sql(
    src: str = "documents", line_tokens: int = LINE_TOKENS
) -> str:
    from .text import chunk_tokens_sql

    chunks = chunk_tokens_sql(src, chunk=line_tokens, stride=line_tokens)
    return f"""
        WITH lines AS (
          SELECT doc_id, chunk_idx AS line_idx, chunk_text AS line_text
          FROM ({chunks}) c
        ),
        keepers AS (
          SELECT line_text,
                 MIN(doc_id * 1000000 + line_idx) AS keeper
          FROM lines GROUP BY line_text
        ),
        marked AS (
          SELECT l.doc_id,
                 CASE WHEN l.doc_id * 1000000 + l.line_idx = k.keeper
                      THEN 1 ELSE 0 END AS kept
          FROM lines l JOIN keepers k USING (line_text)
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(kept) AS BIGINT) AS n_kept,
               ROUND(SUM(kept) / CAST(COUNT(*) AS DOUBLE), 6) AS kept_ratio
        FROM marked GROUP BY doc_id
    """


def line_dedup_rewrite(docs: DataFrame, line_tokens: int = LINE_TOKENS) -> DataFrame:
    """The TRANSFORM companion of :func:`line_dedup_stats`: emit each
    document's cleaned text with its corpus-duplicated lines removed
    (first occurrence kept), i.e. what actually ships to training after
    the C4 repeated-line rule.

    Same two keyed exchanges as the stats variant (keeper election on
    ``line_text`` — map-side-combinable min — then one doc-keyed
    aggregate); reassembly concatenates the kept lines in line order
    via a sorted struct aggregate, so no window pass and no assumption
    about row order surviving the shuffle. Documents whose every line
    was a duplicate come back with empty text, which is exactly the
    "drop docs that are pure boilerplate" signal downstream filters key
    on."""
    from .text import chunk_tokens

    # the line table feeds keeper election AND the join-back branch;
    # exchange reuse does not fire across aliased branches, so without
    # truncation the tokenize+chunk pass runs TWICE (same remedy as the
    # gram/signature tables)
    lines = materialize(
        chunk_tokens(docs, chunk=line_tokens, stride=line_tokens).select(
            "doc_id",
            F.col("chunk_idx").alias("line_idx"),
            F.col("chunk_text").alias("line_text"),
        )
    )
    pos = (F.col("doc_id") * F.lit(1_000_000) + F.col("line_idx")).cast("long")
    keepers = (
        lines.select("line_text", pos.alias("_pos"))
        .groupBy("line_text")
        .agg(F.min("_pos").alias("_keeper"))
    )
    kept = (
        lines.join(keepers, "line_text")
        .filter(pos == F.col("_keeper"))
        .groupBy("doc_id")
        .agg(
            F.expr(
                "array_join(transform(sort_array(collect_list("
                "struct(line_idx, line_text))), s -> s.line_text), ' ')"
            ).alias("clean_text"),
            F.count("*").cast("long").alias("n_kept"),
        )
    )
    return (
        docs.select("doc_id")
        .join(kept, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        )
    )


def line_dedup_rewrite_sql(
    src: str = "documents", line_tokens: int = LINE_TOKENS
) -> str:
    from .text import chunk_tokens_sql

    chunks = chunk_tokens_sql(src, chunk=line_tokens, stride=line_tokens)
    return f"""
        WITH lines AS (
          SELECT doc_id, chunk_idx AS line_idx, chunk_text AS line_text
          FROM ({chunks}) c
        ),
        keepers AS (
          SELECT line_text,
                 MIN(doc_id * 1000000 + line_idx) AS keeper
          FROM lines GROUP BY line_text
        ),
        kept AS (
          SELECT l.doc_id,
                 string_agg(l.line_text, ' ' ORDER BY l.line_idx) AS clean_text,
                 CAST(COUNT(*) AS BIGINT) AS n_kept
          FROM lines l JOIN keepers k USING (line_text)
          WHERE l.doc_id * 1000000 + l.line_idx = k.keeper
          GROUP BY l.doc_id
        )
        SELECT d.doc_id,
               COALESCE(kept.clean_text, '') AS clean_text,
               COALESCE(kept.n_kept, 0) AS n_kept
        FROM {src} d LEFT JOIN kept USING (doc_id)
    """


# --------------------------------------- exact substring (span) dedup
DUP_SPAN_K = 8  # tokens per positional gram = minimum detectable repeat
DUP_SPAN_MIN_OCC = 2  # global occurrences that make a gram "duplicated"


def duplicate_ngram_spans(
    docs: DataFrame, k: int = DUP_SPAN_K, min_occurrences: int = DUP_SPAN_MIN_OCC
) -> DataFrame:
    """Exact-substring duplication profile (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499 §4.1 EXACTSUBSTR): find VERBATIM repeated token
    spans across the corpus — the dedup pass that catches boilerplate,
    licenses and templated passages that document-level MinHash/SimHash
    miss because the containing documents differ.

    Suffix arrays (the paper's tool) are sequential; the distributed
    re-expression is positional k-gram fingerprints: any repeated span
    of >= k tokens necessarily repeats all its k-grams, so (1) hash
    every token position's k-gram (md5-60bit, same constants both
    engines), (2) a global count finds grams occurring >=
    ``min_occurrences`` times, (3) each doc's duplicated positions merge
    into maximal spans with one gaps-and-islands window (adjacent
    duplicated starts overlap), (4) per-doc aggregate: span count,
    duplicated token total, longest span, and the duplicated-token
    ratio driving the keep/trim/drop decision.

    Returns (doc_id, n_spans, dup_tokens, longest_span, dup_ratio) for
    documents containing at least one duplicated span.

    Scale posture: the positional gram table is O(total tokens) rows of
    (bigint hash, int pos) — the gram STRING never leaves the map side.
    The occurrence count is map-side combinable; the duplicated-gram
    semi-join is keyed on the hash with a distinct build side (no row
    explosion on hot grams — a million-fold repeated license gram is ONE
    build row); the islands window partitions by doc_id. Nothing is
    all-pairs, nothing is driver-side. 60-bit collisions could mark a
    non-duplicated gram (~1e-18 x |grams|² false-flag odds), identically
    in both engines.
    """
    toked = spread(docs).select(
        "doc_id", tokens_col("text").alias("toks")
    ).select("doc_id", "toks", F.size("toks").alias("n_tokens"))
    gram_h = _HASH60_SPARK.format(x=f"concat_ws(' ', slice(toks, i, {k}))")
    pos_grams = materialize(
        toked.select(
            "doc_id",
            F.explode(
                F.expr(
                    f"CASE WHEN size(toks) >= {k} THEN"
                    f" transform(sequence(1, size(toks) - {k - 1}),"
                    f" i -> struct(i AS pos, {gram_h} AS gh))"
                    " ELSE array() END"
                )
            ).alias("x"),
        ).select("doc_id", F.col("x.pos").alias("pos"), F.col("x.gh").alias("gh"))
    )
    dup_grams = (
        pos_grams.groupBy("gh")
        .agg(F.count("*").alias("occ"))
        .filter(F.col("occ") >= min_occurrences)
        .select("gh")
    )
    dup_pos = pos_grams.join(dup_grams, "gh", "left_semi")
    w = Window.partitionBy("doc_id").orderBy("pos")
    islands = (
        dup_pos.withColumn("prev", F.lag("pos").over(w))
        .withColumn(
            "new_island",
            F.when(
                F.col("prev").isNull() | (F.col("pos") - F.col("prev") > 1), 1
            ).otherwise(0),
        )
        .withColumn("island", F.sum("new_island").over(w))
    )
    spans = islands.groupBy("doc_id", "island").agg(
        F.min("pos").alias("s"), (F.max("pos") + F.lit(k - 1)).alias("e")
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.count("*").alias("n_spans"),
        F.sum(F.col("e") - F.col("s") + 1).alias("dup_tokens"),
        F.max(F.col("e") - F.col("s") + 1).alias("longest_span"),
    )
    return per_doc.join(toked.select("doc_id", "n_tokens"), "doc_id").select(
        "doc_id",
        "n_spans",
        "dup_tokens",
        "longest_span",
        F.round(F.col("dup_tokens") / F.col("n_tokens"), 6).alias("dup_ratio"),
    )


def duplicate_ngram_spans_sql(
    src: str = "documents",
    k: int = DUP_SPAN_K,
    min_occurrences: int = DUP_SPAN_MIN_OCC,
) -> str:
    t = tokens_sql("text")
    gram_h = _HASH60_DUCK.format(
        x=f"array_to_string(toks[i:i+{k - 1}], ' ')"
    )
    return f"""
        WITH toks AS (SELECT doc_id, {t} AS toks FROM {src}),
        sized AS (SELECT doc_id, toks, len(toks) AS n_tokens FROM toks),
        pg0 AS (
          SELECT doc_id,
                 [{{'pos': i, 'gh': {gram_h}}}
                  for i in generate_series(1, greatest(len(toks) - {k - 1}, 0))]
                   AS gs
          FROM sized
        ),
        pg AS (SELECT doc_id, UNNEST(gs, recursive := true) FROM pg0),
        dupg AS (SELECT gh FROM pg GROUP BY gh
                 HAVING COUNT(*) >= {min_occurrences}),
        dp AS (SELECT doc_id, pos FROM pg JOIN dupg USING (gh)),
        lagd AS (
          SELECT doc_id, pos,
                 LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
          FROM dp
        ),
        isl AS (
          SELECT doc_id, pos,
                 SUM(CASE WHEN prev IS NULL OR pos - prev > 1 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY pos) AS island
          FROM lagd
        ),
        spans AS (
          SELECT doc_id, island, MIN(pos) AS s, MAX(pos) + {k - 1} AS e
          FROM isl GROUP BY doc_id, island
        ),
        per_doc AS (
          SELECT doc_id,
                 CAST(COUNT(*) AS BIGINT) AS n_spans,
                 CAST(SUM(e - s + 1) AS BIGINT) AS dup_tokens,
                 CAST(MAX(e - s + 1) AS BIGINT) AS longest_span
          FROM spans GROUP BY doc_id
        )
        SELECT p.doc_id, p.n_spans, p.dup_tokens, p.longest_span,
               ROUND(p.dup_tokens / CAST(s.n_tokens AS DOUBLE), 6) AS dup_ratio
        FROM per_doc p JOIN sized s USING (doc_id)
    """


# --------------------------------------------- dedup pipeline QA (eval)
def dedup_recall_eval(
    docs: DataFrame,
    threshold: float = 0.5,
    n: int = NGRAM_N,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """Retrieval-quality audit of the MinHash+LSH dedup path against
    exact n-gram Jaccard ground truth AT THE SAME THRESHOLD — the dedup
    twin of :func:`..similarity.recall_eval` (every approximate stage in
    the curation pipeline ships with its own measured recall, not an
    assumed one; a re-banding or hash change that silently tanks recall
    must show up in a number).

    One row: exact pairs, estimated pairs, their overlap, precision and
    recall. The eval join is |pairs| x |pairs| keyed on the pair ids —
    pair sets are tiny next to the corpus, so the audit costs two dedup
    runs plus a pair-keyed join, at any scale."""
    true_pairs = ngram_jaccard_pairs(docs, threshold=threshold, n=n).select(
        "doc_a", "doc_b", F.lit(1).alias("t")
    )
    est_pairs = minhash_lsh_pairs(docs, est_threshold=threshold, n=n, sigs=sigs).select(
        "doc_a", "doc_b", F.lit(1).alias("e")
    )
    both = true_pairs.join(est_pairs, ["doc_a", "doc_b"], "full")
    return both.agg(
        F.sum("t").alias("n_true"),
        F.sum("e").alias("n_est"),
        F.sum(F.col("t") * F.col("e")).alias("n_hit"),
    ).select(
        F.coalesce("n_true", F.lit(0)).alias("n_true"),
        F.coalesce("n_est", F.lit(0)).alias("n_est"),
        F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
        F.round(
            F.coalesce("n_hit", F.lit(0))
            / F.greatest(F.coalesce("n_est", F.lit(0)), F.lit(1)).cast("double"),
            6,
        ).alias("precision"),
        F.round(
            F.coalesce("n_hit", F.lit(0))
            / F.greatest(F.coalesce("n_true", F.lit(0)), F.lit(1)).cast("double"),
            6,
        ).alias("recall"),
    )


def dedup_recall_eval_sql(
    src: str = "documents", threshold: float = 0.5, n: int = NGRAM_N
) -> str:
    true_sql = ngram_jaccard_pairs_sql(src, threshold=threshold, n=n)
    est_sql = minhash_lsh_pairs_sql(src, est_threshold=threshold, n=n)
    return f"""
        WITH tp AS (SELECT doc_a, doc_b, 1 AS t FROM ({true_sql}) x),
        ep AS (SELECT doc_a, doc_b, 1 AS e FROM ({est_sql}) y),
        j AS (
          SELECT COALESCE(tp.doc_a, ep.doc_a) AS doc_a,
                 COALESCE(tp.doc_b, ep.doc_b) AS doc_b, t, e
          FROM tp FULL OUTER JOIN ep
            ON tp.doc_a = ep.doc_a AND tp.doc_b = ep.doc_b
        )
        SELECT CAST(COALESCE(SUM(t), 0) AS BIGINT) AS n_true,
               CAST(COALESCE(SUM(e), 0) AS BIGINT) AS n_est,
               CAST(COALESCE(SUM(t * e), 0) AS BIGINT) AS n_hit,
               ROUND(COALESCE(SUM(t * e), 0)
                     / CAST(GREATEST(COALESCE(SUM(e), 0), 1) AS DOUBLE), 6)
                 AS precision,
               ROUND(COALESCE(SUM(t * e), 0)
                     / CAST(GREATEST(COALESCE(SUM(t), 0), 1) AS DOUBLE), 6)
                 AS recall
        FROM j
    """


# ------------------------------------------- minhash estimate accuracy
def minhash_accuracy(
    docs: DataFrame,
    est_threshold: float = 0.5,
    n: int = NGRAM_N,
    max_band_size: int | None = None,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """Estimate-vs-truth audit of the MinHash signatures: for every LSH
    candidate pair, the signature-agreement ESTIMATE next to the exact
    n-gram Jaccard — the "measure, don't guess" report that tells you
    whether NUM_HASHES is big enough and where the banding threshold
    actually sits before a 100 TB dedup run commits to it (the MinHash
    estimator is unbiased with σ = sqrt(J(1-J)/k); this table is that
    theory checked against this corpus).

    Shape at scale: candidate generation IS :func:`minhash_lsh_pairs`
    (banded, capped — never all-pairs); the exact re-check restricts the
    gram table to PAIR MEMBERS first (a doc-id semi-join, so the
    shared-gram self-join runs over the candidate docs only, the same
    containment trick :func:`ngram_containment_pairs` uses), and sizes
    ride the pair row from the |docs|-row gram-size table."""
    pairs = minhash_lsh_pairs(docs, est_threshold, n, max_band_size, sigs=sigs)
    grams = _doc_grams(docs, n)
    sizes = grams.select("doc_id", "n_grams")
    withsz = pairs.join(
        sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_grams").alias("na")),
        "doc_a",
    ).join(
        sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_grams").alias("nb")),
        "doc_b",
    )
    ids = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .union(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    ex = (
        grams.join(ids, "doc_id")
        .select("doc_id", F.explode("grams").alias("gram"))
    )
    inter = (
        ex.select(F.col("doc_id").alias("doc_a"), "gram")
        .join(ex.select(F.col("doc_id").alias("doc_b"), "gram"), "gram")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        withsz.join(inter, ["doc_a", "doc_b"], "left")
        .select(
            "doc_a",
            "doc_b",
            "est_jaccard",
            F.round(
                F.coalesce("inter", F.lit(0))
                / (
                    F.col("na") + F.col("nb") - F.coalesce("inter", F.lit(0))
                ).cast("double"),
                6,
            ).alias("true_jaccard"),
        )
    )


def minhash_accuracy_sql(
    src: str = "documents",
    est_threshold: float = 0.5,
    n: int = NGRAM_N,
    max_band_size: int | None = None,
) -> str:
    t = tokens_sql("text")
    g = word_ngrams_sql("toks", n)
    return f"""
        WITH pairs AS MATERIALIZED ({minhash_lsh_pairs_sql(src, est_threshold, n, max_band_size)}),
        gsets AS MATERIALIZED (
          SELECT doc_id, list_distinct({g}) AS grams
          FROM (SELECT doc_id, {t} AS toks FROM {src}) tk
        ),
        sizes AS (SELECT doc_id, len(grams) AS n_grams FROM gsets),
        ids AS (
          SELECT doc_a AS doc_id FROM pairs
          UNION SELECT doc_b FROM pairs
        ),
        ex AS MATERIALIZED (
          SELECT doc_id, UNNEST(grams) AS gram FROM gsets
          WHERE doc_id IN (SELECT doc_id FROM ids)
        ),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
          FROM ex a JOIN ex b ON a.gram = b.gram AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT p.doc_a, p.doc_b, p.est_jaccard,
               ROUND(COALESCE(i, 0) / CAST(sa.n_grams + sb.n_grams
                     - COALESCE(i, 0) AS DOUBLE), 6) AS true_jaccard
        FROM pairs p
        JOIN sizes sa ON sa.doc_id = p.doc_a
        JOIN sizes sb ON sb.doc_id = p.doc_b
        LEFT JOIN inter ON inter.doc_a = p.doc_a AND inter.doc_b = p.doc_b
    """


# ----------------------------------- cross-corpus (train/benchmark) LSH
def cross_corpus_contamination(
    docs: DataFrame,
    eval_source: str = "src0",
    est_threshold: float = 0.5,
    n: int = NGRAM_N,
    max_band_size: int | None = None,
) -> DataFrame:
    """FUZZY train/benchmark contamination report — the near-dup
    complement of :mod:`.corpus`'s exact-gram ``decontaminate``: an eval
    doc lightly paraphrased or partially quoted inside the training
    corpus shares no long exact gram but still collides in MinHash
    bands. For every doc of the held-out corpus (``source ==
    eval_source``) that near-duplicates ANY training-side doc at
    ``est_threshold`` estimated Jaccard, report its best-matching
    training doc — the list a pretraining run must drop (or an eval
    must flag) before results are trustworthy.

    Candidate generation is the SAME banded LSH as the dedup family —
    band-keyed join restricted to cross-side pairs, hot-band cap
    applied over the union corpus — so the cost model (O(Σ band²),
    capped) carries over unchanged; the top-1-per-eval-doc window runs
    on the already-thresholded pair set. At 100 TB the train side
    dwarfs the eval side, which is exactly the asymmetry LSH likes:
    eval bands are a sliver of the band table, and only colliding
    training docs are ever touched.
    """
    sides = docs.select(
        "doc_id", (F.col("source") == F.lit(eval_source)).alias("is_eval")
    )
    sigs = materialize(minhash_signatures(docs, n).join(sides, "doc_id"))
    bands_long = bands_of(sigs)
    if max_band_size is not None:
        small = (
            bands_long.groupBy("band_key")
            .agg(F.count("*").alias("bn"))
            .filter(F.col("bn") <= max_band_size)
            .select("band_key")
        )
        bands_long = bands_long.join(small, "band_key")
    tagged = bands_long.join(sigs.select("doc_id", "is_eval"), "doc_id")
    ev = tagged.filter(F.col("is_eval")).select(
        F.col("doc_id").alias("eval_doc"), "band_key"
    )
    tr = tagged.filter(~F.col("is_eval")).select(
        F.col("doc_id").alias("train_doc"), "band_key"
    )
    cand = ev.join(tr, "band_key").select("eval_doc", "train_doc").distinct()
    sa = sigs.select(
        F.col("doc_id").alias("eval_doc"),
        *[F.col(f"s{i}").alias(f"a{i}") for i in range(NUM_HASHES)],
    )
    sb = sigs.select(
        F.col("doc_id").alias("train_doc"),
        *[F.col(f"s{i}").alias(f"b{i}") for i in range(NUM_HASHES)],
    )
    matches = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(NUM_HASHES)
    )
    scored = (
        cand.join(sa, "eval_doc")
        .join(sb, "train_doc")
        .select(
            "eval_doc",
            "train_doc",
            F.round(matches / F.lit(float(NUM_HASHES)), 6).alias(
                "est_jaccard"
            ),
        )
        .filter(F.col("est_jaccard") >= est_threshold)
    )
    w = Window.partitionBy("eval_doc").orderBy(
        F.desc("est_jaccard"), F.asc("train_doc")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("eval_doc", "train_doc", "est_jaccard")
    )


def cross_corpus_contamination_sql(
    src: str = "documents",
    eval_source: str = "src0",
    est_threshold: float = 0.5,
    n: int = NGRAM_N,
    max_band_size: int | None = None,
) -> str:
    sig_sql = minhash_signatures_sql(src, n)
    band_exprs = ", ".join(
        "md5(concat_ws(',', "
        + ", ".join(
            f"CAST(s{b * ROWS_PER_BAND + r} AS VARCHAR)"
            for r in range(ROWS_PER_BAND)
        )
        + f")) AS band{b}"
        for b in range(BANDS)
    )
    band_list = ", ".join(f"band{b}" for b in range(BANDS))
    match_expr = " + ".join(
        f"CASE WHEN sa.s{i} = sb.s{i} THEN 1 ELSE 0 END"
        for i in range(NUM_HASHES)
    )
    if max_band_size is not None:
        band_filter = f"""
        kept AS (
          SELECT band_key FROM bands_long
          GROUP BY band_key HAVING COUNT(*) <= {int(max_band_size)}
        ),
        bands_kept AS (
          SELECT bl.doc_id, bl.band_key
          FROM bands_long bl JOIN kept k ON bl.band_key = k.band_key
        ),"""
        cand_src = "bands_kept"
    else:
        band_filter = ""
        cand_src = "bands_long"
    return f"""
        WITH sigs AS MATERIALIZED ({sig_sql}),
        sides AS (
          SELECT doc_id, source = '{eval_source}' AS is_eval FROM {src}
        ),
        banded AS (SELECT doc_id, {band_exprs} FROM sigs),
        bands_long AS (
          SELECT doc_id, UNNEST([{band_list}]) AS band_key FROM banded
        ),{band_filter}
        tagged AS (
          SELECT b.doc_id, b.band_key, s.is_eval
          FROM {cand_src} b JOIN sides s USING (doc_id)
        ),
        cand AS (
          SELECT DISTINCT e.doc_id AS eval_doc, t.doc_id AS train_doc
          FROM tagged e JOIN tagged t ON e.band_key = t.band_key
          WHERE e.is_eval AND NOT t.is_eval
        ),
        scored AS (
          SELECT cand.eval_doc, cand.train_doc,
                 ROUND(({match_expr}) / {float(NUM_HASHES)}, 6)
                   AS est_jaccard
          FROM cand
          JOIN sigs sa ON sa.doc_id = cand.eval_doc
          JOIN sigs sb ON sb.doc_id = cand.train_doc
          WHERE ROUND(({match_expr}) / {float(NUM_HASHES)}, 6)
                  >= {est_threshold}
        )
        SELECT eval_doc, train_doc, est_jaccard FROM (
          SELECT scored.*,
                 ROW_NUMBER() OVER (PARTITION BY eval_doc
                                    ORDER BY est_jaccard DESC,
                                             train_doc ASC) AS rk
          FROM scored
        ) WHERE rk = 1
    """


# ------------------------------------------- dedup ROI threshold sweep
SWEEP_THRESHOLDS = (0.5, 0.625, 0.75, 0.875, 1.0)


def lsh_threshold_sweep(
    docs: DataFrame,
    thresholds: tuple[float, ...] = SWEEP_THRESHOLDS,
    n: int = NGRAM_N,
    max_band_size: int | None = None,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """Dedup ROI curve: for each candidate MinHash threshold, how many
    near-dup pairs would be flagged and how many documents touched —
    the tuning table a pipeline reads before committing a threshold
    (too low: harvest collapses distinct docs; too high: mirrors
    survive), symmetric with the IVF ``probe``-count sweep on the ANN
    side. Thresholds are estimator-grid values (multiples of
    1/NUM_HASHES), so verdicts never sit on a float boundary.

    ONE banded candidate generation + ONE signature-scoring join serve
    every sweep point (the candidates are scored once, unfiltered;
    each threshold is a conditional aggregate over the scored pair
    table) — the sweep costs the same data movement as a single dedup
    run plus a |pairs|-row multi-count."""
    if sigs is None:
        sigs = materialize(minhash_signatures(docs, n))
    bands_long = bands_of(sigs)
    if max_band_size is not None:
        small = (
            bands_long.groupBy("band_key")
            .agg(F.count("*").alias("bn"))
            .filter(F.col("bn") <= max_band_size)
            .select("band_key")
        )
        bands_long = bands_long.join(small, "band_key")
    cand = (
        bands_long.alias("x")
        .join(bands_long.alias("y"), "band_key")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )
    scored = materialize(score_candidates(cand, sigs, est_threshold=0.0))
    rows = []
    for t in thresholds:
        cond = F.col("est_jaccard") >= t
        rows.append(
            scored.agg(
                F.lit(float(t)).alias("threshold"),
                F.sum(cond.cast("long")).alias("n_pairs"),
                F.countDistinct(
                    F.when(cond, F.col("doc_a"))
                ).alias("_da"),
                F.countDistinct(
                    F.when(cond, F.col("doc_b"))
                ).alias("_db"),
            )
        )
    from functools import reduce

    per_t = reduce(lambda a, b: a.unionByName(b), rows)
    # docs touched = |union of both sides|: count distinct over the
    # unioned side columns needs the pair table once more per threshold;
    # instead report both side counts and the pair count (the ROI signal)
    # plus removable docs = n_pairs-capped upper bound min(_da+_db, ...)
    return per_t.select(
        "threshold",
        F.coalesce("n_pairs", F.lit(0)).cast("long").alias("n_pairs"),
        (F.coalesce("_da", F.lit(0)) + F.coalesce("_db", F.lit(0)))
        .cast("long")
        .alias("docs_in_pairs_ub"),
    )


def lsh_threshold_sweep_sql(
    src: str = "documents",
    thresholds: tuple[float, ...] = SWEEP_THRESHOLDS,
    n: int = NGRAM_N,
    max_band_size: int | None = None,
) -> str:
    pairs_sql = minhash_lsh_pairs_sql(
        src, est_threshold=0.0, n=n, max_band_size=max_band_size
    )
    selects = "\n        UNION ALL ".join(
        f"""SELECT CAST({float(t)} AS DOUBLE) AS threshold,
               CAST(COALESCE(SUM(CASE WHEN est_jaccard >= {float(t)}
                                      THEN 1 END), 0) AS BIGINT) AS n_pairs,
               CAST(COUNT(DISTINCT CASE WHEN est_jaccard >= {float(t)}
                                        THEN doc_a END)
                    + COUNT(DISTINCT CASE WHEN est_jaccard >= {float(t)}
                                          THEN doc_b END) AS BIGINT)
                 AS docs_in_pairs_ub
        FROM scored"""
        for t in thresholds
    )
    return f"""
        WITH scored AS MATERIALIZED ({pairs_sql})
        {selects}
    """


# ------------------------------------------------- soft-dedup weights
def soft_dedup_weights(docs: DataFrame) -> DataFrame:
    """Soft deduplication: instead of DELETING exact duplicates, assign
    each doc a training loss weight 1/|dup-group| so every distinct text
    contributes one unit of gradient signal regardless of how many times
    it was crawled (the reweighting alternative to hard removal — the
    "soft dedup" knob in LLM corpus planners; here the commonness unit
    is the exact normalized-text fingerprint group).

    Emits per doc: group size, weight, and the doc's EFFECTIVE token
    budget (tokens x weight) — the number planners sum to get the
    de-duplicated token supply without dropping rows.

    One shuffle on the md5 fingerprint (the window's partition key); a
    100M-copy boilerplate doc still works because the window computes a
    COUNT, not an ordered scan. Weight lands on the 1e-6 grid identically
    in both engines (round once, after the division)."""
    toks = tokens_col("text")
    fp = docs.select(
        "doc_id",
        F.md5(F.array_join(toks, " ")).alias("fingerprint"),
        F.size(toks).cast("long").alias("token_count"),
    )
    w = Window.partitionBy("fingerprint")
    grp = F.count(F.lit(1)).over(w).cast("long")
    weight = F.round(F.lit(1.0) / grp.cast("double"), 6)
    return fp.select(
        "doc_id",
        "token_count",
        grp.alias("group_size"),
        weight.alias("weight"),
        F.round(F.col("token_count").cast("double") * weight, 6).alias(
            "eff_tokens"
        ),
    )


def soft_dedup_weights_sql(src: str = "documents") -> str:
    t = tokens_sql("text")
    return f"""
        SELECT doc_id,
               token_count,
               COUNT(*) OVER (PARTITION BY fingerprint) AS group_size,
               ROUND(1.0 / (COUNT(*) OVER (PARTITION BY fingerprint)), 6)
                   AS weight,
               ROUND(CAST(token_count AS DOUBLE)
                     * ROUND(1.0 / (COUNT(*) OVER (PARTITION BY fingerprint)), 6),
                     6) AS eff_tokens
        FROM (SELECT doc_id,
                     md5(array_to_string({t}, ' ')) AS fingerprint,
                     CAST(len({t}) AS BIGINT) AS token_count
              FROM {src}) s
    """


# ----------------------------------------- incremental LSH delta probe
def incremental_lsh_probe(
    docs: DataFrame,
    est_threshold: float = 0.5,
    n: int = NGRAM_N,
    delta_mod: int = 10,
    delta_rem: int = 7,
) -> DataFrame:
    """The production shape of near-dup detection: a nightly DELTA batch
    probes the STANDING LSH index instead of re-deduping the corpus.
    New docs' band keys join (a) the base index's band table — new-vs-
    old collisions — and (b) each other — within-batch collisions; base-
    vs-base pairs are never re-derived. Cost scales with |delta| band
    rows, not |corpus|²: exactly what lets a 100 TB corpus absorb a
    0.1% daily feed without a full dedup pass.

    The fixture's "delta" is the deterministic ``doc_id % delta_mod ==
    delta_rem`` slice (a ~10% batch). Equivalence contract (the oracle):
    the probe emits exactly the full LSH pair set restricted to pairs
    touching a delta doc — same banding, same estimator, same threshold
    — so incremental maintenance provably loses nothing.

    In production the base band/signature tables are the persisted index
    (signatures are already a materialized table in the batch path);
    here both sides derive from one signature pass for the fixture,
    which only OVERSTATES the incremental cost."""
    sigs = materialize(minhash_signatures(docs, n))
    bands = materialize(bands_of(sigs))
    is_delta = (F.col("doc_id") % delta_mod) == delta_rem
    delta_b = bands.filter(is_delta)
    base_b = bands.filter(~is_delta)
    cross = (
        delta_b.alias("x")
        .join(base_b.alias("y"), "band_key")
        .select(
            F.least(F.col("x.doc_id"), F.col("y.doc_id")).alias("doc_a"),
            F.greatest(F.col("x.doc_id"), F.col("y.doc_id")).alias("doc_b"),
        )
    )
    within = (
        delta_b.alias("x")
        .join(delta_b.alias("y"), "band_key")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
        )
    )
    cand = cross.unionByName(within).distinct()
    return score_candidates(cand, sigs, est_threshold)


def incremental_lsh_probe_sql(
    src: str = "documents",
    est_threshold: float = 0.5,
    n: int = NGRAM_N,
    delta_mod: int = 10,
    delta_rem: int = 7,
) -> str:
    """Oracle: the FULL LSH pair set (same banding/threshold) restricted
    to pairs touching the delta slice — the lossless-maintenance
    contract."""
    full = minhash_lsh_pairs_sql(src, est_threshold, n)
    return f"""
        SELECT * FROM ({full}) p
        WHERE p.doc_a % {delta_mod} = {delta_rem}
           OR p.doc_b % {delta_mod} = {delta_rem}
    """


# ------------------------------------------------ URL canonicalization
# Web-corpus ingestion's first dedup pass: the same page arrives under
# scheme/host-case variants, www. prefixes, tracking query params
# (utm_*), fragments, and trailing slashes. Canonicalizing BEFORE the
# fetch/dedup pipeline collapses those families for the cost of a
# per-row projection — no content comparison at all.
_URL_SYNTH_SPARK = (
    "concat("
    " CASE WHEN doc_id % 7 = 0 THEN 'HTTPS://' ELSE 'https://' END,"
    " CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END,"
    # coalesce: Spark's concat is NULL-absorbing while DuckDB's skips
    # NULLs — a NULL source would make the twins synthesize different
    # raw URLs and silently diverge (r6 advice; fixture is NULL-free
    # today, this pins the degradation mode identical anyway)
    " coalesce(source, ''), '.Example.COM/docs/item-',"
    " CAST(doc_id % 40 AS STRING),"
    " CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END,"
    " CASE WHEN doc_id % 2 = 0"
    "   THEN concat('?utm_source=feed&utm_campaign=x&ref=',"
    "               CAST(doc_id % 5 AS STRING))"
    "   WHEN doc_id % 5 = 0 THEN concat('?ref=', CAST(doc_id % 5 AS STRING))"
    "   ELSE '' END,"
    " CASE WHEN doc_id % 6 = 0 THEN '#section-2' ELSE '' END)"
)
_URL_SYNTH_DUCK = (
    _URL_SYNTH_SPARK.replace("AS STRING", "AS VARCHAR")
)


def url_canonical_dedup(docs: DataFrame) -> DataFrame:
    """Canonical-URL duplicate groups over deterministically synthesized
    raw URLs (scheme/host case, www., utm_* tracking params, fragments,
    trailing slash planted from doc_id — both engines derive the SAME
    raw string, so the oracle checks the CANONICALIZATION, not the
    synthesis): lowercase, drop the fragment, strip utm_* params (and
    the dangling '?'/'&' they leave), strip www., strip the trailing
    slash; then one groupBy canonical key.

    All string built-ins in one codegen projection + one combinable
    aggregate — the shape that survives a 100 TB crawl manifest. Spark's
    ``regexp_replace`` is replace-ALL by default; the DuckDB twin passes
    the 'g' flag explicitly."""
    raw = docs.select(
        "doc_id", F.expr(_URL_SYNTH_SPARK).alias("raw_url")
    )
    # outermost layer collapses a slash-before-query ('/docs/x/?ref=2')
    # with its slash-less variant — without it trailing-slash collapsing
    # only covered end-of-string slashes (r6 advice)
    canon = (
        "regexp_replace("
        "  regexp_replace("
        "    regexp_replace("
        "      regexp_replace("
        "        regexp_replace(lower(raw_url), '#.*$', ''),"
        "        'utm_[a-z]+=[^&#]*&?', ''),"
        "      '[?&]$', ''),"
        "    '^https://www\\\\.', 'https://'),"
        "  '/\\\\?', '?')"
    )
    return (
        raw.select(
            "doc_id",
            "raw_url",
            F.expr(
                f"CASE WHEN {canon} LIKE '%/' "
                f"THEN substring({canon}, 1, length({canon}) - 1) "
                f"ELSE {canon} END"
            ).alias("canonical_url"),
        )
        .groupBy("canonical_url")
        .agg(
            F.count("*").alias("n_urls"),
            F.countDistinct("raw_url").alias("n_raw_variants"),
            F.min("doc_id").alias("keeper_doc"),
        )
        .orderBy("canonical_url")
    )


def url_canonical_dedup_sql(src: str = "documents") -> str:
    canon = (
        "regexp_replace("
        "  regexp_replace("
        "    regexp_replace("
        "      regexp_replace("
        "        regexp_replace(lower(raw_url), '#.*$', '', 'g'),"
        "        'utm_[a-z]+=[^&#]*&?', '', 'g'),"
        "      '[?&]$', '', 'g'),"
        "    '^https://www\\.', 'https://', 'g'),"
        "  '/\\?', '?', 'g')"
    )
    return f"""
        WITH raw AS (
          SELECT doc_id, {_URL_SYNTH_DUCK} AS raw_url FROM {src}
        ),
        canon AS (
          SELECT doc_id, raw_url,
                 CASE WHEN {canon} LIKE '%/'
                      THEN substring({canon}, 1, length({canon}) - 1)
                      ELSE {canon} END AS canonical_url
          FROM raw
        )
        SELECT canonical_url,
               CAST(COUNT(*) AS BIGINT) AS n_urls,
               CAST(COUNT(DISTINCT raw_url) AS BIGINT) AS n_raw_variants,
               CAST(MIN(doc_id) AS BIGINT) AS keeper_doc
        FROM canon
        GROUP BY 1
        ORDER BY 1
    """


# ------------------------------------------------ edit-distance dedup
def plant_text_twins(
    docs: DataFrame, every: int = 50, id_offset: int = 1_000_000
) -> DataFrame:
    """Append a deterministic near-duplicate twin for every ``every``-th
    document (text + a 2-char suffix, id + ``id_offset``) — the text
    analogue of the embedding family's ``plant_near_dups``: the fixture
    corpus is random word salad with no natural small-edit pairs, so the
    edit-distance dedup needs planted positives its oracle can predict
    in closed form."""
    twins = docs.filter((F.col("doc_id") % every == 0)).select(
        (F.col("doc_id") + id_offset).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" x")).alias("text"),
    )
    return docs.select("doc_id", "text").unionByName(twins)


def edit_distance_pairs(
    docs: DataFrame,
    max_dist: int = 3,
    prefix_len: int = 16,
    max_len_diff: int = 4,
    max_block: int = 50,
) -> DataFrame:
    """Near-duplicate pairs by EXACT Levenshtein distance, blocked so
    the quadratic edit-distance kernel only ever runs inside small
    candidate blocks — the fuzzy-match dedup for OCR/typo-grade
    near-dups that shingle Jaccard smears out (a 2-char edit barely
    moves Jaccard on a long doc but is exactly dist<=2 here).

    Blocking: equi-join on the first ``prefix_len`` chars (an edit
    inside the prefix escapes the block — the standard recall trade of
    prefix blocking; MinHash-LSH is the registry's recall-oriented
    path), plus a length-difference cut (|len diff| > max_dist can
    never pass, so ``max_len_diff`` >= ``max_dist`` is a free filter).
    Blocks above ``max_block`` rows are EXCLUDED, the
    ``dedup_ngram_jaccard_capped`` hot-cap discipline: a degenerate
    corpus (every doc sharing a boilerplate prefix) caps at
    max_block^2 comparisons per block instead of n^2. Levenshtein is
    codegen (``F.levenshtein``) — per CANDIDATE pair only, never per
    cross pair — and BOUNDED (the 3-arg threshold form): the banded DP
    costs O(max_dist * min_len) instead of O(len_a * len_b) and bails
    out early, exact for every distance <= max_dist and -1 beyond, so
    the kept rows (and their ``dist`` values) are identical to the
    unbounded form while the dominant non-matching pairs cost ~len
    instead of ~len² (r10 optimization; measured 6.6 s -> see
    OPTIMIZATION_r10.md)."""
    from pyspark.sql import Window

    from .partitioning import materialize, spread

    base = spread(docs).select(
        "doc_id",
        "text",
        F.substring("text", 1, prefix_len).alias("blk"),
        F.length("text").alias("ln"),
    )
    # block-size cap as ONE windowed count over the blk exchange (the
    # former groupBy + semi-join recomputed the whole upstream twice),
    # and the surviving table is MATERIALIZED once: both sides of the
    # self-join below read the same temp columnar table instead of each
    # replaying scan→union→spread→count (r10 optimization: the before
    # plan carried 4 parquet scans and 2 block-count aggregates; the
    # after plan carries 1 of each)
    kept = materialize(
        base.withColumn(
            "_bn", F.count("*").over(Window.partitionBy("blk"))
        )
        .filter(F.col("_bn") <= max_block)
        .drop("_bn")
    )
    a, b = kept.alias("a"), kept.alias("b")
    # The distance cut lives INSIDE the join condition, as the LAST
    # conjunct: a post-join `.filter(dist <= k)` gets pushed into the
    # join condition anyway — but PREPENDED, so the DP ran for every
    # blk-matched candidate BEFORE the cheap id/length cuts (measured
    # ~2 s of the before cost at sf0.1). Conjunct order short-circuits:
    # the DP now runs only on candidates surviving the cheap cuts, and
    # it returns -1 past max_dist, so `>= 0` IS the `<= max_dist` cut.
    return a.join(
        b,
        (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
        & (F.abs(F.col("a.ln") - F.col("b.ln")) <= max_len_diff)
        & (
            F.levenshtein(F.col("a.text"), F.col("b.text"), int(max_dist))
            >= 0
        ),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.levenshtein(
            F.col("a.text"), F.col("b.text"), int(max_dist)
        ).alias("dist"),
    )


def edit_distance_pairs_sql(
    src: str = "documents",
    max_dist: int = 3,
    prefix_len: int = 16,
    max_len_diff: int = 4,
    max_block: int = 50,
    twin_every: int = 50,
    twin_offset: int = 1_000_000,
) -> str:
    return f"""
        WITH d AS (
          SELECT doc_id, text FROM {src}
          UNION ALL
          SELECT doc_id + {twin_offset}, text || ' x'
          FROM {src} WHERE doc_id % {twin_every} = 0
        ),
        k AS (
          SELECT doc_id, text, substr(text, 1, {prefix_len}) AS blk,
                 length(text) AS ln
          FROM d
        ),
        ok AS (
          SELECT blk FROM k GROUP BY blk HAVING COUNT(*) <= {max_block}
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(levenshtein(a.text, b.text) AS INTEGER) AS dist
        FROM k a JOIN ok USING (blk)
        JOIN k b ON a.blk = b.blk AND a.doc_id < b.doc_id
               AND abs(a.ln - b.ln) <= {max_len_diff}
        WHERE levenshtein(a.text, b.text) <= {max_dist}
    """
