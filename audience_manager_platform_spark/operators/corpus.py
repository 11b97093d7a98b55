"""Corpus-curation operators for training-data pipelines: deterministic
dataset splits, token-budget sequence packing, and benchmark
decontamination. All three are the operations a 100 TB pretraining
pipeline runs after dedup/quality filtering and before tokenization.

Scale posture: split assignment is a pure per-row hash (no shuffle);
packing shuffles once on the shard key and windows within shards (never
a global single-partition sort); decontamination is a gram-keyed
semi-join (candidate cost proportional to shared grams, like the dedup
family). Every operator has an exact DuckDB oracle via the portable
md5-based hash (:func:`..functions.stable_long_hash`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import HASH60_DUCK_SQL as _HASH60_DUCK
from ..functions import stable_long_hash
from .text import tokens_col, tokens_sql, word_ngrams_col, word_ngrams_sql

# ------------------------------------------------------ dataset splits
SPLIT_BUCKETS = 10_000


def split_assign(
    docs: DataFrame,
    weights: dict[str, float] | None = None,
    salt: str = "split-v1",
) -> DataFrame:
    """Deterministic train/val/test assignment: bucket = stable 60-bit
    hash of (salt || doc_id) mod 10k, split = cumulative-weight interval
    the bucket falls in. Properties a pipeline needs:

    - reproducible across runs/engines (md5 arithmetic, no RNG state);
    - stable under corpus growth — a doc's split never changes when other
      docs are added/removed (unlike ``randomSplit``/``sampleBy``);
    - pure per-row projection: no shuffle, no driver state, trivially
      parallel at any scale.
    """
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    bucket = stable_long_hash(F.col("doc_id").cast("string"), salt=salt) % SPLIT_BUCKETS
    expr = None
    acc = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w
        cond = bucket < int(round(acc * SPLIT_BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    split = expr.otherwise(last) if expr is not None else F.lit(last)
    return docs.select("doc_id", bucket.alias("bucket"), split.alias("split"))


def split_assign_sql(
    src: str = "documents",
    weights: dict[str, float] | None = None,
    salt: str = "split-v1",
) -> str:
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    h = _HASH60_DUCK.format(x=f"'{salt}' || CAST(doc_id AS VARCHAR)")
    items = list(weights.items())
    acc = 0.0
    cases = []
    for name, w in items[:-1]:
        acc += w
        cases.append(f"WHEN bucket < {int(round(acc * SPLIT_BUCKETS))} THEN '{name}'")
    case = "CASE " + " ".join(cases) + f" ELSE '{items[-1][0]}' END"
    return f"""
        SELECT doc_id, bucket, {case} AS split
        FROM (SELECT doc_id, {h} % {SPLIT_BUCKETS} AS bucket FROM {src}) b
    """


# --------------------------------------------------- sequence packing
def pack_sequences(
    docs: DataFrame, token_budget: int = 256, n_shards: int = 32
) -> DataFrame:
    """Assign documents to fixed-token-budget bins (context-window
    packing before tokenization): within a shard, docs are laid out in
    doc_id order and a doc's bin is ``floor(preceding_tokens / budget)``
    — contiguous greedy packing, deterministic, one pass.

    Sharding first (``doc_id % n_shards``) keeps the running-sum window
    partitioned — the global-ORDER-BY formulation would serialize the
    whole corpus through one partition. Bins are keyed (shard, bin_id);
    a doc longer than the budget gets its own bin(s) worth of space, it
    is never split (splitting is the tokenizer's job downstream)."""
    toks = docs.select(
        "doc_id",
        (F.col("doc_id") % n_shards).alias("shard"),
        F.size(tokens_col("text")).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    preceding = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return toks.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.floor(preceding / token_budget).cast("long").alias("bin_id"),
    )


def pack_sequences_sql(
    src: str = "documents", token_budget: int = 256, n_shards: int = 32
) -> str:
    t = tokens_sql("text")
    return f"""
        WITH toks AS (
          SELECT doc_id, doc_id % {n_shards} AS shard,
                 len({t}) AS n_tokens
          FROM {src}
        )
        SELECT doc_id, shard, n_tokens,
               CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (
                 PARTITION BY shard ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 / {token_budget}) AS BIGINT) AS bin_id
        FROM toks
    """


# ------------------------------------------------ deterministic shuffle
def shuffle_shards(
    docs: DataFrame, n_shards: int = 64, salt: str = "epoch-0"
) -> DataFrame:
    """Deterministic training-order shuffle: every doc gets a
    ``(shard_id, pos_in_shard)`` coordinate from a salted
    content-independent hash — the global read order (shard 0 pos 0,
    1, …, shard 1 pos 0, …) is a reproducible pseudo-random permutation
    of the corpus, re-seedable per epoch via ``salt``.

    Scale posture: a global ``ORDER BY hash`` + ``row_number`` would
    funnel the corpus through ONE partition for the ranking window;
    instead the hash's low bits pick a shard (pure per-row projection)
    and the position window is partitioned BY SHARD — the only shuffle
    is the exchange keyed on shard_id, and every shard ranks in
    parallel. Sharded order is what training loaders consume anyway
    (one reader per shard); n_shards scales with the cluster, not the
    data. Ties on the hash break by doc_id, so the permutation is total
    and the DuckDB twin reproduces it exactly.
    """
    h = stable_long_hash(F.col("doc_id").cast("string"), salt=salt)
    w = Window.partitionBy("shard_id").orderBy("h", "doc_id")
    return (
        docs.select("doc_id", h.alias("h"))
        .withColumn("shard_id", F.col("h") % n_shards)
        .select(
            "doc_id",
            "shard_id",
            (F.row_number().over(w) - 1).alias("pos_in_shard"),
        )
    )


def shuffle_shards_sql(
    src: str = "documents", n_shards: int = 64, salt: str = "epoch-0"
) -> str:
    h = _HASH60_DUCK.format(x=f"'{salt}' || CAST(doc_id AS VARCHAR)")
    return f"""
        WITH hashed AS (
          SELECT doc_id, {h} AS h, ({h}) % {n_shards} AS shard_id FROM {src}
        )
        SELECT doc_id, shard_id,
               ROW_NUMBER() OVER (
                 PARTITION BY shard_id ORDER BY h, doc_id) - 1 AS pos_in_shard
        FROM hashed
    """


# ----------------------------------------------- benchmark decontamination
def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
) -> DataFrame:
    """Flag corpus documents sharing ANY word n-gram with a benchmark
    set (eval-contamination check). Shape: explode both sides to
    (gram, doc) and semi-join corpus grams against the (small) benchmark
    gram set — candidate cost is proportional to shared grams, never
    |corpus| x |benchmark|. Returns every corpus doc with its shared-gram
    count and a ``contaminated`` flag, so the pipeline can filter or
    audit."""
    from pyspark.ml.feature import NGram

    def grams_of(df: DataFrame) -> DataFrame:
        toked = df.select("doc_id", tokens_col("text").alias("toks"))
        g = NGram(n=n, inputCol="toks", outputCol="grams").transform(toked)
        return g.select("doc_id", F.explode(F.array_distinct("grams")).alias("gram"))

    bench_grams = grams_of(benchmark).select("gram").distinct()
    corpus_grams = grams_of(docs)
    shared = (
        corpus_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared_grams"))
    )
    return (
        docs.select("doc_id")
        .join(shared, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shared_grams", F.lit(0)).alias("n_shared_grams"),
            (F.coalesce("n_shared_grams", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def decontaminate_sql(
    src: str = "documents", bench_pred: str = "doc_id % 50 = 0", n: int = 3
) -> str:
    t = tokens_sql("text")
    g = word_ngrams_sql("toks", n)
    return f"""
        WITH toks AS (SELECT doc_id, {t} AS toks FROM {src}),
        grams AS (SELECT doc_id, UNNEST(list_distinct({g})) AS gram FROM toks),
        bench AS (SELECT DISTINCT gram FROM grams WHERE {bench_pred}),
        shared AS (
          SELECT g.doc_id, COUNT(*) AS n_shared_grams
          FROM grams g JOIN bench USING (gram)
          GROUP BY g.doc_id
        )
        SELECT d.doc_id,
               COALESCE(s.n_shared_grams, 0) AS n_shared_grams,
               COALESCE(s.n_shared_grams, 0) > 0 AS contaminated
        FROM {src} d LEFT JOIN shared s ON d.doc_id = s.doc_id
    """


# ------------------------------------------------- stratified sampling
def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    salt: str = "sample-v1",
) -> DataFrame:
    """Deterministic per-stratum sampling: a row survives iff its stable
    key hash bucket falls under its stratum's fraction. Unlike
    ``DataFrame.sampleBy`` (partition-order-dependent RNG), this is

    - exactly reproducible across runs, engines and repartitionings
      (md5 arithmetic on the key — the same portable hash the split
      assigner uses);
    - a pure per-row filter: no shuffle, no driver state, pushes down
      past column pruning like any other predicate;
    - stable under corpus growth: adding rows never flips the sampling
      decision of existing rows.

    Strata absent from ``fractions`` are dropped (fraction 0), matching
    ``sampleBy``."""
    bucket = (
        stable_long_hash(F.col(key_col).cast("string"), salt=salt) % SPLIT_BUCKETS
    )
    thresh = None
    for name, frac in fractions.items():
        lim = F.lit(int(round(frac * SPLIT_BUCKETS)))
        thresh = (
            F.when(F.col(strata_col) == name, lim)
            if thresh is None
            else thresh.when(F.col(strata_col) == name, lim)
        )
    thresh = thresh.otherwise(F.lit(0)) if thresh is not None else F.lit(0)
    return df.filter(bucket < thresh)


def stratified_sample_sql(
    src: str,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    salt: str = "sample-v1",
) -> str:
    """DuckDB twin of :func:`stratified_sample`."""
    hash_expr = _HASH60_DUCK.format(x=f"'{salt}' || CAST({key_col} AS VARCHAR)")
    cases = " ".join(
        f"WHEN '{name}' THEN {int(round(frac * SPLIT_BUCKETS))}"
        for name, frac in fractions.items()
    )
    return (
        f"SELECT * FROM {src} WHERE ({hash_expr}) % {SPLIT_BUCKETS} < "
        f"(CASE {strata_col} {cases} ELSE 0 END)"
    )


def reservoir_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    n: int,
    salt: str = "resv-v1",
) -> DataFrame:
    """Deterministic per-group fixed-``n`` uniform sample — the
    distributed replacement for one reservoir PER GROUP (equal
    representation per source is how balanced eval/holdout sets are
    drawn from a skewed corpus; the fractional :func:`stratified_sample`
    can't promise exact counts and the global fixed-n sampler can't
    promise per-group ones).

    Each row ranks within its group by the stable 60-bit key hash
    (portable md5 arithmetic — exactly reproducible across runs,
    engines and repartitionings, and stable under corpus growth for the
    surviving ranks' ordering); the ``n`` smallest win. ONE group-keyed
    exchange; with AQE a hot group's sort spills rather than stalls, and
    because the rank predicate is ``<= n`` Spark runs the window in
    partial "rank limit" mode (WindowGroupLimit) — each map task
    pre-prunes to its local top-n before the shuffle, so the exchange
    carries O(|groups| x n) rows per task, not the corpus."""
    h = stable_long_hash(F.col(key_col).cast("string"), salt=salt)
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.select(group_col, key_col)
        .withColumn("pick_rank", F.row_number().over(w))
        .filter(F.col("pick_rank") <= n)
        .orderBy(group_col, "pick_rank")
    )


def reservoir_per_group_sql(
    src: str,
    group_col: str,
    key_col: str,
    n: int,
    salt: str = "resv-v1",
) -> str:
    h = _HASH60_DUCK.format(x=f"'{salt}' || CAST({key_col} AS VARCHAR)")
    return f"""
        SELECT {group_col}, {key_col}, pick_rank FROM (
          SELECT {group_col}, {key_col},
                 ROW_NUMBER() OVER (
                   PARTITION BY {group_col}
                   ORDER BY {h} ASC, {key_col} ASC) AS pick_rank
          FROM {src}
        ) x WHERE pick_rank <= {int(n)}
        ORDER BY {group_col}, pick_rank
    """


def weighted_priority_sample(
    df: DataFrame,
    weight_col,
    key_col: str,
    n: int,
    salt: str = "wsample-v1",
) -> DataFrame:
    """Deterministic weight-biased top-n sample: each row gets a stable
    pseudo-uniform u from its key hash, and the n rows with the smallest
    priority = u / weight win — heavier rows draw systematically smaller
    priorities, so selection probability grows with weight while staying
    exactly reproducible across runs, engines and repartitionings (the
    quality-weighted document sampling a pretraining mixture does, made
    replayable).

    This is the LINEAR surrogate of exponential-clock A-ES sampling
    (Efraimidis-Spirakis keys would be -ln(u)/w): the monotone division
    keeps cross-engine float parity EXACT (one IEEE division, no
    transcendental whose last ulp could differ between libm builds),
    which the hash-match oracle gate requires. Selection is still
    strictly monotone in weight for fixed u.

    Spark executes the global ascending top-n as TakeOrderedAndProject
    (per-partition n-row heads merged on the driver) — no global sort,
    no full shuffle; ``n`` rows of driver state."""
    u = (
        stable_long_hash(F.col(key_col).cast("string"), salt=salt)
        % SPLIT_BUCKETS
    ).cast("double") / F.lit(float(SPLIT_BUCKETS))
    pri = u / weight_col
    return (
        df.withColumn("priority", F.round(pri, 6))
        .orderBy(F.asc("priority"), F.asc(key_col))
        .limit(n)
    )


def weighted_priority_sample_sql(
    src: str,
    weight_expr: str,
    key_col: str,
    n: int,
    salt: str = "wsample-v1",
) -> str:
    h = _HASH60_DUCK.format(x=f"'{salt}' || CAST({key_col} AS VARCHAR)")
    u = f"(CAST(({h}) % {SPLIT_BUCKETS} AS DOUBLE) / {float(SPLIT_BUCKETS)!r})"
    return f"""
        SELECT *, ROUND({u} / ({weight_expr}), 6) AS priority
        FROM {src}
        ORDER BY priority ASC, {key_col} ASC
        LIMIT {n}
    """


# ---------------------------------------------- end-to-end curation run
def curation_ledger(docs: DataFrame, bench: DataFrame) -> DataFrame:
    """One-pass curation decision ledger: every upstream pipeline stage
    (quality gate, exact dedup, decontamination, token budget, split
    assignment) joined into a per-document row plus the final ``selected``
    verdict a pretraining run would materialize.

    This is the composition the individual operators exist FOR — each
    stage is the already-oracled operator, reused verbatim; the ledger
    just key-joins their outputs on doc_id. At warehouse scale the joins
    after the first are co-partitioned on doc_id (one shuffle each on the
    dedup/decon branches, which shuffle internally anyway; quality, token
    stats and splits are pure projections that fold into the probe side).
    """
    from .dedup import exact_dedup
    from .text import gopher_quality, token_stats

    q = gopher_quality(docs).select(
        "doc_id", F.col("keep").alias("keep_quality")
    )
    dd = exact_dedup(docs).select("doc_id", "is_duplicate")
    c = decontaminate(docs, bench).select("doc_id", "contaminated")
    t = token_stats(docs).select("doc_id", "n_tokens")
    s = split_assign(docs).select("doc_id", "split")
    return (
        docs.select("doc_id")
        .join(q, "doc_id")
        .join(dd, "doc_id")
        .join(c, "doc_id")
        .join(t, "doc_id")
        .join(s, "doc_id")
        .withColumn(
            "selected",
            F.col("keep_quality")
            & ~F.col("is_duplicate")
            & ~F.col("contaminated"),
        )
    )


def curation_ledger_sql(
    src: str = "documents", bench_pred: str = "doc_id % 50 = 0"
) -> str:
    """DuckDB twin of :func:`curation_ledger` — composes the stage
    oracles as subqueries, so Spark plan and oracle share per-stage
    semantics by construction."""
    from .dedup import exact_dedup_sql
    from .text import gopher_quality_sql, token_stats_sql

    return f"""
        SELECT d.doc_id, q.keep AS keep_quality, dd.is_duplicate,
               c.contaminated, t.n_tokens, s.split,
               (q.keep AND NOT dd.is_duplicate AND NOT c.contaminated)
                 AS selected
        FROM {src} d
        JOIN ({gopher_quality_sql(src)}) q ON d.doc_id = q.doc_id
        JOIN ({exact_dedup_sql(src)}) dd ON d.doc_id = dd.doc_id
        JOIN ({decontaminate_sql(src, bench_pred)}) c ON d.doc_id = c.doc_id
        JOIN ({token_stats_sql(src)}) t ON d.doc_id = t.doc_id
        JOIN ({split_assign_sql(src)}) s ON d.doc_id = s.doc_id
    """


# ------------------------------------------------ mixture / re-weighting
def mixture_weights(
    docs: DataFrame, group_col: str = "lang", alpha: float = 0.5
) -> DataFrame:
    """Temperature-scaled sampling weights per corpus slice — the
    multilingual/source re-balancing computation (w_i ∝ p_i^alpha, the
    exponent flattening the head so tail slices are not drowned; alpha=1
    is proportional sampling, alpha=0 uniform).

    Two tiny aggregates (slice counts, then the normalizer over the
    |slices|-row result) with 1-row broadcast joins — nothing here is
    data-sized after the first count, at any corpus scale.
    """
    counts = docs.groupBy(group_col).agg(F.count("*").alias("n_docs"))
    tot = counts.agg(F.sum("n_docs").alias("_N"))
    scaled = counts.join(F.broadcast(tot)).select(
        group_col,
        "n_docs",
        F.round(F.col("n_docs") / F.col("_N"), 6).alias("raw_share"),
        F.pow(F.col("n_docs") / F.col("_N"), F.lit(alpha)).alias("_s"),
    )
    z = scaled.agg(F.sum("_s").alias("_z"))
    return scaled.join(F.broadcast(z)).select(
        group_col,
        "n_docs",
        "raw_share",
        F.round(F.col("_s") / F.col("_z"), 6).alias("mixture_weight"),
    )


def mixture_weights_sql(
    src: str = "documents", group_col: str = "lang", alpha: float = 0.5
) -> str:
    return f"""
        WITH counts AS (
          SELECT {group_col}, COUNT(*) AS n_docs FROM {src} GROUP BY {group_col}
        ),
        tot AS (SELECT SUM(n_docs) AS _N FROM counts),
        scaled AS (
          SELECT {group_col}, n_docs,
                 ROUND(n_docs / _N, 6) AS raw_share,
                 POWER(n_docs / _N, {alpha}) AS _s
          FROM counts, tot
        ),
        z AS (SELECT SUM(_s) AS _z FROM scaled)
        SELECT {group_col}, n_docs, raw_share,
               ROUND(_s / _z, 6) AS mixture_weight
        FROM scaled, z
    """


# ------------------------------------------------- quality-decile bins
N_QUALITY_BINS = 10


def quality_bins(docs: DataFrame, bins: int = N_QUALITY_BINS) -> DataFrame:
    """Assign every document a quality decile (bin ``bins`` = best) for
    quality-mixed sampling — the curation move of training
    preferentially on high-quality strata instead of hard-filtering.

    Deliberately NOT a global ``ntile`` window: that sorts the whole
    corpus through one partition. Instead ONE aggregate computes the
    exact interpolated (bins-1)-quantile thresholds of the quality
    score, a 1-row broadcast carries them, and each doc's bin is
    ``1 + #thresholds strictly below its score`` — a per-row expression,
    embarrassingly parallel. Thresholds and scores are 6dp-quantized, so
    boundary membership is deterministic cross-engine (ties share the
    lower bin, which is why bin populations need not be exactly equal —
    the contract is thresholds, not equal counts).
    """
    from .text import quality_score

    fracs = [i / bins for i in range(1, bins)]
    qs = quality_score(docs).select("doc_id", "quality_score")
    th = qs.agg(
        F.expr(
            "transform(percentile(quality_score, array({fr})), t -> round(t, 6))".format(
                fr=", ".join(f"{f}D" for f in fracs)
            )
        ).alias("_th")
    )
    return qs.join(F.broadcast(th)).select(
        "doc_id",
        "quality_score",
        (
            F.lit(1)
            + F.size(F.expr("filter(_th, t -> quality_score > t)"))
        ).cast("long").alias("quality_bin"),
    )


def quality_bins_sql(src: str = "documents", bins: int = N_QUALITY_BINS) -> str:
    from .text import quality_score_sql

    fracs = ", ".join(str(i / bins) for i in range(1, bins))
    return f"""
        WITH qs AS (
          SELECT doc_id, quality_score FROM ({quality_score_sql(src)}) q
        ),
        th AS (
          SELECT list_transform(
                   QUANTILE_CONT(quality_score, [{fracs}]), t -> ROUND(t, 6)
                 ) AS _th
          FROM qs
        )
        SELECT doc_id, quality_score,
               CAST(1 + len(list_filter(_th, t -> quality_score > t)) AS BIGINT)
                 AS quality_bin
        FROM qs, th
    """


# --------------------------------------- bloom-prefilter decontamination
BLOOM_M_BITS = 1 << 20
BLOOM_K = 5


def _bloom_positions(gram: str, m_bits: int, k: int) -> list[int]:
    """k double-hashed bit positions (crc32 + odd adler32 stride) —
    deterministic across processes, no PYTHONHASHSEED dependence."""
    import zlib

    b = gram.encode("utf-8")
    h1 = zlib.crc32(b)
    h2 = zlib.adler32(b) | 1  # odd stride so it cycles the whole table
    return [(h1 + i * h2) % m_bits for i in range(k)]


def bloom_decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    m_bits: int = BLOOM_M_BITS,
    k_hashes: int = BLOOM_K,
) -> DataFrame:
    """:func:`decontaminate` with a Bloom prefilter on the corpus side —
    IDENTICAL output (the exact confirm join removes every bloom false
    positive), different 100 TB posture.

    The exact path broadcasts the benchmark gram set as a hash relation:
    fine while the benchmark fits an executor's memory, dead at a
    100M-gram benchmark suite (multi-GB hash table per executor). The
    bloom bitmap costs m_bits/8 bytes TOTAL (128 KiB at the default)
    no matter the gram count, so the broadcast always fits; corpus grams
    that miss the bitmap — the overwhelming majority — are dropped in the
    narrow map stage, and only the surviving fraction (true matches + the
    ~(1-e^{-kn/m})^k false-positive rate) pays the exact confirm join,
    which therefore shuffles survivors, not the corpus.

    Build is distributed: each benchmark partition ORs its grams into a
    local bitmap (mapInPandas, one binary row per partition); the driver
    ORs the partition bitmaps — bounded driver state, same contract as
    the k-means/PQ/SQ model collects."""
    import numpy as np
    import pandas as pd

    from pyspark.ml.feature import NGram

    def grams_of(df: DataFrame) -> DataFrame:
        toked = df.select("doc_id", tokens_col("text").alias("toks"))
        g = NGram(n=n, inputCol="toks", outputCol="grams").transform(toked)
        return g.select(
            "doc_id", F.explode(F.array_distinct("grams")).alias("gram")
        )

    bench_grams = grams_of(benchmark).select("gram").distinct()
    corpus_grams = grams_of(docs)

    def build(batches):
        bm = np.zeros(m_bits // 8, dtype=np.uint8)
        any_rows = False
        for pdf in batches:
            for gram in pdf["gram"]:
                any_rows = True
                for pos in _bloom_positions(gram, m_bits, k_hashes):
                    bm[pos >> 3] |= np.uint8(1 << (pos & 7))
        if any_rows:
            yield pd.DataFrame({"bm": [bm.tobytes()]})

    parts = bench_grams.mapInPandas(build, "bm binary").collect()
    merged = np.zeros(m_bits // 8, dtype=np.uint8)
    for row in parts:
        merged |= np.frombuffer(row["bm"], dtype=np.uint8)
    bc = docs.sparkSession.sparkContext.broadcast(merged.tobytes())

    def member_filter(batches):
        bm = np.frombuffer(bc.value, dtype=np.uint8)
        for pdf in batches:
            if not len(pdf):
                continue
            keep = []
            for gram in pdf["gram"]:
                hit = True
                for pos in _bloom_positions(gram, m_bits, k_hashes):
                    if not (bm[pos >> 3] >> (pos & 7)) & 1:
                        hit = False
                        break
                keep.append(hit)
            out = pdf[pd.Series(keep, index=pdf.index)]
            if len(out):
                yield out

    surviving = corpus_grams.mapInPandas(
        member_filter, schema="doc_id long, gram string"
    )
    # exact confirm: NO broadcast hint — the point is that survivors are
    # few enough to shuffle even when the benchmark can't be a hash
    # relation (AQE still may pick broadcast at small scale; that's fine)
    shared = (
        surviving.join(bench_grams, "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared_grams"))
    )
    return (
        docs.select("doc_id")
        .join(shared, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shared_grams", F.lit(0)).alias("n_shared_grams"),
            (F.coalesce("n_shared_grams", F.lit(0)) > 0).alias("contaminated"),
        )
    )


# ------------------------------------------------------- per-source caps
def source_cap(docs: DataFrame, cap: int = 100) -> DataFrame:
    """Cap documents per source — the per-domain quota every web-corpus
    pipeline applies so one prolific host can't dominate the training
    mix. Keeps the ``cap`` highest-value docs per source (value proxy:
    n_chars desc, doc_id asc as the deterministic tiebreak) and returns
    every doc with its rank and kept flag, so downstream can filter or
    audit the drop.

    Shape at scale: one shuffle keyed on source + a per-source window.
    A skewed mega-source serializes its own partition only; if one host
    is a double-digit fraction of the corpus the salting pattern from
    operators/skew.py applies, but at web-scale source cardinality the
    planner's hash partitioning spreads fine."""
    w = Window.partitionBy("source").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    return docs.select(
        "doc_id",
        "source",
        F.row_number().over(w).alias("source_rank"),
    ).withColumn("kept", F.col("source_rank") <= cap)


def source_cap_sql(src: str = "documents", cap: int = 100) -> str:
    return f"""
        SELECT doc_id, source, source_rank, source_rank <= {cap} AS kept
        FROM (
          SELECT doc_id, source, ROW_NUMBER() OVER (
            PARTITION BY source ORDER BY n_chars DESC, doc_id ASC)
            AS source_rank
          FROM {src}
        ) r
    """


# ------------------------------------------- DSIR importance weights
DSIR_BUCKETS = 128


def dsir_weights(
    docs: DataFrame,
    target_lang: str = "en",
    buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """DSIR importance weights (Xie et al., NeurIPS 2023 — "Data
    Selection for Language Models via Importance Resampling"): score
    every document by how much more likely its hashed-unigram bag is
    under a TARGET distribution (here: the ``target_lang`` slice, the
    stand-in for "looks like the high-quality domain") than under the
    RAW corpus distribution,

        log w(x) = Σ_b c_b(x) · (ln p̂_tgt[b] − ln p̂_raw[b])

    with add-one smoothing over ``buckets`` hashed features (the paper's
    hashed n-gram generative model; the pipeline then resamples docs
    with probability ∝ w — the score column IS the selection key, so the
    sampler downstream is :func:`weighted_priority_sample`).

    Shape at scale: token explode → one (doc, bucket) map-side-combinable
    aggregate; both feature distributions are ``buckets``-row aggregates
    of the SAME hashed relation (one pass, the target is a filtered
    re-aggregate, never a second tokenize); the per-bucket log-ratio
    table is O(buckets) and broadcast into the scoring join. Nothing
    after the first aggregate is corpus-sized except the per-doc reduce.

    Determinism contract: the log-ratio λ[b] is floor-scaled to an
    INTEGER micro-log-ratio (⌊λ·1e6⌋ as bigint — ln() of exact integer
    counts, quantized once per bucket), so the per-doc score is an EXACT
    bigint sum Σ c·λ_int divided once by 1e6 — no rounding boundary
    exists downstream of the quantization (a doc sum landing exactly on
    a half-grid edge flipped 2/500 rows under the earlier
    round-the-double-sum formulation).
    """
    from ..functions import HASH60_SPARK_SQL
    from .partitioning import spread

    h = HASH60_SPARK_SQL.format(x="term")
    hashed = (
        spread(docs)
        .select("doc_id", "lang", F.explode(tokens_col("text")).alias("term"))
        .select("doc_id", "lang", F.expr(f"({h}) % {buckets}").alias("bucket"))
    )
    doc_b = hashed.groupBy("doc_id", "bucket").agg(F.count("*").alias("c"))
    raw = hashed.groupBy("bucket").agg(F.count("*").alias("r"))
    tgt = (
        hashed.filter(F.col("lang") == target_lang)
        .groupBy("bucket")
        .agg(F.count("*").alias("t"))
    )
    # target ⊆ raw, so raw's bucket set is the support; absent target
    # buckets are genuine zeros under smoothing
    lam = raw.join(tgt, "bucket", "left").select(
        "bucket", F.coalesce("t", F.lit(0)).alias("t"), "r"
    )
    totals = lam.agg(F.sum("t").alias("tt"), F.sum("r").alias("rr"))
    lam6 = lam.crossJoin(F.broadcast(totals)).select(
        "bucket",
        F.floor(
            (
                F.log((F.col("t") + 1).cast("double"))
                - F.log((F.col("tt") + buckets).cast("double"))
                - F.log((F.col("r") + 1).cast("double"))
                + F.log((F.col("rr") + buckets).cast("double"))
            )
            * F.lit(1_000_000.0)
        )
        .cast("bigint")
        .alias("lam_int"),
    )
    return (
        doc_b.join(F.broadcast(lam6), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            (
                F.sum(F.col("c") * F.col("lam_int")).cast("double")
                / F.lit(1_000_000.0)
            ).alias("dsir_logw"),
        )
    )


def dsir_weights_sql(
    src: str = "documents",
    target_lang: str = "en",
    buckets: int = DSIR_BUCKETS,
) -> str:
    t = tokens_sql("text")
    h = _HASH60_DUCK.format(x="term")
    return f"""
        WITH hashed AS MATERIALIZED (
          SELECT doc_id, lang, ({h}) % {buckets} AS bucket
          FROM (SELECT doc_id, lang, UNNEST({t}) AS term FROM {src}) e
        ),
        doc_b AS (
          SELECT doc_id, bucket, COUNT(*) AS c FROM hashed GROUP BY 1, 2
        ),
        raw AS (SELECT bucket, COUNT(*) AS r FROM hashed GROUP BY 1),
        tgt AS (
          SELECT bucket, COUNT(*) AS t FROM hashed
          WHERE lang = '{target_lang}' GROUP BY 1
        ),
        lam AS MATERIALIZED (
          SELECT raw.bucket, COALESCE(tgt.t, 0) AS t, raw.r
          FROM raw LEFT JOIN tgt ON raw.bucket = tgt.bucket
        ),
        tot AS (SELECT SUM(t) AS tt, SUM(r) AS rr FROM lam),
        lam6 AS (
          SELECT bucket,
                 CAST(FLOOR((LN(t + 1) - LN(tt + {buckets})
                       - LN(r + 1) + LN(rr + {buckets}))
                       * 1000000.0) AS BIGINT) AS lam_int
          FROM lam, tot
        )
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS n_tokens,
               CAST(SUM(c * lam_int) AS DOUBLE) / 1000000.0 AS dsir_logw
        FROM doc_b JOIN lam6 USING (bucket)
        GROUP BY doc_id
    """


# ---------------------------------------------- per-source dup profile
def dup_rate_by_source(docs: DataFrame) -> DataFrame:
    """Per-source exact-duplication profile — the curation dashboard's
    "which feed is flooding us with copies" report, and the first place
    cross-source syndication (the same article arriving via N crawlers)
    becomes visible. Per source: doc count, docs whose normalized
    fingerprint occurs more than once corpus-wide, docs whose
    fingerprint also appears under ANOTHER source, and the dup rate.

    Shape at scale: one fingerprint projection (md5 of the normalized
    token join, the exact-dedup key), one fingerprint-keyed aggregate
    (|distinct fingerprints| rows), one fingerprint-keyed join back, one
    |sources|-row rollup — every exchange is keyed and combinable, and
    the wide text column is dropped before the first shuffle (only
    32-char fingerprints move).
    """
    fp = docs.select(
        "doc_id",
        "source",
        F.md5(F.array_join(tokens_col("text"), " ")).alias("fingerprint"),
    )
    fam = fp.groupBy("fingerprint").agg(
        F.count("*").alias("copies"),
        F.countDistinct("source").alias("n_sources"),
    )
    return (
        fp.join(fam, "fingerprint")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.when(F.col("copies") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_docs"),
            F.sum(F.when(F.col("n_sources") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_cross_source"),
            F.round(
                F.avg(F.when(F.col("copies") > 1, 1.0).otherwise(0.0)), 6
            ).alias("dup_rate"),
        )
    )


def dup_rate_by_source_sql(src: str = "documents") -> str:
    t = tokens_sql("text")
    return f"""
        WITH fp AS (
          SELECT doc_id, source,
                 md5(array_to_string({t}, ' ')) AS fingerprint
          FROM {src}
        ),
        fam AS (
          SELECT fingerprint, COUNT(*) AS copies,
                 COUNT(DISTINCT source) AS n_sources
          FROM fp GROUP BY 1
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN copies > 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_dup_docs,
               CAST(SUM(CASE WHEN n_sources > 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_cross_source,
               ROUND(AVG(CASE WHEN copies > 1 THEN 1.0 ELSE 0.0 END), 6)
                 AS dup_rate
        FROM fp JOIN fam USING (fingerprint)
        GROUP BY source
    """


# -------------------------------------------------- curation filter funnel
def filter_funnel(docs: DataFrame) -> DataFrame:
    """Stage-by-stage attrition through the standard curation cascade —
    language-ID → Gopher quality gate → exact dedup — the funnel report
    every curation run publishes (each row: docs entering the stage,
    survivors, dropped, survival ratio). The conjunction is CUMULATIVE
    in pipeline order, so the numbers answer "which stage costs us the
    most data" rather than scoring stages in isolation.

    Shape at scale: the three per-doc verdicts are each the documented
    map-stage / fingerprint-keyed shapes of their operators; they join
    on doc_id into ONE flag table, and the funnel itself is a single
    1-row aggregate unpivoted to |stages| rows — exact integer counts,
    so cross-engine equality is exact.
    """
    from .text import gopher_quality, language_id

    lang = language_id(docs).select(
        "doc_id", (F.col("detected_lang") != "und").alias("lang_ok")
    )
    goph = gopher_quality(docs).select(
        "doc_id", F.col("keep").alias("gopher_ok")
    )
    fp = docs.select(
        "doc_id",
        F.md5(F.array_join(tokens_col("text"), " ")).alias("fingerprint"),
    )
    keeper = fp.groupBy("fingerprint").agg(F.min("doc_id").alias("keeper_id"))
    uniq = fp.join(keeper, "fingerprint").select(
        "doc_id", (F.col("doc_id") == F.col("keeper_id")).alias("uniq_ok")
    )
    flags = (
        docs.select("doc_id")
        .join(lang, "doc_id")
        .join(goph, "doc_id")
        .join(uniq, "doc_id")
    )
    agg = flags.agg(
        F.count("*").alias("s0"),
        F.sum(F.when(F.col("lang_ok"), 1).otherwise(0)).alias("s1"),
        F.sum(
            F.when(F.col("lang_ok") & F.col("gopher_ok"), 1).otherwise(0)
        ).alias("s2"),
        F.sum(
            F.when(
                F.col("lang_ok") & F.col("gopher_ok") & F.col("uniq_ok"), 1
            ).otherwise(0)
        ).alias("s3"),
    )
    return agg.select(
        F.expr(
            "stack(3,"
            " 1, 'language_id',    s0, s1,"
            " 2, 'gopher_quality', s1, s2,"
            " 3, 'exact_dedup',    s2, s3"
            ") as (stage, stage_name, entered, survivors)"
        )
    ).select(
        "stage",
        "stage_name",
        F.col("entered").cast("long").alias("entered"),
        F.col("survivors").cast("long").alias("survivors"),
        (F.col("entered") - F.col("survivors")).cast("long").alias("dropped"),
        F.round(
            F.col("survivors")
            / F.nullif(F.col("entered"), F.lit(0)).cast("double"),
            6,
        ).alias("survival_ratio"),
    )


def filter_funnel_sql(src: str = "documents") -> str:
    from .text import gopher_quality_sql, language_id_sql

    t = tokens_sql("text")
    return f"""
        WITH lang AS MATERIALIZED (
          SELECT doc_id, detected_lang != 'und' AS lang_ok
          FROM ({language_id_sql(src)}) l
        ),
        goph AS MATERIALIZED (
          SELECT doc_id, keep AS gopher_ok FROM ({gopher_quality_sql(src)}) g
        ),
        fp AS MATERIALIZED (
          SELECT doc_id, md5(array_to_string({t}, ' ')) AS fingerprint
          FROM {src}
        ),
        keeper AS (
          SELECT fingerprint, MIN(doc_id) AS keeper_id FROM fp GROUP BY 1
        ),
        uniq AS (
          SELECT fp.doc_id, fp.doc_id = keeper_id AS uniq_ok
          FROM fp JOIN keeper USING (fingerprint)
        ),
        flags AS (
          SELECT d.doc_id, lang_ok, gopher_ok, uniq_ok
          FROM (SELECT doc_id FROM {src}) d
          JOIN lang USING (doc_id)
          JOIN goph USING (doc_id)
          JOIN uniq USING (doc_id)
        ),
        agg AS MATERIALIZED (
          SELECT COUNT(*) AS s0,
                 SUM(CASE WHEN lang_ok THEN 1 ELSE 0 END) AS s1,
                 SUM(CASE WHEN lang_ok AND gopher_ok THEN 1 ELSE 0 END) AS s2,
                 SUM(CASE WHEN lang_ok AND gopher_ok AND uniq_ok
                     THEN 1 ELSE 0 END) AS s3
          FROM flags
        ),
        stages AS (
          SELECT 1 AS stage, 'language_id' AS stage_name,
                 s0 AS entered, s1 AS survivors FROM agg
          UNION ALL
          SELECT 2, 'gopher_quality', s1, s2 FROM agg
          UNION ALL
          SELECT 3, 'exact_dedup', s2, s3 FROM agg
        )
        SELECT stage, stage_name,
               CAST(entered AS BIGINT) AS entered,
               CAST(survivors AS BIGINT) AS survivors,
               CAST(entered - survivors AS BIGINT) AS dropped,
               ROUND(survivors / CAST(NULLIF(entered, 0) AS DOUBLE), 6)
                 AS survival_ratio
        FROM stages
    """


# ------------------------------------------------ packing efficiency
def pack_efficiency(
    docs: DataFrame, token_budget: int = 256, n_shards: int = 32
) -> DataFrame:
    """Context-window utilization report over :func:`pack_sequences` —
    "how much of every training context am I wasting": bins grouped by
    fill decile (0..10, where 10 = exactly/over budget), with bin and
    doc counts and the mean fill ratio per band. A left-heavy histogram
    means the packer is leaving paid-for context tokens empty; the
    over-budget band counts long docs that spill past one window (the
    tokenizer splits those downstream).

    Shape: the packer's one shard-keyed window, then TWO map-side-
    combinable aggregates ((shard, bin) sums → |bands| rollup) — exact
    integer token counts end-to-end, so cross-engine equality is exact.
    """
    packed = pack_sequences(docs, token_budget, n_shards)
    bins = packed.groupBy("shard", "bin_id").agg(
        F.sum("n_tokens").alias("used"),
        F.count("*").alias("docs_in_bin"),
    )
    band = F.least(
        F.floor(F.col("used") * 10 / token_budget), F.lit(10)
    ).cast("int")
    return (
        bins.groupBy(band.alias("fill_band"))
        .agg(
            F.count("*").cast("long").alias("n_bins"),
            F.sum("docs_in_bin").cast("long").alias("n_docs"),
            F.round(
                F.avg(
                    F.least(
                        F.col("used") / F.lit(float(token_budget)), F.lit(1.0)
                    )
                ),
                6,
            ).alias("avg_fill"),
            F.sum(
                F.when(F.col("used") > token_budget, 1).otherwise(0)
            ).cast("long").alias("overflow_bins"),
        )
    )


def pack_efficiency_sql(
    src: str = "documents", token_budget: int = 256, n_shards: int = 32
) -> str:
    return f"""
        WITH packed AS ({pack_sequences_sql(src, token_budget, n_shards)}),
        bins AS (
          SELECT shard, bin_id, SUM(n_tokens) AS used,
                 COUNT(*) AS docs_in_bin
          FROM packed GROUP BY 1, 2
        )
        SELECT CAST(LEAST(FLOOR(used * 10 / {token_budget}), 10) AS INTEGER)
                 AS fill_band,
               CAST(COUNT(*) AS BIGINT) AS n_bins,
               CAST(SUM(docs_in_bin) AS BIGINT) AS n_docs,
               ROUND(AVG(LEAST(used / CAST({token_budget} AS DOUBLE), 1.0)), 6)
                 AS avg_fill,
               CAST(SUM(CASE WHEN used > {token_budget} THEN 1 ELSE 0 END)
                 AS BIGINT) AS overflow_bins
        FROM bins GROUP BY 1
    """


# ------------------------------------------------- n-gram novelty curve
def ngram_novelty(
    docs: DataFrame, n: int = 3, buckets: int = 10
) -> DataFrame:
    """Corpus novelty curve: scan the corpus in doc_id order and measure,
    per doc_id decile, what fraction of the distinct word n-grams are NEW
    — never seen in any earlier doc. This is the curation dashboard's
    diversity/saturation report: a healthy growing corpus keeps the tail
    buckets' novelty well above zero; a crawler stuck re-fetching the
    same sites shows novelty collapsing toward the exact-dup floor, and
    the knee tells you where additional ingestion stopped adding
    information (the data-scaling analogue of deduplication ROI).

    "First seen" is exact, not sketched: gram -> MIN(doc_id) via one
    gram-keyed map-side-combinable aggregate, joined back on gram — the
    same candidate shape as the dedup family, cost proportional to
    |distinct (doc, gram)| with no all-pairs stage. Buckets come from a
    1-row MAX(doc_id) broadcast (``least(buckets-1, floor(doc_id *
    buckets / (max_id + 1)))``), NOT a global ntile — nothing
    corpus-sized ever crosses one partition. Docs with fewer than ``n``
    tokens carry no grams and drop out (documented in the oracle too);
    the per-bucket novelty is a ratio of exact integer sums divided
    once, so there is no engine-order rounding hazard."""
    toked = docs.select("doc_id", tokens_col("text").alias("toks"))
    grams = toked.select(
        "doc_id",
        F.explode(F.array_distinct(word_ngrams_col("toks", n))).alias("gram"),
    )
    first = grams.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        grams.join(first, "gram")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).cast("long").alias("n_new"),
        )
    )
    mx = per_doc.agg(F.max("doc_id").alias("_max_id"))
    return (
        per_doc.join(F.broadcast(mx))
        .select(
            F.least(
                F.lit(buckets - 1),
                F.floor(
                    F.col("doc_id") * buckets / (F.col("_max_id") + 1)
                ),
            ).cast("int").alias("bucket"),
            "n_grams",
            "n_new",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_grams").cast("long").alias("grams"),
            F.sum("n_new").cast("long").alias("new_grams"),
            F.round(
                F.sum("n_new").cast("double") / F.sum("n_grams"), 6
            ).alias("novelty"),
        )
    )


def ngram_novelty_sql(
    src: str = "documents", n: int = 3, buckets: int = 10
) -> str:
    t = tokens_sql("text")
    g = word_ngrams_sql("toks", n)
    return f"""
        WITH toked AS (
          SELECT doc_id, {t} AS toks FROM {src}
        ),
        grams AS (
          SELECT doc_id, UNNEST(list_distinct({g})) AS gram FROM toked
        ),
        first AS (
          SELECT gram, MIN(doc_id) AS first_doc FROM grams GROUP BY 1
        ),
        per_doc AS (
          SELECT doc_id,
                 CAST(COUNT(*) AS BIGINT) AS n_grams,
                 CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_new
          FROM grams JOIN first USING (gram)
          GROUP BY 1
        ),
        mx AS (SELECT MAX(doc_id) AS _max_id FROM per_doc)
        SELECT CAST(LEAST({buckets - 1},
                 FLOOR(doc_id * {buckets} / (_max_id + 1))) AS INTEGER)
                 AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_grams) AS BIGINT) AS grams,
               CAST(SUM(n_new) AS BIGINT) AS new_grams,
               ROUND(CAST(SUM(n_new) AS DOUBLE) / SUM(n_grams), 6)
                 AS novelty
        FROM per_doc, mx
        GROUP BY 1
    """


# ---------------------------------------------- epoch budget allocation
EPOCH_BUDGET_TOKENS = 1_000_000
EPOCH_REPEAT_CAP = 4.0  # >4 epochs of repetition: diminishing returns


def epoch_budget(
    docs: DataFrame,
    group_col: str = "lang",
    budget_tokens: int = EPOCH_BUDGET_TOKENS,
    alpha: float = 0.5,
    repeat_cap: float = EPOCH_REPEAT_CAP,
) -> DataFrame:
    """Training-run token-budget allocation per corpus slice: combine the
    temperature-scaled mixture (w ∝ share^alpha, as
    :func:`mixture_weights`) with each slice's actual token supply to
    report how many EPOCHS of every slice the run would consume — the
    planning table that surfaces the repeated-data trap before training
    starts (a slice allocated 5x its supply repeats 5 times;
    ``repeat_risk`` flags slices past ``repeat_cap``, the
    published diminishing-returns knee for multi-epoch pretraining
    data). Per slice: docs, tokens, mixture weight, allocated tokens,
    effective epochs, and the risk verdict.

    Shape: one narrow token-count projection feeding a |slices|-row
    combinable aggregate, then two 1-row broadcasts (total + mixture
    normalizer) — nothing after the first reduce is data-sized."""
    per = docs.select(
        group_col, F.size(tokens_col("text")).alias("_tok")
    ).groupBy(group_col).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("_tok").cast("long").alias("n_tokens"),
    )
    tot = per.agg(F.sum("n_tokens").alias("_T"))
    scaled = per.join(F.broadcast(tot)).select(
        group_col,
        "n_docs",
        "n_tokens",
        F.pow(F.col("n_tokens") / F.col("_T"), F.lit(alpha)).alias("_s"),
    )
    z = scaled.agg(F.sum("_s").alias("_z"))
    w = F.col("_s") / F.col("_z")
    epochs = F.round(
        F.lit(float(budget_tokens)) * w / F.col("n_tokens"), 4
    )
    return scaled.join(F.broadcast(z)).select(
        group_col,
        "n_docs",
        "n_tokens",
        F.round(w, 6).alias("mixture_weight"),
        F.round(F.lit(float(budget_tokens)) * w, 2).alias("alloc_tokens"),
        epochs.alias("epochs"),
        (epochs > repeat_cap).alias("repeat_risk"),
    )


def epoch_budget_sql(
    src: str = "documents",
    group_col: str = "lang",
    budget_tokens: int = EPOCH_BUDGET_TOKENS,
    alpha: float = 0.5,
    repeat_cap: float = EPOCH_REPEAT_CAP,
) -> str:
    t = tokens_sql("text")
    return f"""
        WITH per AS (
          SELECT {group_col},
                 CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(len({t})) AS BIGINT) AS n_tokens
          FROM {src} GROUP BY {group_col}
        ),
        tot AS (SELECT SUM(n_tokens) AS _T FROM per),
        scaled AS (
          SELECT {group_col}, n_docs, n_tokens,
                 POWER(n_tokens / CAST(_T AS DOUBLE), {alpha}) AS _s
          FROM per, tot
        ),
        z AS (SELECT SUM(_s) AS _z FROM scaled)
        SELECT {group_col}, n_docs, n_tokens,
               ROUND(_s / _z, 6) AS mixture_weight,
               ROUND({float(budget_tokens)} * (_s / _z), 2) AS alloc_tokens,
               ROUND({float(budget_tokens)} * (_s / _z) / n_tokens, 4)
                 AS epochs,
               ROUND({float(budget_tokens)} * (_s / _z) / n_tokens, 4)
                 > {repeat_cap} AS repeat_risk
        FROM scaled, z
    """


# -------------------------------------- per-source unigram JS divergence
def source_unigram_jsd(
    docs: DataFrame, buckets: int = DSIR_BUCKETS
) -> DataFrame:
    """Data-mixture health metric: per source, the Jensen-Shannon
    divergence (nats; bounded by ln 2) between that source's hashed-
    unigram distribution and the whole corpus' — the dashboard number
    that ranks feeds by "how different is this slice's vocabulary from
    the mixture", flags a feed drifting off-domain, and feeds mixture
    re-weighting decisions next to :func:`mixture_weights` (JSD is the
    symmetric, finite alternative to the KL score DSIR uses — defined
    even where supports differ).

    Distributions live on the same ``buckets`` hashed features as
    :func:`dsir_weights` (one token pass, |buckets|-row model), add-one
    smoothed over the corpus support so every grid cell has positive
    mass. The per-source sum runs over a |sources| x |support| dense
    grid (broadcast cross join of two tiny aggregates — at B=128 this
    is dashboard-sized at any corpus scale).

    Determinism: each grid term p·ln(p/m) + q·ln(q/m) is floor-scaled
    to a 1e-9-grid integer and summed EXACTLY in bigint, one division +
    rounding at the end (the DSIR integer-sum lesson: never sum raw
    doubles that feed a rounding boundary)."""
    from ..functions import HASH60_SPARK_SQL
    from .partitioning import materialize, spread

    h = HASH60_SPARK_SQL.format(x="term")
    hashed = (
        spread(docs)
        .select("source", F.explode(tokens_col("text")).alias("term"))
        .select("source", F.expr(f"({h}) % {buckets}").alias("bucket"))
    )
    sb = materialize(
        hashed.groupBy("source", "bucket").agg(F.count("*").alias("cs"))
    )
    qb = materialize(hashed.groupBy("bucket").agg(F.count("*").alias("cb")))
    tot = qb.agg(
        F.count("*").alias("bs"), F.sum("cb").alias("big_n")
    )
    ns = sb.groupBy("source").agg(F.sum("cs").alias("n_tokens"))
    grid = (
        ns.crossJoin(F.broadcast(qb))
        .crossJoin(F.broadcast(tot))
        .join(sb, ["source", "bucket"], "left")
        .select(
            "source",
            "n_tokens",
            F.expr(
                "(coalesce(cs, 0) + 1) / cast(n_tokens + bs as double)"
            ).alias("p"),
            F.expr("(cb + 1) / cast(big_n + bs as double)").alias("q"),
        )
    )
    term = (
        "p * ln(p / ((p + q) / 2)) + q * ln(q / ((p + q) / 2))"
    )
    return (
        grid.select(
            "source",
            "n_tokens",
            F.expr(
                f"cast(floor(({term}) * 1e9) as bigint)"
            ).alias("_t9"),
        )
        .groupBy("source")
        .agg(
            F.first("n_tokens").cast("long").alias("n_tokens"),
            F.round(
                F.lit(0.5) * F.sum("_t9").cast("double") / F.lit(1e9), 6
            ).alias("jsd"),
        )
    )


def source_unigram_jsd_sql(
    src: str = "documents", buckets: int = DSIR_BUCKETS
) -> str:
    t = tokens_sql("text")
    h = _HASH60_DUCK.format(x="term")
    term = "p * LN(p / ((p + q) / 2)) + q * LN(q / ((p + q) / 2))"
    return f"""
        WITH hashed AS MATERIALIZED (
          SELECT source, ({h}) % {buckets} AS bucket
          FROM (SELECT source, UNNEST({t}) AS term FROM {src}) e
        ),
        sb AS MATERIALIZED (
          SELECT source, bucket, COUNT(*) AS cs FROM hashed GROUP BY 1, 2
        ),
        qb AS MATERIALIZED (
          SELECT bucket, COUNT(*) AS cb FROM hashed GROUP BY 1
        ),
        tot AS (SELECT COUNT(*) AS bs, SUM(cb) AS big_n FROM qb),
        ns AS (SELECT source, SUM(cs) AS n_tokens FROM sb GROUP BY 1),
        grid AS (
          SELECT ns.source, ns.n_tokens,
                 (COALESCE(sb.cs, 0) + 1)
                   / CAST(ns.n_tokens + tot.bs AS DOUBLE) AS p,
                 (qb.cb + 1) / CAST(tot.big_n + tot.bs AS DOUBLE) AS q
          FROM ns CROSS JOIN qb CROSS JOIN tot
          LEFT JOIN sb ON sb.source = ns.source AND sb.bucket = qb.bucket
        )
        SELECT source,
               CAST(MIN(n_tokens) AS BIGINT) AS n_tokens,
               ROUND(0.5 * CAST(SUM(CAST(FLOOR(({term}) * 1e9) AS BIGINT))
                     AS DOUBLE) / 1e9, 6) AS jsd
        FROM grid GROUP BY source
    """


# --------------------------------------- dedup-cluster-safe split audit
def cluster_safe_split(
    docs: DataFrame,
    weights: dict[str, float] | None = None,
    salt: str = "split-v1",
    prefix_tokens: int = 8,
) -> DataFrame:
    """Leakage-safe splitting: hashing DOC IDS into train/val/test puts
    two copies of the same document on opposite sides of the split — the
    eval set then *contains the training data* and every benchmark
    number is inflated. The fix is to split on the dedup-cluster key
    (here the exact-dedup fingerprint; with near-dup clusters, the CC
    cluster_id) so a whole duplicate family lands in ONE split.

    Output contrasts both strategies side by side: per (strategy,
    split): doc and distinct-group counts, plus the strategy's count of
    STRADDLING groups (fingerprints whose copies land in >1 split) —
    positive for the naive doc-id split wherever duplicates exist, ZERO
    by construction for the cluster-safe split. This is the audit row a
    training pipeline pins before trusting held-out numbers.

    Shape at scale: one fingerprint projection, two pure per-row hash
    projections (no shuffle), and fingerprint-keyed aggregates — the
    same exchanges exact dedup already pays.
    """
    from .text import tokens_col

    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    items = list(weights.items())

    def split_of(col) -> F.Column:
        bucket = stable_long_hash(col, salt=salt) % SPLIT_BUCKETS
        expr = None
        acc = 0.0
        for name, w in items[:-1]:
            acc += w
            cond = bucket < int(round(acc * SPLIT_BUCKETS))
            expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        return expr.otherwise(items[-1][0])

    fp = docs.select(
        "doc_id",
        F.md5(
            F.array_join(
                F.slice(tokens_col("text"), 1, prefix_tokens), " "
            )
        ).alias("fp"),
    )
    tagged = fp.select(
        "fp",
        split_of(F.col("doc_id").cast("string")).alias("naive"),
        split_of(F.col("fp")).alias("safe"),
    )
    long = tagged.select(
        F.lit("doc_id_hash").alias("strategy"),
        F.col("naive").alias("split"),
        "fp",
    ).unionByName(
        tagged.select(
            F.lit("cluster_safe").alias("strategy"),
            F.col("safe").alias("split"),
            "fp",
        )
    )
    per = long.groupBy("strategy", "split").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.countDistinct("fp").cast("long").alias("n_groups"),
    )
    straddle = (
        long.groupBy("strategy", "fp")
        .agg(F.countDistinct("split").alias("_ns"))
        .groupBy("strategy")
        .agg(
            F.sum(F.when(F.col("_ns") > 1, 1).otherwise(0))
            .cast("long")
            .alias("straddling_groups")
        )
    )
    return per.join(straddle, "strategy").orderBy("strategy", "split")


def cluster_safe_split_sql(
    src: str = "documents",
    weights: dict[str, float] | None = None,
    salt: str = "split-v1",
    prefix_tokens: int = 8,
) -> str:
    from .text import tokens_sql

    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    items = list(weights.items())

    def case_of(x: str) -> str:
        h = _HASH60_DUCK.format(x=f"'{salt}' || {x}")
        acc = 0.0
        cases = []
        for name, w in items[:-1]:
            acc += w
            cases.append(
                f"WHEN {h} % {SPLIT_BUCKETS}"
                f" < {int(round(acc * SPLIT_BUCKETS))} THEN '{name}'"
            )
        return "CASE " + " ".join(cases) + f" ELSE '{items[-1][0]}' END"

    t = tokens_sql("text")
    return f"""
        WITH fp AS (
          SELECT doc_id,
                 md5(array_to_string(
                   list_slice({t}, 1, {int(prefix_tokens)}), ' ')) AS fp
          FROM {src}
        ),
        tagged AS (
          SELECT fp,
                 {case_of("CAST(doc_id AS VARCHAR)")} AS naive,
                 {case_of("fp")} AS safe
          FROM fp
        ),
        long AS (
          SELECT 'doc_id_hash' AS strategy, naive AS split, fp FROM tagged
          UNION ALL
          SELECT 'cluster_safe', safe, fp FROM tagged
        ),
        per AS (
          SELECT strategy, split,
                 CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_groups
          FROM long GROUP BY 1, 2
        ),
        straddle AS (
          SELECT strategy,
                 CAST(SUM(CASE WHEN _ns > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS straddling_groups
          FROM (
            SELECT strategy, fp, COUNT(DISTINCT split) AS _ns
            FROM long GROUP BY 1, 2
          ) x GROUP BY strategy
        )
        SELECT per.strategy, per.split, per.n_docs, per.n_groups,
               straddle.straddling_groups
        FROM per JOIN straddle USING (strategy)
        ORDER BY strategy, split
    """


# ------------------------------------ deterministic mixture interleave
def interleave_schedule(
    docs: DataFrame, first_n: int = 200, salt: str = "interleave-v1"
) -> DataFrame:
    """Deterministic weighted interleave — the replayable ORDER in which
    a training job consumes a multi-source mixture (stride/virtual-time
    scheduling, the WFQ discipline): doc r of source s is served at
    virtual time r/w_s, so at every prefix of the stream each source's
    share tracks its weight — no RNG state, reproducible from scratch
    on any cluster, stable under corpus growth.

    Audit output per source: corpus share (the proportional weight),
    the source's count in the first ``first_n`` served docs, the
    observed share, and an on-schedule verdict (|observed − target|
    bounded by the granularity 1.5·|sources|/first_n + one stride).

    Determinism: within-source order is the md5 shuffle rank; virtual
    time is the exact bigint ``r·10¹² // n_s`` (both engines truncate
    toward zero on positive operands); the global order is a total
    order on (vtime, source, rank). The schedule position is served per
    RANGE-shard of virtual time (``global_row_positions``: deterministic
    width-buckets of ``_vt``, per-shard ``row_number``, broadcast
    offsets) — the global sort never lands on one task (r8 verdict
    weak #3), and ``_vt`` is near-uniform on [0, 10¹²] by construction,
    so the shards balance.
    """
    from .partitioning import global_row_positions
    n_tot = docs.count()
    per_src = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    ranked = docs.select(
        "doc_id",
        "source",
        F.row_number()
        .over(
            Window.partitionBy("source").orderBy(
                F.md5(F.concat(F.lit(salt), F.col("doc_id").cast("string"))),
                "doc_id",
            )
        )
        .alias("r"),
    )
    v = ranked.join(per_src, "source").select(
        "doc_id",
        "source",
        "r",
        # pure bigint stride: overflows only past ~9.2M docs per source,
        # where the schedule would shard by source anyway
        F.expr(
            "(cast(r as bigint) * 1000000000000L) div n_docs"
        ).alias("_vt"),
    )
    pos = global_row_positions(v, "_vt", ["source", "r"], out_col="pos").select(
        "source", "pos"
    )
    head = pos.filter(F.col("pos") <= first_n)
    obs = head.groupBy("source").agg(
        F.count("*").cast("long").alias(f"in_first_{first_n}")
    )
    return (
        per_src.join(obs, "source", "left")
        .na.fill(0)
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.round(F.col("n_docs") / F.lit(float(n_tot)), 6).alias(
                "target_share"
            ),
            F.col(f"in_first_{first_n}"),
            F.round(
                F.col(f"in_first_{first_n}") / F.lit(float(first_n)), 6
            ).alias("observed_share"),
        )
        .withColumn(
            "on_schedule",
            F.abs(F.col("observed_share") - F.col("target_share"))
            <= F.col("target_share") / first_n + F.lit(1.5 / first_n),
        )
    )


def interleave_schedule_sql(
    src: str = "documents", first_n: int = 200, salt: str = "interleave-v1"
) -> str:
    return f"""
        WITH per_src AS (
          SELECT source, COUNT(*) AS n_docs FROM {src} GROUP BY source
        ),
        tot AS (SELECT COUNT(*) AS n FROM {src}),
        ranked AS (
          SELECT doc_id, source,
                 ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5('{salt}' || CAST(doc_id AS VARCHAR)),
                            doc_id) AS r
          FROM {src}
        ),
        v AS (
          SELECT ranked.doc_id, ranked.source, ranked.r,
                 (CAST(ranked.r AS BIGINT) * 1000000000000)
                   // per_src.n_docs AS _vt
          FROM ranked JOIN per_src USING (source)
        ),
        pos AS (
          SELECT source,
                 ROW_NUMBER() OVER (ORDER BY _vt, source, r) AS pos
          FROM v
        ),
        obs AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS in_first_{first_n}
          FROM pos WHERE pos <= {int(first_n)} GROUP BY source
        )
        SELECT p.source,
               CAST(p.n_docs AS BIGINT) AS n_docs,
               ROUND(p.n_docs / CAST(tot.n AS DOUBLE), 6) AS target_share,
               COALESCE(obs.in_first_{first_n}, 0) AS in_first_{first_n},
               ROUND(COALESCE(obs.in_first_{first_n}, 0)
                     / CAST({int(first_n)} AS DOUBLE), 6)
                 AS observed_share,
               ABS(ROUND(COALESCE(obs.in_first_{first_n}, 0)
                     / CAST({int(first_n)} AS DOUBLE), 6)
                   - ROUND(p.n_docs / CAST(tot.n AS DOUBLE), 6))
                 <= ROUND(p.n_docs / CAST(tot.n AS DOUBLE), 6)
                    / {int(first_n)} + 1.5 / {int(first_n)} AS on_schedule
        FROM per_src p CROSS JOIN tot
        LEFT JOIN obs USING (source)
    """


# ------------------------------------------------- canary scan
CANARY_PROBES: tuple[str, ...] = (
    "canary-2f9d-4e1b-deadbeef",
    "hash value table",
    "merge batch part",
)


def canary_scan(
    docs: DataFrame, canaries: tuple[str, ...] = CANARY_PROBES
) -> DataFrame:
    """Benchmark-canary detection — the decontamination practice of
    planting unique marker strings (GUID canaries) in held-out sets and
    scanning training corpora for them (the published big-bench /
    training-data-extraction hygiene check). For every probe string:
    documents hit, total occurrences (exact substring count), and the
    first offending doc_id — zero hits is the healthy answer for a real
    canary; the phrase probes demonstrate the hit path.

    Exact occurrence counting with no UDF:
    ``(len(text) - len(replace(text, c, ''))) / len(c)`` — pure codegen
    string ops, identical on both engines. Shape: ONE corpus scan
    against the broadcast |canaries| probe list (bounded fan-out per
    row); the report is |canaries| rows, zero-hit probes included."""
    spark = docs.sparkSession
    probe_df = spark.createDataFrame(
        [(c,) for c in canaries], "canary string"
    )
    hits = (
        docs.crossJoin(F.broadcast(probe_df))
        .select(
            "doc_id",
            "canary",
            F.expr(
                "(length(text) - length(replace(text, canary, '')))"
                " div length(canary)"
            ).alias("occ"),
        )
        .filter(F.col("occ") > 0)
        .groupBy("canary")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("occ").cast("long").alias("total_occurrences"),
            F.min("doc_id").alias("first_doc_id"),
        )
    )
    return (
        probe_df.join(hits, "canary", "left")
        .select(
            "canary",
            F.coalesce("n_docs", F.lit(0)).cast("long").alias("n_docs"),
            F.coalesce("total_occurrences", F.lit(0))
            .cast("long")
            .alias("total_occurrences"),
            F.col("first_doc_id").cast("long").alias("first_doc_id"),
        )
        .orderBy("canary")
    )


def canary_scan_sql(
    src: str = "documents", canaries: tuple[str, ...] = CANARY_PROBES
) -> str:
    probe_rows = " UNION ALL ".join(
        f"SELECT '{c}' AS canary" for c in canaries
    )
    return f"""
        WITH probes AS ({probe_rows}),
        hits AS (
          SELECT canary,
                 CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(occ) AS BIGINT) AS total_occurrences,
                 MIN(doc_id) AS first_doc_id
          FROM (
            SELECT d.doc_id, p.canary,
                   (length(d.text) - length(replace(d.text, p.canary, '')))
                     // length(p.canary) AS occ
            FROM {src} d CROSS JOIN probes p
          ) WHERE occ > 0
          GROUP BY canary
        )
        SELECT p.canary,
               COALESCE(h.n_docs, 0) AS n_docs,
               COALESCE(h.total_occurrences, 0) AS total_occurrences,
               h.first_doc_id
        FROM probes p LEFT JOIN hits h ON p.canary = h.canary
        ORDER BY p.canary
    """


# ------------------------------------------- Neyman optimal allocation
NEYMAN_BUDGET = 1000


def neyman_allocation(
    events: DataFrame, budget: int = NEYMAN_BUDGET
) -> DataFrame:
    """Neyman-optimal stratified sample design: allocate a fixed row
    budget across strata proportional to ``N_h · S_h`` (stratum size x
    stratum std-dev) — the textbook-optimal split that
    :func:`stratified_sample`'s hand-picked fractions approximate. This
    is the DESIGN step (per-stratum sample sizes); feeding them into the
    md5-ordered draw is the existing fixed-n machinery.

    Determinism: per-stratum variance numerators are exact bigints over
    integer cents (``n·Σx² − (Σx)²``); S_h is one sqrt of an identical
    double on both engines; integerization uses the largest-remainder
    method — bases are exact floors, the +1 top-up ranks on the
    e9-floor-scaled remainder with a stratum-name tiebreak, so the
    allocation sums to the budget EXACTLY and is bit-stable.

    Shape: one combinable per-stratum reduce, then everything lives in
    the |strata|-row table (two 1-row broadcasts)."""
    g = (
        events.filter(F.col("value").isNotNull())
        .select(
            "event_type",
            # decimal(38,0): exact like bigint but 128-bit-safe — sx*sx
            # overflows a long at production stratum sizes (DuckDB's
            # SUM(BIGINT) is already HUGEINT), found by tools/scale_smoke.py
            F.expr(
                "CAST(CAST(floor(value * 100 + 0.5) AS BIGINT)"
                " AS DECIMAL(38,0))"
            ).alias("x"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("x").alias("sx"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
        .select(
            "event_type",
            "n_rows",
            F.expr(
                "CASE WHEN n_rows > 1 THEN"
                " sqrt((n_rows * sxx - sx * sx)"
                "      / (CAST(n_rows AS DOUBLE) * (n_rows - 1)))"
                " ELSE 0.0 END"
            ).alias("s_cents"),
        )
        .select(
            "event_type",
            "n_rows",
            "s_cents",
            (F.col("n_rows") * F.col("s_cents")).alias("w"),
        )
    )
    tot = g.agg(
        F.sum("w").alias("w_tot"), F.sum("n_rows").alias("nr_tot")
    )
    # all-zero-variance corner: Neyman degenerates to proportional
    # allocation (w_h -> N_h), never a 0/0
    share = (
        f"CASE WHEN w_tot > 0 THEN {int(budget)} * w / w_tot"
        f" ELSE {int(budget)} * n_rows / CAST(nr_tot AS DOUBLE) END"
    )
    based = g.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "n_rows",
        F.expr("CAST(floor(s_cents * 1e6 + 0.5) AS BIGINT)").alias(
            "stddev_cents_e6"
        ),
        F.expr(f"CAST(floor({share}) AS BIGINT)").alias("base_n"),
        F.expr(
            f"CAST(floor(({share} - floor({share})) * 1e9 + 0.5) AS BIGINT)"
        ).alias("rem_e9"),
    )
    deficit = based.agg(
        (F.lit(int(budget)) - F.sum("base_n")).alias("_d")
    )
    from pyspark.sql import Window

    rk = F.row_number().over(
        Window.orderBy(F.desc("rem_e9"), F.asc("event_type"))
    )
    return (
        based.crossJoin(F.broadcast(deficit))
        .withColumn("_rk", rk)
        .select(
            "event_type",
            "n_rows",
            "stddev_cents_e6",
            F.expr(
                "CAST(base_n + CASE WHEN _rk <= _d THEN 1 ELSE 0 END"
                " AS BIGINT)"
            ).alias("alloc_n"),
        )
        .orderBy("event_type")
    )


def neyman_allocation_sql(
    src: str = "events", budget: int = NEYMAN_BUDGET
) -> str:
    return f"""
        WITH g AS (
          SELECT event_type, COUNT(*) AS n_rows,
                 SUM(x) AS sx, SUM(x * x) AS sxx
          FROM (SELECT event_type,
                       CAST(floor(value * 100 + 0.5) AS BIGINT) AS x
                FROM {src} WHERE value IS NOT NULL) q
          GROUP BY 1
        ),
        s AS (
          SELECT event_type, n_rows,
                 CASE WHEN n_rows > 1 THEN
                   sqrt((n_rows * sxx - sx * sx)
                        / (CAST(n_rows AS DOUBLE) * (n_rows - 1)))
                 ELSE 0.0 END AS s_cents
          FROM g
        ),
        w AS (SELECT *, n_rows * s_cents AS w FROM s),
        tot AS (
          SELECT SUM(w) AS w_tot, SUM(n_rows) AS nr_tot FROM w
        ),
        based AS (
          SELECT event_type, n_rows,
                 CAST(floor(s_cents * 1e6 + 0.5) AS BIGINT)
                   AS stddev_cents_e6,
                 CAST(floor(CASE WHEN w_tot > 0
                            THEN {int(budget)} * w / w_tot
                            ELSE {int(budget)} * n_rows
                                 / CAST(nr_tot AS DOUBLE) END)
                      AS BIGINT) AS base_n,
                 CAST(floor((CASE WHEN w_tot > 0
                             THEN {int(budget)} * w / w_tot
                             ELSE {int(budget)} * n_rows
                                  / CAST(nr_tot AS DOUBLE) END
                             - floor(CASE WHEN w_tot > 0
                               THEN {int(budget)} * w / w_tot
                               ELSE {int(budget)} * n_rows
                                    / CAST(nr_tot AS DOUBLE) END))
                            * 1e9 + 0.5) AS BIGINT) AS rem_e9
          FROM w CROSS JOIN tot
        ),
        deficit AS (
          SELECT {int(budget)} - SUM(base_n) AS _d FROM based
        ),
        ranked AS (
          SELECT *, ROW_NUMBER() OVER (
            ORDER BY rem_e9 DESC, event_type ASC) AS _rk
          FROM based
        )
        SELECT event_type, n_rows, stddev_cents_e6,
               CAST(base_n + CASE WHEN _rk <= _d THEN 1 ELSE 0 END
                    AS BIGINT) AS alloc_n
        FROM ranked CROSS JOIN deficit
        ORDER BY event_type
    """


# --------------------------------------------- purged time-series folds
def purged_time_split(
    events: DataFrame, k: int = 5, embargo_days: int = 2
) -> DataFrame:
    """Purged k-fold assignment for time-ordered data — the
    leakage-safe cross-validation layout (de Prado's purged CV): days
    split into k contiguous folds by calendar order, and the first
    ``embargo_days`` days of each fold AFTER the first are EMBARGOED
    (excluded from training) so serial correlation can't leak the
    previous fold's information across the boundary.

    All bookkeeping rides the |days|-row aggregated table (the raw
    stream contributes one count aggregate); fold id is closed-form
    ``(idx-1)*k div D`` so the embargo test needs NO second window —
    a day is embargoed iff its fold differs from the fold of the day
    ``embargo_days`` earlier. Exact integers everywhere."""
    days = (
        events.select(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .groupBy("day")
        .agg(F.count("*").alias("n_rows"))
    )
    w = Window.orderBy("day")  # |days| rows only — never the raw stream
    # total-day count as an unbounded window over the SAME (empty
    # partition, day-order) spec: one exchange+sort evaluates both
    # exprs, and no cross join enters the plan (the audit bans
    # undeclared cartesians; the DuckDB twin is COUNT(*) OVER ())
    w_all = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    idxed = (
        days.withColumn("idx", F.row_number().over(w))
        .withColumn("n_days", F.count("*").over(w_all))
        .select(
            "day",
            "n_rows",
            F.expr(f"(idx - 1) * {k} div n_days").alias("fold"),
            F.when(
                F.col("idx") - embargo_days >= 1,
                F.expr(
                    f"(idx - 1 - {embargo_days}) * {k} div n_days"
                ),
            ).alias("prev_fold"),
        )
        .select(
            "day",
            "n_rows",
            "fold",
            (
                F.col("prev_fold").isNotNull()
                & (F.col("prev_fold") != F.col("fold"))
            ).alias("embargoed"),
        )
    )
    return (
        idxed.groupBy("fold")
        .agg(
            F.count("*").alias("n_days"),
            F.sum("n_rows").alias("n_rows"),
            F.sum(F.when(F.col("embargoed"), F.col("n_rows")).otherwise(0))
            .alias("n_embargo_rows"),
            F.min("day").alias("day_min"),
            F.max("day").alias("day_max"),
        )
        .orderBy("fold")
    )


def purged_time_split_sql(
    src: str = "events", k: int = 5, embargo_days: int = 2
) -> str:
    """DuckDB twin of :func:`purged_time_split`."""
    return f"""
        WITH days AS (
          SELECT strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n_rows
          FROM {src} GROUP BY 1
        ),
        idxed AS (
          SELECT day, n_rows,
                 ROW_NUMBER() OVER (ORDER BY day) AS idx,
                 COUNT(*) OVER () AS n_days
          FROM days
        ),
        flagged AS (
          SELECT day, n_rows,
                 (idx - 1) * {k} // n_days AS fold,
                 CASE WHEN idx - {embargo_days} >= 1
                      THEN (idx - 1 - {embargo_days}) * {k} // n_days
                 END AS prev_fold
          FROM idxed
        )
        SELECT CAST(fold AS BIGINT) AS fold,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(n_rows) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN prev_fold IS NOT NULL
                              AND prev_fold != fold
                             THEN n_rows ELSE 0 END) AS BIGINT)
                 AS n_embargo_rows,
               MIN(day) AS day_min,
               MAX(day) AS day_max
        FROM flagged
        GROUP BY 1
        ORDER BY 1
    """


# ------------------------------------------- cross-source overlap matrix
def source_overlap_matrix(
    docs: DataFrame, n: int = 3, max_gram_df: int | None = None
) -> DataFrame:
    """Pairwise n-gram overlap between SOURCES — the corpus-level
    contamination/redundancy map (which feeds deduplicate-before-mixing
    decisions: two crawls with 40% containment shouldn't both enter the
    mixture at full weight).

    Geometry: distinct (source, gram) pairs — the reduction that makes
    everything downstream |vocab|-sized — then a gram-keyed self-join
    emits only co-occurring source pairs (never the |sources|² cross
    product); per-source gram counts broadcast back for the exact
    integer containment/Jaccard ppm. ``max_gram_df`` drops grams present
    in more than that many sources (boilerplate guard — at thousands of
    sources a universal gram would emit df² pairs; 20 fixture sources
    need no cap)."""
    from .partitioning import spread

    grams = (
        spread(docs)
        .select("source", tokens_col("text").alias("toks"))
        .select(
            "source", F.explode(word_ngrams_col("toks", n)).alias("g")
        )
        .distinct()
    )
    if max_gram_df is not None:
        ok = (
            grams.groupBy("g")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_gram_df)
            .select("g")
        )
        grams = grams.join(ok, "g")
    sizes = grams.groupBy("source").agg(F.count("*").alias("n_grams"))
    pairs = (
        grams.alias("a")
        .join(grams.alias("b"), "g")
        .filter(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("src_a"),
            F.col("b.source").alias("src_b"),
        )
        .agg(F.count("*").alias("n_shared"))
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("n_grams").alias("na"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("n_grams").alias("nb"))
    return (
        pairs.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_shared",
            F.expr("n_shared * 1000000 div least(na, nb)")
            .alias("containment_ppm"),
            F.expr("n_shared * 1000000 div (na + nb - n_shared)")
            .alias("jaccard_ppm"),
        )
        .orderBy("src_a", "src_b")
    )


def source_overlap_matrix_sql(src: str = "documents", n: int = 3) -> str:
    """DuckDB twin of :func:`source_overlap_matrix`."""
    toks = tokens_sql("text")
    return f"""
        WITH grams AS (
          SELECT DISTINCT source, g
          FROM (
            SELECT source,
                   unnest({word_ngrams_sql(f'({toks})', n)}) AS g
            FROM {src}
          )
        ),
        sizes AS (
          SELECT source, COUNT(*) AS n_grams FROM grams GROUP BY 1
        ),
        pairs AS (
          SELECT a.source AS src_a, b.source AS src_b,
                 COUNT(*) AS n_shared
          FROM grams a JOIN grams b ON a.g = b.g AND a.source < b.source
          GROUP BY 1, 2
        )
        SELECT p.src_a, p.src_b,
               CAST(p.n_shared AS BIGINT) AS n_shared,
               CAST(p.n_shared * 1000000 // least(sa.n_grams, sb.n_grams)
                    AS BIGINT) AS containment_ppm,
               CAST(p.n_shared * 1000000
                    // (sa.n_grams + sb.n_grams - p.n_shared)
                    AS BIGINT) AS jaccard_ppm
        FROM pairs p
        JOIN sizes sa ON sa.source = p.src_a
        JOIN sizes sb ON sb.source = p.src_b
        ORDER BY 1, 2
    """
