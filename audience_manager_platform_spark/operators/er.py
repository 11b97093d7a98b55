"""Entity resolution: blocked fuzzy matching by edit distance.

The record-linkage primitive a 100 TB catalog/CRM pipeline needs —
"are these two rows the same real-world thing" — expressed with the
same candidate-generation discipline as the dedup family: never
all-pairs. Candidates come from an equi-join on a cheap deterministic
blocking key (here the first name token), are thinned by an exact
agreement predicate on a second attribute (brand), and only then pay
the expensive edit-distance comparison. Recall lost to blocking is the
standard ER trade; production pipelines union several blocking passes
(first token, last token, sorted-token prefix) through this same
operator.

Scale shape: one projection derives the block key (no shuffle beyond
the block-key equi-join), candidate cost is Σ|block|² bounded by the
key's selectivity, and ``levenshtein`` runs JVM-side inside codegen —
no Python in the loop. Both engines implement classic unit-cost
Levenshtein, and the similarity is a ratio of exact integers, so the
oracle comparison is deterministic.

Reference scope note: the reference has no fuzzy-match capability at
all (its segment engine is exact-predicate only,
``backend/app/processor/spark_processor.py``); this extends the engine
the direction a curation/CRM workload actually grows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_blocked_pairs(
    df: DataFrame,
    key_col: str,
    name_col: str,
    agree_col: str | None = None,
    max_distance: int = 3,
) -> DataFrame:
    """Blocked fuzzy self-match: pair rows whose ``name_col`` values
    share a blocking key (first whitespace token) and an exact
    ``agree_col`` value, keep pairs with edit distance in
    ``1..max_distance`` (0 is exact dedup's job, not ER's), and score
    ``similarity = 1 - dist / max(len_a, len_b)``.

    Output is one row per matched pair with ``key_col`` ids ordered
    (a < b) — a stable, re-runnable match table.
    """
    base = df.select(
        F.col(key_col).alias("_k"),
        F.col(name_col).alias("_name"),
        *([F.col(agree_col).alias("_agree")] if agree_col else []),
        F.split_part(F.col(name_col), F.lit(" "), F.lit(1)).alias("_blk"),
    )
    left = base.select(
        F.col("_k").alias("a_key"),
        F.col("_name").alias("a_name"),
        *([F.col("_agree").alias("_agree_a")] if agree_col else []),
        "_blk",
    )
    right = base.select(
        F.col("_k").alias("b_key"),
        F.col("_name").alias("b_name"),
        *([F.col("_agree").alias("_agree_b")] if agree_col else []),
        "_blk",
    )
    cond = [F.col("a_key") < F.col("b_key")]
    if agree_col:
        cond.append(F.col("_agree_a") == F.col("_agree_b"))
    pairs = left.join(right, on="_blk").filter(
        cond[0] if len(cond) == 1 else cond[0] & cond[1]
    )
    # bounded (3-arg) levenshtein: exact for distances <= max_distance,
    # -1 beyond — the banded DP costs O(max_distance * len) instead of
    # O(len²) on the dominant non-matching candidates, and the -1 rows
    # are exactly the rows the BETWEEN filter already dropped
    dist = F.levenshtein(
        F.col("a_name"), F.col("b_name"), int(max_distance)
    )
    out = pairs.select(
        "a_key",
        "b_key",
        "a_name",
        "b_name",
        dist.cast("long").alias("edit_distance"),
        F.round(
            F.lit(1.0)
            - dist
            / F.greatest(F.length("a_name"), F.length("b_name")).cast(
                "double"
            ),
            6,
        ).alias("similarity"),
    ).filter(
        (F.col("edit_distance") >= 1)
        & (F.col("edit_distance") <= max_distance)
    )
    return out


def fuzzy_blocked_pairs_sql(
    src: str,
    key_col: str,
    name_col: str,
    agree_col: str | None = None,
    max_distance: int = 3,
) -> str:
    agree_sel = f", {agree_col} AS _agree" if agree_col else ""
    agree_join = "AND x._agree = y._agree" if agree_col else ""
    return f"""
        WITH b AS (
          SELECT {key_col} AS _k, {name_col} AS _name{agree_sel},
                 split_part({name_col}, ' ', 1) AS _blk
          FROM {src}
        )
        SELECT x._k AS a_key, y._k AS b_key,
               x._name AS a_name, y._name AS b_name,
               CAST(levenshtein(x._name, y._name) AS BIGINT)
                 AS edit_distance,
               ROUND(1.0 - levenshtein(x._name, y._name)
                     / CAST(GREATEST(LENGTH(x._name), LENGTH(y._name))
                            AS DOUBLE), 6) AS similarity
        FROM b x JOIN b y ON x._blk = y._blk AND x._k < y._k {agree_join}
        WHERE levenshtein(x._name, y._name) BETWEEN 1 AND {int(max_distance)}
    """


# ------------------------------------------------- entity clustering
def entity_clusters(
    df: DataFrame,
    key_col: str,
    name_col: str,
    agree_col: str | None = None,
    max_distance: int = 3,
    cc: DataFrame | None = None,
) -> DataFrame:
    """The second half of entity resolution: pairwise matches from
    :func:`fuzzy_blocked_pairs` are only EVIDENCE — the deliverable is
    ENTITIES, i.e. the transitive closure of the match graph (A≈B and
    B≈C put A and C in one entity even when blocking never compared
    them). Reuses the dedup funnel's min-label-propagation connected
    components (:func:`..dedup.connected_components` — one keyed shuffle
    per round, rounds = component diameter, match graphs are near-clique
    so it converges in 2-3), then rolls each multi-member component up
    to an entity record: canonical id (min member key), member count,
    distinct surface forms, and the canonical (minimum) name.

    Output is the master-data table an MDM/curation pipeline persists:
    one row per resolved entity that actually merged records.

    ``cc`` lets the caller pass a precomputed component table (doc_id,
    cluster_id) — the registry shares ONE fuzzy-pair + CC build between
    this and :func:`survivorship`, which run the identical match graph
    (r10 optimization; the CC loop is the dominant cost of both).
    """
    from .dedup import connected_components

    if cc is None:
        pairs = fuzzy_blocked_pairs(
            df, key_col, name_col, agree_col=agree_col, max_distance=max_distance
        ).select(F.col("a_key").alias("doc_a"), F.col("b_key").alias("doc_b"))
        nodes = df.select(F.col(key_col).alias("doc_id"))
        cc = connected_components(pairs, nodes)
    members = cc.join(
        df.select(
            F.col(key_col).alias("doc_id"), F.col(name_col).alias("_name")
        ),
        "doc_id",
    )
    return (
        members.groupBy(F.col("cluster_id").alias("entity_id"))
        .agg(
            F.count("*").cast("long").alias("n_members"),
            F.countDistinct("_name").cast("long").alias("n_names"),
            F.min("_name").alias("canonical_name"),
        )
        .filter(F.col("n_members") >= 2)
        .orderBy(F.desc("n_members"), F.asc("entity_id"))
    )


def entity_clusters_sql(
    src: str,
    key_col: str,
    name_col: str,
    agree_col: str | None = None,
    max_distance: int = 3,
) -> str:
    pairs_sql = fuzzy_blocked_pairs_sql(
        src, key_col, name_col, agree_col=agree_col, max_distance=max_distance
    )
    return f"""
        WITH RECURSIVE pairs AS ({pairs_sql}),
        edges AS (
          SELECT a_key AS src, b_key AS dst FROM pairs
          UNION
          SELECT b_key, a_key FROM pairs
        ),
        reach(id, seen) AS (
          SELECT {key_col}, {key_col} FROM {src}
          UNION
          SELECT r.id, e.dst FROM reach r JOIN edges e ON r.seen = e.src
        ),
        comp AS (
          SELECT id AS _k, MIN(seen) AS entity_id FROM reach GROUP BY id
        ),
        members AS (
          SELECT comp.entity_id, s.{name_col} AS _name
          FROM comp JOIN {src} s ON s.{key_col} = comp._k
        )
        SELECT entity_id,
               CAST(COUNT(*) AS BIGINT) AS n_members,
               CAST(COUNT(DISTINCT _name) AS BIGINT) AS n_names,
               MIN(_name) AS canonical_name
        FROM members GROUP BY entity_id
        HAVING COUNT(*) >= 2
        ORDER BY n_members DESC, entity_id ASC
    """


# ------------------------------------------------- golden records
def survivorship(
    df: DataFrame,
    key_col: str,
    name_col: str,
    attrs: tuple[str, ...],
    agree_col: str | None = None,
    max_distance: int = 3,
    cc: DataFrame | None = None,
) -> DataFrame:
    """Golden-record construction — the step after
    :func:`entity_clusters` that MDM pipelines actually ship: for every
    resolved entity, elect ONE surviving value per attribute by
    most-frequent-wins voting over the member records (ties break to the
    smallest value, so the election is deterministic on any engine and
    any partitioning — never ``mode()``, whose tie behavior is engine
    noise). Output: entity id, member count, canonical (minimum) name,
    and one ``<attr>_survivor`` column per requested attribute.

    Scale shape: members = component table joined back to the source
    (key-wise); each attribute election is a |entities|x|values|
    combinable count plus an entity-keyed top-1 window; the final joins
    are |entities|-row model tables.
    """
    from pyspark.sql import Window

    from .dedup import connected_components

    if cc is None:
        pairs = fuzzy_blocked_pairs(
            df, key_col, name_col, agree_col=agree_col, max_distance=max_distance
        ).select(F.col("a_key").alias("doc_a"), F.col("b_key").alias("doc_b"))
        nodes = df.select(F.col(key_col).alias("doc_id"))
        cc = connected_components(pairs, nodes)
    members = cc.join(
        df.select(F.col(key_col).alias("doc_id"), name_col, *attrs), "doc_id"
    )
    ents = (
        members.groupBy(F.col("cluster_id").alias("entity_id"))
        .agg(
            F.count("*").cast("long").alias("n_members"),
            F.min(name_col).alias("canonical_name"),
        )
        .filter(F.col("n_members") >= 2)
    )
    out = ents
    for attr in attrs:
        votes = members.groupBy("cluster_id", attr).agg(
            F.count("*").alias("_c")
        )
        w = Window.partitionBy("cluster_id").orderBy(
            F.desc("_c"), F.asc(attr)
        )
        top = (
            votes.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(
                F.col("cluster_id").alias("entity_id"),
                F.col(attr).alias(f"{attr}_survivor"),
            )
        )
        out = out.join(top, "entity_id")
    return out.orderBy(F.desc("n_members"), F.asc("entity_id"))


def survivorship_sql(
    src: str,
    key_col: str,
    name_col: str,
    attrs: tuple[str, ...],
    agree_col: str | None = None,
    max_distance: int = 3,
) -> str:
    pairs_sql = fuzzy_blocked_pairs_sql(
        src, key_col, name_col, agree_col=agree_col, max_distance=max_distance
    )
    vote_ctes = []
    vote_joins = []
    vote_cols = []
    for attr in attrs:
        vote_ctes.append(f"""v_{attr} AS (
          SELECT entity_id, {attr} AS {attr}_survivor FROM (
            SELECT entity_id, {attr}, ROW_NUMBER() OVER (
                     PARTITION BY entity_id
                     ORDER BY COUNT(*) DESC, {attr} ASC NULLS FIRST) AS rn
            FROM members GROUP BY entity_id, {attr}
          ) WHERE rn = 1
        )""")
        vote_joins.append(f"JOIN v_{attr} USING (entity_id)")
        vote_cols.append(f"{attr}_survivor")
    votes = ",\n        ".join(vote_ctes)
    joins = "\n        ".join(vote_joins)
    cols = ", ".join(vote_cols)
    return f"""
        WITH RECURSIVE pairs AS ({pairs_sql}),
        edges AS (
          SELECT a_key AS src, b_key AS dst FROM pairs
          UNION
          SELECT b_key, a_key FROM pairs
        ),
        reach(id, seen) AS (
          SELECT {key_col}, {key_col} FROM {src}
          UNION
          SELECT r.id, e.dst FROM reach r JOIN edges e ON r.seen = e.src
        ),
        comp AS (
          SELECT id AS _k, MIN(seen) AS entity_id FROM reach GROUP BY id
        ),
        members AS (
          SELECT comp.entity_id, s.{name_col} AS _name,
                 {", ".join(f"s.{a}" for a in attrs)}
          FROM comp JOIN {src} s ON s.{key_col} = comp._k
        ),
        ents AS (
          SELECT entity_id,
                 CAST(COUNT(*) AS BIGINT) AS n_members,
                 MIN(_name) AS canonical_name
          FROM members GROUP BY entity_id
          HAVING COUNT(*) >= 2
        ),
        {votes}
        SELECT entity_id, n_members, canonical_name, {cols}
        FROM ents
        {joins}
        ORDER BY n_members DESC, entity_id ASC
    """


# ------------------------------------------------- blocking quality
def blocking_quality(
    df: DataFrame,
    key_col: str,
    name_col: str,
    agree_col: str | None = None,
    max_distance: int = 3,
    sample_n: int = 300,
) -> DataFrame:
    """Blocking evaluation — the methodology report that justifies (or
    indicts) the blocking key before anyone trusts the ER match table:

    - **reduction ratio**: what fraction of the all-pairs comparison
      space the blocking key prunes (full corpus, exact integer counts);
    - **pair completeness**: of the TRUE matches (the same edit-distance
      + agreement definition, evaluated WITHOUT blocking), how many
      share a block and therefore survive into candidate generation —
      measured exhaustively on a bounded deterministic sample
      (``key < sample_n``), the documented audit cost (sample² ~ 10⁵
      comparisons, never corpus²).

    One row: sample size, truth/found pairs on the sample, pair
    completeness, full-corpus candidate count, and the reduction ratio.
    A blocking key with high reduction but low completeness is silently
    throwing matches away — this report is how that shows up."""
    base = df.select(
        F.col(key_col).alias("_k"),
        F.col(name_col).alias("_name"),
        *([F.col(agree_col).alias("_agree")] if agree_col else []),
        F.split_part(F.col(name_col), F.lit(" "), F.lit(1)).alias("_blk"),
    )
    agree_cond = (
        (F.col("a._agree") == F.col("b._agree")) if agree_col else F.lit(True)
    )
    sample = base.filter(F.col("_k") < sample_n)
    sample_pairs = (
        sample.alias("a")
        .join(sample.alias("b"), F.col("a._k") < F.col("b._k"))
        .filter(agree_cond)
        .select(
            F.col("a._k").alias("ka"),
            F.col("b._k").alias("kb"),
            # bounded: truth only keeps dist in 1..max_distance, and the
            # -1 overflow sentinel fails that filter like any larger
            # distance would
            F.levenshtein(
                F.col("a._name"), F.col("b._name"), int(max_distance)
            ).alias("dist"),
            (F.col("a._blk") == F.col("b._blk")).alias("same_block"),
        )
    )
    truth = sample_pairs.filter(
        (F.col("dist") >= 1) & (F.col("dist") <= max_distance)
    )
    sample_stats = truth.agg(
        F.count("*").cast("long").alias("truth_pairs"),
        F.sum(F.when(F.col("same_block"), 1).otherwise(0))
        .cast("long")
        .alias("found_pairs"),
    )
    per_block = base.groupBy(
        "_blk", *(["_agree"] if agree_col else [])
    ).agg(F.count("*").alias("bn"))
    cand = per_block.agg(
        F.sum(F.expr("bn * (bn - 1) div 2")).cast("long").alias(
            "candidate_pairs"
        )
    )
    total = base.agg(F.count("*").alias("n"))
    sample_count = sample.agg(F.count("*").cast("long").alias("sample_rows"))
    return (
        sample_stats.crossJoin(F.broadcast(cand))
        .crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(sample_count))
        .select(
            "sample_rows",
            "truth_pairs",
            "found_pairs",
            F.round(
                F.col("found_pairs") / F.col("truth_pairs").cast("double"), 6
            ).alias("pair_completeness"),
            "candidate_pairs",
            (F.expr("n * (n - 1) div 2")).cast("long").alias("all_pairs"),
            F.round(
                F.lit(1.0)
                - F.col("candidate_pairs")
                / F.expr("CAST(n * (n - 1) div 2 AS DOUBLE)"),
                6,
            ).alias("reduction_ratio"),
        )
    )


def blocking_quality_sql(
    src: str,
    key_col: str,
    name_col: str,
    agree_col: str | None = None,
    max_distance: int = 3,
    sample_n: int = 300,
) -> str:
    agree_sel = f", {agree_col} AS _agree" if agree_col else ""
    agree_join = "AND a._agree = b._agree" if agree_col else ""
    agree_grp = ", _agree" if agree_col else ""
    return f"""
        WITH base AS (
          SELECT {key_col} AS _k, {name_col} AS _name{agree_sel},
                 split_part({name_col}, ' ', 1) AS _blk
          FROM {src}
        ),
        sample_rel AS (SELECT * FROM base WHERE _k < {sample_n}),
        truth AS (
          SELECT a._k AS ka, b._k AS kb,
                 a._blk = b._blk AS same_block
          FROM sample_rel a JOIN sample_rel b
            ON a._k < b._k {agree_join}
          WHERE levenshtein(a._name, b._name) BETWEEN 1 AND {max_distance}
        ),
        sample_stats AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS truth_pairs,
                 CAST(SUM(CASE WHEN same_block THEN 1 ELSE 0 END)
                   AS BIGINT) AS found_pairs
          FROM truth
        ),
        cand AS (
          SELECT CAST(SUM(bn * (bn - 1) // 2) AS BIGINT)
            AS candidate_pairs
          FROM (
            SELECT COUNT(*) AS bn FROM base GROUP BY _blk{agree_grp}
          )
        ),
        total AS (SELECT COUNT(*) AS n FROM base),
        sample_count AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS sample_rows FROM sample_rel
        )
        SELECT sample_rows, truth_pairs, found_pairs,
               ROUND(found_pairs / CAST(truth_pairs AS DOUBLE), 6)
                 AS pair_completeness,
               candidate_pairs,
               CAST(n * (n - 1) // 2 AS BIGINT) AS all_pairs,
               ROUND(1.0 - candidate_pairs
                     / CAST(n * (n - 1) // 2 AS DOUBLE), 6)
                 AS reduction_ratio
        FROM sample_stats
        CROSS JOIN cand CROSS JOIN total CROSS JOIN sample_count
    """


# ------------------------- Fellegi–Sunter probabilistic match weights
FS_M_PROB = 0.9  # declared m-prior per field (the Splink-style default)


def fellegi_sunter_patterns(parts: DataFrame) -> DataFrame:
    """Fellegi–Sunter match-weight PATTERN table over brand-blocked part
    pairs (Fellegi & Sunter 1969; the agreement-pattern readout Splink
    presents): for each of the 2⁴ agreement patterns on (type, size,
    first name token, price band), the candidate-pair count and the
    log2 match weight w = Σ_f agree ? log2(m/u_f) : log2((1-m)/(1-u_f)).

    u-probabilities (chance agreement between two RANDOM records) are
    estimated from the data as Σ_v c_v² / N² per field — an EXACT-bigint
    numerator over the squared value frequencies, so both engines derive
    identical doubles; the m-prior is the declared 0.9 literal (the
    unsupervised-EM refinement is out of scope and documented). The
    weight is a fixed-order four-term expression over those u doubles,
    rounded once at 6dp.

    Scale shape (r10 optimization): the agreement-pattern COUNTS are
    computed WITHOUT materializing the candidate pairs at all. For any
    field subset S, the number of same-block pairs agreeing on at least
    S is Σ_groups C(|group|, 2) grouped by (block, S) — one CUBE over
    the per-combination frequency table yields all 16 subset counts in
    a single pass, and inclusion–exclusion (n_exact(T) = Σ_{S⊇T}
    (-1)^{|S\\T|} n_atleast(S)) recovers the exact per-pattern counts.
    That replaces the former Σ|block|² equi-join (8M candidate rows at
    sf0.1, quadratic in block size at scale) with three linear, map-side
    combinable aggregates; every count stays an exact bigint, so the
    output is bit-identical to the pair-join form (oracle-verified).
    Four |values|-row frequency aggregates still fold to one broadcast
    row for the u-probabilities; output ≤ 16 rows at any data size.

    Correctness note for the identity: group-by equality treats two
    NULLs as agreeing while the former `a.f = b.f` join predicate did
    not — all four fields come from non-null TPC-H part columns, so the
    two semantics coincide here (enforced by the oracle hash).

    Reference scope note: like the rest of this family, no reference
    analogue (exact-predicate engine only) — extension surface."""
    base = parts.select(
        F.col("p_partkey").alias("k"),
        F.col("p_brand").alias("blk"),
        F.col("p_type").alias("f_type"),
        F.col("p_size").cast("long").alias("f_size"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("f_tok"),
        F.expr(
            "CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) div 5000"
        ).alias("f_band"),
    )

    def _u(col: str):
        return (
            base.groupBy(col)
            .count()
            .agg(
                F.sum(F.col("count") * F.col("count")).alias(f"un_{col}")
            )
        )

    totals = (
        base.agg(F.count("*").alias("n"))
        .crossJoin(F.broadcast(_u("f_type")))
        .crossJoin(F.broadcast(_u("f_size")))
        .crossJoin(F.broadcast(_u("f_tok")))
        .crossJoin(F.broadcast(_u("f_band")))
    )
    fields = ("f_type", "f_size", "f_tok", "f_band")
    # per-combination frequencies: C(c,2) pairs inside each finest cell
    finest = base.groupBy("blk", *fields).agg(F.count("*").alias("c"))
    # ONE cube pass = all 16 "agree on at least S" groupings. cube() also
    # emits the 16 groupings that aggregate away blk — dropped via
    # grouping_id (bit 4, the first cube column); pair counting is only
    # valid within a block.
    cubed = finest.cube("blk", *fields).agg(
        F.sum("c").alias("cs"), F.grouping_id().alias("gid")
    )
    # gid bit (3-i) == 0  ⇔  fields[i] is grouped (in S); mask bit i = 1
    # ⇔ fields[i] in S, matching the agree_* bit order below
    mask_expr = F.expr(
        "CAST((1 - ((gid >> 3) & 1))"
        " + 2 * (1 - ((gid >> 2) & 1))"
        " + 4 * (1 - ((gid >> 1) & 1))"
        " + 8 * (1 - (gid & 1)) AS INT)"
    )
    atleast = (
        cubed.filter(F.col("gid") < 16)
        .select(mask_expr.alias("mask"), "cs")
        .groupBy("mask")
        .agg(F.sum(F.expr("cs * (cs - 1) div 2")).alias("at_least"))
    )
    # inclusion–exclusion over the 16-row subset table: exact-pattern
    # count = alternating-sign sum of the superset at-least counts
    pats = (
        base.sparkSession.range(16)
        .select(F.col("id").cast("int").alias("pmask"))
    )
    patt = (
        pats.join(
            F.broadcast(atleast),
            F.expr("(mask & pmask) = pmask"),
        )
        .groupBy("pmask")
        .agg(
            F.sum(
                F.expr(
                    "CASE WHEN bit_count(mask ^ pmask) % 2 = 0"
                    " THEN at_least ELSE -at_least END"
                )
            ).alias("n_pairs")
        )
        .filter(F.col("n_pairs") >= 1)
        .select(
            F.expr("CAST(pmask & 1 AS INT)").alias("agree_type"),
            F.expr("CAST((pmask >> 1) & 1 AS INT)").alias("agree_size"),
            F.expr("CAST((pmask >> 2) & 1 AS INT)").alias("agree_tok"),
            F.expr("CAST((pmask >> 3) & 1 AS INT)").alias("agree_band"),
            F.col("n_pairs").cast("long").alias("n_pairs"),
        )
    )
    ud = " CAST(un_f_{f} AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) "
    term = (
        "CASE WHEN agree_{g} = 1 THEN log2({m} / ({u})) "
        "ELSE log2({one_m} / (1 - ({u}))) END"
    )
    w = " + ".join(
        term.format(
            g=g, u=ud.format(f=f), m=FS_M_PROB, one_m=round(1 - FS_M_PROB, 6)
        )
        for g, f in (
            ("type", "type"),
            ("size", "size"),
            ("tok", "tok"),
            ("band", "band"),
        )
    )
    return (
        patt.crossJoin(F.broadcast(totals))
        .withColumn("match_weight", F.round(F.expr(w), 6))
        .select(
            "agree_type",
            "agree_size",
            "agree_tok",
            "agree_band",
            "n_pairs",
            "match_weight",
            F.expr(
                "CASE WHEN match_weight >= 8 THEN 'match' "
                "WHEN match_weight >= 0 THEN 'possible' "
                "ELSE 'non_match' END"
            ).alias("class"),
        )
        .orderBy("agree_type", "agree_size", "agree_tok", "agree_band")
    )


def fellegi_sunter_patterns_sql(src: str = "part") -> str:
    m = FS_M_PROB
    one_m = round(1 - FS_M_PROB, 6)
    ud = (
        "CAST(un_f_{f} AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))"
    )
    term = (
        "CASE WHEN agree_{g} = 1 THEN log2({m} / ({u})) "
        "ELSE log2({one_m} / (1 - ({u}))) END"
    )
    w = " + ".join(
        term.format(g=g, u=ud.format(f=f), m=m, one_m=one_m)
        for g, f in (
            ("type", "type"),
            ("size", "size"),
            ("tok", "tok"),
            ("band", "band"),
        )
    )
    return f"""
        WITH base AS (
          SELECT p_partkey AS k, p_brand AS blk, p_type AS f_type,
                 CAST(p_size AS BIGINT) AS f_size,
                 split_part(p_name, ' ', 1) AS f_tok,
                 CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) // 5000
                   AS f_band
          FROM {src}
        ),
        ut AS (SELECT SUM(c * c) AS un_f_type FROM
               (SELECT COUNT(*) AS c FROM base GROUP BY f_type) x),
        us AS (SELECT SUM(c * c) AS un_f_size FROM
               (SELECT COUNT(*) AS c FROM base GROUP BY f_size) x),
        uk AS (SELECT SUM(c * c) AS un_f_tok FROM
               (SELECT COUNT(*) AS c FROM base GROUP BY f_tok) x),
        ub AS (SELECT SUM(c * c) AS un_f_band FROM
               (SELECT COUNT(*) AS c FROM base GROUP BY f_band) x),
        tot AS (SELECT (SELECT COUNT(*) FROM base) AS n,
                       un_f_type, un_f_size, un_f_tok, un_f_band
                FROM ut, us, uk, ub),
        patt AS (
          SELECT CAST(a.f_type = b.f_type AS INTEGER) AS agree_type,
                 CAST(a.f_size = b.f_size AS INTEGER) AS agree_size,
                 CAST(a.f_tok = b.f_tok AS INTEGER) AS agree_tok,
                 CAST(a.f_band = b.f_band AS INTEGER) AS agree_band,
                 COUNT(*) AS n_pairs
          FROM base a JOIN base b ON a.blk = b.blk AND a.k < b.k
          GROUP BY 1, 2, 3, 4
        )
        SELECT agree_type, agree_size, agree_tok, agree_band, n_pairs,
               ROUND({w}, 6) AS match_weight,
               CASE WHEN ROUND({w}, 6) >= 8 THEN 'match'
                    WHEN ROUND({w}, 6) >= 0 THEN 'possible'
                    ELSE 'non_match' END AS class
        FROM patt CROSS JOIN tot
        ORDER BY agree_type, agree_size, agree_tok, agree_band
    """
