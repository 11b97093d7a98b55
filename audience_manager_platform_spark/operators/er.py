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
    dist = F.levenshtein(F.col("a_name"), F.col("b_name"))
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
