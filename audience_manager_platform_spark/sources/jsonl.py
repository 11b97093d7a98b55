"""JSON-lines source adapter with corrupt-record auditing — the
semi-structured ingestion surface next to the parquet/JDBC/synthetic
sources: production feeds arrive as JSONL with a fraction of malformed
lines, and the load must COUNT and quarantine them, never silently drop
or abort (reference parity: the seed loaders assume clean CSV; this is
the hardened form a 100 TB feed needs).

The registry query derives a deterministic JSONL file from the documents
fixture with planted corrupt lines (every ``bad_every``-th doc), so the
oracle predicts every output row from the planting formula without
parsing JSON at all."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BAD_EVERY = 97


def jsonl_corrupt_audit(
    spark: SparkSession, docs: DataFrame, bad_every: int = BAD_EVERY
) -> DataFrame:
    """Write fixture-derived JSONL with planted corrupt lines, read it
    back through the PRODUCTION reader configuration (explicit schema +
    PERMISSIVE mode + a corrupt-record column — never schema inference,
    which costs an extra full pass at scale), and report per-language
    good-row counts beside the quarantined corrupt count.

    Scale shape: the write is a narrow projection; the read is the
    standard distributed JSONL scan (splittable by line); the audit is
    one combinable aggregate. The corrupt-record column is the
    dead-letter hook — a real pipeline writes those rows to a quarantine
    sink instead of counting them."""
    from ..operators.partitioning import tracked_tempdir

    work = tracked_tempdir("amps_jsonl_")
    path = f"{work}/data"
    docs.select(
        F.when(F.col("doc_id") % bad_every == 0, F.lit('{"broken'))
        .otherwise(F.to_json(F.struct("doc_id", "lang", "n_chars")))
        .alias("value")
    ).write.mode("overwrite").text(path)
    read = (
        spark.read.schema("doc_id bigint, lang string, n_chars bigint, _bad string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .json(path)
    )
    return (
        read.groupBy(
            F.when(F.col("_bad").isNotNull(), F.lit("_corrupt"))
            .otherwise(F.col("lang"))
            .alias("lang")
        )
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("lang")
    )


def jsonl_corrupt_audit_sql(
    src: str = "documents", bad_every: int = BAD_EVERY
) -> str:
    """Oracle from the planting formula — corrupt lines are exactly the
    ``doc_id % bad_every = 0`` docs; everything else round-trips."""
    return f"""
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM {src} WHERE doc_id % {int(bad_every)} != 0
        GROUP BY lang
        UNION ALL
        SELECT '_corrupt', CAST(COUNT(*) AS BIGINT),
               CAST(NULL AS BIGINT)
        FROM {src} WHERE doc_id % {int(bad_every)} = 0
        ORDER BY lang
    """
