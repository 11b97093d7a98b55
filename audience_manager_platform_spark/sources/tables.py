"""Parquet-backed table registry.

Reference parity: the reference scans SQLite over JDBC with explicit
``customSchema`` strings to bypass type inference (reference
``backend/app/processor/spark_processor.py:103-110`` and
``backend/app/processor/data_sources.py:21-58``). Parquet files carry their
schema, so the explicit-schema contract is native here; scans get columnar
reads, predicate pushdown, and column pruning from Catalyst for free.

At 100 TB these tables would be directories of many parquet files
(optionally partitioned by date); ``spark.read.parquet`` handles both a
single file and a partitioned directory tree identically, so nothing in the
engine assumes single-file inputs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# Tables the driver fixtures provide (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Catalyst prunes columns / pushes filters into the
    parquet reader from the enclosing plan (SURVEY.md S3)."""
    # every registry query funnels through here: pin the session timezone
    # so date/timestamp-derived strings are stable no matter what session
    # the caller (e.g. the verify driver) built
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(table_path(sf_dir, name))


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events fixture's ``ts`` unit varies by generator round:
    TIMESTAMP(NANOS) — which Spark's vectorized reader rejects — or
    TIMESTAMP(MICROS), which reads natively (as TIMESTAMP_NTZ). Enable
    the nanos-as-long legacy conf and adapt on the observed dtype:
    a bigint ``ts`` is nanos needing the JVM-side conversion (integer
    DIV, lossless — values are generated at microsecond precision),
    anything else is already a timestamp. Still a plain columnar scan.
    The streaming twin (``streaming.jobs.stream_events``) sniffs the
    parquet footer for the same decision."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, "events"))
    if dict(df.dtypes).get("ts") == "bigint":
        # integer DIV, not /1000.0: epoch-nanos (~1.7e18) overflow double's
        # 53-bit mantissa and float division lands ±1µs off
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> None:
    """Register each table as a temp view so operators can be written in
    either DataFrame or SQL form (same Catalyst plan either way)."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
