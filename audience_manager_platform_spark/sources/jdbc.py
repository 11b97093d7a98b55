"""JDBC source/sink parity (reference S1/S6).

The reference's only connector is SQLite over JDBC, and its scans set no
``partitionColumn``/``numPartitions`` — every read is a SINGLE task no
matter the cluster size (reference
``backend/app/processor/spark_processor.py:104-110``, launch classpath
``backend/app/core/scheduler.py:80-97``). That is the one behavior this
module refuses to inherit: :func:`read_jdbc` requires partitioning bounds
unless the caller explicitly opts into a serial scan, so a 100 TB-posture
deployment can't silently funnel a warehouse table through one executor
thread.

Write parity: the reference does DROP TABLE + JDBC overwrite with
``createTableColumnTypes`` (``spark_processor.py:177-203``); here that is
``mode("overwrite")`` + optional ``createTableColumnTypes`` in one call.

Tests drive this against Apache Derby's embedded driver (ships inside
Spark's own jars directory), so the round trip is exercised for real —
no external database service needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    partition_column: str | None = None,
    lower_bound: int | str | None = None,
    upper_bound: int | str | None = None,
    num_partitions: int | None = None,
    custom_schema: str | None = None,
    driver: str | None = None,
    allow_single_partition: bool = False,
) -> DataFrame:
    """Partitioned JDBC scan.

    ``table`` may be a table name or a ``(subquery) alias`` — projection/
    filter pushdown into the foreign database happens there, mirroring the
    reference's full-query pushdown (S1) when wanted. ``custom_schema``
    is the reference's ``customSchema`` inference bypass, verbatim.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if driver:
        reader = reader.option("driver", driver)
    if custom_schema:
        reader = reader.option("customSchema", custom_schema)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError(
                "partition_column needs lowerBound, upperBound and numPartitions"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    elif not allow_single_partition:
        raise ValueError(
            "JDBC scan without partitionColumn executes as ONE task regardless "
            "of cluster size; pass partition_column=... or opt in with "
            "allow_single_partition=True for known-small tables"
        )
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    *,
    mode: str = "overwrite",
    driver: str | None = None,
    create_table_column_types: str | None = None,
    batch_size: int = 10_000,
) -> None:
    """Typed JDBC sink — atomic from the caller's view (Spark handles the
    truncate/recreate), with the reference's ``createTableColumnTypes``
    DDL override available."""
    writer = (
        df.write.format("jdbc")
        .mode(mode)
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
    )
    if driver:
        writer = writer.option("driver", driver)
    if create_table_column_types:
        writer = writer.option("createTableColumnTypes", create_table_column_types)
    writer.save()
