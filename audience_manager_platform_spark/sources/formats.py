"""Typed file-format connectors beyond parquet (source/sink surface).

Reference parity: the reference's only connector is SQLite-over-JDBC, and
it bypasses type inference on BOTH directions — ``customSchema`` on read
(``backend/app/processor/spark_processor.py:103-110``) and
``createTableColumnTypes`` on write
(``backend/app/processor/spark_processor.py:189-203``). That contract —
*schemas are declared, never inferred* — is what these helpers port to
file formats: CSV/JSON reads REQUIRE an explicit schema (inference over
100 TB means a second full scan and nondeterministic types), and writes go
through atomic ``mode("overwrite")`` instead of the reference's
non-atomic DROP-then-write two-step.

Format notes at scale:

- **parquet** is the primary format (columnar, pushdown, pruning; splits
  parallelize a 100 TB table across executors for free).
- **csv** round-trips flat/scalar schemas only; timestamps are pinned to
  an explicit UTC format so a reader cluster in another timezone parses
  identical values.
- **json (lines)** carries nested arrays/structs (e.g. the embeddings
  table); each line is a record, so the file still splits across tasks.
- **orc** is the second self-describing columnar format (predicate
  pushdown + pruning like parquet; schema travels with the file, so no
  declared schema is demanded) — the interop surface for Hive-era
  warehouses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

_CSV_OPTS = {
    "header": "true",
    "timestampFormat": TS_FMT,
    "nullValue": "\\N",  # distinguish NULL from empty string
    "escape": '"',
}


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
) -> None:
    """Atomic typed sink (reference S6 without the DROP-then-write race).

    ``partition_by`` maps to hive-style directory partitioning — the scan
    side then gets partition pruning on those columns.
    """
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer = writer.options(**_CSV_OPTS)
    writer.format(fmt).save(path)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | None = None,
) -> DataFrame:
    """Typed scan. CSV/JSON demand a schema (the customSchema contract);
    parquet carries its own."""
    if fmt in ("parquet", "orc"):
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
        return reader.format(fmt).load(path)
    if schema is None:
        raise ValueError(f"{fmt} reads require an explicit schema (no inference)")
    reader = spark.read.schema(schema)
    if fmt == "csv":
        reader = reader.options(**_CSV_OPTS)
    elif fmt != "json":
        raise ValueError(f"unsupported format: {fmt}")
    return reader.format(fmt).load(path)


def round_trip(
    df: DataFrame, path: str, fmt: str
) -> DataFrame:
    """Write then re-read with the source DataFrame's own schema — the
    fidelity contract the tests pin (schema equality + row equality)."""
    write_table(df, path, fmt)
    return read_table(df.sparkSession, path, fmt, schema=df.schema)
