"""Input-spreading guard shared by the corpus operators (dedup / ANN /
text): the local fixtures arrive as ONE parquet file, so without a
repartition every downstream explode/aggregate runs on a single core.

``spread`` repartitions ONLY when the scan produced fewer partitions
than the session's parallelism. On a real multi-split table (the 100 TB
case) the scan already yields hundreds of partitions sized by
``spark.sql.files.maxPartitionBytes`` and the full shuffle a blind
``repartition(defaultParallelism)`` would do is skipped entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
