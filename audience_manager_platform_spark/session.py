"""SparkSession factory tuned for the engine.

The reference launches one ``spark-submit`` subprocess per rule with a cold
JVM (reference ``backend/app/core/scheduler.py:90-114``) — ~10s of fixed
overhead per query. We instead keep ONE long-lived session; every rule and
analytics query runs as a job inside it.

Scale posture: AQE on (runtime coalescing, skew-join splitting), shuffle
partitions sized to the local core count (on a real cluster this would be
~2-3x total executor cores), UTC session timezone so results are stable
across environments and comparable to external oracles.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "audience_manager_platform_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    In local mode the driver is the only JVM; ``spark.driver.memory`` is the
    single memory knob. On a cluster the same configs apply unchanged —
    nothing here assumes local execution.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = DEFAULT_SHUFFLE_PARTITIONS

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # Keep broadcast threshold at default 10MB; dimension tables
        # (region/nation/customer at small SF) broadcast automatically, and
        # operators add explicit broadcast() hints where the small side is
        # known small at ANY scale (e.g. region: 5 rows).
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "32g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
