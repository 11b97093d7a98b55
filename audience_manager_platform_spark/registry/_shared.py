"""Session-keyed cache of shared materialized intermediate TABLES.

A production warehouse keeps tables like the MinHash signature table or
the support-cut co-occurrence edge list as materialized assets reused by
every consumer run; the registry's per-query lambdas were instead
rebuilding them per query (the r7 FULLBENCH profile: the co-purchase
edge build ran four times, the signature build five). This cache gives
the registry the production shape: first consumer builds, the rest read.

Unlike the driver-side MODEL caches (k-means fits, PQ codebooks — plain
Python data, safely keyed on sf_dir alone), a DataFrame handle is bound
to its SparkSession, so every entry here is keyed on the owning
session's applicationId: a new session rebuilds, never reuses a dead
handle. Fixture immutability makes sf_dir a sufficient data key; a
mutable-source deployment would add a snapshot id.
"""

from __future__ import annotations

from collections.abc import Callable

_CACHE: dict[tuple, object] = {}


def shared(spark, key: tuple, build: Callable[[], object]):
    app = spark.sparkContext.applicationId
    # One live session at a time is the repo's pattern: evict entries
    # owned by any OTHER applicationId before inserting, so a long-lived
    # process that cycles sessions doesn't retain dead DataFrame/py4j
    # handles forever (r8 advice).
    stale = [k for k in _CACHE if k[0] != app]
    for k in stale:
        del _CACHE[k]
    k = (app, *key)
    if k not in _CACHE:
        _CACHE[k] = build()
    return _CACHE[k]
