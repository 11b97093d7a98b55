"""MERGE-style upsert without a transactional table format.

The environment (and plain parquet) has no Delta/Iceberg MERGE INTO; the
idiomatic emulation (SCD1) is:

    result = new_rows ∪ (old_rows ⟕anti new_rows on key)

i.e. incoming rows win, untouched old rows survive. This is the engine's
incremental-refresh primitive: instead of recomputing a segment from all
history (the reference's only mode — full DROP + rewrite per refresh,
``backend/app/processor/spark_processor.py:177-203``), fold a delta
aggregate into the existing materialization. One anti-join shuffle on the
key; at warehouse scale both sides can be bucketed on the key to make it
shuffle-free.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame


def upsert(old: DataFrame, new: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Rows of ``new`` plus rows of ``old`` whose key doesn't appear in
    ``new``. Columns must match by name."""
    keep_old = old.join(new.select(*keys), on=list(keys), how="left_anti")
    return new.unionByName(keep_old)
