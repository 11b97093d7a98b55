"""Small-file compaction: fewer files, identical rows, old layout never
visible mid-rewrite."""

import os

from audience_manager_platform_spark.operators.maintenance import compact_table
from audience_manager_platform_spark.sources import load_table


def _parquet_files(path):
    return [
        f
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    ]


def test_compaction_reduces_files_preserves_rows(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_small_files")
    src.repartition(32).write.parquet(path)
    assert len(_parquet_files(path)) == 32

    before = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    n_files = compact_table(spark, path, target_file_bytes=10**9)
    assert n_files == 1
    assert len(_parquet_files(path)) == 1
    assert not os.path.exists(path + ".compact.tmp")
    assert not os.path.exists(path + ".compact.old")
    after = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    assert after == before


def test_compaction_respects_target_size(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_target")
    src.repartition(16).write.parquet(path)
    total = sum(
        os.path.getsize(os.path.join(path, f)) for f in _parquet_files(path)
    )
    # target of ~1/3 the table -> 3-4 files
    n_files = compact_table(spark, path, target_file_bytes=total // 3 + 1)
    assert 2 <= n_files <= 4
