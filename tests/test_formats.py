"""Source/sink fidelity: CSV and JSON connectors must round-trip rows and
schemas exactly (the reference's declared-schema contract, S1/S6, mapped
to file formats)."""

import pytest
from pyspark.sql import functions as F

from audience_manager_platform_spark.sources import (
    load_table,
    read_table,
    round_trip,
    write_table,
)


def _rows(df, keys):
    return sorted([tuple(r) for r in df.collect()], key=lambda t: tuple(
        str(t[k]) for k in keys
    ))


@pytest.mark.parametrize("fmt", ["csv", "json", "parquet", "orc"])
def test_flat_table_round_trip(spark, sf_dir, tmp_path, fmt):
    """orders: longs, doubles, strings, timestamps — every flat fixture
    type survives a write+typed-read in each format."""
    src = load_table(spark, sf_dir, "orders")
    back = round_trip(src, str(tmp_path / f"orders_{fmt}"), fmt)
    assert back.schema == src.schema
    assert _rows(back, [0]) == _rows(src, [0])


def test_json_round_trips_nested_arrays(spark, sf_dir, tmp_path):
    """embeddings carries array<float> — JSON keeps it; the declared
    schema (not inference) restores the exact float type."""
    src = load_table(spark, sf_dir, "embeddings")
    back = round_trip(src, str(tmp_path / "emb_json"), "json")
    assert back.schema == src.schema
    a = src.selectExpr("vec_id", "round(aggregate(embedding, 0D, (s,x)->s+x), 4) AS s")
    b = back.selectExpr("vec_id", "round(aggregate(embedding, 0D, (s,x)->s+x), 4) AS s")
    assert _rows(a, [0]) == _rows(b, [0])


def test_csv_null_vs_empty_string(spark, tmp_path):
    """The nullValue sentinel keeps NULL and '' distinct through CSV —
    silently merging them is the classic lossy-CSV bug."""
    src = spark.createDataFrame(
        [(1, None), (2, ""), (3, "x")], "id int, s string"
    )
    back = round_trip(src, str(tmp_path / "nulls_csv"), "csv")
    got = {r["id"]: r["s"] for r in back.collect()}
    assert got == {1: None, 2: "", 3: "x"}


def test_csv_and_json_require_schema(spark, tmp_path):
    df = spark.range(3)
    write_table(df, str(tmp_path / "r"), "json")
    with pytest.raises(ValueError, match="explicit schema"):
        read_table(spark, str(tmp_path / "r"), "json")


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    """partitionBy produces hive layout and scans of one partition read
    only that directory (partition pruning at the source)."""
    src = load_table(spark, sf_dir, "orders").withColumn(
        "status", F.col("o_orderstatus")
    )
    path = str(tmp_path / "orders_part")
    write_table(src, path, "parquet", partition_by=("status",))
    back = read_table(spark, path, "parquet").filter("status = 'F'")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert back.count() == src.filter("o_orderstatus = 'F'").count()
    assert "PartitionFilters: [isnotnull(status" in plan or "status#" in plan


def test_orc_round_trips_nested_and_pushes_filters(spark, sf_dir, tmp_path):
    """ORC is self-describing columnar like parquet: nested arrays
    survive, and predicates reach the scan (PushedFilters)."""
    src = load_table(spark, sf_dir, "embeddings")
    back = round_trip(src, str(tmp_path / "emb_orc"), "orc")
    assert back.schema == src.schema
    q = back.filter("vec_id = 7").select("vec_id", "label")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "EqualTo(vec_id,7)" in plan
    assert q.count() == 1
