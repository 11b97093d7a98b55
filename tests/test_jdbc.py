"""JDBC source/sink parity, exercised for real against Apache Derby's
embedded driver (bundled in Spark's jars — no external DB service)."""

import pytest

from audience_manager_platform_spark.sources import load_table
from audience_manager_platform_spark.sources.jdbc import read_jdbc, write_jdbc

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "testdb"
    return f"jdbc:derby:{db};create=true"


def test_jdbc_round_trip_partitioned_scan(spark, sf_dir, derby_url):
    """Write orders out over JDBC, read back as a 4-partition scan keyed
    on o_orderkey: rows equal, parallelism real (the reference's scans
    were always 1 task — reference spark_processor.py:104-110)."""
    src = load_table(spark, sf_dir, "orders")
    write_jdbc(src, derby_url, "orders_rt", driver=DRIVER)
    hi = src.agg({"o_orderkey": "max"}).collect()[0][0]
    back = read_jdbc(
        spark,
        derby_url,
        "orders_rt",
        partition_column="o_orderkey",
        lower_bound=0,
        upper_bound=int(hi) + 1,
        num_partitions=4,
        driver=DRIVER,
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == src.count()
    a = sorted(tuple(r) for r in src.collect())
    b = sorted(tuple(r) for r in back.collect())
    assert a == b


def test_jdbc_pushdown_subquery(spark, sf_dir, derby_url):
    """S1 full-query pushdown shape: the foreign DB evaluates the
    subquery; Spark sees only final rows."""
    src = load_table(spark, sf_dir, "orders")
    # typed DDL (reference createTableColumnTypes parity): Spark's default
    # string mapping is CLOB, which Derby can't GROUP BY
    write_jdbc(
        src,
        derby_url,
        "orders_pd",
        driver=DRIVER,
        create_table_column_types=(
            "o_orderstatus VARCHAR(4), o_orderpriority VARCHAR(16)"
        ),
    )
    # Derby folds unquoted identifiers to uppercase; Spark created the
    # columns quoted-lowercase, so the pushed-down SQL must quote them
    sub = (
        '(SELECT "o_orderstatus", COUNT(*) AS "n" FROM orders_pd '
        'GROUP BY "o_orderstatus") t'
    )
    back = read_jdbc(
        spark, derby_url, sub, driver=DRIVER, allow_single_partition=True
    )
    expect = {
        (r["o_orderstatus"], r["count"])
        for r in src.groupBy("o_orderstatus").count().collect()
    }
    got = {(r["o_orderstatus"], r["n"]) for r in back.collect()}
    assert got == expect


def test_unpartitioned_scan_requires_opt_in(spark, derby_url):
    with pytest.raises(ValueError, match="ONE task"):
        read_jdbc(spark, derby_url, "whatever", driver=DRIVER)
