"""Bucketed co-located joins: the write-once-shuffle-never pattern for
repeated large-large joins (instructions: 'bucketing for co-located
joins')."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from swarm_spark.plans.bucketing import (
    assert_exchange_free_join,
    colocated_join,
    write_bucketed,
)


@pytest.fixture()
def db(spark, tmp_path):
    name = f"bkt_{tmp_path.name.replace('-', '_')}"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}")
    yield name
    spark.sql(f"DROP DATABASE IF EXISTS {name} CASCADE")


def test_bucketed_join_is_exchange_free(spark, sf_dir, db):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    write_bucketed(orders, f"{db}.orders_b", "o_custkey", 8, sort_by="o_custkey")
    write_bucketed(
        cust.withColumnRenamed("c_custkey", "o_custkey"),
        f"{db}.cust_b", "o_custkey", 8, sort_by="o_custkey",
    )
    # disable broadcast so the planner would otherwise shuffle
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = colocated_join(spark, f"{db}.orders_b", f"{db}.cust_b", "o_custkey")
        assert_exchange_free_join(j)
        # values still correct vs the plain (shuffling) join
        plain = orders.join(
            cust, orders.o_custkey == cust.c_custkey
        ).count()
        assert j.count() == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_mismatched_buckets_fall_back_to_shuffle(spark, sf_dir, db):
    """Sanity: the Exchange-free plan is the BUCKETING's doing, not a
    vacuous assertion — mismatched bucket counts do shuffle one side."""
    from swarm_spark.plans.skew import physical_plan

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    write_bucketed(orders, f"{db}.o8", "o_custkey", 8)
    write_bucketed(
        cust.withColumnRenamed("c_custkey", "o_custkey"), f"{db}.c3",
        "o_custkey", 3,
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = colocated_join(spark, f"{db}.o8", f"{db}.c3", "o_custkey")
        assert "Exchange" in physical_plan(j)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
