"""Bucketed tables join without a shuffle: write orders+customer bucketed on
the key, assert the join plan has no Exchange on either scan leg."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from healthcare_rcm_etl_pipeline_spark.sources.sinks import write_bucketed


@pytest.fixture()
def no_broadcast(spark):
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
    spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)


def test_bucketed_join_is_shuffle_free(spark, sf_dir, no_broadcast):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    write_bucketed(orders, "b_orders", 8, ["o_custkey"], sort_cols=["o_custkey"])
    write_bucketed(
        customer.withColumnRenamed("c_custkey", "o_custkey"),
        "b_customer", 8, ["o_custkey"], sort_cols=["o_custkey"],
    )
    joined = spark.table("b_orders").join(spark.table("b_customer"), "o_custkey")

    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan[:2000]}"

    # and it is still correct
    expect = orders.join(
        customer, orders.o_custkey == customer.c_custkey
    ).count()
    assert joined.count() == expect
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
