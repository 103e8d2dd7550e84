"""Round-6 analytics patterns, beyond the oracle equality the registry
sweep already enforces:

- q46_bitmap_distinct: the word-packed bitmap count must equal a plain
  COUNT(DISTINCT) in-engine (the oracle intentionally runs the same
  bitmap plan, so THIS test is where exactness vs the naive aggregate is
  pinned), and the per-word masks must merge across disjoint partitions
  of the data (the rollup property that justifies the layout).
- q47_ewma_revenue: the folded EWMA must satisfy the defining recurrence
  s_t = 0.3 x_t + 0.7 s_{t-1} row by row, not just match the oracle's
  implementation of the same fold.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from healthcare_rcm_etl_pipeline_spark.plans.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_bitmap_distinct_equals_count_distinct(spark):
    got = {
        r["o_orderpriority"]: r["distinct_customers"]
        for r in QUERIES["q46_bitmap_distinct"](spark, SF).collect()
    }
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    want = {
        r["o_orderpriority"]: r["n"]
        for r in orders.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert got == want


def test_bitmap_masks_merge_across_partitions(spark):
    """bit_or masks built on two disjoint halves of the data OR-combine to
    the full-data distinct count — the mergeable-state property that makes
    the bitmap layout a rollup-able distinct, which COUNT(DISTINCT)
    results can never be."""
    orders = spark.read.parquet(f"{SF}/orders.parquet")

    def masks(df):
        return (
            df.select(
                (F.col("o_custkey") / 63).cast("bigint").alias("word"),
                F.expr(
                    "shiftleft(CAST(1 AS BIGINT), CAST(o_custkey % 63 AS INT))"
                ).alias("bitval"),
            )
            .groupBy("word")
            .agg(F.bit_or("bitval").alias("mask"))
        )

    halves = masks(orders.filter("o_orderkey % 2 = 0")).unionAll(
        masks(orders.filter("o_orderkey % 2 = 1"))
    )
    merged = (
        halves.groupBy("word")
        .agg(F.bit_or("mask").alias("mask"))
        .agg(F.sum(F.bit_count("mask")).alias("n"))
        .collect()[0]["n"]
    )
    assert merged == orders.select("o_custkey").distinct().count()


def test_ewma_satisfies_recurrence(spark):
    rows = QUERIES["q47_ewma_revenue"](spark, SF).collect()
    by_nation: dict[str, list] = {}
    for r in rows:
        by_nation.setdefault(r["n_name"], []).append(r)
    assert by_nation
    for series in by_nation.values():
        series.sort(key=lambda r: r["month"])
        s = series[0]["revenue"]
        assert series[0]["ewma"] == round(s, 6)
        for r in series[1:]:
            s = 0.3 * r["revenue"] + 0.7 * s
            assert abs(r["ewma"] - s) < 1e-6, (r["n_name"], r["month"])
