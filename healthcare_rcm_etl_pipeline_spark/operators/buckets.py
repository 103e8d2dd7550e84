"""Shared bounded-buffer bucket aggregation for the pair-generating ops.

Every LSH-family operator groups rows into buckets (band hash / simhash
block / deletion variant / sign-sketch table+bucket) and collects each
bucket into an array before emitting its i<j pairs, with ``max_bucket``
dropping over-cap buckets. Round-6 finding (the q44 LISTAGG bug class,
generalized): applying the cap as ``filter(size(ds) <= cap)`` AFTER
``collect_list`` bounds the OUTPUT but not the AGGREGATION BUFFER — a
degenerate bucket (10^8 identical docs / a boilerplate band value) still
materializes its whole member array in one agg buffer before being
discarded, which is an executor OOM at adversarial scale.

``bounded_bucket_collect`` applies the cap BEFORE aggregation: a
partition-count window tags each row with its bucket population and
over-cap rows never reach the agg buffer. The window shuffles on the same
bucket keys the groupBy needs, so Catalyst reuses one exchange — the cap
costs a within-partition sort, never a second shuffle (the same measured
trade as ngram_jaccard_pairs' "window" cap mode, which this factors out).
WindowExec buffers a partition group SPILLABLY (UnsafeExternalSorter),
unlike the in-memory collect_list array — that asymmetry is the point.

Output is byte-identical to the filter-after form: the same buckets are
dropped, the same arrays emerge (pinned by the skew-guard and oracle
suites).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bounded_bucket_collect(
    df: DataFrame,
    keys: list[str],
    payload: Column,
    max_bucket: int | None,
) -> DataFrame:
    """groupBy(keys) -> sorted collect_list(payload) as ``ds``, buckets of
    size 1 dropped (no pairs), buckets over ``max_bucket`` dropped BEFORE
    any row reaches the aggregation buffer (None = uncapped, plain
    collect)."""
    if max_bucket is not None:
        from pyspark.sql import Window

        w = Window.partitionBy(*keys)
        df = (
            df.withColumn("__bn", F.count("*").over(w))
            .filter((F.col("__bn") <= max_bucket) & (F.col("__bn") > 1))
            .drop("__bn")
        )
    return (
        df.groupBy(*keys)
        .agg(F.sort_array(F.collect_list(payload)).alias("ds"))
        .filter(F.size("ds") > 1)
    )
