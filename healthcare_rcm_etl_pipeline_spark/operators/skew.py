"""Skew mitigation for hot keys at scale.

Two classic remedies, both pure DataFrame:

- salted_aggregate: two-phase aggregation — partial agg on (key, salt),
  final agg on key. Turns one hot reducer into ``salt_buckets`` parallel
  ones. Works for any algebraic aggregate (sum/count/min/max; avg as
  sum+count). Catalyst's partial aggregation already does this for simple
  cases; explicit salting is for aggregates over high-cardinality state
  (e.g. collect-style or exact distinct per hot key).
- salted_broadcast_left / replicated_join: skewed fact ⋈ small-but-not-tiny
  dim: salt the fact side with rand-free deterministic salt (hash of a
  unique column), replicate the dim side across all salts, join on
  (key, salt). The shuffle spreads each hot key across ``salt_buckets``
  partitions.

AQE's skew-join handling (spark.sql.adaptive.skewJoin, on in session.py)
covers sort-merge joins automatically at runtime; these operators are for
the cases AQE can't rewrite (aggregations, broadcast-ineligible dims).

Salts are derived deterministically (xxhash64 of a row-unique column mod
buckets) — no rand(), so plans stay reproducible and re-executable under
task retries (a rand() salt can silently duplicate or drop rows when a
stage retries with different random draws).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, unique_col: str, buckets: int, salt_col: str = "__salt") -> DataFrame:
    """Deterministic salt in [0, buckets) from a row-unique column."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(F.col(unique_col)), F.lit(buckets)).cast("int")
    )


_MERGE_FNS = {"sum": F.sum, "min": F.min, "max": F.max}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, str]],
    unique_col: str,
    buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation for algebraic measures.

    ``aggs`` maps output name -> (partial aggregate expression, merge fn):
    an EXPLICIT merge per aggregate — "sum" (for sum/count partials), "min",
    or "max". Non-algebraic aggregates (avg, count_distinct, first, ...)
    have no valid pairwise merge of partials and must be decomposed by the
    caller (avg = sum+count merged then divided); anything outside the
    supported merges raises instead of silently producing wrong results.
    """
    bad = {n: m for n, (_, m) in aggs.items() if m not in _MERGE_FNS}
    if bad:
        raise ValueError(
            f"unsupported merge fns {bad}: supported {sorted(_MERGE_FNS)}; "
            "decompose non-algebraic aggregates (e.g. avg -> sum+count)"
        )
    salted = with_salt(df, unique_col, buckets)
    partial = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(f"__p_{name}") for name, (expr, _) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[_MERGE_FNS[m](F.col(f"__p_{n}")).alias(n) for n, (_, m) in aggs.items()]
    )


def replicated_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    fact_unique_col: str,
    buckets: int = 16,
    how: str = "left",
) -> DataFrame:
    """Skew-safe equi-join: salt the (skewed) fact, replicate the dim across
    every salt value, join on keys + salt. Shuffle volume for the dim grows
    ×buckets; each hot fact key spreads over ``buckets`` reducers."""
    salted_fact = with_salt(fact, fact_unique_col, buckets)
    salts = fact.sparkSession.range(buckets).select(F.col("id").cast("int").alias("__salt"))
    replicated_dim = dim.crossJoin(F.broadcast(salts))
    return salted_fact.join(replicated_dim, on + ["__salt"], how).drop("__salt")
