"""Mergeable-sketch operators for 100 TB aggregates.

The percentile (KLL) and distinct (HLL++) sketch paths are registered as
tolerance twins in plans/queries.py via Spark's built-in
``percentile_approx`` / ``approx_count_distinct``. This module adds the
frequency sketch: Count-Min over a key column (Cormode & Muthukrishnan,
J. Algorithms 2005) through Spark's ``count_min_sketch`` aggregate.

Workflow shape (the standard sketch deployment): the sketch is BUILT
distributed — count_min_sketch partials are mergeable, so the aggregate
map-side combines and the exchange moves kilobyte sketches, never keys —
and then POINT-QUERIED on the driver for a bounded candidate set. Only the
~KB sketch and the k candidate rows ever reach the driver.

Guarantee checked by the tolerance query: a CMS estimate never
underestimates, and overestimates by at most eps * N with probability
1 - confidence; with seeded hash functions and counter-addition merges the
estimate is deterministic across partitionings, so the bound booleans are
stable driver-oracle material.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    k: int = 10,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
) -> DataFrame:
    """Exact top-k heavy hitters with their Count-Min bound check.

    Returns (key string, exact_n, cms_within_bound): the k most frequent
    keys by exact count (total order: count desc, key asc), each flagged
    with whether the CMS point estimate respects the sketch guarantee
    ``exact <= estimate <= exact + ceil(eps * N)``.

    Keys are cast to string before sketching so build-side and query-side
    hashing agree (CMS hashes strings and integral types differently; the
    cast pins one representation end-to-end).
    """
    spark = df.sparkSession
    keyed = df.select(F.col(key_col).cast("string").alias("key"))
    agg = keyed.agg(
        F.count_min_sketch("key", F.lit(eps), F.lit(confidence), F.lit(seed)).alias(
            "sk"
        ),
        F.count("*").alias("n_total"),
    ).collect()[0]
    n_total = agg["n_total"]
    bound = math.ceil(eps * n_total)
    cms = spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytes(agg["sk"])
    )
    topk = (
        keyed.groupBy("key")
        .agg(F.count("*").alias("exact_n"))
        .orderBy(F.desc("exact_n"), F.asc("key"))
        .limit(k)
        .collect()
    )
    rows = []
    for r in topk:
        est = cms.estimateCount(r["key"])
        rows.append(
            (r["key"], r["exact_n"], r["exact_n"] <= est <= r["exact_n"] + bound)
        )
    return spark.createDataFrame(
        rows, "key string, exact_n bigint, cms_within_bound boolean"
    )
