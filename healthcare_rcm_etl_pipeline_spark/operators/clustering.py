"""Exact-reproducible Lloyd k-means over an embedding column — the
clustering primitive for corpus organization (topic bucketing, diversity
sampling, SemDeDup's cell structure, IVF coarse quantizers).

Design for cross-engine exactness (the property the whole query surface is
built on): float iterative clustering normally can't hash-match anything —
summation order changes the means, which changes the assignments. Here
every per-point distance and every centroid coordinate is ROUNDED to a
fixed number of decimals at each step, so both engines quantize away their
sub-ulp disagreements before any comparison or division, and assignment
ties break on the cluster id. The result is a deterministic fixed sequence
of assignments reproducible by an unrolled SQL twin (plans/queries.py
``kmeans_lloyd``) — same device as the integer fixed-point PageRank, with
rounding playing the role of integer floors.

Scale shape (100 TB): the loop is FULLY declarative — no per-iteration
collect, no driver-side centroids. Assignment is a broadcast cross join
against the k-row centroid table (k·dim floats); the centroid update is a
posexplode + partial-aggregated avg whose shuffle carries k·dim rows per
partition, never vectors. ``localCheckpoint`` per iteration truncates the
growing lineage exactly as the other iterative operators do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sq_dist(e: F.Column, c: F.Column, ndp: int) -> F.Column:
    """Rounded squared L2 distance between two double arrays; the
    zip_with/aggregate fold evaluates in array order (deterministic)."""
    return F.round(
        F.aggregate(
            F.zip_with(e, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        ndp,
    )


def kmeans_lloyd(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 2,
    ndp: int = 6,
) -> DataFrame:
    """``iters`` Lloyd steps from deterministic seeds (the ``k`` rows with
    the smallest ids — on-manifold, RNG-free, the ivf_fit seeding idea
    made oracle-friendly). Returns the final assignment
    (id, cluster, dist2): every point labeled with the seed-id of its
    nearest centroid after the last step.

    Cluster ids are the seed ids. A cluster that attracts no points in an
    iteration DROPS OUT (its centroid is undefined); with on-manifold
    seeds this needs a pathological geometry, and the SQL twin drops it
    identically. Distances and centroid coordinates round to ``ndp``
    decimals per step — see the module docstring for why that makes the
    whole iteration cross-engine exact.
    """
    v = df.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("e"),
    ).localCheckpoint(eager=True)
    from pyspark.sql import Window

    cents = (
        v.orderBy("vec_id")
        .limit(k)
        .select(
            F.col("vec_id").alias("cluster"),
            F.transform("e", lambda x: F.round(x, ndp)).alias("c"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy("dist2", "cluster")
    assigned = None
    for step in range(iters):
        scored = v.crossJoin(F.broadcast(cents)).select(
            "vec_id", "cluster", _sq_dist(F.col("e"), F.col("c"), ndp).alias("dist2")
        )
        assigned = (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
            .localCheckpoint(eager=True)
        )
        if step == iters - 1:
            break
        dims = assigned.join(v, "vec_id").select(
            "cluster", F.posexplode("e").alias("i", "val")
        )
        means = dims.groupBy("cluster", "i").agg(
            F.round(F.avg("val"), ndp).alias("cv")
        )
        cents = (
            means.groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("i", "cv"))).alias("s"))
            .select("cluster", F.col("s.cv").alias("c"))
        )
    return assigned
