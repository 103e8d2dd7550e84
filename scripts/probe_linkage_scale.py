"""Round-12 scale probes for the new surface: record-linkage agreement
blocking and distribution drift.

Measures, at sf0.01 and sf0.1 (10x rows):

1. edit1_pairs candidate-stage fanout, plain vs agreement-blocked, on the
   FULL customer table — the claim under test is that folding the
   agreement attributes INTO the posting key shrinks the quadratic
   candidate stage (pairs emitted before the levenshtein verify), not
   just the verified output.
2. Wall time of the registered entity_resolution_golden and
   drift_psi_events queries (noop-sink materialization, min of 3).

Usage: python scripts/probe_linkage_scale.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from healthcare_rcm_etl_pipeline_spark.operators import fuzzy  # noqa: E402
from healthcare_rcm_etl_pipeline_spark.plans.queries import QUERIES  # noqa: E402
from healthcare_rcm_etl_pipeline_spark.session import get_spark  # noqa: E402


def _candidate_fanout(df, agree):
    """Pairs emitted by the posting buckets BEFORE the levenshtein verify
    (the quadratic stage): sum over buckets of d*(d-1)/2."""
    agree = list(agree or [])
    base = df.select(
        F.col("c_custkey").alias("__id"),
        F.col("c_name").cast("string").alias("__key"),
        *[F.col(c) for c in agree],
    )
    post = base.select(
        "__id", *agree, F.explode(fuzzy.deletion_variants(F.col("__key"))).alias("__var")
    ).withColumn("__vh", F.xxhash64("__var"))
    return (
        post.groupBy("__vh", *agree)
        .agg(F.count(F.lit(1)).alias("d"))
        .agg(F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("fanout"))
        .first()["fanout"]
    )


def _timed(fn, iters=3):
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> None:
    spark = get_spark(app_name="probe-linkage-scale")
    out = {"probe": "linkage_drift_scale_r12", "sfs": {}}
    for sf in ("0.01", "0.1"):
        sf_dir = f"/root/testdata/sf{sf}"
        cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
        n = cust.count()
        plain_fan = int(_candidate_fanout(cust, []))
        blocked_fan = int(_candidate_fanout(cust, ["c_nationkey", "c_mktsegment"]))
        t_golden = _timed(lambda: QUERIES["entity_resolution_golden"](spark, sf_dir).write.format("noop").mode("overwrite").save())
        t_drift = _timed(lambda: QUERIES["drift_psi_events"](spark, sf_dir).write.format("noop").mode("overwrite").save())
        t_hardneg = _timed(lambda: QUERIES["ann_hard_negatives"](spark, sf_dir).write.format("noop").mode("overwrite").save())
        out["sfs"][sf] = {
            "customer_rows": n,
            "candidate_fanout_plain": plain_fan,
            "candidate_fanout_agreement_blocked": blocked_fan,
            "fanout_reduction": round(plain_fan / max(blocked_fan, 1), 1),
            "entity_resolution_golden_sec": t_golden,
            "drift_psi_events_sec": t_drift,
            "ann_hard_negatives_sec": t_hardneg,
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
