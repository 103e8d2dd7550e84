"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed end-to-end (plan + execute + materialize via count/
collect of the final small result). The SparkSession is created once —
JVM startup is excluded, matching how a long-lived cluster runs queries.
"""

from __future__ import annotations

import json
import os
import sys
import time

from healthcare_rcm_etl_pipeline_spark.plans.queries import QUERIES
from healthcare_rcm_etl_pipeline_spark.session import get_spark

HEADLINE = [
    "q01_collection_rate",
    "q02_revenue_by_nation",
    "q03_monthly_revenue",
    "q04_status_rates",
    "q07_avg_ship_delay",
    "q09_top20_customers",
    "q10_part_profitability",
    "q11_volume_trends",
    "sk_dense_scalable",
    "scd2_type2_merge",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "ann_topk_bruteforce",
    "text_quality",
    "json_extract_events",
    "events_sessionize",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark(app_name="hrcm-bench")

    # Warm-up: run every headline query once at the smallest SF. Whole-stage
    # codegen classes and JIT compilations are keyed by plan shape, not data
    # size, so this populates the same caches a long-lived cluster session
    # would have. Timed runs below then measure execution, not compilation.
    warm_dir = os.environ.get("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    if os.path.isdir(warm_dir):
        for name in HEADLINE:
            try:
                QUERIES[name](spark, warm_dir).count()
            except Exception as e:  # warm-up must never fail the bench
                print(f"  warmup {name} failed: {e}", file=sys.stderr)

    # min of N runs: steady-state latency, robust to background-load noise
    iters = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "2"))
    timings: dict[str, float] = {}
    for name in HEADLINE:
        best, n = float("inf"), 0
        for _ in range(iters):
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            n = df.count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        print(f"  {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
