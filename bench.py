"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed end-to-end (plan + execute + materialize via count/
collect of the final small result). The SparkSession is created once —
JVM startup is excluded, matching how a long-lived cluster runs queries.

Contention guard: a fixed-cost calibration sentinel (pure JVM range-sum,
independent of SF and of any engine code) is timed before and after the
query loop. If the machine got busier mid-run the sentinel drifts, and the
run is flagged "contended" — so an environment wobble can never masquerade
as a code regression. Per-query dispersion (min/median/max over the timed
iterations) is reported alongside the headline min for the same reason.
"""

from __future__ import annotations

import glob
import json
import os
import re
import statistics
import sys
import time

from healthcare_rcm_etl_pipeline_spark.plans.queries import QUERIES
from healthcare_rcm_etl_pipeline_spark.session import get_spark

# explanations for expected round-over-round deltas (emitted with the JSON
# so a regression vs the previous round is never silent)
DELTA_NOTES = {
    "dedup_ngram_jaccard": "r2 runs with the max_df skew cap ON "
    "(single-pass window mode); r1 benched the uncapped form",
    "q21_customer_deciles": "r4 computes the exact ntile via the two-pass "
    "parallel rank (one extra bounded count job) instead of the "
    "single-task global window r3 benched",
    "semantic_dedup": "r4 adds the max_cell hot-cell guard (one extra "
    "partial-aggregated cell-count pass before the pair scan)",
}


def _prev_round() -> tuple[str | None, dict[str, float], float | None]:
    """Latest committed BENCH_r{N}.json: (name, per-query secs, sentinel)."""
    best_n, best = -1, None
    for p in glob.glob(os.path.join(os.path.dirname(__file__) or ".", "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if m and int(m.group(1)) > best_n:
            best_n, best = int(m.group(1)), p
    if best is None:
        return None, {}, None
    try:
        with open(best) as f:
            doc = json.load(f)
        # the driver wraps the bench's JSON line under "parsed"
        doc = doc.get("parsed", doc) or {}
        prev_sent = (doc.get("sentinel") or {}).get("before_sec")
        return f"r{best_n:02d}", doc.get("queries", {}), prev_sent
    except Exception:
        return None, {}, None

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
    # round-2 surface additions
    "chunk_documents",
    "repetition_quality",
    "incremental_agg_maintenance",
    "embedding_quantize",
    "q21_customer_deciles",
    "semantic_dedup",
    "quality_classifier",
    # round-4 surface additions
    "events_range_join",
    "ann_topk_ivf",
    "oov_rate",
    "dedup_keep_survivors",
]


def _sentinel_sec(spark, iters: int = 5) -> float:
    """Min wall-clock of a fixed-cost JVM-side job: 50M-row range sum over
    32 partitions. No IO, no engine code — its only variable is machine
    load, which is exactly what it exists to measure."""
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        spark.range(0, 50_000_000, 1, 32).selectExpr("sum(id * 3 + 1)").collect()
        best = min(best, time.perf_counter() - t0)
    return best


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

    # min of N runs: steady-state latency, robust to background-load noise.
    # Sub-second queries get extra iterations — their min is dominated by
    # scheduler/GC jitter, so a deeper min tightens round-over-round deltas
    # at negligible added wall-clock.
    iters = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "3")))
    extra = max(0, int(os.environ.get("SPARK_GRAFT_BENCH_EXTRA", "3")))
    sentinel_before = _sentinel_sec(spark)
    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name in HEADLINE:
        runs: list[float] = []
        n = 0
        for i in range(iters + extra):
            if i >= iters and min(runs) >= 1.0:
                break
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            n = df.count()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(min(runs), 3)
        spread[name] = [
            round(min(runs), 3),
            round(statistics.median(runs), 3),
            round(max(runs), 3),
        ]
        print(f"  {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)
    sentinel_after = _sentinel_sec(spark)

    drift = round(sentinel_after / sentinel_before, 2) if sentinel_before > 0 else 1.0
    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "spread": spread,  # per-query [min, median, max] over timed iters
        "sentinel": {
            "before_sec": round(sentinel_before, 3),
            "after_sec": round(sentinel_after, 3),
            "drift": drift,
            # machine load changed >1.5x during the run: treat per-query
            # numbers as unreliable for round-over-round comparison
            "contended": bool(drift > 1.5 or drift < 1 / 1.5),
        },
    }
    prev_name, prev, prev_sentinel = _prev_round()
    if prev_sentinel:
        # before/after drift only catches load CHANGES during the run; the
        # cross-round sentinel ratio catches a uniformly slower/faster
        # environment (the r02->r03 2x machine shift) — per-query deltas
        # should be read relative to it
        env = round(min(sentinel_before, sentinel_after) / prev_sentinel, 2)
        out["sentinel"]["vs_prev_round"] = env
        out["sentinel"]["env_shifted"] = bool(env > 1.5 or env < 1 / 1.5)
    if prev:
        deltas = {
            name: round(timings[name] / prev[name], 2)
            for name in timings
            if name in prev and prev[name] > 0
        }
        out["deltas_vs"] = prev_name
        out["deltas"] = deltas  # ratio this-round / prev-round per query
        # total over only the queries the previous round also benched —
        # the honest round-over-round number when HEADLINE grows
        out["comparable_total"] = round(
            sum(t for n, t in timings.items() if n in prev), 3
        )
        out["delta_notes"] = {
            k: v for k, v in DELTA_NOTES.items() if deltas.get(k, 1.0) > 1.5
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
