"""Targeted per-query micro-bench for round-15 before/after evidence.

Usage: python scripts/microbench_r15.py <name> [name ...] [--iters N]

Times each named registered query exactly as bench.py does (construction +
noop-sink materialization, min of N runs after one warm-up at the same SF)
on $SPARK_GRAFT_SF_DIR (default sf0.1). Prints one line per query. Isolated
runs keep bench-order warmup effects out of before/after comparisons; the
full-bench numbers remain the committed artifact.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from healthcare_rcm_etl_pipeline_spark.plans.queries import QUERIES  # noqa: E402
from healthcare_rcm_etl_pipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    iters = 3
    if "--iters" in sys.argv:
        iters = int(sys.argv[sys.argv.index("--iters") + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="hrcm-microbench")
    for name in args:
        spark.sparkContext.setJobDescription(f"microbench:{name}")
        # one untimed warm run (codegen/JIT; matches bench.py's count warm)
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(iters):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(time.perf_counter() - t0)
        print(
            f"{name}: min={min(runs):.3f} runs={[round(r, 3) for r in runs]}",
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
