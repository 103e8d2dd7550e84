"""r15 probe (r14 verdict missing #2): the windowed embedding-centroid
drift unrolls ``dim`` integer-sum aggregate columns (streaming-legal ONE
aggregation — no explode). At production embedding widths the analysis /
codegen cost of that unroll grows linearly and whole-stage codegen can
bail to interpreted mode. Measure the real build+run cost at dim
64/256/768/1536 on a synthetic 200k-row frame, and whether the aggregate
stays inside WholeStageCodegen, to pick the documented ceiling that
``windowed_embedding_centroid_drift`` asserts.

Usage: python scripts/probe_wdrift_dim_r15.py [rows_per_dim]
Prints one line per dim: build_sec (plan construction + analysis),
run_sec (execution on the synthetic frame), codegen (whether the hash
aggregate appears inside a WholeStageCodegen span).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from healthcare_rcm_etl_pipeline_spark.operators import quality  # noqa: E402
from healthcare_rcm_etl_pipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_spark(cpus=16, driver_memory="16g", app_name="wdrift-dim-probe")
    for dim in (64, 256, 768, 1536):
        # deterministic synthetic vectors: component = f(id, pos) in [-0.5, 0.5]
        base = spark.range(n_rows).select(
            (F.col("id") % 8).cast("int").alias("grp"),
            F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id") % 7200).alias("ts"),
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda p: F.round(
                    (F.pmod(F.xxhash64(F.col("id"), p), F.lit(1000)) / 1000.0) - 0.5, 6
                ),
            ).alias("vec"),
        )
        ref = base.filter(F.col("id") % 2 == 0).drop("ts") if False else base
        t0 = time.perf_counter()
        out = quality.windowed_embedding_centroid_drift(
            ref, base, "vec", "grp", "ts", duration="30 minutes", dim=dim
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        build = time.perf_counter() - t0
        t0 = time.perf_counter()
        n = out.count()
        run = time.perf_counter() - t0
        in_codegen = "WholeStageCodegen" in plan and "HashAggregate" in plan
        print(
            f"dim={dim:5d} rows={n_rows} out_rows={n} "
            f"build_sec={build:7.2f} run_sec={run:7.2f} "
            f"codegen_spans={'yes' if in_codegen else 'no'} "
            f"plan_chars={len(plan)}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
