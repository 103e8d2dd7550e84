"""Round-13 scale probe: the broadcast cliff is now crossed BY DEFAULT.

Round 12 measured the defect (probe_scale_r12.py): at x100 the 1M-row
patient dimension's compressed-bytes estimate (~1.1 MB pruned) slid under
every static broadcast threshold, the default plan broadcast it, and the
broadcast BUILD dominated — forced sort-merge was 2.9x faster on hq2
(0.97 s vs 2.82 s), but only with manual threshold forcing.

Round 13 ships the fix (analytics.scaled_lookup): hq2/hq9's patient
lookup picks broadcast vs merge from the dimension's ACTUAL row count
(row-denominated bound _BROADCAST_MAX_DIM_ROWS), because broadcast build
cost is per ROW while the static estimate is per compressed BYTE —
dictionary encoding hides ~30x on the replicated star. This probe re-runs
the x100 star at DEFAULT session config with NO threshold forcing and
records, from the EXECUTED (AQE-final) plan, the actual strategy of the
patient-dim join plus wall time — done = sort-merge by default and hq2 in
the ~1 s band the r12 forced run measured.

Usage: python scripts/probe_scale_r13.py   (writes /tmp/probe_r13.json;
rows summarized into SCALE.md round-13 section)
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from pyspark.sql import functions as F  # noqa: E402

from probe_scale_r11 import _noop, _replicate  # noqa: E402
from probe_scale_r12 import _patient_join_strategy  # noqa: E402

from healthcare_rcm_etl_pipeline_spark.plans import analytics  # noqa: E402
from healthcare_rcm_etl_pipeline_spark.plans.pipeline import run_pipeline  # noqa: E402
from healthcare_rcm_etl_pipeline_spark.session import get_spark  # noqa: E402


def _executed_strategy(df, dim: str = "dim_patients") -> str:
    df.collect()
    return _patient_join_strategy(
        df._jdf.queryExecution().executedPlan().toString(), dim
    )


def main() -> None:
    spark = get_spark(cpus=32, driver_memory="24g", app_name="hrcm-probe-r13")
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="hrcm_r13_star_")
    out: dict = {"config": "default (NO threshold forcing; scaled_lookup only)"}
    k = 100
    growing = {"dim_patients", "fact_claims", "fact_transactions"}
    try:
        star1 = run_pipeline(spark)
        sk_stride = (
            star1["dim_patients"].agg(F.max("patient_sk")).collect()[0][0] + 1
        )
        star = {}
        for name, df in star1.items():
            df.write.mode("overwrite").parquet(f"{base}/x1/{name}")
            src = spark.read.parquet(f"{base}/x1/{name}")
            if name in growing:
                _replicate(
                    src, k, sk_stride, ["ClaimID", "TransactionID", "EncounterID"]
                ).write.mode("overwrite").parquet(f"{base}/x{k}/{name}")
                star[name] = spark.read.parquet(f"{base}/x{k}/{name}")
            else:
                star[name] = src
        out["rows"] = {n: star[n].count() for n in sorted(growing)}

        for qname in ("hq2_revenue_by_hospital", "hq9_patient_lifetime_value"):
            fn = analytics.HEALTHCARE_QUERIES[qname]
            strategy = _executed_strategy(fn(star))
            _noop(fn(star))  # warm
            best = min(
                (lambda t0: (_noop(fn(star)), time.perf_counter() - t0)[1])(
                    time.perf_counter()
                )
                for _ in range(3)
            )
            out[qname] = {
                "patient_dim_join": strategy,
                "best_sec": round(best, 3),
            }
            print(f"{qname}: {out[qname]}", flush=True)

        # and the x1 star must still broadcast (the small-dim fast path)
        star_x1 = {n: spark.read.parquet(f"{base}/x1/{n}") for n in star1}
        out["x1_hq2_patient_dim_join"] = _executed_strategy(
            analytics.HEALTHCARE_QUERIES["hq2_revenue_by_hospital"](star_x1)
        )
        print(f"x1 strategy: {out['x1_hq2_patient_dim_join']}", flush=True)
        with open("/tmp/probe_r13.json", "w") as f:
            json.dump(out, f, indent=1)
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
