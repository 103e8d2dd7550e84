"""Round-12 scale probes.

1. CROSS the hq broadcast cliff (round-11 verdict #5): at x100 the patient
   dimension (~1M rows) still fit under Spark's size estimate for
   spark.sql.autoBroadcastJoinThreshold, so the interesting 100 TB
   behavior — the flip to a shuffle join and AQE's runtime re-plan — was
   never demonstrated. This probe re-runs hq2/hq9 on the x100 star twice:
   once at the default threshold (broadcast expected) and once with the
   threshold lowered to 512 KB (both the static and the AQE-runtime
   threshold), which forces the patient-dim join to plan/replan as a
   shuffle join. Wall time and the ACTUAL strategy of the patient-dim
   join are recorded from the EXECUTED (AQE-final) plan.

2. Fixed `_join_strategy` (round-11 ADVICE): the r11 probe reported
   'broadcast' if ANY BroadcastHashJoin appeared anywhere in the plan;
   hq2/hq9 also join genuinely-small dims (providers/dates) that stay
   broadcast at any scale, so the check must scope to the join whose
   SUBTREE scans dim_patients. `_patient_join_strategy` walks the plan
   string's tree structure and returns the strategy of the DEEPEST join
   node whose subtree contains the dim_patients scan, truncating at
   "== Initial Plan ==" so an AQE re-plan is read from the final plan
   only.

Usage: python scripts/probe_scale_r12.py   (writes /tmp/probe_r12.json;
rows summarized into SCALE.md round-12 section)
"""

from __future__ import annotations

import json
import re
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from pyspark.sql import functions as F  # noqa: E402

from probe_scale_r11 import _noop, _replicate  # noqa: E402

from healthcare_rcm_etl_pipeline_spark.plans import analytics  # noqa: E402
from healthcare_rcm_etl_pipeline_spark.plans.pipeline import run_pipeline  # noqa: E402
from healthcare_rcm_etl_pipeline_spark.session import get_spark  # noqa: E402

_IND = re.compile(r"^[\s:+\-]*")
_MARK = re.compile(r"^\*?\(\d+\)\s*")
_KINDS = (
    ("BroadcastHashJoin", "broadcast"),
    ("SortMergeJoin", "sort-merge"),
    ("ShuffledHashJoin", "shuffled-hash"),
    ("BroadcastNestedLoopJoin", "broadcast-nested-loop"),
)


def _patient_join_strategy(plan_str: str, dim: str = "dim_patients") -> str:
    """Strategy of the deepest join whose subtree scans ``dim``."""
    cut = plan_str.find("== Initial Plan ==")
    if cut != -1:
        plan_str = plan_str[:cut]
    lines = plan_str.splitlines()
    best: tuple[int, str] | None = None
    for i, ln in enumerate(lines):
        ind = _IND.match(ln).end()
        body = _MARK.sub("", ln[ind:])
        kind = next((k for pfx, k in _KINDS if body.startswith(pfx)), None)
        if kind is None:
            continue
        sub = []
        for lb in lines[i + 1:]:
            if lb.strip() and _IND.match(lb).end() <= ind:
                break
            sub.append(lb)
        if any(dim in s for s in sub) and (best is None or ind > best[0]):
            best = (ind, kind)
    return best[1] if best else "none"


def _executed_strategy(df, dim: str = "dim_patients") -> str:
    """Execute the plan (AQE finalizes only on execution), then read the
    strategy from the df's OWN query execution's final physical plan."""
    df.collect()
    return _patient_join_strategy(
        df._jdf.queryExecution().executedPlan().toString(), dim
    )


def main() -> None:
    spark = get_spark(cpus=32, driver_memory="24g", app_name="hrcm-probe-r12")
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="hrcm_r12_star_")
    out: dict = {}
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

        for label, threshold in (("default_10MB", None), ("forced_512KB", 512 * 1024)):
            if threshold is not None:
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(threshold))
                spark.conf.set(
                    "spark.sql.adaptive.autoBroadcastJoinThreshold", str(threshold)
                )
            cfg: dict = {}
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
                cfg[qname] = {
                    "patient_dim_join": strategy,
                    "best_sec": round(best, 3),
                }
            out[label] = cfg
            print(f"{label}: {cfg}", flush=True)
        with open("/tmp/probe_r12.json", "w") as f:
            json.dump(out, f, indent=1)
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
