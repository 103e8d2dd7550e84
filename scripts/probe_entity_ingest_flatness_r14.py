"""Round-14 probe: entity-ingest per-batch flatness measured PAST JIT
warmup (r13 verdict #3: the 8-batch r13 probe trended monotone DOWN
(9.6 -> 5.9 s) because warmup masked the steady state — unlike the
text/semantic ingest flatness rows, which isolate the steady regime).

Folds the FULL sf0.1 customer table through ``make_entity_ingest_batch_fn``
in 16 equal ascending-custkey batches at the ``entity_resolution_golden``
linkage config and times each batch. The flatness statistics EXCLUDE the
first ``warmup`` batches:

- ``steady_trend_post_warmup``: mean of the last quarter / mean of the
  first post-warmup quarter — ~1.0 iff per-batch cost does not track the
  accumulated state (which grows 16x across the run).
- ``rel_slope_post_warmup``: least-squares slope per batch over the
  post-warmup window, normalized by the window mean — seconds-free drift
  per batch as a fraction of the typical batch.

Usage: python scripts/probe_entity_ingest_flatness_r14.py
(writes /tmp/probe_entity_flatness_r14.json)
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from healthcare_rcm_etl_pipeline_spark.session import get_spark  # noqa: E402
from healthcare_rcm_etl_pipeline_spark.sources.readers import load_table  # noqa: E402
from healthcare_rcm_etl_pipeline_spark.streaming import ingest  # noqa: E402


def main() -> None:
    spark = get_spark(cpus=32, driver_memory="24g", app_name="hrcm-entflat-r14")
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="hrcm_r14_entflat_") + "/mdm"
    sf_dir = "/root/testdata/sf0.1"
    n_batches, warmup = 16, 4
    try:
        c = load_table(spark, sf_dir, "customer")
        hi = c.agg(F.max("c_custkey")).collect()[0][0]
        width = (hi + n_batches) // n_batches
        fn = ingest.make_entity_ingest_batch_fn(
            base, "c_name", "c_custkey", agree_cols=["c_nationkey", "c_mktsegment"]
        )
        per_batch, state_rows = [], []
        for b in range(n_batches):
            batch = c.filter(
                (F.col("c_custkey") >= b * width)
                & (F.col("c_custkey") < (b + 1) * width)
            )
            t0 = time.perf_counter()
            fn(batch, b)
            per_batch.append(round(time.perf_counter() - t0, 3))
            idx = ingest.read_variant_index(spark, base)
            state_rows.append(idx.count() if idx is not None else 0)
            print(
                f"batch {b}: {per_batch[-1]} s, variant index {state_rows[-1]} rows",
                flush=True,
            )
        steady = per_batch[warmup:]
        q = max(1, len(steady) // 3)
        trend = round(sum(steady[-q:]) / q / (sum(steady[:q]) / q), 2)
        n = len(steady)
        xbar, ybar = (n - 1) / 2.0, sum(steady) / n
        slope = sum(
            (i - xbar) * (y - ybar) for i, y in enumerate(steady)
        ) / sum((i - xbar) ** 2 for i in range(n))
        out = {
            "sf_dir": sf_dir,
            "batches": n_batches,
            "warmup_excluded": warmup,
            "per_batch_sec": per_batch,
            "variant_index_rows": state_rows,
            "steady_trend_post_warmup": trend,
            "rel_slope_post_warmup": round(slope / ybar, 4),
        }
        print(json.dumps(out), flush=True)
        with open("/tmp/probe_entity_flatness_r14.json", "w") as f:
            json.dump(out, f, indent=1)
    finally:
        shutil.rmtree(base.rsplit("/", 1)[0], ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
