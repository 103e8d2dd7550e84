"""Round-13 probe: incremental entity-resolution per-batch cost is flat
while the accumulated corpus grows — the same flatness contract the text
and semantic ingest paths carry (SCALE.md streaming sections).

Folds the FULL sf0.1 customer table (15k rows) through
``make_entity_ingest_batch_fn`` in 8 equal ascending-custkey batches at
the ``entity_resolution_golden`` linkage config (name within one edit,
agreement on nation + segment) and times each batch. Per-batch work must
track the BATCH (its own blocking + point lookups into the vh-sorted
variant index and the doc-sorted label state), not the accumulated state:
a growing trend here would mean a probe degraded into a state scan.

Usage: python scripts/probe_entity_ingest_flatness.py
(writes /tmp/probe_entity_flatness_r13.json)
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
    spark = get_spark(cpus=32, driver_memory="24g", app_name="hrcm-entflat-r13")
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="hrcm_r13_entflat_") + "/mdm"
    sf_dir = "/root/testdata/sf0.1"
    n_batches = 8
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
        out = {
            "sf_dir": sf_dir,
            "batches": n_batches,
            "per_batch_sec": per_batch,
            "variant_index_rows": state_rows,
            "steady_trend": round(per_batch[-1] / per_batch[1], 2),
        }
        print(json.dumps(out), flush=True)
        with open("/tmp/probe_entity_flatness_r13.json", "w") as f:
            json.dump(out, f, indent=1)
    finally:
        shutil.rmtree(base.rsplit("/", 1)[0], ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
