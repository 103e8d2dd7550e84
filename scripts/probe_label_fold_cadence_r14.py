"""Round-14 probe: what does the self-arming label-state fold cadence
(`compact_labels_every`) cost per batch?

Folds the same 8-batch component-labeling ingest (5000 sf0.1 documents —
the bench.py streaming_ingest shape) twice: cadence OFF and cadence 4
(fold after epochs 3 and 7). Reports per-batch walls for both runs and
the isolated fold overhead (cadence batches vs their no-cadence twins).
The fold is O(label state) — pair-graph-sized, ≪ corpus — so the
overhead should be a small constant per fold batch, NOT a term that
grows with the corpus.

Usage: python scripts/probe_label_fold_cadence_r14.py
(writes /tmp/probe_label_fold_cadence_r14.json)
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


def _run(spark, docs, base: str, n_batches: int, every: int | None) -> list[float]:
    fn = ingest.make_component_ingest_batch_fn(
        base, "text", "doc_id", compact_labels_every=every
    )
    walls = []
    for b in range(n_batches):
        batch = docs.filter(F.col("__b") == b).drop("__b")
        t0 = time.perf_counter()
        fn(batch, b)
        walls.append(round(time.perf_counter() - t0, 3))
        print(f"every={every} batch {b}: {walls[-1]} s", flush=True)
    return walls


def main() -> None:
    spark = get_spark(cpus=32, driver_memory="24g", app_name="hrcm-foldcad-r14")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="hrcm_r14_foldcad_")
    n_batches, every, n_docs = 8, 4, 5000
    try:
        docs = (
            load_table(spark, "/root/testdata/sf0.1", "documents")
            .orderBy("doc_id")
            .limit(n_docs)
            .withColumn("__b", F.col("doc_id") % n_batches)
            .localCheckpoint(eager=True)
        )
        off = _run(spark, docs, f"{root}/off", n_batches, None)
        on = _run(spark, docs, f"{root}/on", n_batches, every)
        fold_batches = [b for b in range(n_batches) if (b + 1) % every == 0]
        out = {
            "n_docs": n_docs,
            "batches": n_batches,
            "compact_labels_every": every,
            "per_batch_off": off,
            "per_batch_on": on,
            "fold_batches": fold_batches,
            "fold_overhead_sec": [round(on[b] - off[b], 3) for b in fold_batches],
            "nonfold_delta_sec": [
                round(on[b] - off[b], 3)
                for b in range(n_batches)
                if b not in fold_batches
            ],
        }
        print(json.dumps(out), flush=True)
        with open("/tmp/probe_label_fold_cadence_r14.json", "w") as f:
            json.dump(out, f, indent=1)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
