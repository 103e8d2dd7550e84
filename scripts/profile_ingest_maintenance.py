"""Isolate the streaming-ingest residual per-batch drift and show that
size-tiered compaction bounds it.

After the round-6 probe prune (`prune_bands_to_probe`), the bench's
per-batch ingest cost is flat-to-slightly-rising: slope ~+0.02/batch
(normalized by the median batch) while the band index grows 7.6x — far
from the O(index) term the prune removed, but not zero. The remaining
hypothesis (SCALE.md): each batch appends an ``epoch=N`` directory to the
docs AND bands datasets, so every later batch's index scan lists and
plans over a growing directory count — metadata cost, linear in BATCH
COUNT (not corpus size), and exactly what `compact_epochs` exists to
bound.

This probe runs the SAME sf0.1 document stream through the foreachBatch
body twice, 16 micro-batches each:

- arm ``none``: no maintenance — epoch dirs accumulate 1 per batch.
- arm ``tiered``: ``compact_epochs(small_bytes=...)`` every 4 batches
  (cost logged separately, NOT inside the batch timings), so the live
  epoch-dir count is bounded by the compaction interval.

Reported per arm: per-batch wall-clock, post-warmup normalized slope,
live epoch-dir count per batch, and (tiered arm) per-compaction cost.
If the drift is metadata growth, the tiered arm's slope must flatten
toward 0 while its batch LEVEL stays the same — a cheaper level would
mean the drift was index-scan volume instead (compaction also coalesces
row groups), which the prune already rules out at these sizes.

Usage: python scripts/profile_ingest_maintenance.py [n_batches] [interval]
Prints one JSON line; /tmp staging only.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from healthcare_rcm_etl_pipeline_spark.session import get_spark  # noqa: E402
from healthcare_rcm_etl_pipeline_spark.sources.readers import load_table  # noqa: E402
from healthcare_rcm_etl_pipeline_spark.streaming import ingest  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _epoch_dirs(base: str, sub: str) -> int:
    root = f"{base}/{sub}"
    if not os.path.isdir(root):
        return 0
    return sum(1 for d in os.listdir(root) if d.startswith("epoch="))


def _slope(per_batch: list[float]) -> float | None:
    """Normalized least-squares slope over post-warmup batches (1..n-1):
    fraction of a median batch added per batch (same metric as bench.py)."""
    steady = per_batch[1:]
    if len(steady) < 2:
        return None
    nm = len(steady)
    xbar = (nm - 1) / 2
    ybar = sum(steady) / nm
    num = sum((i - xbar) * (y - ybar) for i, y in enumerate(steady))
    den = sum((i - xbar) ** 2 for i in range(nm))
    med = statistics.median(steady)
    return round((num / den) / med, 3) if med else None


def run_arm(spark, docs, n_batches: int, interval: int | None) -> dict:
    base = tempfile.mkdtemp(prefix="hrcm_maint_")
    try:
        fn = ingest.make_dedup_ingest_batch_fn(base)
        per_batch: list[float] = []
        dirs: list[int] = []
        compactions: list[dict] = []
        for b in range(n_batches):
            batch = docs.filter((docs.doc_id % n_batches) == b)
            t0 = time.perf_counter()
            fn(batch, b)
            per_batch.append(round(time.perf_counter() - t0, 3))
            dirs.append(_epoch_dirs(base, "bands"))
            if interval and (b + 1) % interval == 0:
                t0 = time.perf_counter()
                folded = ingest.compact_epochs(spark, base, small_bytes=64 << 20)
                compactions.append(
                    {
                        "after_batch": b,
                        "sec": round(time.perf_counter() - t0, 3),
                        "folded": folded,
                    }
                )
        out = {
            "per_batch_sec": per_batch,
            "epoch_dirs": dirs,
            "slope": _slope(per_batch),
            "steady_median": round(statistics.median(per_batch[1:]), 3),
        }
        if interval:
            out["compactions"] = compactions
        return out
    finally:
        shutil.rmtree(base, ignore_errors=True)


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    interval = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark(app_name="hrcm-ingest-maintenance")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    # warm-up pass: JIT/codegen, so arm ordering doesn't bias the compare
    run_arm(spark, docs, 2, None)
    arms = {
        "none": run_arm(spark, docs, n_batches, None),
        "tiered": run_arm(spark, docs, n_batches, interval),
    }
    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "n_batches": n_batches,
                "compact_interval": interval,
                "arms": arms,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
