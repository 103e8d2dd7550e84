"""Round-14 probe: measure the components-state scan-TWO crossover AT AND
BEYOND the twin gate (r13 verdict: `_TWIN_MIN_BYTES` = 8 GiB was an
EXTRAPOLATED crossover — every measured point stopped at 512M rows, where
the semi-join still won; no committed evidence showed the twin actually
winning above the gate).

Same synthetic layout as scripts/probe_component_scan_r13.py (epoch dirs,
`_range_sorted` doc/component, label values hash-decorrelated from the doc
sort — the adversarial post-merge case), scaled past the gate: the 1.28B-row
point's twin directory exceeds 8 GiB (getContentSummary bytes recorded per
point, so each row maps onto the gate's own axis). Both the r12 semi-join
shape and the twin literal path are timed on identical state; a third
column records the measured twin size. Larger epochs (8M rows) keep the
epoch count in the compacted regime compact_epochs maintains
(`small_bytes` tiering), so the twin's footer-read term reflects a
maintained base, not thousands of tiny files.

Three points, 2 axes: (64 ep x 8M rows) and (160 ep x 8M rows) hold
files-per-row constant — the UNMAINTAINED regime, where epoch (and file)
count grows with the state; (10 ep x 128M rows) holds the SAME 1.28B rows
in compacted epochs — the regime ``compact_epochs`` maintains. The pair of
1.28B-row points isolates what the twin's cost actually tracks.

Usage: python scripts/probe_twin_gate_r14.py [epochs:rows_per_epoch ...]
(writes /tmp/probe_twin_gate_r14.json, or _extra.json for a subset run)
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
from healthcare_rcm_etl_pipeline_spark.sources import sinks  # noqa: E402
from healthcare_rcm_etl_pipeline_spark.streaming import ingest  # noqa: E402


def _build_state(spark, base: str, rows_per_epoch: int, epochs: int) -> None:
    for ep in range(epochs):
        lo = ep * rows_per_epoch
        delta = spark.range(lo, lo + rows_per_epoch).select(
            F.col("id").alias("doc"),
            F.abs(
                F.xxhash64((F.col("id") - F.col("id") % 4).cast("string"))
            ).alias("component"),
        )
        ingest._range_sorted(delta, "doc").write.mode("overwrite").parquet(
            f"{base}/components/epoch={ep}"
        )
        ingest._range_sorted(delta, "component").write.mode("overwrite").parquet(
            f"{base}/components_by_label/epoch={ep}"
        )


def _r12_semijoin_slice(state, nodes):
    live_mine = (
        ingest._literal_pruned(state, nodes, "doc")
        .join(F.broadcast(nodes), "doc", "left_semi")
        .groupBy("doc")
        .agg(F.max_by("component", "epoch").alias("component"))
    )
    touched = live_mine.select("component").distinct()
    return (
        state.join(F.broadcast(touched), "component", "left_semi")
        .select("doc", "component")
        .distinct()
    )


def _time_slice(spark, base: str, nodes, mode: str, reps: int = 3) -> float:
    state = spark.read.parquet(f"{base}/components")
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        if mode == "r12_semijoin":
            _r12_semijoin_slice(state, nodes).collect()
        else:  # twin_literal
            twin = spark.read.parquet(f"{base}/components_by_label")
            ingest._affected_component_slice(state, nodes, twin).collect()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    spark = get_spark(cpus=32, driver_memory="24g", app_name="hrcm-twin-r14")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="hrcm_r14_twin_")
    points = [(64, 8_000_000), (160, 8_000_000), (10, 128_000_000)]
    subset = [
        (int(a.split(":")[0]), int(a.split(":")[1])) for a in sys.argv[1:]
    ]
    dest = "/tmp/probe_twin_gate_r14.json"
    if subset:
        points, dest = subset, "/tmp/probe_twin_gate_r14_extra.json"
    out = {"probe_docs": 8}
    rows = []
    try:
        nodes = spark.createDataFrame([(i * 4,) for i in range(8)], "doc long")
        for epochs, rows_per_epoch in points:
            base = f"{root}/e{epochs}"
            _build_state(spark, base, rows_per_epoch, epochs)
            fs, _ = sinks._fs_path(spark, base)
            summ = fs.getContentSummary(
                ingest._jpath(spark, f"{base}/components_by_label")
            )
            twin_bytes = summ.getLength()
            rec = {
                "state_rows": epochs * rows_per_epoch,
                "epochs": epochs,
                "rows_per_epoch": rows_per_epoch,
                "twin_bytes": int(twin_bytes),
                "twin_gib": round(twin_bytes / (1 << 30), 2),
                "twin_files": int(summ.getFileCount()),
                "mean_file_mb": round(
                    twin_bytes / max(1, summ.getFileCount()) / (1 << 20), 1
                ),
            }
            for mode in ("r12_semijoin", "twin_literal"):
                rec[f"{mode}_sec"] = round(_time_slice(spark, base, nodes, mode), 3)
            rows.append(rec)
            print(rec, flush=True)
            shutil.rmtree(base, ignore_errors=True)
        out["rows"] = rows
        with open("/tmp/probe_twin_gate_r14.json", "w") as f:
            json.dump(out, f, indent=1)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
