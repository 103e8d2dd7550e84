"""Round-13 probe: components-state scan TWO is bounded by the touched
neighborhood, not the accumulated label state.

Before r13, `_affected_component_slice`'s scan TWO (every state row of the
touched components) was a broadcast semi-join over the DOC-sorted state:
no pushed predicate, so every batch decompressed the ENTIRE accumulated
label state to keep a handful of rows — per-batch I/O grew linearly with
state size. r13 adds the COMPONENT-sorted state twin
(`components_by_label/`, same delta rows re-sorted at write time): the
bounded touched-label set inlines as a pushed-down `In(component, ...)`
literal, and footer min/max stats skip the row groups whose component
range can't match.

This probe writes synthetic label states of growing size (SAME layout the
ingest writes: epoch dirs, `_range_sorted` on doc for the main state /
component for the twin), then times the affected-slice fetch for a fixed
small touched set, twin-served vs legacy — the flatness row for SCALE.md.
Wall time is the honest proxy: Spark exposes no row-groups-read metric,
and numFiles counts listed files (footer opens), not decompressed data.

Usage: python scripts/probe_component_scan_r13.py
(writes /tmp/probe_component_scan_r13.json)
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
from healthcare_rcm_etl_pipeline_spark.streaming import ingest  # noqa: E402


def _build_state(spark, base: str, rows_per_epoch: int, epochs: int) -> None:
    """Synthetic label state in the exact ingest layout: clusters of 4
    contiguous docs whose LABEL VALUE is hash-decorrelated from the doc
    range — the adversarial (and realistic, post-merge) case where a
    doc-sorted file's per-row-group component min/max spans the whole
    label space, so only the component-sorted twin can skip row groups."""
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
    """The r12 code path verbatim: scan ONE literal-pruned, scan TWO a
    bare broadcast semi-join over the doc-sorted state — no pushed
    predicate, every row group decompressed."""
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
        elif mode == "main_literal":
            ingest._affected_component_slice(state, nodes, None).collect()
        else:  # twin_literal
            twin = spark.read.parquet(f"{base}/components_by_label")
            ingest._affected_component_slice(state, nodes, twin).collect()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    spark = get_spark(cpus=32, driver_memory="24g", app_name="hrcm-scan2-r13")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="hrcm_r13_scan2_")
    out = {"probe_docs": 8, "rows_per_epoch": 2_000_000}
    rows = []
    try:
        nodes = spark.createDataFrame([(i * 4,) for i in range(8)], "doc long")
        for epochs in (4, 16, 64, 256):
            base = f"{root}/e{epochs}"
            _build_state(spark, base, out["rows_per_epoch"], epochs)
            rec = {
                "state_rows": epochs * out["rows_per_epoch"],
                "epochs": epochs,
            }
            for mode in ("r12_semijoin", "main_literal", "twin_literal"):
                rec[f"{mode}_sec"] = round(
                    _time_slice(spark, base, nodes, mode), 3
                )
            rows.append(rec)
            print(rec, flush=True)
            shutil.rmtree(base, ignore_errors=True)
        out["rows"] = rows
        with open("/tmp/probe_component_scan_r13.json", "w") as f:
            json.dump(out, f, indent=1)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
