"""Profile purge_ids cost vs AFFECTED-epoch count at a 10x corpus.

The operator's scale claim: a purge rewrites ONLY the epoch partitions
containing tombstoned ids — cost = one affected-epoch scan (linear in the
corpus, pure scan + broadcast semi-join, no shuffle) + one bounded rewrite
per affected partition. This probe pins the claim with numbers: a 10x
documents corpus laid out as 16 ingest epochs, then purges engineered to
touch exactly 1 / 2 / 4 / 8 epochs (disjoint epoch sets, so successive
probes don't interact). Reported per probe: wall-clock, the rewritten-
directory count the op itself returns (must equal the engineered k), and
the per-extra-epoch marginal cost implied by the series.

The base is laid out directly (docs/bands epoch dirs + _EPOCH marker) —
purge only reads the LAYOUT, so routing 10x data through the full gated
ingest would measure ingestion, not the purge.

Usage: python scripts/profile_purge_scale.py [replicas]   (default 10)
Prints one JSON line; /tmp staging only.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from bench_scale import scaled_documents  # noqa: E402
from healthcare_rcm_etl_pipeline_spark.operators import dedup  # noqa: E402
from healthcare_rcm_etl_pipeline_spark.session import get_spark  # noqa: E402
from healthcare_rcm_etl_pipeline_spark.streaming import ingest  # noqa: E402

N_EPOCHS = 16


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark(app_name="hrcm-purge-profile")
    base = tempfile.mkdtemp(prefix="hrcm_purge_")
    try:
        docs = scaled_documents(spark, replicas).select("doc_id", "text").cache()
        n_docs = docs.count()
        bands = dedup.minhash_band_table(docs, "text", "doc_id").cache()
        for e in range(N_EPOCHS):
            docs.filter(F.col("doc_id") % N_EPOCHS == e).write.parquet(
                f"{base}/docs/epoch={e}"
            )
            bands.filter(F.col("doc") % N_EPOCHS == e).write.parquet(
                f"{base}/bands/epoch={e}"
            )
        ingest._write_marker(spark, base, "probe", 0, N_EPOCHS - 1)
        docs.unpersist()
        bands.unpersist()

        # disjoint epoch windows: k=1 -> epoch {0}, k=2 -> {1,2},
        # k=4 -> {3..6}, k=8 -> {7..14}; 64 ids per probe either way so
        # the tombstone set size is constant and only k varies
        probes = {}
        start = 0
        for k in (1, 2, 4, 8):
            epochs = list(range(start, start + k))
            start += k
            ids = []
            per = 64 // k
            for e in epochs:
                # ids congruent to e mod N_EPOCHS live in epoch e only
                ids.extend(e + N_EPOCHS * j for j in range(1, per + 1))
            t0 = time.perf_counter()
            got = ingest.purge_ids(spark, base, ids)
            sec = round(time.perf_counter() - t0, 3)
            probes[f"k={k}"] = {
                "rewritten": got,
                "sec": sec,
                "epochs_match": got["docs"] == k and got["bands"] == k,
            }
            print(f"  k={k}: {sec}s rewritten={got}", file=sys.stderr)

        secs = [probes[f"k={k}"]["sec"] for k in (1, 2, 4, 8)]
        # marginal cost per extra affected epoch from the 1->8 span
        marginal = round((secs[-1] - secs[0]) / 7, 3)
        report = {
            "replicas": replicas,
            "n_docs": n_docs,
            "n_epochs": N_EPOCHS,
            "probes": probes,
            "fixed_scan_sec_approx": round(secs[0] - marginal, 3),
            "marginal_sec_per_epoch": marginal,
            "all_counts_match": all(
                probes[f"k={k}"]["epochs_match"] for k in (1, 2, 4, 8)
            ),
        }
        print(json.dumps(report))
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
