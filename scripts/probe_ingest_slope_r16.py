"""Step-level timing of the dedup-ingest foreachBatch body (r16 probe).

Mirrors make_dedup_ingest_batch_fn action-for-action with a timer around
every Spark action — the same 8-batch fold bench.py times — PLUS the state
file/dir counts after every epoch, to attribute the LOW-CORE per-batch
growth the driver's 8-core rerun exposed (BENCH_r15_c8: 3.47 -> 7.61 s
across 8 batches while the 32-core trend stayed flat — VERDICT r15 item 5).
Run on an idle machine:
  SPARK_GRAFT_CPUS=8 python scripts/probe_ingest_slope_r16.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from healthcare_rcm_etl_pipeline_spark.operators import dedup, graph  # noqa: E402
from healthcare_rcm_etl_pipeline_spark.session import get_spark  # noqa: E402
from healthcare_rcm_etl_pipeline_spark.sources.readers import load_table  # noqa: E402
from healthcare_rcm_etl_pipeline_spark.streaming import ingest  # noqa: E402


def _count_files(base: str, sub: str) -> tuple[int, int]:
    """(parquet files, epoch dirs) under base/sub."""
    root = os.path.join(base, sub)
    files = dirs = 0
    for dirpath, dirnames, filenames in os.walk(root):
        dirs += sum(1 for d in dirnames if d.startswith("epoch="))
        files += sum(1 for f in filenames if f.endswith(".parquet"))
    return files, dirs


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="hrcm-ingest-slope-probe")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs.count()
    base = tempfile.mkdtemp(prefix="hrcm_probe_slope_")
    # More batches than the bench's 8 expose a per-epoch growth term that
    # JIT warm-up decay would otherwise mask (the first ~3 batches of a
    # cold JVM are dominated by codegen/JIT, not state size)
    n_batches = int(os.environ.get("PROBE_BATCHES", "8"))
    k, bands, n, thr = 64, 16, 3, 0.5
    try:
        for b in range(n_batches):
            batch_df = docs.filter((docs.doc_id % n_batches) == b)
            t = {}
            t0 = time.perf_counter()

            def lap(name):
                nonlocal t0
                now = time.perf_counter()
                t[name] = round(now - t0, 3)
                t0 = now

            resolved = ingest._resolve_epoch(spark, base, b, None)
            bound, offset, physical, last = resolved
            ingest.recover_base(spark, base, own_token=bound)
            lap("resolve+recover")

            from pyspark.sql import Window

            from healthcare_rcm_etl_pipeline_spark.functions.text import (
                fingerprint_md5,
            )

            w_fp = Window.partitionBy("__fp").orderBy(F.col("doc_id"))
            batch = (
                batch_df.withColumn("__fp", fingerprint_md5("text"))
                .withColumn("__rn", F.row_number().over(w_fp))
                .filter(F.col("__rn") == 1)
                .drop("__fp", "__rn")
            )
            batch_bands = dedup.minhash_band_table(
                batch, "text", "doc_id", k=k, bands=bands, n=n
            ).localCheckpoint(eager=True)
            lap("bands_ckpt")
            pairs = dedup.minhash_lsh_pairs(
                batch, "text", "doc_id", k=k, bands=bands, n=n,
                verify_threshold=thr, prebuilt_bands=batch_bands,
            ).localCheckpoint(eager=True)
            lap("pairs_ckpt")
            losers = (
                graph.connected_components_bounded(pairs, collect_limit=4096)
                .filter(F.col("doc") != F.col("component"))
                .select(F.col("doc").alias("doc_id"))
            )
            batch = batch.join(losers, "doc_id", "left_anti")
            lap("cc_collect")

            corpus = ingest.read_corpus(spark, base, max_epoch=last)
            index = ingest.read_band_index(spark, base, max_epoch=last)
            lap("state_read_plan")
            if corpus is not None and index is not None:
                index = ingest._literal_pruned_index(index, batch_bands)
                lap("literal_prune_collect")

                def fetch(ids: list):
                    return ingest.read_corpus(spark, base, max_epoch=last).filter(
                        F.col("doc_id").isin(list(ids))
                    )

                dup_new = (
                    dedup.minhash_lsh_pairs_incremental(
                        batch, None, "text", "doc_id",
                        k=k, bands=bands, n=n, verify_threshold=thr,
                        base_bands=index, new_bands=batch_bands,
                        base_lookup=fetch,
                    )
                    .select(F.col("doc_new").alias("doc_id"))
                    .distinct()
                )
                batch = batch.join(dup_new, "doc_id", "left_anti")
            batch = batch.persist()
            ingest._range_sorted(batch, "doc_id").write.mode("overwrite").parquet(
                f"{base}/docs/epoch={physical}"
            )
            lap("docs_write")
            out_bands = batch_bands.join(
                F.broadcast(batch.select(F.col("doc_id").alias("doc"))),
                "doc",
                "left_semi",
            )
            ingest._range_sorted(out_bands, "bh").write.mode("overwrite").parquet(
                f"{base}/bands/epoch={physical}"
            )
            lap("bands_write")
            batch.unpersist()
            ingest._write_marker(spark, base, bound, offset, physical)
            lap("marker")
            total = round(sum(t.values()), 3)
            df_files, df_dirs = _count_files(base, "docs")
            bf_files, bf_dirs = _count_files(base, "bands")
            print(
                f"batch {b}: total={total} {t} "
                f"state_files docs={df_files}/{df_dirs}ep bands={bf_files}/{bf_dirs}ep",
                flush=True,
            )
    finally:
        shutil.rmtree(base, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
