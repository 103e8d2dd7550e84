"""Profile dedup_ngram_jaccard's 10x growth, mode by mode.

Round-5 finding: the registered config (window cap mode, max_df=20) showed
the dedup family's highest 10x wall-clock ratio (2.50 vs <=2.0 for every
sibling). This script isolates WHERE the superlinear term lives:

- mode-by-mode end-to-end ratios (window / antijoin / filter), same data,
  same max_df — if one mode's ratio stands out, the cap mechanism is the
  term; if all modes grow alike, the shared posting/pair machinery is.
- stage breakdown at both scales for the window mode: shingle postings
  alone, postings + hashed window cap, full pairs — the first stage whose
  ratio jumps is the growth term.

Replicated corpora use bench_scale.scaled_documents (replica-prefixed
tokens -> disjoint shingles -> the TRUE pair count scales exactly
linearly), so any superlinear wall-clock is machine behavior (sort,
spill, scheduling), never a bigger answer.

Usage: python scripts/profile_ngram_scale.py [replicas]   (default 10)
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

SF01 = "/root/testdata/sf0.1"
MAX_DF = 20


def timed(fn, iters: int = 2) -> float:
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark(app_name="hrcm-ngram-profile")
    tmp = tempfile.mkdtemp(prefix="hrcm_ngram_")
    try:
        p1, p10 = f"{tmp}/docs1.parquet", f"{tmp}/docs10.parquet"
        spark.read.parquet(f"{SF01}/documents.parquet").repartition(32).write.parquet(p1)
        scaled_documents(spark, replicas).repartition(32).write.parquet(p10)
        docs1, docs10 = spark.read.parquet(p1), spark.read.parquet(p10)
        report: dict = {"replicas": replicas, "max_df": MAX_DF}

        def pairs(d, mode):
            return dedup.ngram_jaccard_pairs(
                d, "text", "doc_id", n=3, threshold=0.5, max_df=MAX_DF,
                cap_mode=mode,
            )

        # warm codegen once
        pairs(docs1, "window").count()

        modes = {}
        for mode in ("window", "antijoin", "filter"):
            t1 = timed(lambda: pairs(docs1, mode).count())
            t10 = timed(lambda: pairs(docs10, mode).count())
            modes[mode] = {
                "sf0.1_sec": t1,
                "sf1_sec": t10,
                "ratio": round(t10 / t1, 2),
            }
            print(f"  mode={mode}: {t1}s -> {t10}s (x{modes[mode]['ratio']})",
                  file=sys.stderr)
        report["modes"] = modes

        # stage breakdown, window mode
        def posting(d):
            return dedup._shingle_posting(d, "text", "doc_id", 3).withColumn(
                "__sh", F.xxhash64("shingle")
            ).drop("shingle")

        def capped(d):
            from pyspark.sql import Window

            w = Window.partitionBy("__sh")
            return (
                posting(d)
                .withColumn("__df", F.count("*").over(w))
                .filter(F.col("__df") <= MAX_DF)
                .drop("__df")
            )

        def grouped_pairs(d):
            return dedup._posting_cooccurrence(
                dedup._shingle_posting(d, "text", "doc_id", 3), MAX_DF, "window"
            )

        stages = {}
        for stage, fn in (
            ("postings", posting),
            ("postings_plus_window_cap", capped),
            ("full_pairs", grouped_pairs),
        ):
            t1 = timed(lambda: fn(docs1).count())
            t10 = timed(lambda: fn(docs10).count())
            stages[stage] = {
                "sf0.1_sec": t1,
                "sf1_sec": t10,
                "ratio": round(t10 / t1, 2),
            }
            print(f"  stage={stage}: {t1}s -> {t10}s (x{stages[stage]['ratio']})",
                  file=sys.stderr)
        report["window_mode_stages"] = stages

        # sanity: identical outputs across modes at 10x (count-level)
        counts = {m: pairs(docs10, m).count() for m in ("window", "antijoin", "filter")}
        report["pair_counts_10x"] = counts
        report["modes_agree"] = len(set(counts.values())) == 1

        print(json.dumps(report))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
