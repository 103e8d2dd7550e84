"""Round-10 scale probes: the empirical claims SCALE.md still owed.

1. chunk_rewrite — `chunk_dedup_rewrite` text-keyed vs hash-keyed keeper
   aggregation at 10x and 100x of sf0.1 (50k / 500k docs): wall time AND
   shuffle-write bytes per run (the whole point of `key_mode="hash"` is
   that the wide chunk-text column stays out of the combinable keeper
   agg's shuffle; this measures how many bytes that actually saves and
   what the recheck join costs).
2. triangles — `triangle_counts` on a synthetic skewed graph (one
   celebrity node whose NAIVE open-wedge count is quadratic) at 1x and
   10x edges. The degree-ordered orientation's O(m^1.5) wedge bound is
   the one major scale claim in the repo with no empirical row; this
   records the measured wall-clock and shuffle growth.
3. bpe_vocab — `bpe_train` per-merge cost at ~5k vs ~50k distinct words
   (Zipf-ish log-uniform word draw, SAME total token count) — replacing
   SCALE.md's Heaps-law argument for "per-merge cost is O(vocab), not
   O(corpus)" with data at a realistic vocabulary size.
4. chunk_ingest — per-batch cost slope of the chunk-dedup-rewriting
   streaming ingestion as the keeper state accumulates (must be ~flat).

Shuffle bytes come from the JVM AppStatusStore's cumulative per-executor
totals (never evicted), delta'd around one run of each measured op.

Usage: python scripts/probe_scale_r10.py [probe ...]
  probe in {chunk_rewrite, triangles, bpe_vocab, chunk_ingest};
  default: all. Prints one JSON line per probe plus a trailing summary
  line; results are transcribed into SCALE.md's round-10 section. Writes
  nothing outside /tmp.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from healthcare_rcm_etl_pipeline_spark.operators import graph
from healthcare_rcm_etl_pipeline_spark.operators.corpus import (
    bpe_initial_words,
    bpe_train,
    chunk_dedup_rewrite,
)
from healthcare_rcm_etl_pipeline_spark.session import get_spark
from scripts.bench_scale import scaled_documents

SF01 = "/root/testdata/sf0.1"


def shuffle_write_bytes(spark) -> int:
    """Cumulative shuffle-write bytes across all executors of this app,
    from the AppStatusStore's executor summaries. Executor totals are
    monotone counters that never get evicted — unlike per-stage rows,
    which spark.ui.retainedStages caps (a stage-list delta silently
    UNDERCOUNTS once old stages age out mid-probe; observed on the first
    run of this script)."""
    store = spark.sparkContext._jsc.sc().statusStore()
    total = 0
    it = store.executorList(False).iterator()
    while it.hasNext():
        total += it.next().totalShuffleWrite()
    return total


def run_measured(spark, fn, iters: int = 2) -> dict:
    """Best wall time over `iters` runs + shuffle bytes of ONE run."""
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    s0 = shuffle_write_bytes(spark)
    fn()
    return {
        "sec": round(best, 3),
        "shuffle_mb": round((shuffle_write_bytes(spark) - s0) / 1e6, 2),
    }


def probe_chunk_rewrite(spark) -> dict:
    """Scales are 10x and 100x of sf0.1 (50k / 500k docs): at raw sf0.1
    (5k docs, ~1.5 MB text) fixed job costs dominate and the two scales
    time identically — the 10-vs-100 pair is the smallest spread where
    the data term is visible on local[32]."""
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="hrcm_r10_chunks_")
    try:
        out = {}
        frames = {}
        for scale, replicas in [("10x", 10), ("100x", 100)]:
            p = f"{tmp}/docs_{scale}"
            scaled_documents(spark, replicas).repartition(32).write.parquet(p)
            frames[scale] = spark.read.parquet(p)
        def materialize(d, mode):
            # NOT .count(): the rewrite ends in a unique-keyed left join,
            # so count() lets Catalyst prune the entire dedup pipeline
            # (measured: per-stage shuffle showed ~0 bytes downstream of
            # the scan). The checksum forces every clean_text to be built.
            chunk_dedup_rewrite(d, key_mode=mode).agg(
                F.sum(F.length("clean_text")), F.sum("n_kept")
            ).collect()

        for scale in ["10x", "100x"]:
            d = frames[scale]
            for mode in ["text", "hash"]:
                out[f"{scale}_{mode}"] = run_measured(
                    spark, lambda: materialize(d, mode)
                )
        for scale in ["10x", "100x"]:
            t, h = out[f"{scale}_text"], out[f"{scale}_hash"]
            out[f"{scale}_hash_vs_text_shuffle"] = (
                round(h["shuffle_mb"] / t["shuffle_mb"], 3) if t["shuffle_mb"] else None
            )
        out["text_ratio_10x"] = round(
            out["100x_text"]["sec"] / out["10x_text"]["sec"], 2
        )
        out["hash_ratio_10x"] = round(
            out["100x_hash"]["sec"] / out["10x_hash"]["sec"], 2
        )
        return out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def skewed_edges(spark, n_edges: int, n_nodes: int, celeb_deg: int):
    """Deterministic random graph + one celebrity node (id = n_nodes)
    adjacent to the first `celeb_deg` node ids. The celebrity's naive
    open-wedge count is celeb_deg^2/2 — the quadratic blowup the
    degree-ordered orientation must avoid."""
    rand = spark.range(n_edges).select(
        F.pmod(F.xxhash64("id", F.lit("s")), F.lit(n_nodes)).alias("src"),
        F.pmod(F.xxhash64("id", F.lit("d")), F.lit(n_nodes)).alias("dst"),
    )
    celeb = spark.range(celeb_deg).select(
        F.lit(n_nodes).cast("bigint").alias("src"), F.col("id").alias("dst")
    )
    return rand.unionByName(celeb)


def probe_triangles(spark) -> dict:
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="hrcm_r10_tri_")
    try:
        specs = {
            "1x": (200_000, 50_000, 20_000),
            "10x": (2_000_000, 500_000, 200_000),
        }
        out = {}
        for scale, (m, v, c) in specs.items():
            p = f"{tmp}/{scale}"
            skewed_edges(spark, m, v, c).repartition(32).write.parquet(p)
            e = spark.read.parquet(p)
            out[scale] = run_measured(
                spark,
                lambda: graph.triangle_counts(e).agg(F.sum("n_triangles")).collect(),
            )
            out[scale]["edges"] = m
            out[scale]["celebrity_degree"] = c
        out["ratio_10x"] = round(out["10x"]["sec"] / out["1x"]["sec"], 2)
        out["m^1.5_bound"] = round(10**1.5, 1)
        return out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def zipf_corpus(spark, n_tokens: int, vocab: int, words_per_doc: int = 100):
    """~`vocab` distinct words drawn log-uniform (Zipf-ish: rank-r word
    frequency ~ 1/r), packed into documents of `words_per_doc` words.
    Deterministic (xxhash64-seeded)."""
    u = (F.pmod(F.xxhash64("id", F.lit("z")), F.lit(1_000_000)) + 0.5) / 1_000_000.0
    wid = F.floor(F.exp(u * F.log(F.lit(float(vocab))))).cast("bigint")
    toks = spark.range(n_tokens).select(
        (F.col("id") / words_per_doc).cast("bigint").alias("doc"),
        F.concat(F.lit("w"), wid.cast("string")).alias("w"),
    )
    return toks.groupBy("doc").agg(F.array_join(F.collect_list("w"), " ").alias("text"))


def probe_bpe_vocab(spark) -> dict:
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="hrcm_r10_bpe_")
    try:
        n_tokens, n_merges = 2_000_000, 8
        out = {"n_tokens": n_tokens, "n_merges": n_merges}
        for tag, vocab in [("5k", 5_000), ("50k", 50_000)]:
            p = f"{tmp}/{tag}"
            zipf_corpus(spark, n_tokens, vocab).repartition(32).write.parquet(p)
            d = spark.read.parquet(p)
            distinct = d.select(F.explode(F.split("text", " ")).alias("w")).select(
                "w"
            ).distinct().count()
            t0 = time.perf_counter()
            bpe_initial_words(d, "text").count()
            t_init = time.perf_counter() - t0
            t0 = time.perf_counter()
            merges, _ = bpe_train(d, "text", n_merges=n_merges, require_full=True)
            assert merges.count() == n_merges
            t_total = time.perf_counter() - t0
            out[tag] = {
                "distinct_words": distinct,
                "init_sec": round(t_init, 3),
                "per_merge_sec": round((t_total - t_init) / n_merges, 3),
            }
        out["per_merge_ratio_at_10x_vocab"] = round(
            out["50k"]["per_merge_sec"] / out["5k"]["per_merge_sec"], 2
        )
        return out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def probe_chunk_ingest(spark, n_batches: int = 8) -> dict:
    """Per-batch wall time of the chunk-dedup-rewriting ingestion
    (streaming/ingest.py:make_chunk_ingest_batch_fn) as the keeper-chunk
    state accumulates: sf0.1 documents split into ``n_batches`` ascending
    micro-batches. The pass condition is the SLOPE, not the level — each
    batch pays one anti-join probe against the accumulated state plus
    batch-local work, so per-batch cost must stay flat while the state
    grows (the same contract the LSH ingest bench enforces)."""
    import shutil
    import tempfile

    from healthcare_rcm_etl_pipeline_spark.streaming.ingest import (
        make_chunk_ingest_batch_fn,
        read_chunk_state,
    )

    tmp = tempfile.mkdtemp(prefix="hrcm_r10_cingest_")
    try:
        d = spark.read.parquet(f"{SF01}/documents.parquet")
        # batch over the OBSERVED [lo, hi] id range, not [0, max]: on data
        # whose ids don't start near 0 the 0-based width collapses every
        # doc into one non-empty batch and the slope silently stops
        # exercising the accumulated-state anti-join (same offset-id trap
        # dedup_chunks_incremental_q fixed in queries.py)
        lo, hi = d.agg(F.min("doc_id"), F.max("doc_id")).collect()[0]
        width = (hi - lo + n_batches) // n_batches
        fn = make_chunk_ingest_batch_fn(f"{tmp}/base")
        per_batch, state_rows = [], []
        for b in range(n_batches):
            batch = d.filter(
                (F.col("doc_id") >= lo + b * width)
                & (F.col("doc_id") < lo + (b + 1) * width)
            )
            t0 = time.perf_counter()
            fn(batch, b)
            per_batch.append(round(time.perf_counter() - t0, 3))
            state_rows.append(read_chunk_state(spark, f"{tmp}/base").count())
        n = len(per_batch)
        xbar, ybar = (n - 1) / 2.0, sum(per_batch) / n
        slope = sum((i - xbar) * (y - ybar) for i, y in enumerate(per_batch)) / sum(
            (i - xbar) ** 2 for i in range(n)
        )
        return {
            "per_batch_sec": per_batch,
            "state_rows": state_rows,
            "slope_sec_per_batch": round(slope, 4),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


PROBES = {
    "chunk_rewrite": probe_chunk_rewrite,
    "triangles": probe_triangles,
    "bpe_vocab": probe_bpe_vocab,
    "chunk_ingest": probe_chunk_ingest,
}


def main() -> None:
    names = sys.argv[1:] or list(PROBES)
    unknown = [n for n in names if n not in PROBES]
    if unknown:
        print(f"unknown probe(s) {unknown}; choose from {list(PROBES)}", file=sys.stderr)
        raise SystemExit(2)
    spark = get_spark(app_name="hrcm-probe-r10")
    results = {}
    for n in names:
        results[n] = PROBES[n](spark)
        print(json.dumps({n: results[n]}), flush=True)
    print(json.dumps({"probe_scale_r10": results}))


if __name__ == "__main__":
    main()
