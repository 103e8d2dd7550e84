"""10x scaling probe for the heavy corpus operators.

Builds an sf1-equivalent corpus (10x the sf0.1 documents/embeddings) by
replicating sf0.1 with per-replica structural isolation, then times
minhash-LSH dedup, semantic dedup, and IVF ANN at both scales and prints
the wall-clock ratio. Near-linear ratios (~10x for 10x data) are the pass
condition recorded in SCALE.md.

Replication is NOT naive duplication — that would create 10 exact copies
of every doc and grow near-dup PAIRS quadratically, which is a worst-case
stress test, not a scaling measurement. Instead each replica is made
structurally identical to sf0.1 but disjoint from the others:

- documents: every token is prefixed with the replica tag (one
  regexp_replace), so within-replica shingle similarity is preserved
  exactly while cross-replica similarity is zero — total near-dup pairs
  scale linearly with replicas.
- embeddings: each replica's vectors are circularly rotated by the replica
  index. Rotation preserves norms and within-replica cosines; for the
  synthetic near-orthogonal vectors, cross-replica cosines stay ~0.

ANN probes a FIXED query set (the base replica's every-40th vector) at both
scales, so its cost model is corpus-linear by construction.

Usage: python scripts/bench_scale.py [replicas]   (default 10)
Writes nothing outside /tmp; prints one JSON line.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from healthcare_rcm_etl_pipeline_spark.operators import dedup, graph, similarity
from healthcare_rcm_etl_pipeline_spark.session import get_spark
from healthcare_rcm_etl_pipeline_spark.streaming.ingest import (
    make_dedup_ingest_batch_fn,
)

SF01 = "/root/testdata/sf0.1"


def scaled_documents(spark, replicas: int):
    base = spark.read.parquet(f"{SF01}/documents.parquet")
    parts = [
        base.select(
            (F.col("doc_id") + r * 10_000_000).alias("doc_id"),
            F.regexp_replace("text", r"(^|\s)", f"$1r{r}x").alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        for r in range(replicas)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def scaled_embeddings(spark, replicas: int, dim: int = 64):
    base = spark.read.parquet(f"{SF01}/embeddings.parquet")
    parts = []
    for r in range(replicas):
        e = F.col("embedding")
        rot = e if r == 0 else F.concat(F.slice(e, r + 1, dim - r), F.slice(e, 1, r))
        parts.append(
            base.select(
                (F.col("vec_id") + r * 10_000_000).alias("vec_id"),
                rot.alias("embedding"),
                "label",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def timed(fn, iters: int = 2) -> float:
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark(app_name="hrcm-bench-scale")

    # materialize both corpora to parquet so timed runs measure the
    # operators, not the replication expressions
    tmp = tempfile.mkdtemp(prefix="hrcm_scale_")
    paths = {}
    for name, df in [
        ("docs1", spark.read.parquet(f"{SF01}/documents.parquet")),
        ("docs10", scaled_documents(spark, replicas)),
        ("emb1", spark.read.parquet(f"{SF01}/embeddings.parquet")),
        ("emb10", scaled_embeddings(spark, replicas)),
    ]:
        p = f"{tmp}/{name}.parquet"
        df.repartition(32).write.parquet(p)
        paths[name] = p
    docs1 = spark.read.parquet(paths["docs1"])
    docs10 = spark.read.parquet(paths["docs10"])
    emb1 = spark.read.parquet(paths["emb1"])
    emb10 = spark.read.parquet(paths["emb10"])
    queries = emb1.filter(F.col("vec_id") % 40 == 0)  # FIXED across scales

    results = {}

    def run(op, small, big):
        small()  # warm codegen/JIT on the small corpus
        t1, t10 = timed(small), timed(big)
        results[op] = {
            "sf0.1_sec": t1,
            f"sf1({replicas}x)_sec": t10,
            "ratio": round(t10 / t1, 2) if t1 > 0 else None,
        }
        print(f"  {op}: {t1}s -> {t10}s (x{results[op]['ratio']})", file=sys.stderr)

    run(
        "dedup_minhash_lsh",
        lambda: dedup.minhash_lsh_pairs(docs1, "text", "doc_id").count(),
        lambda: dedup.minhash_lsh_pairs(docs10, "text", "doc_id").count(),
    )
    run(
        "semantic_dedup",
        lambda: dedup.semantic_dedup(emb1, "embedding", "vec_id", threshold=0.35).count(),
        lambda: dedup.semantic_dedup(emb10, "embedding", "vec_id", threshold=0.35).count(),
    )
    cents1 = similarity.ivf_fit(emb1, n_cells=16, iters=1)
    cents10 = similarity.ivf_fit(emb10, n_cells=16, iters=1)
    run(
        "ann_topk_ivf",
        lambda: similarity.ivf_topk(emb1, queries, cents1, k=5, n_probe=4).count(),
        lambda: similarity.ivf_topk(emb10, queries, cents10, k=5, n_probe=4).count(),
    )
    books1 = similarity.pq_fit(emb1, m=16, k_cb=16, iters=2)
    books10 = similarity.pq_fit(emb10, m=16, k_cb=16, iters=2)
    # noop-write, NOT count(): pq_encode is one output row per input row,
    # so count() lets Catalyst prune the code computation entirely — the
    # noop sink forces every code array to be built (bench.py r10 lesson)
    run(
        "pq_encode",
        lambda: similarity.pq_encode(emb1, books1)
        .write.format("noop")
        .mode("overwrite")
        .save(),
        lambda: similarity.pq_encode(emb10, books10)
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )
    # probe the MATERIALIZED code relation (the persisted-index usage);
    # fixed query set, so probe cost is corpus-linear by construction
    similarity.pq_encode(emb1, books1).write.parquet(f"{tmp}/codes1.parquet")
    similarity.pq_encode(emb10, books10).write.parquet(f"{tmp}/codes10.parquet")
    codes1 = spark.read.parquet(f"{tmp}/codes1.parquet")
    codes10 = spark.read.parquet(f"{tmp}/codes10.parquet")
    run(
        "ann_topk_pq",
        lambda: similarity.pq_topk(
            codes1, queries, books1, k=5, rerank=25, corpus=emb1
        ).count(),
        lambda: similarity.pq_topk(
            codes10, queries, books10, k=5, rerank=25, corpus=emb10
        ).count(),
    )
    run(
        "dedup_ngram_jaccard",
        lambda: dedup.ngram_jaccard_pairs(
            docs1, "text", "doc_id", n=3, threshold=0.5, max_df=20
        ).count(),
        lambda: dedup.ngram_jaccard_pairs(
            docs10, "text", "doc_id", n=3, threshold=0.5, max_df=20
        ).count(),
    )

    def survivors(d):
        pairs = dedup.ngram_jaccard_pairs(
            d, "text", "doc_id", n=3, threshold=0.5, max_df=20
        )
        clusters = graph.connected_components(pairs)
        losers = clusters.filter(F.col("doc") != F.col("component")).select(
            F.col("doc").alias("doc_id")
        )
        return d.select("doc_id").join(losers, "doc_id", "left_anti").count()

    run(
        "dedup_keep_survivors",
        lambda: survivors(docs1),
        lambda: survivors(docs10),
    )
    from healthcare_rcm_etl_pipeline_spark.operators import corpus

    run(
        "dedup_exact_substring",
        lambda: dedup.exact_substring_pairs(docs1, "text", "doc_id", window=20).count(),
        lambda: dedup.exact_substring_pairs(docs10, "text", "doc_id", window=20).count(),
    )
    run(
        "chunk_dedup_rate",
        lambda: corpus.chunk_dedup_stats(docs1, "text", "doc_id", 15).count(),
        lambda: corpus.chunk_dedup_stats(docs10, "text", "doc_id", 15).count(),
    )
    run(
        "corpus_bigram_lm",
        lambda: corpus.bigram_lm_scores(docs1, "text", "doc_id").count(),
        lambda: corpus.bigram_lm_scores(docs10, "text", "doc_id").count(),
    )

    # kmeans (r7): per-round cost must track DATA (assignment scan +
    # k·dim partial-agg rows), never k·n² — the broadcast-centroid loop
    # has no term that grows faster than the corpus
    from healthcare_rcm_etl_pipeline_spark.operators.clustering import kmeans_lloyd

    run(
        "kmeans_lloyd",
        lambda: kmeans_lloyd(emb1, "embedding", "vec_id", k=8, iters=2, ndp=6).count(),
        lambda: kmeans_lloyd(emb10, "embedding", "vec_id", k=8, iters=2, ndp=6).count(),
    )

    # bfs_hops (r7): frontier BFS over the near-dup pair graph — cost must
    # track the REACHED neighborhood (frontier⋈edges per round), and the
    # replica-isolated 10x graph reaches ~10x the nodes from 10x the seeds
    def bfs_reach(d):
        edges = dedup.ngram_jaccard_pairs(
            d, "text", "doc_id", n=3, threshold=0.5, max_df=20
        ).select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        seeds = (
            d.select(F.col("doc_id").alias("node"))
            .filter(F.col("node") % 100 == 0)
            .distinct()
        )
        return graph.bfs_hops(edges, seeds, max_hops=3).count()

    run(
        "bfs_hops",
        lambda: bfs_reach(docs1),
        lambda: bfs_reach(docs10),
    )

    # CC round count must be scale-invariant (pointer jumping: O(log
    # diameter), and replica isolation keeps per-replica diameter fixed)
    results["cc_rounds"] = {
        "sf0.1": graph.cc_rounds(
            dedup.ngram_jaccard_pairs(docs1, "text", "doc_id", n=3, threshold=0.5, max_df=20)
        ),
        f"sf1({replicas}x)": graph.cc_rounds(
            dedup.ngram_jaccard_pairs(docs10, "text", "doc_id", n=3, threshold=0.5, max_df=20)
        ),
    }
    print(f"  cc_rounds: {results['cc_rounds']}", file=sys.stderr)

    # streaming ingest: per-batch latency at both scales — the batch is the
    # unit of work, so per-batch cost should scale with BATCH size (10x
    # docs -> ~10x batch) while staying flat across batches at a fixed size
    def ingest_batches(d, tag):
        base_dir = f"{tmp}/ingest_{tag}"
        fn = make_dedup_ingest_batch_fn(base_dir)
        per = []
        for b in range(3):
            batch = d.filter((F.col("doc_id") % 3) == b).select("doc_id", "text")
            t0 = time.perf_counter()
            fn(batch, b)
            per.append(round(time.perf_counter() - t0, 3))
        return per

    p1 = ingest_batches(docs1, "1x")
    p10 = ingest_batches(docs10, f"{replicas}x")
    # flatness compares LAST vs SECOND batch: the first batch is
    # structurally cheaper (empty base corpus -> no cross-corpus probe), so
    # steady-state index-growth cost shows from batch 2 onward
    results["streaming_ingest"] = {
        "sf0.1_per_batch": p1,
        f"sf1({replicas}x)_per_batch": p10,
        "batch_ratio": round(
            (sum(p10) / len(p10)) / (sum(p1) / len(p1)), 2
        ),
        "flat_1x": round(p1[-1] / p1[1], 2) if p1[1] else None,
        f"flat_{replicas}x": round(p10[-1] / p10[1], 2) if p10[1] else None,
    }
    print(f"  streaming_ingest: {results['streaming_ingest']}", file=sys.stderr)

    print(json.dumps({"replicas": replicas, "results": results}))
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
