"""Product-quantization ANN (operators/similarity.py PQ family).

Contracts pinned here:
- degenerate exactness: with k_cb >= corpus size and no Lloyd steps, every
  subvector is its own centroid, so ADC distance IS the exact squared L2 —
  on unit-norm vectors the top-k must equal the cosine brute force.
- real-compression recall: m=32 x k_cb=16 codes (64-d float32 -> 16
  logical bytes, 16x) must keep the measured recall floor vs exact, and
  exact re-ranking of a top-50 ADC shortlist must raise it.
- determinism: two fits on the same corpus give identical codebooks.
- plan shape: encoding is shuffle-free; the ADC probe broadcasts the
  query/LUT side (the corpus side only ever scans codes).
- IVF×PQ composition: all-cells + exact codebook == brute force; the
  partial-probe compressed composition stays near plain IVF's recall.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from healthcare_rcm_etl_pipeline_spark.operators import similarity

EMB = "/root/testdata/sf0.001/embeddings.parquet"


def _topk_sets(rows) -> dict:
    out: dict[int, set] = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def _recall(approx: dict, exact: dict) -> float:
    hits = sum(len(approx.get(q, set()) & s) for q, s in exact.items())
    return hits / sum(len(s) for s in exact.values())


def test_pq_degenerate_codebook_is_exact(spark):
    emb = spark.read.parquet(EMB).limit(120).cache()
    n = emb.count()
    q = emb.limit(12)
    books = similarity.pq_fit(emb, m=4, k_cb=n, iters=0)
    assert len(books) == 4 and all(len(b) == n for b in books)
    codes = similarity.pq_encode(emb, books)
    exact = _topk_sets(similarity.brute_force_topk(emb, q, k=5).collect())
    adc = _topk_sets(similarity.pq_topk(codes, q, books, k=5).collect())
    assert _recall(adc, exact) == 1.0


def test_pq_compressed_recall_and_rerank(spark):
    emb = spark.read.parquet(EMB).cache()
    q = emb.limit(20)
    books = similarity.pq_fit(emb, m=32, k_cb=16, iters=2)
    codes = similarity.pq_encode(emb, books).cache()
    exact = _topk_sets(similarity.brute_force_topk(emb, q, k=10).collect())
    adc = _topk_sets(similarity.pq_topk(codes, q, books, k=10).collect())
    rr_rows = similarity.pq_topk(
        codes, q, books, k=10, rerank=50, corpus=emb
    ).collect()
    rr = _topk_sets(rr_rows)
    r_adc, r_rr = _recall(adc, exact), _recall(rr, exact)
    # Measured (deterministic) on this corpus: ADC 0.555, top-50 rerank
    # 0.960 at 128-bit codes (16x compression of 64-d float32). The
    # near-uniform unit-sphere synthetic corpus is PQ's WORST case (rank-10
    # margins are tiny, quantization cells are isotropic); the measured
    # config sweep in the module docstring shows recall rising
    # monotonically with code budget (32-bit: 0.21 -> 128-bit: 0.56 raw).
    # Floors pinned just under the measured values.
    assert r_adc >= 0.45, r_adc
    assert r_rr >= r_adc, (r_rr, r_adc)
    assert r_rr >= 0.90, r_rr
    # reranked scores are EXACT cosines: spot-check against brute force
    bf = {
        (r["query_id"], r["neighbor_id"]): r["cos"]
        for r in similarity.brute_force_topk(emb, q, k=10).collect()
    }
    overlap = [r for r in rr_rows if (r["query_id"], r["neighbor_id"]) in bf]
    assert overlap and all(
        abs(r["cos"] - bf[(r["query_id"], r["neighbor_id"])]) < 1e-9 for r in overlap
    )


def test_pq_fit_deterministic(spark):
    emb = spark.read.parquet(EMB).limit(200)
    a = similarity.pq_fit(emb, m=4, k_cb=8, iters=1)
    b = similarity.pq_fit(emb, m=4, k_cb=8, iters=1)
    assert a == b


def test_pq_encode_shuffle_free_and_probe_broadcasts(spark):
    emb = spark.read.parquet(EMB).limit(100)
    books = similarity.pq_fit(emb, m=4, k_cb=8, iters=1)
    enc_plan = similarity.pq_encode(emb, books)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in enc_plan
    q = emb.limit(5)
    codes = similarity.pq_encode(emb, books)
    probe_plan = (
        similarity.pq_topk(codes, q, books, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in probe_plan or "BroadcastExchange" in probe_plan


def test_pq_seed_prefilter_matches_full_sort(spark):
    """The hash-threshold seed prefilter must select EXACTLY the same rows
    as the corpus-wide sort it replaced (r10 audit flag: the old
    row_number-over-partitionBy(j) window sorted the full corpus inside
    each of m partitions). The k_cb smallest hashes are each below any
    threshold that keeps >= k_cb rows, so a sufficient prefilter is
    selection-invariant — pinned here by comparing against frac=1.0 (the
    old full-window behavior) on the same exploded frame."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(EMB)
    n = emb.count()
    m, k_cb, sub_dim = 4, 8, 16
    exploded = emb.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        F.slice(F.col("embedding"), j * sub_dim + 1, sub_dim).alias("s"),
                        F.xxhash64(F.col("vec_id").cast("string"), F.lit(42 + 31 * j)).alias("h"),
                    )
                    for j in range(m)
                ]
            )
        ).alias("e")
    ).select("e.*")
    frac = min(1.0, similarity._SEED_OVERSAMPLE * k_cb / n)
    assert frac < 1.0  # the prefilter is actually exercised on this corpus
    fast = similarity._pq_seed_frame(exploded, k_cb, n, frac).collect()
    full = similarity._pq_seed_frame(exploded, k_cb, n, 1.0).collect()
    keyf = lambda r: (r["j"], r["rn"], tuple(r["s"]))
    assert sorted(map(keyf, fast)) == sorted(map(keyf, full))


def test_pq_seed_plan_filters_before_window(spark):
    """Plan guard for the fit path: the seed-selection window must consume
    the hash-threshold Filter, not the corpus — i.e. no corpus-sized
    single-partition sort anywhere in the fit plan. (The registry-wide
    no-unpartitioned-window sweep in test_plans.py can't catch this shape:
    the window IS partitioned, just by a key with cardinality m.) The
    guard is structural — a Filter on h sits BELOW the Window in the
    optimized plan — plus a live check that the window's input is
    O(oversample × k_cb × m), independent of corpus size."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(EMB)
    n = emb.count()
    m, k_cb = 4, 8
    exploded = emb.select(
        F.lit(0).alias("j"),
        F.col("embedding").alias("s"),
        F.xxhash64(F.col("vec_id").cast("string")).alias("h"),
    )
    frac = min(1.0, similarity._SEED_OVERSAMPLE * k_cb / n)
    plan = (
        similarity._pq_seed_frame(exploded, k_cb, n, frac)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    win_at = plan.find("Window")
    filt_at = plan.find("h#", win_at)
    assert win_at >= 0 and filt_at > win_at, plan
    assert "Filter" in plan[win_at:], plan
    # survivor bound: expected oversample × k_cb per subspace; assert a
    # generous 8× ceiling so the test pins "bounded", not the exact draw
    survivors = exploded.filter(
        F.col("h") < F.lit(int(frac * 2**64) - 2**63)
    ).count()
    assert survivors <= 8 * similarity._SEED_OVERSAMPLE * k_cb


def test_pq_seed_escalation_matches(spark, monkeypatch):
    """The undershoot escalation path: with a pathologically small
    oversample factor the prefilter keeps too few rows and pq_fit must
    widen the threshold until every subspace has its k_cb seeds — and the
    selection it converges to is the SAME k_cb-smallest-hash set the
    normal path picks (the assertion holds whichever branch runs: the
    selection rule is threshold-invariant once enough rows survive)."""
    emb = spark.read.parquet(EMB).limit(200)
    normal = similarity.pq_fit(emb, m=4, k_cb=8, iters=0)
    monkeypatch.setattr(similarity, "_SEED_OVERSAMPLE", 0.05)
    escalated = similarity.pq_fit(emb, m=4, k_cb=8, iters=0)
    assert escalated == normal


def test_pq_small_corpus_pads_codebook(spark):
    emb = spark.read.parquet(EMB).limit(5)
    books = similarity.pq_fit(emb, m=4, k_cb=16, iters=1)
    assert all(len(b) == 16 for b in books)
    codes = similarity.pq_encode(emb, books).collect()
    assert all(0 <= c < 16 for r in codes for c in r["codes"])


def test_ivf_pq_composition(spark):
    """IVF×PQ: with ALL cells probed and a degenerate (exact) codebook the
    composition must equal brute force (both approximation factors at
    recall 1); with partial probe + compressed codes, recall must be at
    least cell-recall × ADC-recall would predict — pinned loosely as
    "finds most of what plain partial-probe IVF finds"."""
    emb = spark.read.parquet(EMB).limit(200).cache()
    n = emb.count()
    q = emb.limit(10)
    cents = similarity.ivf_fit(emb, n_cells=8, iters=1)
    index = similarity.ivf_index(emb, cents).cache()
    exact = _topk_sets(similarity.brute_force_topk(emb, q, k=5).collect())

    books_exact = similarity.pq_fit(emb, m=4, k_cb=n, iters=0)
    codes_exact = similarity.pq_encode(emb, books_exact)
    full = _topk_sets(
        similarity.ivf_pq_topk(
            index, codes_exact, q, cents, books_exact, k=5, n_probe=8
        ).collect()
    )
    assert _recall(full, exact) == 1.0

    books = similarity.pq_fit(emb, m=32, k_cb=16, iters=2)
    codes = similarity.pq_encode(emb, books)
    ivf_only = _topk_sets(
        similarity.ivf_topk_indexed(index, q, cents, k=5, n_probe=4).collect()
    )
    ivfpq = _topk_sets(
        similarity.ivf_pq_topk(
            index, codes, q, cents, books, k=5, n_probe=4, rerank=25, corpus=emb
        ).collect()
    )
    r_ivf, r_ivfpq = _recall(ivf_only, exact), _recall(ivfpq, exact)
    # measured: IVF-only 0.86, IVF×PQ(rerank 25) 0.84 on this corpus — the
    # reranked composition must stay within a small factor of its own
    # candidate generator's recall (ADC ordering loses little once the
    # exact rerank sees 5x candidates)
    assert r_ivfpq >= r_ivf - 0.15, (r_ivfpq, r_ivf)


def test_registered_rerank_margin_self_defending(spark):
    """Round-11 VERDICT #4: the ann_topk_pq / ann_topk_ivf_pq oracle
    registrations rest on rerank monotonicity with a measured exact-match
    minimum <= 100 and a registered budget of 200 (2x headroom). Growth or
    densification of /root/testdata could silently erode that margin while
    the sweep stays green at 200 — so this guard re-measures the margin on
    the CURRENT testdata at the registered config (m=32, k_cb=16, iters=1,
    queries vec_id % 40 == 0, k=5): at HALF the registered budget the
    reranked output must already equal the exact brute force, value for
    value. If this reds, re-measure the minimum and raise the registered
    rerank (and this bound) before trusting the sweep."""
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
        q = emb.filter(F.col("vec_id") % 40 == 0)
        books = similarity.pq_fit(emb, m=32, k_cb=16, iters=1)
        codes = similarity.pq_encode(emb, books)
        half = sorted(
            map(tuple, similarity.pq_topk(
                codes, q, books, k=5, rerank=100, corpus=emb
            ).collect())
        )
        exact = sorted(
            map(tuple, similarity.brute_force_topk(emb, q, k=5).collect())
        )
        assert half == exact, f"rerank=100 no longer exact at {sf_dir}"
        emb.unpersist()
