"""sf1-equivalent audit of the TOLERANCE-based oracle contracts.

Three registered queries assert probabilistic guarantees rather than
row-exact SQL parity, and those guarantees are scale-sensitive (the r4
sf0.1 audit caught divergences invisible at the driver's sf0.01):

- ``embedding_near_dup_lsh`` / ``ann_topk_lsh``: 16-table sign-sketch LSH
  claimed to reach recall 1.0 vs the exact brute-force answer.
- ``sketch_distinct_tolerance`` / ``sketch_rollup_distinct``: HLL++ /
  DataSketches-HLL estimates claimed within 5% of the exact distinct.

This script re-verifies all four at the largest corpus the sandbox holds:
a 10x structurally-isolated replica of sf0.1 (the bench_scale protocol —
rotation-isolated embeddings, shifted ids) ~= sf1. Ground truth for the
LSH contracts is computed EXACTLY in numpy on the driver (20k x 64
vectors; blocked matmul) — exactness of the yardstick is the point, the
distributed path is what's under audit. Ground truth for the HLL
contracts is exact COUNT DISTINCT in Spark.

Usage: python scripts/audit_tolerance_sf1.py [replicas]   (default 10)
Writes nothing outside /tmp; prints one JSON line (plus stderr progress).
"""

from __future__ import annotations

import json
import math
import sys

import numpy as np
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from bench_scale import scaled_documents, scaled_embeddings  # noqa: E402
from healthcare_rcm_etl_pipeline_spark.operators import dedup, fuzzy, similarity  # noqa: E402
from healthcare_rcm_etl_pipeline_spark.session import get_spark  # noqa: E402

SF01 = "/root/testdata/sf0.1"
THRESHOLD = 0.35
K = 5


def _collect_matrix(df, id_col="vec_id", vec_col="embedding"):
    rows = df.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    X = np.array([r[1] for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], X[order]


def exact_pairs(ids, X, threshold, block=2048):
    """All (id_a, id_b) with round(cos, 6) >= threshold, a < b — exact,
    blocked so the Gram matrix never fully materializes."""
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    n = len(ids)
    out = {}
    borderline = 0
    for s in range(0, n, block):
        G = Xn[s : s + block] @ Xn.T  # (block, n)
        for i in range(G.shape[0]):
            gi = s + i
            cos = np.round(G[i], 6)
            js = np.nonzero(cos >= threshold)[0]
            borderline += int(np.sum(np.abs(G[i] - threshold) < 1e-6))
            for j in js:
                if gi < j:
                    out[(int(ids[gi]), int(ids[j]))] = float(cos[j])
    return out, borderline


def exact_topk(ids, X, query_mask, k):
    """Exact top-k neighbor ID SETS per query (rank ties at the kth cos
    resolved by neighbor_id asc, matching both engine and oracle)."""
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    truth = {}
    qidx = np.nonzero(query_mask)[0]
    for qi in qidx:
        cos = np.round(Xn[qi] @ Xn.T, 6)
        cos[qi] = -np.inf  # exclude self
        order = np.lexsort((ids, -cos))[:k]
        truth[int(ids[qi])] = {int(ids[j]) for j in order}
    return truth


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark(app_name="hrcm-audit-sf1")
    report = {"replicas": replicas}

    # ---- scaled corpora --------------------------------------------------
    emb = scaled_embeddings(spark, replicas).cache()
    n_emb = emb.count()
    report["n_embeddings"] = n_emb
    ids, X = _collect_matrix(emb)

    # ---- 1. embedding_near_dup_lsh: 16-table LSH pair recall -------------
    print("exact pair ground truth ...", file=sys.stderr)
    truth_pairs, borderline = exact_pairs(ids, X, THRESHOLD)
    # n_planes=None -> adaptive bucket sizing, the scale path (the fixed
    # 4-plane driver-SF config OOMs here — that finding created this knob).
    # "sweep" as argv[2] additionally measures the recall/cost curve across
    # bucket targets — the knob's measured trade, one ground truth reused.
    if len(sys.argv) > 2 and sys.argv[2] == "sweep":
        import time

        curve = {}
        for target in (512, 256, 128):
            planes = dedup.adaptive_n_planes(n_emb, target)
            t0 = time.perf_counter()
            found = {
                (min(r[0], r[1]), max(r[0], r[1]))
                for r in dedup.embedding_near_dup_pairs(
                    emb, "embedding", "vec_id",
                    threshold=THRESHOLD, n_planes=planes, n_tables=16,
                ).select("id_a", "id_b").collect()
            }
            curve[f"target_{target}"] = {
                "n_planes": planes,
                "recall": round(
                    len(found & set(truth_pairs)) / max(1, len(truth_pairs)), 6
                ),
                "sec": round(time.perf_counter() - t0, 2),
            }
            print(f"  sweep target={target}: {curve[f'target_{target}']}", file=sys.stderr)
        report["near_dup_plane_sweep"] = curve
    report["near_dup_planes"] = dedup.adaptive_n_planes(n_emb, 256)
    got = dedup.embedding_near_dup_pairs(
        emb, "embedding", "vec_id", threshold=THRESHOLD, n_planes=None, n_tables=16
    ).select("id_a", "id_b").collect()
    got_pairs = {(min(r[0], r[1]), max(r[0], r[1])) for r in got}
    missed = set(truth_pairs) - got_pairs
    false_pos = got_pairs - set(truth_pairs)
    strong = {p for p, c in truth_pairs.items() if c >= 0.45}
    report["near_dup_lsh"] = {
        "true_pairs": len(truth_pairs),
        "found_pairs": len(got_pairs),
        "missed": len(missed),
        "false_positives": len(false_pos),
        "recall": round(1 - len(missed) / max(1, len(truth_pairs)), 6),
        "recall_cos_ge_045": round(
            1 - len(strong - got_pairs) / max(1, len(strong)), 6
        ),
        "max_missed_cos": max((truth_pairs[p] for p in missed), default=None),
        "borderline_within_1e6_of_threshold": borderline,
        "cross_replica_true_pairs": sum(
            1 for a, b in truth_pairs if a // 10_000_000 != b // 10_000_000
        ),
    }
    print(f"near_dup_lsh: {report['near_dup_lsh']}", file=sys.stderr)

    # ---- 2. ann_topk_lsh: 16-table top-5 recall --------------------------
    print("exact topk ground truth ...", file=sys.stderr)
    truth_topk = exact_topk(ids, X, ids % 40 == 0, K)
    q = emb.filter(F.col("vec_id") % 40 == 0)
    got_topk = {}
    for r in similarity.lsh_bucket_topk(
        emb, q, k=K, dim=64, n_planes=None, n_tables=16
    ).collect():
        got_topk.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(truth_topk[qid] & got_topk.get(qid, set())) for qid in truth_topk)
    total = sum(len(v) for v in truth_topk.values())
    exact_q = sum(1 for qid in truth_topk if got_topk.get(qid, set()) == truth_topk[qid])
    report["ann_topk_lsh"] = {
        "queries": len(truth_topk),
        "row_recall": round(hits / total, 6),
        "queries_exact": exact_q,
    }
    print(f"ann_topk_lsh: {report['ann_topk_lsh']}", file=sys.stderr)

    # ---- 2b. PQ ADC recall at 10x corpus, fixed code budget --------------
    # Quantization error is corpus-size-independent (codebooks cover the
    # same manifold) but rank-k MARGINS shrink as the corpus densifies —
    # this measures how much recall the fixed 64-bit budget loses at 20k
    # vectors, raw and after the standard exact top-50 rerank.
    print("pq adc at 10x ...", file=sys.stderr)

    def _recall_of(df):
        got = {}
        for r in df.collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        h = sum(len(truth_topk[qid] & got.get(qid, set())) for qid in truth_topk)
        return round(h / total, 6)

    report["pq_adc"] = {"queries": len(truth_topk), "configs": {}}
    # the two recovery levers at 10x density: more code bits (m) and a
    # longer exact-rerank shortlist (r) — measured independently
    for m_, label in [(16, "64bit"), (32, "128bit")]:
        books = similarity.pq_fit(emb, m=m_, k_cb=16, iters=2)
        codes = similarity.pq_encode(emb, books).cache()
        codes.count()
        row = {
            "raw": _recall_of(similarity.pq_topk(codes, q, books, k=K)),
            "rerank50": _recall_of(
                similarity.pq_topk(codes, q, books, k=K, rerank=50, corpus=emb)
            ),
            "rerank200": _recall_of(
                similarity.pq_topk(codes, q, books, k=K, rerank=200, corpus=emb)
            ),
        }
        report["pq_adc"]["configs"][f"m{m_}_k16_{label}"] = row
        codes.unpersist()
        print(f"pq_adc m={m_}: {row}", file=sys.stderr)
    emb.unpersist()

    # ---- 3. sketch_distinct_tolerance: HLL++ rsd=0.01 vs 5% assert -------
    cust = spark.read.parquet(f"{SF01}/customer.parquet")
    parts = [
        cust.select(
            (F.col("c_custkey") + r * 10_000_000).alias("c_custkey"), "c_mktsegment"
        )
        for r in range(replicas)
    ]
    big_cust = parts[0]
    for p in parts[1:]:
        big_cust = big_cust.unionByName(p)
    g = (
        big_cust.groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_custkey").alias("n_exact"),
            F.approx_count_distinct("c_custkey", 0.01).alias("apx"),
        )
        .collect()
    )
    errs = {r["c_mktsegment"]: abs(r["apx"] - r["n_exact"]) / r["n_exact"] for r in g}
    report["hll_distinct"] = {
        "cardinality_per_segment": int(np.mean([r["n_exact"] for r in g])),
        "max_rel_err": round(max(errs.values()), 5),
        "all_within_5pct": all(e <= 0.05 for e in errs.values()),
    }
    print(f"hll_distinct: {report['hll_distinct']}", file=sys.stderr)

    # ---- 4. sketch_rollup_distinct: daily HLL partials -> weekly ---------
    ev = spark.read.parquet(f"{SF01}/events.parquet")
    eparts = [
        ev.select((F.col("user_id") + r * 10_000_000).alias("user_id"), "ts")
        for r in range(replicas)
    ]
    big_ev = eparts[0]
    for p in eparts[1:]:
        big_ev = big_ev.unionByName(p)
    daily = big_ev.groupBy(F.date_trunc("day", "ts").cast("date").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    weekly_est = daily.groupBy(
        F.date_trunc("week", "day").cast("date").alias("week")
    ).agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
    weekly_exact = big_ev.groupBy(
        F.date_trunc("week", F.date_trunc("day", "ts").cast("date")).cast("date").alias("week")
    ).agg(F.countDistinct("user_id").alias("n_exact"))
    rows = weekly_exact.join(weekly_est, "week").collect()
    werrs = {str(r["week"]): abs(r["est"] - r["n_exact"]) / r["n_exact"] for r in rows}
    report["hll_rollup"] = {
        "weeks": len(rows),
        "mean_weekly_distinct": int(np.mean([r["n_exact"] for r in rows])),
        "max_rel_err": round(max(werrs.values()), 5),
        "all_within_5pct": all(e <= 0.05 for e in werrs.values()),
    }
    print(f"hll_rollup: {report['hll_rollup']}", file=sys.stderr)

    # ---- 5. fuzzy edit1: max_bucket / max_key_len recall at 10x ----------
    # Typo-heavy 10x key corpus: customer names x replicas with a
    # replica-digit suffix (so cross-replica twins sit at lev 1 — the
    # densest realistic regime: TPC-H names already differ by one digit
    # from their numeric neighbors) plus a planted deterministic
    # single-edit twin for every 20th key. Ground truth is the UNCAPPED
    # engine run: deletion-neighborhood blocking is COMPLETE for lev <= 1
    # by construction (property-tested over random edits, both
    # directions), so the caps are the only recall knobs — exactly what
    # this audit prices.
    print("fuzzy edit1 ground truth (uncapped) ...", file=sys.stderr)
    cust = spark.read.parquet(f"{SF01}/customer.parquet")
    keyed = [
        cust.select(
            (F.col("c_custkey") + r * 1_000_000).alias("id"),
            F.concat("c_name", F.lit(f"-{r}")).alias("key"),
        )
        for r in range(replicas)
    ]
    keys = keyed[0]
    for p in keyed[1:]:
        keys = keys.unionByName(p)
    planted_src = keys.filter(F.col("id") % 20 == 0)
    pos = (F.pmod(F.xxhash64("id"), F.length("key") - 1) + 1).cast("int")
    kind = F.pmod(F.xxhash64("id", F.lit(1)), F.lit(3))
    typo = (
        F.when(kind == 0, F.concat(  # substitute with '~' (never in names)
            F.substring("key", F.lit(1), pos - 1), F.lit("~"),
            F.substring(F.col("key"), pos + 1, F.length("key")),
        ))
        .when(kind == 1, F.concat(  # insert '~'
            F.substring("key", F.lit(1), pos), F.lit("~"),
            F.substring(F.col("key"), pos + 1, F.length("key")),
        ))
        .otherwise(F.concat(  # delete one char
            F.substring("key", F.lit(1), pos - 1),
            F.substring(F.col("key"), pos + 1, F.length("key")),
        ))
    )
    planted = planted_src.select((F.col("id") + 50_000_000).alias("id"), typo.alias("key"))
    corpus = keys.unionByName(planted).cache()
    n_keys = corpus.count()
    truth = fuzzy.edit1_pairs(corpus, "key", "id", max_bucket=None).cache()
    n_truth = truth.count()
    planted_pairs = planted_src.select(
        F.col("id").alias("id_a"), (F.col("id") + 50_000_000).alias("id_b")
    ).cache()
    n_planted = planted_pairs.count()
    fz = {"keys": n_keys, "true_pairs": n_truth, "planted_pairs": n_planted}
    for cap in (64, 16):
        got = fuzzy.edit1_pairs(corpus, "key", "id", max_bucket=cap).cache()
        n_got = got.count()
        missed = truth.select("id_a", "id_b").join(
            got.select("id_a", "id_b"), ["id_a", "id_b"], "left_anti"
        ).count()
        pl_hit = planted_pairs.join(
            got.select("id_a", "id_b"), ["id_a", "id_b"], "left_semi"
        ).count()
        fz[f"max_bucket_{cap}"] = {
            "found": n_got,
            "recall": round(1 - missed / max(1, n_truth), 6),
            "planted_recall": round(pl_hit / max(1, n_planted), 6),
        }
        got.unpersist()
    # max_key_len: base keys are 20 chars (18-char TPC-H name + "-r");
    # insert-typo twins are 21 — cap 20 excludes exactly those, pricing
    # the documented exclude-don't-fail semantics
    got = fuzzy.edit1_pairs(corpus, "key", "id", max_bucket=None, max_key_len=20)
    got = got.select("id_a", "id_b").cache()
    missed = truth.select("id_a", "id_b").join(got, ["id_a", "id_b"], "left_anti").count()
    excluded = corpus.filter(F.length("key") > 20).count()
    fz["max_key_len_20"] = {
        "keys_excluded": excluded,
        "recall": round(1 - missed / max(1, n_truth), 6),
        "planted_recall": round(
            planted_pairs.join(got, ["id_a", "id_b"], "left_semi").count()
            / max(1, n_planted),
            6,
        ),
    }
    got.unpersist()
    truth.unpersist()
    corpus.unpersist()
    planted_pairs.unpersist()
    report["fuzzy_edit1"] = fz
    print(f"fuzzy_edit1: {fz}", file=sys.stderr)

    # ---- 6. group-minhash k=256 estimate error at 10x --------------------
    # scaled_documents token-prefixes every replica, so each source's
    # shingle SET genuinely grows ~10x while G stays fixed — the estimate
    # must hold its sqrt(J(1-J)/k) error as groups scale.
    docs10 = scaled_documents(spark, replicas)
    sim = dedup.group_minhash_similarity(
        docs10, "text", "doc_id", "source", k=256, n=3, include_estimate=True
    ).collect()
    errs = [abs(r["est"] - r["jaccard"]) for r in sim]
    sigma = [
        math.sqrt(max(r["jaccard"] * (1 - r["jaccard"]), 1e-12) / 256) for r in sim
    ]
    report["group_minhash"] = {
        "group_pairs": len(sim),
        "mean_group_shingles": int(np.mean([r["n_a"] for r in sim])),
        "max_abs_err": round(max(errs), 6),
        "mean_abs_err": round(float(np.mean(errs)), 6),
        "max_err_in_sigmas": round(
            max(e / s for e, s in zip(errs, sigma)), 2
        ),
        "all_within_tol_015": all(r["est_within_tol"] for r in sim),
    }
    print(f"group_minhash: {report['group_minhash']}", file=sys.stderr)

    # ---- 7. containment recall vs max_df at 10x ---------------------------
    # The registered dedup_containment runs UNCAPPED (full oracle
    # semantics); the production twin dedup_containment_capped caps at
    # df > 50. Containment is more cap-sensitive than Jaccard (a dropped
    # stop-shingle depletes small docs' intersection mass first), so the
    # cap's recall cost is measured here against the uncapped ground truth
    # on the 10x corpus — the same protocol as the adaptive-plane sweep.
    import time as _time

    print("containment cap sweep ...", file=sys.stderr)
    docs10.cache().count()
    t0 = _time.perf_counter()
    truth_c = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.containment_pairs(
            docs10, "text", "doc_id", n=3, threshold_pct=70, max_df=None
        ).collect()
    }
    uncapped_sec = round(_time.perf_counter() - t0, 2)
    cont = {"true_pairs": len(truth_c), "uncapped_sec": uncapped_sec}
    for cap in (200, 50, 20):
        t0 = _time.perf_counter()
        got_c = {
            (r["doc_a"], r["doc_b"])
            for r in dedup.containment_pairs(
                docs10, "text", "doc_id", n=3, threshold_pct=70, max_df=cap
            ).collect()
        }
        cont[f"max_df_{cap}"] = {
            "found": len(got_c),
            "recall": round(len(got_c & truth_c) / max(1, len(truth_c)), 6),
            "false_positives": len(got_c - truth_c),
            "sec": round(_time.perf_counter() - t0, 2),
        }
        print(f"  containment cap={cap}: {cont[f'max_df_{cap}']}", file=sys.stderr)
    docs10.unpersist()
    report["containment_cap"] = cont
    print(f"containment_cap: {cont}", file=sys.stderr)

    # ---- 8. rounding-before-rank margins at 10x: bm25 + ES sampling ------
    # bm25_topk rounds scores to 6 dp and weighted_sample_es rounds its
    # ln(u)/w keys to 9 dp BEFORE ranking; cross-engine agreement needs
    # every score in the top region to sit far from its rounding boundary
    # relative to ln()/sum-order ulp noise (~1e-14 relative). Rank flips
    # at the boundary are the exact failure class the r4 audit caught, and
    # score populations DENSIFY as corpora grow — so the margin is
    # measured at 10x, alongside a full engine-vs-oracle parity run on
    # the same 10x corpus.
    import shutil as _shutil
    import tempfile as _tempfile

    import duckdb as _duckdb

    import __spark_entry__ as _entry

    print("bm25/es margin audit ...", file=sys.stderr)
    base_docs = spark.read.parquet(f"{SF01}/documents.parquet")
    # id-shifted replicas, r filler tokens appended (dlen varies per
    # replica so the 10x score population is DISTINCT, not 10 copies —
    # token-prefixed replicas would break term matching entirely)
    parts = [
        base_docs.select(
            (F.col("doc_id") + r * 10_000_000).alias("doc_id"),
            (
                F.col("text")
                if r == 0
                else F.concat(F.col("text"), F.lit(" " + " ".join(["zfill"] * r)))
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        for r in range(replicas)
    ]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    tmp = _tempfile.mkdtemp(prefix="hrcm_margin_")
    big.write.parquet(f"{tmp}/documents.parquet")

    qs, oracles = _entry.queries(), _entry.oracle_sql()
    con = _duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM parquet_scan('{tmp}/documents.parquet/*.parquet')"
    )

    def _canon(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, int):
            return repr(float(v)) if abs(v) < 1e15 else repr(v)
        return str(v)

    def _parity(name):
        sdf = qs[name](spark, tmp)
        scols = sdf.columns
        si = sorted(range(len(scols)), key=lambda i: scols[i])
        srows = sorted(
            tuple(_canon(row[i]) for i in si) for row in sdf.collect()
        )
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        di = sorted(range(len(dcols)), key=lambda i: dcols[i])
        drows = sorted(
            tuple(_canon(row[i]) for i in di) for row in res.fetchall()
        )
        return sorted(scols) == sorted(dcols) and srows == drows

    # unrounded score populations from DuckDB (same integer inputs both
    # engines consume); margin = distance to the nearest 0.5e-ndp rounding
    # boundary among the top region, in units of the score's ulp noise
    def _boundary_margin(values, ndp, top):
        v = np.sort(np.asarray(values, dtype=np.float64))[::-1][:top]
        scaled = v * 10.0**ndp
        dist = np.abs(scaled - np.floor(scaled) - 0.5) * 10.0 ** (-ndp)
        noise = np.maximum(np.abs(v), 1e-30) * 1e-14  # ln + sum-order ulp
        i = int(np.argmin(dist / noise))
        return {
            "top_region": int(len(v)),
            "min_boundary_dist": float(dist[i]),
            "noise_at_min": float(noise[i]),
            "margin_ratio": round(float(dist[i] / noise[i]), 1),
        }

    bm25_unrounded = f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')) AS token FROM documents
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dlen FROM toks GROUP BY 1),
    stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
             CAST(SUM(dlen) AS DOUBLE) / COUNT(*) AS avgdl
      FROM dl
    ),
    tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM toks
      WHERE token IN ('join', 'vector', 'stream') GROUP BY 1, 2
    ),
    idf AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY 1)
    SELECT tf.doc_id,
           SUM(
             ln(1 + (s.n_docs - idf.df + 0.5) / (idf.df + 0.5))
             * tf.tf * 2.2
             / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dlen / s.avgdl))
           ) AS score
    FROM tf JOIN idf USING (token) JOIN dl USING (doc_id) CROSS JOIN stats s
    GROUP BY tf.doc_id
    """
    bm25_scores = [r[1] for r in con.execute(bm25_unrounded).fetchall()]
    es_unrounded = """
    SELECT ln((('0x' || substr(md5('es-v1:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT + 1)
              / 1152921504606846976.0) / n_chars AS es_key
    FROM documents
    """
    es_keys = [r[0] for r in con.execute(es_unrounded).fetchall()]
    report["rounding_margins_10x"] = {
        "n_docs": len(es_keys),
        "bm25_topk": {
            "oracle_parity": _parity("bm25_topk"),
            "scored_docs": len(bm25_scores),
            **_boundary_margin(bm25_scores, 6, 100),
        },
        "weighted_sample_es": {
            "oracle_parity": _parity("weighted_sample_es"),
            **_boundary_margin(es_keys, 9, 100),
        },
    }
    print(f"rounding_margins_10x: {report['rounding_margins_10x']}", file=sys.stderr)
    _shutil.rmtree(tmp, ignore_errors=True)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
