"""Unit/edge-case tests for operators/corpus.py (chunking, packing,
deterministic shuffle, contamination, repetition quality). The full-corpus
driver parity lives in test_queries_oracle.py; these pin the semantics on
hand-built edge cases."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from healthcare_rcm_etl_pipeline_spark.operators import corpus


def _docs(spark, texts, source="s"):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, source=source) for i, t in enumerate(texts)]
    )


class TestChunking:
    def test_short_doc_single_chunk(self, spark):
        d = _docs(spark, ["alpha beta gamma"])
        out = corpus.chunk_documents(d, chunk_tokens=8, stride=4).collect()
        assert len(out) == 1
        assert out[0].chunk_id == 0
        assert out[0].chunk_text == "alpha beta gamma"
        assert out[0].n_tokens == 3

    def test_empty_doc_one_empty_chunk(self, spark):
        d = _docs(spark, ["   "])
        out = corpus.chunk_documents(d, chunk_tokens=8, stride=4).collect()
        assert len(out) == 1 and out[0].n_tokens == 0

    def test_every_token_covered_with_overlap(self, spark):
        toks = [f"t{i}" for i in range(23)]
        d = _docs(spark, [" ".join(toks)])
        rows = corpus.chunk_documents(d, chunk_tokens=8, stride=5).collect()
        covered = set()
        for r in rows:
            covered.update(r.chunk_text.split(" "))
            assert r.n_tokens <= 8
        assert covered == set(toks)
        # consecutive chunks overlap by chunk - stride = 3 tokens
        by_id = {r.chunk_id: r.chunk_text.split(" ") for r in rows}
        assert by_id[0][-3:] == by_id[1][:3]

    def test_redundant_tail_dropped(self, spark):
        # 10 tokens, chunk 8, stride 4 -> starts 1,5,9; window@9 has 2 tokens
        # <= overlap(4), fully inside window@5 -> dropped
        d = _docs(spark, [" ".join(f"t{i}" for i in range(10))])
        rows = corpus.chunk_documents(d, chunk_tokens=8, stride=4).collect()
        assert sorted(r.chunk_id for r in rows) == [0, 1]

    def test_bad_params_raise(self, spark):
        d = _docs(spark, ["x"])
        with pytest.raises(ValueError):
            corpus.chunk_documents(d, chunk_tokens=4, stride=8)


class TestPacking:
    def test_prefix_sum_assignment(self, spark):
        # 4 docs x 3 tokens, budget 5: cum=3,6,9,12 -> starts 0,3,6,9 ->
        # shards 0,0,1,1
        d = _docs(spark, ["a b c"] * 4)
        rows = {r.doc_id: r for r in corpus.pack_token_shards(d, budget=5).collect()}
        assert [rows[i].shard_id for i in range(4)] == [0, 0, 1, 1]
        assert [rows[i].shard_pos for i in range(4)] == [1, 2, 1, 2]

    def test_partition_isolation(self, spark):
        a = _docs(spark, ["a b c"] * 2, source="sa")
        b = _docs(spark, ["x y z"] * 2, source="sb")
        rows = corpus.pack_token_shards(a.unionByName(b), budget=100).collect()
        # each source starts its own shard 0
        assert sorted((r.source, r.shard_id) for r in rows) == [
            ("sa", 0), ("sa", 0), ("sb", 0), ("sb", 0)
        ]

    def test_oversize_doc_own_shard_boundary(self, spark):
        # doc bigger than budget still lands where it starts; next doc moves on
        d = _docs(spark, [" ".join(["w"] * 10), "a b"])
        rows = {r.doc_id: r.shard_id for r in corpus.pack_token_shards(d, budget=4).collect()}
        assert rows[0] == 0 and rows[1] == 2  # starts at cum 10 -> 10//4


class TestShuffleShards:
    def test_partition_properties(self, spark):
        d = _docs(spark, ["x"] * 100)
        rows = corpus.shuffle_shards(d, n_shards=8, salt="v1").collect()
        assert len(rows) == 100
        assert {r.shard_id for r in rows} <= set(range(8))
        # positions are 1..k contiguous within each shard
        from collections import defaultdict

        by_shard = defaultdict(list)
        for r in rows:
            by_shard[r.shard_id].append(r.shard_pos)
        for poss in by_shard.values():
            assert sorted(poss) == list(range(1, len(poss) + 1))

    def test_deterministic_and_salt_sensitive(self, spark):
        d = _docs(spark, ["x"] * 50)
        a = {(r.doc_id, r.shard_id, r.shard_pos) for r in corpus.shuffle_shards(d, salt="v1").collect()}
        b = {(r.doc_id, r.shard_id, r.shard_pos) for r in corpus.shuffle_shards(d, salt="v1").collect()}
        c = {(r.doc_id, r.shard_id, r.shard_pos) for r in corpus.shuffle_shards(d, salt="v2").collect()}
        assert a == b
        assert a != c  # a different salt is a different permutation

    def test_not_identity_order(self, spark):
        # the permutation must not preserve doc_id order within a shard
        d = _docs(spark, ["x"] * 200)
        rows = corpus.shuffle_shards(d, n_shards=1, salt="v1").collect()
        order = [r.doc_id for r in sorted(rows, key=lambda r: r.shard_pos)]
        assert order != sorted(order)


class TestContamination:
    def test_exact_copy_fully_contaminated(self, spark):
        bench = _docs(spark, ["the quick brown fox jumps"])
        cor = _docs(spark, ["the quick brown fox jumps", "zeta eta theta iota kappa"])
        rows = {r.doc_id: r for r in corpus.contamination_stats(cor, bench, n=3).collect()}
        assert rows[0].contaminated and rows[0].overlap_ratio == 1.0
        assert not rows[1].contaminated and rows[1].n_hits == 0

    def test_partial_overlap_counts_distinct_grams(self, spark):
        bench = _docs(spark, ["a b c d"])  # 3-grams: "a b c", "b c d"
        cor = _docs(spark, ["a b c x y z"])  # shares only "a b c"
        r = corpus.contamination_stats(cor, bench, n=3, min_overlap=2).collect()[0]
        assert r.n_hits == 1 and not r.contaminated

    def test_too_short_doc_zero_shingles(self, spark):
        bench = _docs(spark, ["a b c d"])
        cor = _docs(spark, ["a b"])
        r = corpus.contamination_stats(cor, bench, n=3).collect()[0]
        assert r.n_shingles == 0 and r.overlap_ratio is None and not r.contaminated


class TestRepetition:
    def test_degenerate_doc_flagged(self, spark):
        r = corpus.repetition_stats(_docs(spark, ["spam " * 50])).collect()[0]
        assert r.top_ngram_frac == 1.0 and r.dup_ngram_frac == 1.0 and r.flagged

    def test_diverse_doc_not_flagged(self, spark):
        text = " ".join(f"w{i}" for i in range(40))
        r = corpus.repetition_stats(_docs(spark, [text])).collect()[0]
        assert r.top_ngram_frac == pytest.approx(1 / 39)
        assert r.dup_ngram_frac == 0.0 and not r.flagged

    def test_short_doc_zero_fracs(self, spark):
        r = corpus.repetition_stats(_docs(spark, ["one"])).collect()[0]
        assert r.top_ngram_frac == 0.0 and r.dup_ngram_frac == 0.0 and not r.flagged


def test_cooccurrence_pairs_support_and_group_cap(spark):
    """Pair mining: distinct-per-group (repeats can't inflate support),
    canonical a<b pairs, min_support filter; max_group drops a degenerate
    giant group's pairs while small groups are untouched."""
    from healthcare_rcm_etl_pipeline_spark.operators.corpus import cooccurrence_pairs
    from pyspark.sql import Row

    rows = (
        [Row(g=1, i=x) for x in ("a", "b", "c", "a")]  # repeat 'a' in g1
        + [Row(g=2, i=x) for x in ("a", "b")]
        + [Row(g=3, i=x) for x in ("a", "b")]
        + [Row(g=9, i=f"z{k}") for k in range(50)]  # degenerate group
    )
    df = spark.createDataFrame(rows)
    got = {
        (r.item_a, r.item_b): r.support
        for r in cooccurrence_pairs(df, "g", "i", min_support=2).collect()
    }
    assert got == {("a", "b"): 3}  # a-c/b-c appear once; repeats don't count
    capped = cooccurrence_pairs(df, "g", "i", min_support=1, max_group=10)
    pairs = {(r.item_a, r.item_b) for r in capped.collect()}
    assert ("z0", "z1") not in pairs and ("a", "c") in pairs
    uncapped = cooccurrence_pairs(df, "g", "i", min_support=1)
    assert uncapped.count() == len(pairs) + 50 * 49 // 2


def test_chunk_rewrite_hash_mode_equals_text_mode(spark, sf_dir):
    """key_mode='hash' (xxhash64 keeper key + recheck + fallback) must be
    EXACTLY the text-keyed rewrite on the real corpus."""
    from healthcare_rcm_etl_pipeline_spark.operators.corpus import chunk_dedup_rewrite
    from healthcare_rcm_etl_pipeline_spark.sources.readers import load_table

    d = load_table(spark, sf_dir, "documents")
    a = sorted(map(tuple, chunk_dedup_rewrite(d, key_mode="text").collect()))
    b = sorted(map(tuple, chunk_dedup_rewrite(d, key_mode="hash").collect()))
    assert a == b


def test_chunk_rewrite_hash_mode_survives_forced_collisions(spark):
    """The collision-correctness guarantee: with a DEGENERATE 1-bit hash
    (everything collides with nearly everything) the hash mode must still
    equal the text-keyed output — the recheck routes every collision
    victim through the text-keyed fallback, so no innocent text is ever
    deleted, whatever the hash quality."""
    from pyspark.sql import functions as F

    from healthcare_rcm_etl_pipeline_spark.operators.corpus import chunk_dedup_rewrite

    rows = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "alpha beta gamma completely different words"),
        (2, "delta epsilon zeta alpha beta gamma"),
        (3, "totally fresh content here nothing shared"),
        (4, ""),
        (5, "alpha beta gamma delta epsilon zeta"),  # full dup of 0
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(text_col="text", id_col="doc_id", chunk_tokens=3)
    a = sorted(map(tuple, chunk_dedup_rewrite(d, **kw, key_mode="text").collect()))
    b = sorted(
        map(
            tuple,
            chunk_dedup_rewrite(
                d, **kw, key_mode="hash",
                hash_expr=F.length("__chunk") % 2,  # 1-bit: forced collisions
            ).collect(),
        )
    )
    assert a == b


class TestRepetitionRunCounting:
    """Pins value-equivalence of sorted-run counting vs explicit gram
    counting on docs engineered so grams interleave (sortedness is
    load-bearing) and ties exist. History: r15 tried rewriting
    repetition_stats as a per-row sorted-run fold (zero shuffles) and
    REVERTED it — the interpreted fold measured 1.5x slower than the
    codegen'd exchanges (OPTIMIZATION_r15.md §6); the shipped code is the
    explode+groupBy plan, and these pins stay as the safety net for any
    future retry."""

    def test_interleaved_grams_match_explicit_counts(self, spark):
        # 2-gram stream: "a b" x3, "b a" x2, "b c" x1 interleaved
        text = "a b a b a b c"
        # 2-grams: [a b, b a, a b, b a, a b, b c] -> top "a b" 3/6;
        # dup-positions for 3-grams: [a b a, b a b, a b a, b a b, a b c]
        # -> "a b a" x2 + "b a b" x2 = 4 of 5
        r = corpus.repetition_stats(
            _docs(spark, [text]), top_n=2, dup_n=3
        ).collect()[0]
        assert r.n_tokens == 7
        assert r.top_ngram_frac == pytest.approx(3 / 6)
        assert r.dup_ngram_frac == pytest.approx(4 / 5)

    def test_no_flag_below_window_and_empty(self, spark):
        rows = {
            r.doc_id: r
            for r in corpus.repetition_stats(
                _docs(spark, ["a b", "   "]), top_n=2, dup_n=3
            ).collect()
        }
        # doc 0: one 2-gram ("a b") -> top 1/1; no 3-gram -> dup 0.0
        assert rows[0].top_ngram_frac == 1.0 and rows[0].dup_ngram_frac == 0.0
        # doc 1: zero tokens -> zero fractions, never null
        assert rows[1].n_tokens == 0
        assert rows[1].top_ngram_frac == 0.0 and rows[1].dup_ngram_frac == 0.0
        assert not rows[1].flagged


def test_cooccurrence_pairs_null_group_and_item_excluded(spark):
    """r16: the collect_set rewrite must keep the join formulation's NULL
    semantics — a NULL group key never groups rows together (NULL == NULL
    was not a join match) and a NULL item never forms a pair (NULL < x was
    not true)."""
    from healthcare_rcm_etl_pipeline_spark.operators.corpus import cooccurrence_pairs

    rows = [(None, 1), (None, 2), (1, None), (1, 3), (1, 4), (2, 3), (2, 4)]
    df = spark.createDataFrame(rows, "g int, i int")
    out = {
        (r["item_a"], r["item_b"]): r["support"]
        for r in cooccurrence_pairs(df, "g", "i", min_support=1).collect()
    }
    assert out == {(3, 4): 2}
