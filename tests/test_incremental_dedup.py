"""Incremental dedup (batch vs existing corpus) + expectations report —
hand-built edge cases; full-corpus driver parity in test_queries_oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from healthcare_rcm_etl_pipeline_spark.operators import dedup
from healthcare_rcm_etl_pipeline_spark.operators.quality import expectations_report


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


class TestIncrementalExact:
    def test_cross_and_within_batch_dedup(self, spark):
        base = _docs(spark, [(1, "alpha beta gamma"), (2, "delta epsilon")])
        new = _docs(
            spark,
            [
                (10, "ALPHA   beta GAMMA"),   # canonical dup of base doc 1 -> dropped
                (11, "zeta eta theta"),        # unique -> kept
                (12, "zeta eta theta"),        # within-batch dup of 11 -> dropped
                (13, "iota kappa"),            # unique -> kept
            ],
        )
        out = dedup.incremental_exact_dedup(new, base, "text", "doc_id")
        assert sorted(r.doc_id for r in out.collect()) == [11, 13]

    def test_empty_base_degrades_to_plain_dedup(self, spark):
        base = _docs(spark, [(99, "unrelated")]).filter("doc_id < 0")
        new = _docs(spark, [(1, "x y"), (2, "x  y")])
        out = dedup.incremental_exact_dedup(new, base, "text", "doc_id")
        assert [r.doc_id for r in out.collect()] == [1]


class TestIncrementalLsh:
    def test_only_cross_pairs_emitted(self, spark):
        # 20/21 near-identical WITHIN new batch; 1/10 identical ACROSS sides
        long_a = " ".join(f"w{i}" for i in range(30))
        base = _docs(spark, [(1, long_a), (2, "completely different text here")])
        new = _docs(
            spark,
            [
                (10, long_a),                                   # cross near-dup of 1
                (20, "red green blue cyan magenta yellow black white one two"),
                (21, "red green blue cyan magenta yellow black white one three"),
            ],
        )
        out = dedup.minhash_lsh_pairs_incremental(
            new, base, "text", "doc_id", k=64, bands=16, n=3, verify_threshold=0.5
        ).collect()
        assert [(r.doc_base, r.doc_new) for r in out] == [(1, 10)]
        assert out[0].jaccard == 1.0


class TestExpectations:
    def test_violations_counted_and_flagged(self, spark):
        df = spark.createDataFrame(
            [
                Row(k=1, s="A", v=5.0),
                Row(k=1, s="B", v=-1.0),
                Row(k=2, s="Z", v=None),
                Row(k=None, s="A", v=3.0),  # NULL key: a uniqueness violation
            ],
            "k long, s string, v double",
        )
        out = {
            r.expectation: (r.n_violations, r.passed)
            for r in expectations_report(
                df,
                [
                    ("v_not_null", "not_null", {"col": "v"}),
                    ("s_domain", "accepted_values", {"col": "s", "values": ["A", "B"]}),
                    ("v_range", "in_range", {"col": "v", "lo": 0, "hi": 10}),
                    ("k_unique", "unique", {"col": "k"}),
                ],
            ).collect()
        }
        assert out["v_not_null"] == (1, False)
        assert out["s_domain"] == (1, False)      # 'Z' not accepted
        assert out["v_range"] == (2, False)       # -1.0 and NULL
        # 4 rows, 2 distinct non-null keys: k=1 twice + the NULL-key row
        # both violate (COUNT(*) - COUNT(DISTINCT k) = 2, oracle semantics)
        assert out["k_unique"] == (2, False)

    def test_unknown_kind_raises(self, spark):
        with pytest.raises(ValueError):
            expectations_report(
                spark.range(1), [("bad", "regex_match", {"col": "id"})]
            )


class TestPersistedBandIndex:
    def test_probe_against_persisted_index_equals_recompute(self, spark, tmp_path):
        """The production claim made real: band the base corpus ONCE, persist
        the index, then probe it for a new batch — identical pairs to the
        recompute path, with the base never re-shingled."""
        long_a = " ".join(f"w{i}" for i in range(30))
        long_b = " ".join(f"x{i}" for i in range(25))
        base = _docs(spark, [(1, long_a), (2, long_b), (3, "tiny unrelated doc")])
        new = _docs(spark, [(10, long_a), (11, long_b + " extra"), (12, "nothing alike")])

        idx_path = str(tmp_path / "band_index")
        dedup.minhash_band_table(base, "text", "doc_id").write.parquet(idx_path)
        idx = spark.read.parquet(idx_path)

        via_index = dedup.minhash_lsh_pairs_incremental(
            new, base, "text", "doc_id", base_bands=idx
        ).collect()
        recompute = dedup.minhash_lsh_pairs_incremental(
            new, base, "text", "doc_id"
        ).collect()
        key = lambda r: (r.doc_base, r.doc_new, r.n_common, r.jaccard)
        assert sorted(map(key, via_index)) == sorted(map(key, recompute))
        assert (1, 10) in {(r.doc_base, r.doc_new) for r in via_index}

    def test_ingestion_never_shingles_non_candidate_base_docs(
        self, spark, monkeypatch
    ):
        """Linearity claim made observable: with a prebuilt index, the only
        base text that reaches the shingler is the candidate set — a base
        doc sharing no LSH bucket with any new doc must never be shingled,
        otherwise ingestion is O(corpus), not O(new batch)."""
        long_a = " ".join(f"w{i}" for i in range(30))
        base = _docs(
            spark, [(1, long_a), (3, "tiny unrelated doc never colliding")]
        )
        new = _docs(spark, [(10, long_a), (12, "nothing alike at all")])
        idx = dedup.minhash_band_table(base, "text", "doc_id")

        shingled_ids: set = set()
        real = dedup._shingle_arrays

        def spy(df, text_col, id_col, n):
            shingled_ids.update(r[0] for r in df.select(id_col).collect())
            return real(df, text_col, id_col, n)

        monkeypatch.setattr(dedup, "_shingle_arrays", spy)
        out = dedup.minhash_lsh_pairs_incremental(
            new, base, "text", "doc_id", base_bands=idx
        ).collect()
        assert (1, 10) in {(r.doc_base, r.doc_new) for r in out}
        assert 3 not in shingled_ids  # non-candidate base doc never shingled
        assert 1 in shingled_ids      # candidate base doc was verified

    def test_probe_input_pruned_to_batch_band_keys(self, spark):
        """Flat-cost regression pin: of the persisted index, only rows in
        buckets the probe batch occupies may enter the bucket groupBy —
        the exact row count is asserted, so an accidental full-index
        shuffle (the round-5 rising-trend bug) fails loudly."""
        new_bands = spark.createDataFrame(
            [(10, 0, 111), (10, 1, 222), (11, 0, 333)],
            "doc long, band int, bh long",
        )
        base_bands = spark.createDataFrame(
            [
                (1, 0, 111),   # collides with doc 10 band 0
                (2, 1, 222),   # collides with doc 10 band 1
                (3, 0, 999),   # same band, different bucket -> pruned
                (4, 2, 111),   # same bh, different band -> pruned
                (5, 1, 555),   # no collision -> pruned
            ],
            "doc long, band int, bh long",
        )
        pruned = dedup.prune_bands_to_probe(base_bands, new_bands)
        assert pruned.count() == 2
        assert {r.doc for r in pruned.collect()} == {1, 2}

    def test_prune_preserves_incremental_pairs_and_bucket_caps(self, spark):
        """Padding the index with non-colliding junk rows must change
        neither the result nor the max_bucket behavior of a bucket the
        batch does occupy (the prune never shrinks a surviving bucket)."""
        long_a = " ".join(f"w{i}" for i in range(30))
        base = _docs(spark, [(1, long_a), (2, "tiny unrelated doc")])
        new = _docs(spark, [(10, long_a)])
        idx = dedup.minhash_band_table(base, "text", "doc_id")
        junk = spark.createDataFrame(
            [(100 + i, 99, -(i + 1)) for i in range(50)],
            "doc long, band int, bh long",
        )
        clean = dedup.minhash_lsh_pairs_incremental(
            new, base, "text", "doc_id", base_bands=idx
        ).collect()
        padded = dedup.minhash_lsh_pairs_incremental(
            new, base, "text", "doc_id", base_bands=idx.unionByName(junk)
        ).collect()
        key = lambda r: (r.doc_base, r.doc_new, r.n_common, r.jaccard)
        assert sorted(map(key, clean)) == sorted(map(key, padded))
        assert (1, 10) in {(r.doc_base, r.doc_new) for r in clean}


class TestIncrementalChunkRewrite:
    """chunk_dedup_rewrite_incremental: per-batch rewrite against
    accumulated keeper-chunk state; full-corpus hash parity with the batch
    form in test_queries_oracle (dedup_chunks_incremental)."""

    CHUNK = 3  # 3-token chunks keep the fixtures readable

    def _fold(self, spark, batches):
        from healthcare_rcm_etl_pipeline_spark.operators.corpus import (
            chunk_dedup_rewrite_incremental,
        )

        out, seen = [], None
        for rows in batches:
            b = _docs(spark, rows)
            rw, nc = chunk_dedup_rewrite_incremental(
                b, seen, "text", "doc_id", chunk_tokens=self.CHUNK
            )
            out.append({r["doc_id"]: r.asDict() for r in rw.collect()})
            nc = nc.localCheckpoint(eager=True)
            seen = nc if seen is None else seen.unionByName(nc).localCheckpoint(eager=True)
        return out

    def test_cross_batch_chunk_cut_and_keeper_repeats_survive(self, spark):
        boiler = "one two three"
        b1, b2 = self._fold(
            spark,
            [
                # doc 1 claims the boilerplate chunk; its WITHIN-doc repeat
                # survives (both occurrences live in the keeper doc)
                [(1, f"{boiler} {boiler}"), (2, f"{boiler} unique tail here")],
                # later batch: same chunk -> cut; fresh text -> kept
                [(10, f"{boiler} fresh words now"), (11, "all new text entirely")],
            ],
        )
        assert b1[1]["n_kept"] == 2 and b1[1]["clean_text"] == f"{boiler} {boiler}"
        assert b1[2]["n_kept"] == 1 and b1[2]["clean_text"] == "unique tail here"
        assert b2[10]["n_kept"] == 1 and b2[10]["clean_text"] == "fresh words now"
        assert b2[11]["n_kept"] == 2  # 4 tokens -> 2 chunks, both new

    def test_ascending_fold_equals_global_batch_rewrite(self, spark):
        from healthcare_rcm_etl_pipeline_spark.operators.corpus import (
            chunk_dedup_rewrite,
        )

        rows = [
            (0, "alpha beta gamma delta epsilon zeta"),
            (1, "alpha beta gamma completely different"),
            (2, ""),
            (3, "delta epsilon zeta alpha beta gamma"),
            (4, "delta epsilon zeta"),
        ]
        folded = self._fold(spark, [rows[:2], rows[2:4], rows[4:]])
        inc = {k: v for d in folded for k, v in d.items()}
        full = {
            r["doc_id"]: r.asDict()
            for r in chunk_dedup_rewrite(
                _docs(spark, rows), "text", "doc_id", chunk_tokens=self.CHUNK
            ).collect()
        }
        assert inc == full

    def test_first_batch_none_state_equals_plain_rewrite(self, spark):
        from healthcare_rcm_etl_pipeline_spark.operators.corpus import (
            chunk_dedup_rewrite,
        )

        rows = [(1, "a b c a b c"), (2, "a b c d e f")]
        (only,) = self._fold(spark, [rows])
        full = {
            r["doc_id"]: r.asDict()
            for r in chunk_dedup_rewrite(
                _docs(spark, rows), "text", "doc_id", chunk_tokens=self.CHUNK
            ).collect()
        }
        assert only == full
