"""edit-distance-1 fuzzy join (deletion-neighborhood blocking) and
quality-aware dedup survivor selection."""

from __future__ import annotations

from pyspark.sql import functions as F

from healthcare_rcm_etl_pipeline_spark.operators import dedup, fuzzy


def _keys(spark, rows):
    return spark.createDataFrame(rows, "id long, key string")


class TestEdit1Pairs:
    def test_substitution_insertion_deletion_found(self, spark):
        df = _keys(
            spark,
            [
                (1, "abcdef"),
                (2, "abcxef"),   # substitution
                (3, "abcdefg"),  # insertion
                (4, "abcde"),    # deletion
                (5, "zzzzzz"),   # unrelated
            ],
        )
        got = {
            (r["id_a"], r["id_b"]): r["lev"]
            for r in fuzzy.edit1_pairs(df, "key", "id").collect()
        }
        assert got[(1, 2)] == 1 and got[(1, 3)] == 1 and got[(1, 4)] == 1
        assert all(5 not in p for p in got)

    def test_distance2_candidates_verified_away(self, spark):
        # "ab" and "ba" share deletion variant "a" (and "b") but lev = 2
        df = _keys(spark, [(1, "ab"), (2, "ba")])
        assert fuzzy.edit1_pairs(df, "key", "id").count() == 0

    def test_exact_duplicates_reported_at_lev0(self, spark):
        df = _keys(spark, [(1, "same"), (2, "same")])
        got = fuzzy.edit1_pairs(df, "key", "id").collect()
        assert [(r["id_a"], r["id_b"], r["lev"]) for r in got] == [(1, 2, 0)]

    def test_pairs_deduped_across_shared_variants(self, spark):
        # identical strings share EVERY variant — still exactly one pair row
        df = _keys(spark, [(1, "aaaa"), (2, "aaaa")])
        assert fuzzy.edit1_pairs(df, "key", "id").count() == 1

    def test_max_bucket_caps_hot_variant(self, spark):
        rows = [(i, f"k{i}x") for i in range(30)]  # all share variant "kx"?
        # construct a genuinely hot variant: 30 keys "hotN" all length 4
        rows = [(i, "hot" + str(i % 10)) for i in range(30)]
        df = _keys(spark, rows)
        capped = fuzzy.edit1_pairs(df, "key", "id", max_bucket=2).count()
        uncapped = fuzzy.edit1_pairs(df, "key", "id").count()
        assert capped < uncapped


class TestBestSurvivors:
    def test_longest_member_kept_ties_to_lower_id(self, spark):
        docs = spark.createDataFrame(
            [(1, 5), (2, 9), (3, 9), (4, 7)], "doc_id long, n_chars long"
        )
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3)], "doc_a long, doc_b long"
        )
        got = sorted(
            r["doc_id"]
            for r in dedup.best_survivors(docs, pairs, "doc_id", "n_chars").collect()
        )
        # cluster {1,2,3}: max n_chars 9 tie between 2 and 3 -> keep 2;
        # unpaired doc 4 always survives
        assert got == [2, 4]

    def test_min_id_convention_differs_when_best_is_not_min(self, spark):
        d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        pairs = dedup.ngram_jaccard_pairs(
            d, "text", "doc_id", n=3, threshold=0.5, max_df=20
        )
        best = {
            r["doc_id"]
            for r in dedup.best_survivors(d, pairs, "doc_id", "n_chars").collect()
        }
        # same cardinality as the min-id policy (one survivor per cluster),
        # whatever the picks
        from healthcare_rcm_etl_pipeline_spark.operators import graph

        clusters = graph.connected_components(pairs)
        losers_minid = clusters.filter(F.col("doc") != F.col("component")).count()
        assert len(best) == d.count() - losers_minid
