"""SemDeDup semantic dedup + hashing-trick quality classifier.

The invariants tested here are the operator contracts, independent of the
driver oracle: survivor-set semantics for semantic_dedup, and bit-exact
md5-weight reproduction (vs a pure-Python reimplementation) for the
classifier margin.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from healthcare_rcm_etl_pipeline_spark.functions.text import (
    hashed_classifier_margin,
    hashed_classifier_score,
    tokens,
)
from healthcare_rcm_etl_pipeline_spark.functions.vector import cosine
from healthcare_rcm_etl_pipeline_spark.operators.dedup import semantic_dedup
from healthcare_rcm_etl_pipeline_spark.sources.readers import load_table

THRESH = 0.35


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_semantic_dedup_survivor_semantics(spark, sf_dir):
    e = _emb(spark, sf_dir)
    out = semantic_dedup(e, "embedding", "vec_id", threshold=THRESH)
    survivors = {r.vec_id for r in out.collect()}
    all_ids = {r.vec_id for r in e.select("vec_id").collect()}
    assert survivors <= all_ids and survivors

    # no surviving pair shares a cell at cosine >= threshold: if a < b both
    # survive, b's survival means cos(a, b) < threshold by construction.
    s = out.alias("s")
    vec = e.select(F.col("vec_id"), F.col("embedding"))
    joined = (
        s.join(vec, "vec_id")
        .select("vec_id", "cell", "embedding")
    )
    a = joined.select(
        F.col("vec_id").alias("ia"), F.col("cell"), F.col("embedding").alias("va")
    )
    b = joined.select(
        F.col("vec_id").alias("ib"), F.col("cell"), F.col("embedding").alias("vb")
    )
    bad = (
        a.join(b, "cell")
        .filter(F.col("ia") < F.col("ib"))
        .filter(F.round(cosine("va", "vb"), 6) >= THRESH)
        .count()
    )
    assert bad == 0

    # every removed id has a lower-id cell-mate at cosine >= threshold
    removed = all_ids - survivors
    if removed:
        full = semantic_dedup(
            e, "embedding", "vec_id", threshold=2.0
        )  # threshold 2.0 -> nothing removed; gives (id, cell) for everyone
        cells = {r.vec_id: r.cell for r in full.collect()}
        vecs = {r.vec_id: list(r.embedding) for r in e.collect()}

        def cos(u, v):
            du = sum(x * x for x in u) ** 0.5
            dv = sum(x * x for x in v) ** 0.5
            return sum(x * y for x, y in zip(u, v)) / (du * dv)

        for rid in sorted(removed)[:25]:  # spot-check a bounded sample
            mates = [
                i for i in all_ids if i < rid and cells[i] == cells[rid]
            ]
            assert any(
                round(cos(vecs[rid], vecs[i]), 6) >= THRESH for i in mates
            ), rid


def test_semantic_dedup_partition_invariant(spark, sf_dir):
    e = _emb(spark, sf_dir)
    base = sorted(
        (r.vec_id, r.cell)
        for r in semantic_dedup(e, "embedding", "vec_id", threshold=THRESH).collect()
    )
    shuffled = sorted(
        (r.vec_id, r.cell)
        for r in semantic_dedup(
            e.repartition(7), "embedding", "vec_id", threshold=THRESH
        ).collect()
    )
    assert base == shuffled


def test_semantic_dedup_hot_cell_guard_bounds_pairs(spark):
    """A degenerate mass-duplicate cell (every vector identical) must NOT
    enter the quadratic pair scan when it exceeds max_cell: all its rows
    survive (documented recall loss), instead of one hot cell re-creating
    the all-pairs blowup the cells exist to prevent."""
    dim = 64
    vec = [1.0] + [0.0] * (dim - 1)
    hot = spark.createDataFrame(
        [(i, vec) for i in range(50)], "vec_id long, embedding array<double>"
    )
    # guard off: min-id survivor semantics collapse the cell to one row
    no_guard = semantic_dedup(
        hot, "embedding", "vec_id", threshold=0.9, n_planes=6, max_cell=None
    )
    assert no_guard.count() == 1
    # guard on (cap below the cell size): the cell is skipped wholesale
    guarded = semantic_dedup(
        hot, "embedding", "vec_id", threshold=0.9, n_planes=6, max_cell=10
    )
    assert guarded.count() == 50


def test_adaptive_n_planes_tracks_corpus_size():
    from healthcare_rcm_etl_pipeline_spark.operators.dedup import adaptive_n_planes

    assert adaptive_n_planes(0) == 6  # clamped floor, empty-safe
    assert adaptive_n_planes(500) == 6
    assert adaptive_n_planes(512 * 2**10) == 10
    assert adaptive_n_planes(10**9) == 21  # ~1e9/512 -> 2^21 cells
    assert adaptive_n_planes(10**12) == 24  # clamped ceiling


def _py_margin(text: str, n_buckets: int = 1024, salt: str = "qw-v1") -> int:
    total = 0
    for tok in text.lower().strip().split():
        if not tok:
            continue
        bucket = int(hashlib.md5(tok.encode()).hexdigest()[:12], 16) % n_buckets
        w = (
            int(
                hashlib.md5(f"{salt}{bucket}".encode()).hexdigest()[:12], 16
            )
            % 2001
            - 1000
        )
        total += w
    return total


def test_classifier_margin_matches_python_reimplementation(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "Spark SQL 123 !! spark sql"),
        (3, "   "),
        (4, "one-token"),
    ]
    df = spark.createDataFrame(
        rows + [(5, None)], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.m
        for r in df.select(
            "doc_id",
            hashed_classifier_margin(tokens("text")).alias("m"),
        ).collect()
    }
    for doc_id, text in rows:
        assert got[doc_id] == _py_margin(text), (doc_id, text)
    assert got[5] == 0  # NULL text: margin coalesces to 0, not NULL


def test_classifier_score_bounds_and_empty_doc(spark):
    df = spark.createDataFrame(
        [(1, "some ordinary words here"), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.s
        for r in df.select(
            "doc_id", hashed_classifier_score(tokens("text")).alias("s")
        ).collect()
    }
    assert 0.0 < out[1] < 1.0
    assert out[2] == 0.5  # empty doc: zero margin over a one-token floor
    assert out[3] == 0.5  # NULL doc lands at the same neutral point
