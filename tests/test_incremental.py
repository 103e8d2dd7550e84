"""operators/incremental.py — incremental merge must equal full recompute
under multi-round updates, new groups, and empty deltas. The driver oracle
(incremental_agg_maintenance) proves one split; these pin the algebra."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from healthcare_rcm_etl_pipeline_spark.operators import incremental as inc

SPEC = {
    "total": ("sum", "CAST(v AS DECIMAL(18,6))"),
    "n": ("count", "*"),
    "lo": ("min", "v"),
    "hi": ("max", "v"),
}


def _rows(df):
    return {
        r.k: (float(r.total), r.n, r.lo, r.hi)
        for r in df.collect()
    }


def _batch(spark, rows):
    return spark.createDataFrame([Row(k=k, v=v) for k, v in rows])


def test_three_round_merge_equals_full(spark):
    b1 = [("a", 1.0), ("a", 2.0), ("b", 5.0)]
    b2 = [("a", 7.0), ("c", -3.0)]
    b3 = [("b", 0.5), ("c", 9.0), ("d", 4.0)]
    state = inc.agg_state(_batch(spark, b1), ["k"], SPEC)
    for b in (b2, b3):
        state = inc.merge_agg_state(state, inc.agg_state(_batch(spark, b), ["k"], SPEC), ["k"], SPEC)
    full = inc.agg_state(_batch(spark, b1 + b2 + b3), ["k"], SPEC)
    assert _rows(state) == _rows(full)


def test_empty_delta_is_identity(spark):
    b1 = [("a", 1.0), ("b", 2.0)]
    state = inc.agg_state(_batch(spark, b1), ["k"], SPEC)
    empty = inc.agg_state(_batch(spark, [("x", 0.0)]).filter("k = 'nope'"), ["k"], SPEC)
    merged = inc.merge_agg_state(state, empty, ["k"], SPEC)
    assert _rows(merged) == _rows(state)


def test_unsupported_kind_raises(spark):
    with pytest.raises(ValueError):
        inc.agg_state(_batch(spark, [("a", 1.0)]), ["k"], {"bad": ("avg", "v")})


# -- apply_changelog (CDC MERGE analog) -------------------------------------

def _snap(spark, rows):
    return spark.createDataFrame(rows, "k string, a string, b int")


def _log(spark, rows):
    return spark.createDataFrame(rows, "k string, a string, b int, seq long, op string")


def test_changelog_upsert_insert_delete(spark):
    snap = _snap(spark, [("k1", "old", 1), ("k2", "keep", 2), ("k3", "gone", 3)])
    log = _log(spark, [
        ("k1", "new", 10, 5, "U"),
        ("k3", "x", 0, 6, "D"),
        ("k4", "born", 40, 7, "I"),
    ])
    out = {r.k: (r.a, r.b) for r in inc.apply_changelog(snap, log, "k", "seq").collect()}
    assert out == {"k1": ("new", 10), "k2": ("keep", 2), "k4": ("born", 40)}


def test_changelog_latest_seq_wins(spark):
    snap = _snap(spark, [("k1", "old", 1)])
    log = _log(spark, [
        ("k1", "v2", 2, 20, "U"),
        ("k1", "v1", 1, 10, "U"),
        ("k1", "v3", 3, 30, "U"),
    ])
    out = inc.apply_changelog(snap, log, "k", "seq").collect()
    assert [(r.k, r.a, r.b) for r in out] == [("k1", "v3", 3)]


def test_changelog_delete_then_reinsert(spark):
    # net effect per key is the LAST event only: D at seq 10, I at seq 20 -> row lives
    snap = _snap(spark, [("k1", "old", 1)])
    log = _log(spark, [("k1", "x", 0, 10, "D"), ("k1", "back", 9, 20, "I")])
    out = inc.apply_changelog(snap, log, "k", "seq").collect()
    assert [(r.k, r.a, r.b) for r in out] == [("k1", "back", 9)]
    # and the reverse ordering deletes
    log2 = _log(spark, [("k1", "back", 9, 10, "I"), ("k1", "x", 0, 20, "D")])
    assert inc.apply_changelog(snap, log2, "k", "seq").count() == 0


def test_changelog_missing_columns_raises(spark):
    snap = _snap(spark, [("k1", "old", 1)])
    bad = spark.createDataFrame([("k1", 1, "U")], "k string, seq long, op string")
    with pytest.raises(ValueError):
        inc.apply_changelog(snap, bad, "k", "seq")
