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
