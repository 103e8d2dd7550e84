"""Connected components: min-label propagation vs hand-computed components."""

from __future__ import annotations

import pytest

from healthcare_rcm_etl_pipeline_spark.operators.graph import connected_components


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    return {
        r["doc"]: r["component"]
        for r in connected_components(df, **kw).collect()
    }


def test_two_components_and_chain(spark):
    # component {1,2,3} as a chain, component {10,11} as an edge
    got = _cc(spark, [(2, 1), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_cycle_and_isolated_pair(spark):
    got = _cc(spark, [(5, 6), (6, 7), (7, 5), (100, 42)])
    assert got == {5: 5, 6: 5, 7: 5, 42: 42, 100: 42}


def test_long_path_converges_and_label_is_min(spark):
    n = 12
    got = _cc(spark, [(i, i + 1) for i in range(1, n)])
    assert got == {i: 1 for i in range(1, n + 1)}


def test_non_convergence_raises(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        _cc(spark, [(i, i + 1) for i in range(1, 10)], max_iters=2)


def test_empty_pairs(spark):
    assert _cc(spark, []) == {}
