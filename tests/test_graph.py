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


def test_diameter_stress_chain_converges_in_log_rounds(spark):
    """A 1000-link duplicate chain (diameter 1000) — the worst shape for
    plain min-label propagation, which would need ~1000 rounds. Pointer
    jumping must converge within the default 20 (2^20 >> 1000) and the
    labels must still be the component min."""
    from healthcare_rcm_etl_pipeline_spark.operators.graph import cc_rounds

    n = 1000
    edges = [(i, i + 1) for i in range(1, n)]
    got = _cc(spark, edges)
    assert got == {i: 1 for i in range(1, n + 1)}
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    rounds = cc_rounds(df)
    assert rounds <= 14  # ~log2(1000) + detection overhead


def test_compression_off_needs_diameter_rounds(spark):
    """Control for the stress test: without compression the same chain
    needs ~diameter rounds — pinning that the log-round behavior really
    comes from the pointer-jumping step."""
    from healthcare_rcm_etl_pipeline_spark.operators.graph import cc_rounds

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 25)], "doc_a long, doc_b long"
    )
    assert cc_rounds(edges, max_iters=40, compress=False) >= 23
    assert cc_rounds(edges, max_iters=40, compress=True) <= 8
