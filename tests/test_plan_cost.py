"""Plan-construction cost guard (round-9 advice): queries.py holds 160+
registrations and the heaviest ones build large unrolled plans (k MMR
stages, BFS rounds, BPE merge rounds, PageRank iterations) — the repo has
already been bitten once by quadratic plan construction
(operators/similarity.py history: py4j tree building + Janino blowup).
This test times CONSTRUCTION (the QUERIES[name] call, which includes the
eager localCheckpoints those plans pin their stages with, at sf0.001 where
data cost is negligible) plus one analyzer pass for the five largest
plans, against committed budgets — so the next 6x plan-cost surprise fails
CI instead of surfacing as a bench regression.

Budgets are ~4x a warm uncontended local[32] measurement (2026-08, round
10, min of 3: mmr_ivf 2.66s, blast_radius 2.22s, bpe_train 1.55s,
pagerank 1.57s, chunks_incremental 3.80s) — loose enough for CI noise and
contention, tight enough that a structural blowup (the observed failure
mode was 6x+) still trips.
"""

from __future__ import annotations

import time

import pytest

from healthcare_rcm_etl_pipeline_spark.plans.queries import QUERIES

SF = "/root/testdata/sf0.001"

PLAN_BUDGETS_SEC = {
    "mmr_diverse_topk_ivf": 11.0,
    "decontaminate_blast_radius": 9.0,
    "corpus_bpe_train": 6.5,
    "q49_copurchase_pagerank": 6.5,
    "dedup_chunks_incremental": 15.0,
}


@pytest.mark.parametrize("name", sorted(PLAN_BUDGETS_SEC))
def test_plan_construction_within_budget(spark, name):
    # warm pass: JVM/codegen/analyzer caches and the first parquet-footer
    # reads are session startup cost, not plan-construction cost
    QUERIES[name](spark, SF)._jdf.queryExecution().analyzed()
    t0 = time.perf_counter()
    df = QUERIES[name](spark, SF)
    df._jdf.queryExecution().analyzed()
    dt = time.perf_counter() - t0
    assert dt < PLAN_BUDGETS_SEC[name], (
        f"{name}: plan construction took {dt:.2f}s (budget "
        f"{PLAN_BUDGETS_SEC[name]}s) — a structural plan-cost regression "
        "(unrolled stages re-deriving lineage?); see operators/similarity.py "
        "plan-construction notes"
    )
