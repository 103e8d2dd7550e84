"""Triple-parity for the healthcare-native Q1-Q11 (SURVEY.md §2o): the
DataFrame implementation, the spark.sql portable text, and DuckDB running the
SAME SQL text over the staged parquet must all agree (order-insensitive
value compare)."""

from __future__ import annotations

import math
import os
import shutil
import tempfile

import duckdb
import pytest

from healthcare_rcm_etl_pipeline_spark.plans import analytics
from healthcare_rcm_etl_pipeline_spark.plans.pipeline import run_pipeline


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, int):
        return repr(float(v)) if abs(v) < 1e15 else repr(v)
    return str(v)


def _rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_canon(r[i]) for i in idx) for r in rows)


@pytest.fixture(scope="module")
def star_env(spark):
    d = tempfile.mkdtemp(prefix="hrcm_analytics_")
    star = run_pipeline(spark, staging_dir=d, run_date="2025-08-03")
    # read back from staging so all three engines see identical bits
    staged = {}
    for name in analytics.STAR_TABLES:
        path = os.path.join(d, name)
        if name == "dim_patients":
            from healthcare_rcm_etl_pipeline_spark.sources import sinks

            staged[name] = sinks.read_versioned(spark, path)
        else:
            staged[name] = spark.read.parquet(path)
    analytics.register_star_views(staged)
    con = duckdb.connect()
    for name in analytics.STAR_TABLES:
        sub = "/v=1" if name == "dim_patients" else ""
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{d}/{name}{sub}/*.parquet'"
        )
    yield staged, con
    con.close()
    shutil.rmtree(d, ignore_errors=True)


@pytest.mark.parametrize("name", sorted(analytics.HEALTHCARE_QUERIES))
def test_triple_parity(name, spark, star_env):
    star, con = star_env
    df_api = analytics.HEALTHCARE_QUERIES[name](star)
    df_sql = analytics.run_sql(spark, name)
    res = con.execute(analytics.SQL[name])
    dcols = [c[0] for c in res.description]
    drows = res.fetchall()

    a_cols, a_rows = df_api.columns, [tuple(r) for r in df_api.collect()]
    s_cols, s_rows = df_sql.columns, [tuple(r) for r in df_sql.collect()]

    assert sorted(a_cols) == sorted(s_cols) == sorted(dcols), f"{name} columns"
    a, s, d = _rowset(a_cols, a_rows), _rowset(s_cols, s_rows), _rowset(dcols, drows)
    assert a == s, f"{name}: DataFrame vs spark.sql mismatch"
    assert a == d, f"{name}: Spark vs DuckDB mismatch"


class TestScaledLookupCliff:
    """The broadcast cliff (SCALE.md r12/r13): hq2/hq9's patient lookup
    picks its join strategy from the dimension's ACTUAL row count via
    analytics.scaled_lookup — broadcast at every genuinely-small scale,
    merge above _BROADCAST_MAX_DIM_ROWS, with NO manual forcing. The r12
    probe measured the default (compressed-bytes-estimated) broadcast 2.9x
    slower than sort-merge at 1M dim rows; this pins the mechanism that
    makes the fast plan the default."""

    def _executed(self, df) -> str:
        df.collect()
        return df._jdf.queryExecution().executedPlan().toString()

    def test_small_dim_still_broadcasts(self, spark, star_env):
        star, _ = star_env
        plan = self._executed(analytics.hq2(star))
        # hq2 has exactly one join (fact x patient lookup)
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_grown_dim_defaults_to_sort_merge(self, spark):
        n = analytics._BROADCAST_MAX_DIM_ROWS + 1
        p = spark.range(n).selectExpr(
            "id AS patient_sk",
            "true AS is_current",
            "concat('H', id % 7) AS source_hospital",
            "concat('F', id) AS FirstName",
            "concat('L', id) AS LastName",
        )
        fc = spark.range(5000).selectExpr(
            f"id % {n} AS patient_sk",
            "CAST(10.5 AS DOUBLE) AS ClaimAmount",
            "CAST(4.5 AS DOUBLE) AS PaidAmount",
            "CAST(id % 30 AS INT) AS days_to_payment",
            "concat('C', id) AS ClaimID",
        )
        star = {"fact_claims": fc, "dim_patients": p}
        for q in (analytics.hq2, analytics.hq9):
            plan = self._executed(q(star))
            assert "SortMergeJoin" in plan, q.__name__
            assert "BroadcastHashJoin" not in plan, q.__name__

    def test_threshold_boundary(self, spark):
        from pyspark.sql import functions as F

        small = spark.range(10).selectExpr("id", "id AS v")
        lk = analytics.scaled_lookup(small, ["id", "v"])
        # explicit broadcast hint under the bound
        assert "ResolvedHint" in lk._jdf.queryExecution().analyzed().toString()
