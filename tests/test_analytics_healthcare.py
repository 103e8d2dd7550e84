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
