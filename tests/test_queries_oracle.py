"""Mirror of the driver's correctness gate: run every registered query in
Spark AND its DuckDB oracle on the same parquet, compare row count, column
names, and an order-insensitive value hash (values stringified with repr so
float bit-inequality is caught, not papered over)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from healthcare_rcm_etl_pipeline_spark.plans.queries import ORACLES, QUERIES
from healthcare_rcm_etl_pipeline_spark.sources.readers import TESTDATA_TABLES

# default sf0.001 keeps the sweep fast; override to audit scale-sensitive
# oracle contracts (HLL tolerance, LSH recall, df caps) at bigger SFs —
# the round-4 sf0.1 audit caught four divergences invisible at small SF
SF_DIR = os.environ.get("HRCM_ORACLE_SF_DIR", "/root/testdata/sf0.001")


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return repr(float(v))
        return repr(v)
    if isinstance(v, int):
        return repr(float(v)) if abs(v) < 1e15 else repr(v)
    return str(v)


def _rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_canon(r[i]) for i in idx) for r in rows)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, duck):
    sdf = QUERIES[name](spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    sset, dset = _rowset(scols, srows), _rowset(dcols, drows)
    mism = [(a, b) for a, b in zip(sset, dset) if a != b][:5]
    assert sset == dset, f"{name}: value mismatch, first diffs: {mism}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run_and_repeat(name, spark):
    # no oracle for engine-internal-hash ops — determinism across fresh
    # plans is the correctness evidence the driver's rows-only check leans on
    a = QUERIES[name](spark, SF_DIR)
    b = QUERIES[name](spark, SF_DIR)
    assert len(a.columns) > 0
    ra = sorted(tuple(r) for r in a.collect())
    rb = sorted(tuple(r) for r in b.collect())
    assert ra == rb and len(ra) >= 0
