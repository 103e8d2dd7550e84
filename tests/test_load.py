"""Warehouse-load contract: schema binding produces exactly the declared
types, clustering fields applied, row counts reconcile (load.py parity)."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from healthcare_rcm_etl_pipeline_spark.plans import load as wload
from healthcare_rcm_etl_pipeline_spark.plans.pipeline import run_pipeline


@pytest.fixture(scope="module")
def warehouse(spark):
    d = tempfile.mkdtemp(prefix="hrcm_wh_")
    star = run_pipeline(spark, run_date="2025-08-03")
    results = wload.load_warehouse(spark, star, d)
    yield spark, d, results
    shutil.rmtree(d, ignore_errors=True)


def test_all_tables_loaded_and_reconciled(warehouse):
    _, _, results = warehouse
    assert set(results) == set(wload.TARGET_SCHEMAS)
    assert all(results.values()), results


def test_loaded_schemas_match_declared(warehouse):
    spark, d, _ = warehouse
    for name, schema in wload.TARGET_SCHEMAS.items():
        got = spark.read.parquet(f"{d}/{name}")
        declared = [(f.name, f.dataType.simpleString()) for f in schema.fields]
        actual = [(f.name, f.dataType.simpleString()) for f in got.schema.fields]
        assert actual == declared, f"{name}: {actual} != {declared}"
