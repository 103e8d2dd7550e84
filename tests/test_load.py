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


def test_read_jsonl_schema_and_permissive(spark, tmp_path):
    from pyspark.sql import types as T

    from healthcare_rcm_etl_pipeline_spark.sources.readers import read_jsonl

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello", "score": 0.5}\n'
        '{"doc_id": 2, "text": "world", "score": "not a number"}\n'
        '{"doc_id": 3, "text": null, "score": 1.25}\n'
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    rows = {r["doc_id"]: r for r in read_jsonl(spark, str(p), schema).collect()}
    assert rows[1]["score"] == 0.5 and rows[3]["text"] is None
    # malformed field coerces, row survives (PERMISSIVE)
    assert 2 in rows


def test_read_orc_roundtrip_with_pushdown(spark, tmp_path):
    from pyspark.sql import functions as F

    from healthcare_rcm_etl_pipeline_spark.sources.readers import read_orc

    src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    d = str(tmp_path / "orders_orc")
    src.write.mode("overwrite").orc(d)
    back = read_orc(spark, d)
    assert back.count() == src.count()
    q = back.filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_totalprice")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "o_orderstatus" in plan.split("PushedFilters")[1][:200]


def test_normalize_ntz_casts_all_ntz_columns(spark, tmp_path):
    """A parquet file whose timestamps carry no timezone is read as
    TIMESTAMP_NTZ; normalize_ntz must flip every such column to TIMESTAMP
    under the UTC session preserving the stored wall-clock micros — the
    guard that keeps a testdata regeneration from breaking unix_millis /
    withWatermark consumers (it did, in round 3)."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from healthcare_rcm_etl_pipeline_spark.sources.readers import normalize_ntz

    p = str(tmp_path / "ntz.parquet")
    ts = [datetime.datetime(2026, 1, 2, 3, 4, 5, 123456)]
    pq.write_table(
        pa.table(
            {
                "a": pa.array(ts, type=pa.timestamp("us")),  # NTZ
                "b": pa.array(ts, type=pa.timestamp("us", tz="UTC")),
                "k": pa.array([7], type=pa.int64()),
            }
        ),
        p,
    )
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw = spark.read.parquet(p)
    assert dict(raw.dtypes)["a"] == "timestamp_ntz"
    out = normalize_ntz(raw)
    assert dict(out.dtypes) == {"a": "timestamp", "b": "timestamp", "k": "bigint"}
    r = out.collect()[0]
    assert r["a"] == r["b"] == ts[0]  # wall-clock preserved, byte-equal epochs
    from pyspark.sql import functions as F

    ms = out.select(F.unix_millis("a").alias("m")).collect()[0]["m"]
    assert ms == int(ts[0].replace(tzinfo=datetime.timezone.utc).timestamp() * 1000)
