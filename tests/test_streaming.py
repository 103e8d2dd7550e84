"""Structured Streaming smoke tests: the SAME transform functions used by the
batch queries run under readStream with a watermark, proving the operators
are streaming-clean (no batch-only constructs)."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from healthcare_rcm_etl_pipeline_spark.sources.readers import load_events
from healthcare_rcm_etl_pipeline_spark.streaming import events as ev


@pytest.fixture(scope="module")
def event_dir(spark, sf_dir):
    # re-materialize events as a micro-batch file source (ts already micros)
    d = tempfile.mkdtemp(prefix="hrcm_stream_")
    load_events(spark, sf_dir).write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run_stream(spark, stream_df, name, mode):
    q = ev.run_stream_to_memory(stream_df, name, mode)
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_tumbling_window_streaming_matches_batch(spark, sf_dir, event_dir):
    batch = ev.tumbling_window_agg(load_events(spark, sf_dir), "1 hour")
    schema = spark.read.parquet(event_dir).schema
    stream = ev.stream_from_files(spark, event_dir, schema, watermark="10 minutes")
    out = _run_stream(spark, ev.tumbling_window_agg(stream, "1 hour"), "t_tumble", "append")
    b = {tuple(r) for r in batch.collect()}
    s = {tuple(r) for r in out.collect()}
    # availableNow processes everything; watermark only finalizes windows,
    # so every emitted window must equal its batch twin
    assert s <= b
    assert len(s) >= len(b) - 1  # the last open window may be withheld


def test_stateful_user_totals_matches_batch_agg(spark, sf_dir, event_dir):
    from pyspark.sql import functions as F

    schema = spark.read.parquet(event_dir).schema
    stream = spark.readStream.schema(schema).parquet(event_dir)
    out = _run_stream(spark, ev.stateful_user_totals(stream), "t_state", "update")
    # final state per user (last update row) must equal the batch aggregate
    final = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 4))
        for r in out.orderBy("n_events").collect()  # update sink: last wins per key
    }
    batch = {
        r["user_id"]: (r["n"], round(r["t"], 4))
        for r in load_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    assert final == batch


def test_sessionize_streaming_runs(spark, event_dir):
    schema = spark.read.parquet(event_dir).schema
    stream = ev.stream_from_files(spark, event_dir, schema, watermark="30 minutes")
    out = _run_stream(spark, ev.sessionize(stream, "15 minutes"), "t_sess", "append")
    assert out.count() > 0
    cols = set(out.columns)
    assert {"user_id", "session_start", "session_end", "n_events", "total_value"} <= cols
