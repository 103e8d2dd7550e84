"""Edge cases for the int8 embedding quantization in functions/vector.py
(full-corpus oracle parity lives in test_queries_oracle.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from healthcare_rcm_etl_pipeline_spark.functions import vector as V


def _quant(spark, vec):
    df = spark.createDataFrame([Row(v=vec)]).select(
        "v", V.quantize_scale_int8("v").alias("s")
    )
    return df.select(
        "s",
        V.quantize_int8("v", F.col("s")).alias("q"),
        V.dequant_mse("v", V.quantize_int8("v", F.col("s")), F.col("s")).alias("mse"),
    ).collect()[0]


def test_zero_vector_quantizes_to_zeros(spark):
    r = _quant(spark, [0.0, 0.0, 0.0])
    assert r.s == 0.0 and r.q == [0, 0, 0] and r.mse == 0.0


def test_extremes_hit_127(spark):
    r = _quant(spark, [1.0, -1.0, 0.5])
    assert r.q[0] == 127 and r.q[1] == -127
    assert r.q[2] == 64  # floor(0.5*127 + 0.5) = 64
    assert r.mse < (r.s / 2) ** 2  # error bounded by half a quantization step


def test_reconstruction_error_bound(spark):
    vec = [0.31, -0.77, 0.05, 0.999, -0.001]
    r = _quant(spark, vec)
    step = r.s
    for x, qi in zip(vec, r.q):
        assert abs(x - qi * step) <= step / 2 + 1e-12
