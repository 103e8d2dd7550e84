"""Vector math over ``array<float/double>`` embedding columns.

Pure higher-order-function expressions (zip_with/aggregate) — JVM-side,
no UDF, so similarity scans scale with the cluster. Elements are cast to
DOUBLE before arithmetic and folded left-to-right, which makes results
bit-identical to a sequential-loop oracle (e.g. DuckDB list_dot_product).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from healthcare_rcm_etl_pipeline_spark.functions.cleanse import _c, ColumnOrName


def as_double_vec(col: ColumnOrName) -> Column:
    return F.transform(_c(col), lambda x: x.cast("double"))


def dot(a: ColumnOrName, b: ColumnOrName) -> Column:
    prods = F.zip_with(as_double_vec(a), as_double_vec(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: ColumnOrName) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Cosine similarity; null if either vector has zero norm."""
    return dot(a, b) / F.nullif(norm(a) * norm(b), F.lit(0.0))


def quantize_scale_int8(col: ColumnOrName) -> Column:
    """Per-vector symmetric int8 scale: max(|x|)/127 (0.0 for a zero vector)."""
    return F.array_max(F.transform(as_double_vec(col), F.abs)) / F.lit(127.0)


def quantize_int8(col: ColumnOrName, scale: Column) -> Column:
    """Symmetric int8 quantization q = clamp(round(x/scale), ±127) as
    ``array<int>``; a zero vector (scale 0) quantizes to zeros.

    Rounding is spelled ``floor(x/s + 0.5)`` — identical semantics in every
    engine (banker's-vs-half-up ROUND differences across engines would
    poison the oracle). Pure ``transform`` expression: quantization is
    per-row, shuffle-free, and the int8 payload is what a 100 TB embedding
    store actually ships (4× smaller than float32).
    """
    return F.transform(
        as_double_vec(col),
        lambda x: F.greatest(
            F.least(
                F.coalesce(F.floor(x / F.nullif(scale, F.lit(0.0)) + 0.5), F.lit(0)),
                F.lit(127),
            ),
            F.lit(-127),
        ).cast("int"),
    )


def dequant_mse(col: ColumnOrName, q: Column, scale: Column) -> Column:
    """Mean squared reconstruction error between a vector and its
    dequantized int8 form — the quantization-quality audit column."""
    sq = F.zip_with(
        as_double_vec(col), q, lambda x, qi: (x - qi.cast("double") * scale) ** 2
    )
    return F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x) / F.size(_c(col))
