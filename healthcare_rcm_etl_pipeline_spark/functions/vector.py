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
