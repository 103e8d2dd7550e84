"""Warehouse load with explicit target schemas (SURVEY.md §2a S6-S8).

Re-expresses /root/reference/python/load.py: per-table declared schemas
(load.py:31-75), WRITE_TRUNCATE + clustering fields (load.py:92-113),
sink-side date coercion and null normalization (load.py:105-109), and
post-load row-count validation (load.py:115-119) — against partitioned/
clustered parquet instead of BigQuery (no GCP in scope; the sink contract
is the same shape).

The reference declares a dim_departments schema it never loads (load.py:55-58)
— loaded here (gap-fix, consistent with plans/model.build_dim_departments).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from healthcare_rcm_etl_pipeline_spark.sources import sinks


def _schema(*fields: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType([T.StructField(n, t) for n, t in fields])


S, L, I, D, B, F64 = (
    T.StringType(),
    T.LongType(),
    T.IntegerType(),
    T.DateType(),
    T.BooleanType(),
    T.DoubleType(),
)

# target schemas <- load.py:31-75 (BigQuery types mapped to Spark types)
TARGET_SCHEMAS: dict[str, T.StructType] = {
    "dim_patients": _schema(
        ("patient_sk", L), ("unified_patient_id", S), ("FirstName", S),
        ("LastName", S), ("Gender", S), ("age", I), ("Address", S),
        ("source_hospital", S), ("version", I), ("effective_date", D),
        ("expiry_date", D), ("is_current", B),
    ),
    "dim_providers": _schema(
        ("provider_sk", L), ("ProviderID", S), ("FirstName", S), ("LastName", S),
        ("Specialization", S), ("DepartmentName", S), ("NPI", L),
        ("source_hospital", S),
    ),
    "dim_departments": _schema(
        ("department_sk", L), ("DeptID", S), ("DepartmentName", S),
        ("source_hospital", S),
    ),
    "dim_procedures": _schema(
        ("procedure_sk", L), ("ProcedureCode", I), ("ProcedureDescription", S),
    ),
    "dim_date": _schema(
        ("date_sk", L), ("full_date", D), ("year", I), ("month", I),
        ("quarter", I), ("day_of_week", S),
    ),
    "fact_transactions": _schema(
        ("TransactionID", S), ("EncounterID", S), ("patient_sk", L),
        ("provider_sk", L), ("procedure_sk", L), ("date_sk", L),
        ("Amount", F64), ("PaidAmount", F64), ("source_hospital", S),
    ),
    "fact_claims": _schema(
        ("ClaimID", S), ("TransactionID", S), ("patient_sk", L), ("date_sk", L),
        ("ClaimAmount", F64), ("PaidAmount", F64), ("ClaimStatus", S),
        ("PayorType", S), ("Deductible", F64), ("Coinsurance", F64),
        ("Copay", F64), ("days_to_payment", I), ("source_hospital", S),
    ),
}

# clustering fields <- load.py:100-103
CLUSTERING: dict[str, list[str]] = {
    "fact_transactions": ["patient_sk"],
    "fact_claims": ["patient_sk"],
    "dim_patients": ["unified_patient_id", "is_current"],
}


def bind_schema(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Project + cast to the declared target schema (try_cast: malformed ->
    null, pandas-coerce parity — load.py:105-109)."""
    return df.select(
        *[F.col(f.name).try_cast(f.dataType).alias(f.name) for f in schema.fields]
    )


def load_warehouse(
    spark: SparkSession, star: dict[str, DataFrame], warehouse_dir: str
) -> dict[str, bool]:
    """WRITE_TRUNCATE-style load of every star table with clustering and
    row-count reconciliation. Returns {table: reconciled?}."""
    results: dict[str, bool] = {}
    for name, schema in TARGET_SCHEMAS.items():
        if name not in star:
            continue
        bound = bind_schema(star[name], schema)
        path = os.path.join(warehouse_dir, name)
        sinks.write_clustered(bound, path, cluster_by=CLUSTERING.get(name))
        results[name] = sinks.rowcount_reconcile(spark, bound, path)
    return results
