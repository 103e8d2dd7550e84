"""Multi-source integration (SURVEY.md §2d U1-U2, §1 schema reconciliation).

Reference behavior re-expressed:
- rename-map standardization of hospital B's drifted patient columns
  (/root/reference/python/extraction.py:79-83),
- per-source literal tag + UNION ALL (/root/reference/python/extraction.py:88-92),
- drift tolerance: hospital2's CSV carries Updated_Date instead of
  ModifiedDate — unionByName(allowMissingColumns=True) keeps both with nulls,
  exactly reproducing the reference's observed unioned shape (SURVEY.md §1),
- conformed natural key unified_patient_id (extraction.py:96).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from healthcare_rcm_etl_pipeline_spark.functions.cleanse import unified_source_id

# extraction.py:79-83 rename map (hospital B -> hospital A names)
PATIENTS_B_RENAMES = {
    "ID": "PatientID",
    "F_Name": "FirstName",
    "L_Name": "LastName",
    "M_Name": "MiddleName",
}


def standardize_columns(df: DataFrame, renames: dict[str, str]) -> DataFrame:
    return df.withColumnsRenamed(renames)


def tag_source(df: DataFrame, source: str, col: str = "source_hospital") -> DataFrame:
    """Per-source provenance literal (extraction.py:88-92)."""
    return df.withColumn(col, F.lit(source))


def union_with_drift(dfs: list[DataFrame]) -> DataFrame:
    """UNION ALL tolerating schema drift — missing columns null-filled."""
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)


def integrate_sources(
    tagged: dict[str, DataFrame], renames: dict[str, dict[str, str]] | None = None
) -> DataFrame:
    """standardize -> tag -> union for a {source_name: df} dict."""
    renames = renames or {}
    parts = [
        tag_source(standardize_columns(df, renames.get(src, {})), src)
        for src, df in tagged.items()
    ]
    return union_with_drift(parts)


def add_unified_patient_id(df: DataFrame, id_col: str = "PatientID") -> DataFrame:
    """unified_patient_id = upper(source minus 'hospital_') + '-' + id
    (extraction.py:96, duplicated at dimensional_modeling.py:59)."""
    return df.withColumn(
        "unified_patient_id", unified_source_id(F.col("source_hospital"), F.col(id_col))
    )
