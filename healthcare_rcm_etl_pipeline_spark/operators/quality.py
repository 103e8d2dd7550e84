"""Data-quality checks (SURVEY.md §2m, V1-V3) as composable operators.

Reference: /root/reference/python/dimensional_modeling.py:80-100 (orphan FK +
positive-amount checks), /root/reference/python/load.py:115-119 (row-count
reconciliation). All checks are distributed (left_anti joins / filtered
counts) — no isin-lists collected to the driver, so they run at any scale.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def orphans(fact: DataFrame, dim: DataFrame, fact_key: str, dim_key: str | None = None) -> DataFrame:
    """Fact rows whose FK has no match in the dimension (V1) — left_anti.

    NULL FKs count as orphans, matching the reference's
    ``~fact.patient_sk.isin(valid_keys)`` semantics
    (dimensional_modeling.py:87-88: NaN.isin -> False -> flagged)."""
    dim_key = dim_key or fact_key
    keys = dim.select(F.col(dim_key).alias(fact_key)).dropDuplicates()
    return fact.join(keys, fact_key, "left_anti")


def rule_violations(df: DataFrame, predicate: Column) -> DataFrame:
    """Rows violating a business rule (V2), e.g. ``col('Amount') <= 0``."""
    return df.filter(predicate)


def reconcile_counts(written: DataFrame, readback: DataFrame) -> bool:
    """Row-count reconciliation after a load (V3/S8)."""
    return written.count() == readback.count()


@dataclass
class QualityReport:
    name: str
    violation_count: int
    passed: bool


def check(name: str, violations: DataFrame, allow: int = 0) -> QualityReport:
    n = violations.count()
    return QualityReport(name=name, violation_count=n, passed=n <= allow)
