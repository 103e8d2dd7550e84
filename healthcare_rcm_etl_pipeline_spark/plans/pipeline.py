"""End-to-end batch pipeline (SURVEY.md §3, entry point 1).

Spark-native lifecycle replacing /root/reference/python/scd_implementation.py's
orchestration (:102-132): extract -> standardize/union -> clean/enrich ->
surrogate keys -> star schema -> SCD2 -> parquet staging. Everything stays a
lazy DataFrame graph until the staging writes; the only barrier is the SCD2
read-modify-write (versioned dirs, sinks.write_versioned).

Source layout defaults to the reference repo's own seed CSVs (the same data
its MySQL DDL seeds), so the e2e tests run the real input. ``claims source
inference``: the reference tags claims by filename substring
(extraction.py:103-105); here the filename is mapped explicitly per file.
"""

from __future__ import annotations

import os
from glob import glob

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from healthcare_rcm_etl_pipeline_spark.operators.scd2 import apply_scd_type2
from healthcare_rcm_etl_pipeline_spark.plans import model
from healthcare_rcm_etl_pipeline_spark.plans.standardize import (
    PATIENTS_B_RENAMES,
    add_unified_patient_id,
    integrate_sources,
)
from healthcare_rcm_etl_pipeline_spark.sources import readers, schemas, sinks

DB_TABLES = ["departments", "encounters", "patients", "providers", "transactions"]
SCD_TRACKED = ["Address", "LastName"]  # scd_implementation.py:19


def extract(
    spark: SparkSession, reference_root: str = "/root/reference"
) -> tuple[dict[str, DataFrame], DataFrame]:
    """extraction.py:53-111 — CSV-backed (same data the MySQL DDL seeds)."""
    hosp = os.path.join(reference_root, "SQL", "hospital_dbs")
    out: dict[str, DataFrame] = {}
    for tbl in DB_TABLES:
        per_source = {}
        for src, db in [("hospital_a", "hospital1_db"), ("hospital_b", "hospital2_db")]:
            schema_key = (
                "patients_b" if (tbl == "patients" and src == "hospital_b") else
                "patients_a" if tbl == "patients" else tbl
            )
            df = readers.read_csv(
                spark,
                os.path.join(hosp, db, f"{tbl}.csv"),
                schemas.HOSPITAL_TABLE_SCHEMAS[schema_key],
            )
            per_source[src] = df
        out[tbl] = integrate_sources(
            per_source, renames={"hospital_b": PATIENTS_B_RENAMES if tbl == "patients" else {}}
        )
    out["patients"] = add_unified_patient_id(out["patients"])

    claim_files = sorted(glob(os.path.join(reference_root, "Data", "claims", "*.csv")))
    claim_parts = {}
    for f in claim_files:
        src = "hospital_a" if "hospital1" in os.path.basename(f).lower() else "hospital_b"
        claim_parts[src] = readers.read_csv(spark, f, schemas.HOSPITAL_TABLE_SCHEMAS["claims"])
    claims = integrate_sources(claim_parts)
    return out, claims


def transform(
    db_data: dict[str, DataFrame], claims: DataFrame, run_date: str
) -> tuple[dict[str, DataFrame], DataFrame]:
    """transform.py:58-67."""
    db = dict(db_data)
    db["patients"] = model.clean_patients(db["patients"], run_date)
    claims_t = model.enrich_claims(claims)
    db["patients"] = model.attach_surrogate_key(db["patients"], ["unified_patient_id"], "patient_sk")
    db["providers"] = model.attach_surrogate_key(
        db["providers"], ["ProviderID", "source_hospital"], "provider_sk"
    )
    db["departments"] = model.attach_surrogate_key(
        db["departments"], ["DeptID", "source_hospital"], "department_sk"
    )
    return db, claims_t


def run_pipeline(
    spark: SparkSession,
    reference_root: str = "/root/reference",
    staging_dir: str | None = None,
    run_date: str = "2025-08-03",
    existing_dim_patients: DataFrame | None = None,
    use_cpt_lookup: bool = False,
) -> dict[str, DataFrame]:
    """Full batch run; returns {table_name: DataFrame} of dims + facts.

    ``use_cpt_lookup``: opt-in enrichment of dim_procedures from the
    reference's dormant CPT lookup (Data/cptcode/cptcodes.csv — shipped but
    never read by the reference, dimensional_modeling.py:34 fakes the
    description instead). Codes found in the lookup get the real CPT
    description; unknown codes keep the reference's synthetic
    'Desc for Code N' fallback. Off by default for strict parity."""
    db_raw, claims_raw = extract(spark, reference_root)
    db, claims = transform(db_raw, claims_raw, run_date)

    cpt = None
    if use_cpt_lookup:
        cpt = readers.read_csv(
            spark,
            os.path.join(reference_root, "Data", "cptcode", "cptcodes.csv"),
            schemas.HOSPITAL_TABLE_SCHEMAS["cptcodes"],
        )
    dims = {
        "dim_patients": model.build_dim_patients(db["patients"]),
        "dim_providers": model.build_dim_providers(db["providers"], db["departments"]),
        "dim_departments": model.build_dim_departments(db["departments"]),
        "dim_procedures": model.build_dim_procedures(db["transactions"], cptcodes=cpt),
        "dim_date": model.build_dim_date(db["transactions"], db["encounters"]),
    }

    # SCD2 on dim_patients (scd_implementation.py:16-100) BEFORE fact
    # building, so facts resolve FKs against the merged dimension. incoming =
    # natural key + attrs, one row per key (the seed data carries duplicate
    # patient ids; the reference's golden dim holds distinct keys — 9,985 of
    # 10,000); prior state comes from the versioned staging dir if present.
    #
    # Surrogate keys are STABLE (operators.keys.stable_sk): existing keys
    # keep their sk across runs, new keys append after max(sk). The
    # reference instead re-keys the whole dimension positionally each run
    # (scd_implementation.py:96-98, rekey="literal"), which shifts sks after
    # any change run and silently points fact FKs at the wrong patients —
    # replicated by the scd2_type2_merge query for parity, NOT used here.
    from healthcare_rcm_etl_pipeline_spark.operators.keys import first_row_per_key, stable_sk

    incoming = first_row_per_key(
        dims["dim_patients"].drop("patient_sk"), ["unified_patient_id"]
    )
    existing = existing_dim_patients
    if existing is None and staging_dir:
        existing = sinks.read_versioned(spark, os.path.join(staging_dir, "dim_patients"))
    scd = apply_scd_type2(
        incoming,
        existing,
        key="unified_patient_id",
        tracked=SCD_TRACKED,
        run_date=run_date,
        rekey="none",
    )
    has_prior_sk = existing is not None and "patient_sk" in existing.columns
    dims["dim_patients"] = stable_sk(
        scd,
        ["unified_patient_id"],
        "patient_sk",
        existing=existing if has_prior_sk else None,
    )

    facts = {
        "fact_transactions": model.build_fact_transactions(
            db["transactions"],
            dims["dim_patients"].filter(F.col("is_current")),
            dims["dim_providers"],
            dims["dim_procedures"],
            dims["dim_date"],
        ),
    }
    facts["fact_claims"] = model.build_fact_claims(
        claims, facts["fact_transactions"], dims["dim_date"]
    )
    model.validate_star(facts, dims)

    out = {**dims, **facts}
    if staging_dir:
        for name, df in out.items():
            if name == "dim_patients":
                sinks.write_versioned(df, os.path.join(staging_dir, name))
            elif name.startswith("fact_"):
                # clustering analog of load.py:100-103: facts by patient_sk
                sinks.write_clustered(
                    df, os.path.join(staging_dir, name), cluster_by=["patient_sk"]
                )
            else:
                sinks.write_parquet(df, os.path.join(staging_dir, name))
        # staging-time stats (analytics.STAR_STATS_KEY): counted from the
        # JUST-WRITTEN parquet — a footer-metadata read, no recompute of the
        # dim graph — so every downstream query build / view registration
        # plans the size-aware join strategy with zero count jobs
        # (scaled_lookup / register_star_views). Unstaged runs stay pure
        # lazy DataFrames and attach stats explicitly if wanted
        # (analytics.attach_star_stats).
        from healthcare_rcm_etl_pipeline_spark.plans import analytics as _an

        stats: dict[str, int] = {}
        for name in _an.SF_GROWING_DIMS:
            if name == "dim_patients":
                stats[name] = sinks.read_versioned(
                    spark, os.path.join(staging_dir, name)
                ).count()
            elif name in out:
                stats[name] = spark.read.parquet(
                    os.path.join(staging_dir, name)
                ).count()
        out[_an.STAR_STATS_KEY] = stats  # type: ignore[assignment]
    return out
