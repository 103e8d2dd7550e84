"""healthcare_rcm_etl_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference repo ``durgaprasadraju52/Healthcare-RCM-ETL-Pipeline``
(surveyed in SURVEY.md): multi-source extraction + schema reconciliation,
cleansing/enrichment scalar functions, deterministic surrogate keys, star
schema dimensional modeling, SCD Type 2, data-quality checks, the Q1-Q11
analytical query surface — plus large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing, event
windows/sessionization).

Design: DataFrame/SQL first, no RDDs in the hot path, no row-at-a-time
Python UDFs; every operator is a function DataFrame -> DataFrame so Catalyst
sees the whole plan (pushdown, pruning, broadcast, whole-stage codegen, AQE).
"""

__version__ = "0.1.0"
