from healthcare_rcm_etl_pipeline_spark.plans import model, pipeline, queries, standardize  # noqa: F401
