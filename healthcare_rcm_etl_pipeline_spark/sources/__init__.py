from healthcare_rcm_etl_pipeline_spark.sources import readers, schemas, sinks  # noqa: F401
