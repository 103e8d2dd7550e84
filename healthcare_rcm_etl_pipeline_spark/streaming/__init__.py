from healthcare_rcm_etl_pipeline_spark.streaming import events  # noqa: F401
