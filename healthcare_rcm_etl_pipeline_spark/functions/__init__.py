from healthcare_rcm_etl_pipeline_spark.functions import cleanse, text, vector  # noqa: F401
