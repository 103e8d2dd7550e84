from healthcare_rcm_etl_pipeline_spark.operators import (  # noqa: F401
    asof,
    dedup,
    keys,
    multimodal,
    quality,
    scd2,
    similarity,
    skew,
)
