from healthcare_rcm_etl_pipeline_spark.cli import main

raise SystemExit(main())
