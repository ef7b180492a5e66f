from duckdb_retail_pipeline_spark.plans import explain  # noqa: F401
