from duckdb_retail_pipeline_spark.streaming import events  # noqa: F401
