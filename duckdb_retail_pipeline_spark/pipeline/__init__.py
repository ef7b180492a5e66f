"""The retail star-schema pipeline, re-expressed Spark-first.

Mirrors the reference's four phases (reference src/run.py:50-87):
ingest (staging) → dimensions → facts → aggregation, plus the view
and validation layers. Each builder is a pure DataFrame→DataFrame
function so the whole pipeline is one declarative DAG; ``run``
materializes each layer as parquet (the Spark analogue of the
reference's DROP+CTAS layering, SURVEY.md §4).
"""

from duckdb_retail_pipeline_spark.pipeline import (  # noqa: F401
    aggregates,
    analysis,
    dimensions,
    facts,
    run,
    staging,
    validate,
    views,
)
