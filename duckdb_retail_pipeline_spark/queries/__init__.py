"""Named query registry — the driver-contract surface.

Every implemented operator from SURVEY.md §2 (plus the extension
surface) is registered here as a QuerySpec: a Spark callable
``(spark, sf_dir) -> DataFrame`` twinned with the ANSI-SQL string a
DuckDB oracle runs on the same parquet tables. ``__spark_entry__``
re-exports this registry.
"""

from __future__ import annotations

from duckdb_retail_pipeline_spark.queries.base import REGISTRY, QuerySpec, register

# importing the modules populates REGISTRY via their register() calls
from duckdb_retail_pipeline_spark.queries import advanced  # noqa: E402,F401
from duckdb_retail_pipeline_spark.queries import core  # noqa: E402,F401
from duckdb_retail_pipeline_spark.queries import retail  # noqa: E402,F401
from duckdb_retail_pipeline_spark.queries import extensions  # noqa: E402,F401

__all__ = ["REGISTRY", "QuerySpec", "register"]
