"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``duckdb_retail_pipeline_spark.queries`` — this
module just re-exports the registry in the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from duckdb_retail_pipeline_spark.queries import REGISTRY  # noqa: E402
from duckdb_retail_pipeline_spark.session import tune_for_session  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (monthly revenue by nation — scan → broadcast
    star join → expression groupBy → agg) on /root/testdata/sf0.001."""
    tune_for_session(spark)
    return REGISTRY["q02_monthly_revenue_by_nation"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted for
    non-SQL-expressible ops → driver records a rows-only check)."""
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
