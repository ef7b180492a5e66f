"""Aggregate helpers.

``mode`` tie-breaking differs between engines (SURVEY.md §4), so the
engine pins a deterministic rule once: highest count wins, ties break
on the smallest value. ``deterministic_mode`` implements it with a
count + row_number window — identical results on Spark and any
ANSI-SQL oracle, at any partition count.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def deterministic_mode(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Per-group MODE with a pinned (count DESC, value ASC) tie-break.

    Spark 3.4+ has ``F.mode`` but its tie-break is arbitrary-pick,
    like DuckDB's ``MODE()`` — unusable for differential testing.
    This is two shuffles on the same keys (groupBy then window), and
    both shuffle on ``group_cols`` so the second reuses the first's
    partitioning — no extra exchange at scale.
    """
    out_col = out_col or value_col
    counted = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols, value_col)
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("__cnt").desc(), F.col(value_col).asc()
    )
    return (
        counted.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(*group_cols, F.col(value_col).alias(out_col))
    )


def count_distinct_if(cond: Column, value: Column) -> Column:
    """Conditional COUNT(DISTINCT ...) — reference's cancellation-
    excluding order count (src/models/facts.py:375-378):
    ``COUNT(DISTINCT CASE WHEN cond THEN value END)``."""
    return F.count_distinct(F.when(cond, value))


def nullif_div(num: Column, den: Column, scale: int | None = 2) -> Column:
    """NULL-safe ratio: ``ROUND(num / NULLIF(den, 0), scale)``
    (reference sql/views/monthly_sales_summary.sql:26-28)."""
    out = num / F.nullif(den, F.lit(0))
    return F.round(out, scale) if scale is not None else out


def sum_if(cond: Column, value: Column, otherwise=0) -> Column:
    """``SUM(CASE WHEN cond THEN value ELSE otherwise END)``
    (reference src/models/facts.py:75-77)."""
    return F.sum(F.when(cond, value).otherwise(F.lit(otherwise)))
