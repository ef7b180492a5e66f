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
    Cost shape: TWO exchanges — the groupBy hashes on (group_cols +
    value_col) and the window repartitions on group_cols alone
    (hashpartitioning on the wider key does NOT satisfy the window's
    requirement), but the second exchange moves only the already-
    counted (group, value, cnt) rows, a cardinality ≤ distinct
    pairs, not the input."""
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


# A9's NULL-safe ratios (reference sql/views/monthly_sales_summary
# .sql:26-28) are implemented INLINE at their call sites (q12,
# pipeline/views.py) as `num / F.nullif(den, 0)` on exact inputs —
# deliberately without a shared ROUND-ing helper: base.py's
# conventions forbid F.round on compared float columns (round-half
# ties diverge across engines; use dround), so a `nullif_div(...,
# scale)` helper would be a trap. Two such helpers (nullif_div,
# sum_if) sat here unused; deleted rather than left as dead weight.
