"""View layer (reference sql/views/monthly_sales_summary.sql).

The monthly sales summary over agg_country_day — time + geography
grouping with trading-day and order-value ratios. Exposed both as a
DataFrame builder and as a session view (``create_view``), matching
the reference's CREATE OR REPLACE VIEW surface (S6)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_monthly_sales_summary(agg_country_day: DataFrame) -> DataFrame:
    """v_monthly_sales_summary (reference
    sql/views/monthly_sales_summary.sql:5-39): monthly rollup of the
    daily pre-aggregation, returns-only days excluded, NULLIF-guarded
    ratios. Ratio divisions happen once on exact inputs (cents-exact
    revenue, integer counts) so results are engine-stable without
    ROUND."""
    d = F.col("date")
    filtered = agg_country_day.filter(F.col("net_revenue_gbp") > 0)
    grouped = filtered.groupBy(
        # re-derived from date on purpose, though agg_country_day
        # carries year/month: the builder accepts any (date, country,
        # measures) frame (tests feed minimal ones), and the carried
        # columns are year(date)/month(date) by construction anyway
        F.year(d).cast("bigint").alias("year"),
        F.month(d).cast("bigint").alias("month"),
        F.date_trunc("month", d).cast("date").alias("month_start_date"),
        "country",
    ).agg(
        F.count_distinct("date").alias("trading_days"),
        F.sum("orders").cast("bigint").alias("total_orders"),
        F.sum("items").cast("bigint").alias("total_items"),
        F.sum("net_qty").cast("bigint").alias("total_quantity"),
        (F.sum(F.round(F.col("net_revenue_gbp") * 100, 0).cast("bigint")) / F.lit(100.0)).alias(
            "total_revenue_gbp"
        ),
        (F.sum(F.round(F.col("net_revenue_eur") * 10000, 0).cast("bigint")) / F.lit(10000.0)).alias(
            "total_revenue_eur"
        ),
    )
    return grouped.select(
        "year",
        "month",
        "month_start_date",
        "country",
        "trading_days",
        "total_orders",
        "total_items",
        "total_quantity",
        "total_revenue_gbp",
        "total_revenue_eur",
        (
            F.col("total_revenue_gbp")
            / F.nullif(F.col("trading_days"), F.lit(0)).cast("double")
        ).alias("avg_daily_revenue_gbp"),
        (
            F.col("total_orders").cast("double")
            / F.nullif(F.col("trading_days"), F.lit(0)).cast("double")
        ).alias("avg_daily_orders"),
        (
            F.col("total_revenue_gbp")
            / F.nullif(F.col("total_orders"), F.lit(0)).cast("double")
        ).alias("avg_order_value_gbp"),
    )


def create_view(
    spark: SparkSession, agg_country_day: DataFrame, name: str = "v_monthly_sales_summary"
) -> None:
    """Register as a session temp view — the Spark analogue of the
    reference's CREATE OR REPLACE VIEW executed from a .sql file
    (analysis/analyze_monthly_sales.py:32-38)."""
    build_monthly_sales_summary(agg_country_day).createOrReplaceTempView(name)
