"""Aggregation layer (reference src/models/facts.py:347-412).

agg_country_day: the reference's explicit pre-aggregation "for
performance" — its whole performance strategy (SURVEY.md §4) — here
one shuffle on the 8 grouping keys with map-side partial aggregation.
Money sums use integer-cents arithmetic (exact at any partition
count); EUR is 4-dp exact by construction (facts.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from duckdb_retail_pipeline_spark.functions.aggregates import count_distinct_if


def _money_sum(col: F.Column, dp: int) -> F.Column:
    # the ONE exact-cents convention, from queries.base — a local
    # copy had already been byte-identical; importing lazily keeps
    # the pipeline layer import-order-independent of the query
    # registry (queries/__init__ imports every query module)
    from duckdb_retail_pipeline_spark.queries.base import money_sum

    return money_sum(col, dp)


def build_agg_country_day(
    fct_sales_eur: DataFrame,
    dim_customer: DataFrame,
    dim_calendar: DataFrame,
) -> DataFrame:
    """agg_country_day(date, country, orders, items, net_qty,
    net_revenue_gbp, net_revenue_eur, is_weekend, is_uk_holiday,
    iso_week, iso_year, month, year) — reference facts.py:366-412.

    orders excludes 'C'-prefixed cancellations via conditional
    count-distinct (A5); calendar context comes from broadcast dim
    joins (J8).

    The calendar attributes are functionally dependent on ``date``
    (one calendar row per spine day), so the join happens AFTER the
    aggregation: the shuffle carries 2 grouping keys per fact row
    instead of 8, and the broadcast calendar lands on the few-K
    aggregated rows. Equivalent result, ~4× narrower shuffle — the
    plan that survives a 100 TB fact table."""
    base = fct_sales_eur.join(F.broadcast(dim_customer), "customer_id", "inner")
    agg = base.groupBy("date", "country").agg(
        count_distinct_if(
            ~F.col("invoice_no").like("C%"), F.col("invoice_no")
        ).alias("orders"),
        F.count(F.lit(1)).alias("items"),
        F.sum("qty").cast("bigint").alias("net_qty"),
        _money_sum(F.col("gross_amount_gbp"), 2).alias("net_revenue_gbp"),
        _money_sum(F.col("gross_amount_eur"), 4).alias("net_revenue_eur"),
    )
    return agg.join(F.broadcast(dim_calendar), "date", "inner").select(
        "date",
        "country",
        "orders",
        "items",
        "net_qty",
        "net_revenue_gbp",
        "net_revenue_eur",
        "is_weekend",
        "is_uk_holiday",
        "iso_week",
        "iso_year",
        "month",
        "year",
    )
