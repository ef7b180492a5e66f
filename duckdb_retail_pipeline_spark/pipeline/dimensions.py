"""Dimension builders (reference src/models/dimensions.py).

Spark-first translations:
- dim_calendar: sequence/explode date spine + date-part functions +
  a left-join holiday flag — replacing the reference's
  ALTER TABLE + UPDATE (dimensions.py:79-94) with a re-derivation,
  since DataFrames are immutable (SURVEY.md §1.3).
- dim_product / dim_customer: groupBy + deterministic MODE (pinned
  (count DESC, value ASC) tie-break — SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from duckdb_retail_pipeline_spark.functions import datetime_fns as DT
from duckdb_retail_pipeline_spark.functions.aggregates import deterministic_mode

def _valid_stock() -> F.Column:
    """P3 cleaning predicate (reference src/models/dimensions.py:166-168,
    src/models/facts.py:51-53): NULL / empty / pandas-'nan' sentinels.
    (Built lazily — Column exprs need an active session.)"""
    return (
        F.col("stock_code").isNotNull()
        & (F.col("stock_code") != "")
        & (F.col("stock_code") != "nan")
    )


def build_dim_calendar(raw_retail: DataFrame, raw_holidays: DataFrame) -> DataFrame:
    """dim_calendar(date, is_weekend, iso_year, iso_week, month,
    year, day_of_week, day_name, month_name, is_uk_holiday) — dense
    daily spine from first-of-first-month to last-of-last-month of
    the sales range (reference dimensions.py:39-75), holiday flag via
    left join (replaces ALTER+UPDATE, dimensions.py:79-94)."""
    bounds = raw_retail.agg(
        F.trunc(F.min(F.to_date("invoice_ts")), "month").alias("lo"),
        F.last_day(F.max(F.to_date("invoice_ts"))).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("date")
    )
    holidays = raw_holidays.select("holiday_date").dropna().dropDuplicates()
    d = F.col("date")
    return (
        spine.join(
            F.broadcast(holidays), spine.date == holidays.holiday_date, "left"
        )
        .select(
            d,
            DT.is_weekend(d).alias("is_weekend"),
            DT.iso_year(d).cast("bigint").alias("iso_year"),
            DT.iso_week(d).cast("bigint").alias("iso_week"),
            F.month(d).cast("bigint").alias("month"),
            F.year(d).cast("bigint").alias("year"),
            DT.duck_dow(d).cast("bigint").alias("day_of_week"),
            DT.day_name(d).alias("day_name"),
            DT.month_name(d).alias("month_name"),
            F.col("holiday_date").isNotNull().alias("is_uk_holiday"),
        )
    )


def build_dim_product(raw_retail: DataFrame) -> DataFrame:
    """dim_product(stock_code, description, first_seen, last_seen)
    (reference dimensions.py:157-171): P3-cleaned, MODE(description)
    with pinned tie-break, min/max first/last seen dates."""
    clean = raw_retail.filter(_valid_stock())
    seen = clean.groupBy("stock_code").agg(
        F.min(F.to_date("invoice_ts")).alias("first_seen"),
        F.max(F.to_date("invoice_ts")).alias("last_seen"),
    )
    mode_desc = deterministic_mode(clean, ["stock_code"], "description")
    return seen.join(mode_desc, "stock_code", "left").select(
        "stock_code", "description", "first_seen", "last_seen"
    )


def build_dim_customer(raw_retail: DataFrame) -> DataFrame:
    """dim_customer(customer_id, country) (reference
    dimensions.py:203-214): -1 surrogate for NULL ids, 'UNKNOWN'
    country for the surrogate, else MODE(country)."""
    keyed = raw_retail.withColumn(
        "customer_id", F.coalesce(F.col("customer_id"), F.lit(-1.0))
    )
    mode_country = deterministic_mode(keyed, ["customer_id"], "country")
    return (
        keyed.select("customer_id")
        .distinct()
        .join(mode_country, "customer_id", "left")
        .select(
            "customer_id",
            F.when(F.col("customer_id") == -1, F.lit("UNKNOWN"))
            .otherwise(F.col("country"))
            .alias("country"),
        )
    )
