"""Validation layer: the reference's seven inline checks as
first-class operators (SURVEY.md §5 — the reference only LOGS
warnings; here each check returns a violation count that tests
assert to be zero).

Checks (reference citations):
1. calendar continuity / gaps        (dimensions.py:129-143, W2)
2. orphan facts vs dim_calendar      (facts.py:114-150, J5)
3. orphan facts vs dim_product
4. orphan facts vs dim_customer
5. FX coverage of sales dates        (facts.py:210-221, J6)
6. NULL EUR conversions              (facts.py:332-344)
7. quality: no negative orders/items; GBP ≈ EUR×0.8654 ±10%
                                     (facts.py:523-555)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from duckdb_retail_pipeline_spark.operators.windows import gaps


def _count(name: str, df: DataFrame) -> DataFrame:
    return df.agg(F.count(F.lit(1)).alias("violations")).select(
        F.lit(name).alias("check_name"), "violations"
    )


def validation_checks(
    dim_calendar: DataFrame,
    dim_product: DataFrame,
    dim_customer: DataFrame,
    fct_sales: DataFrame,
    daily_fx_rates: DataFrame,
    fct_sales_eur: DataFrame,
    agg_country_day: DataFrame,
) -> DataFrame:
    """UNION ALL of labeled violation counts — all must be zero on a
    healthy build."""
    checks = [
        _count("calendar_gaps", gaps(dim_calendar, "date")),
        _count(
            "orphan_vs_calendar",
            fct_sales.join(dim_calendar, "date", "left_anti"),
        ),
        _count(
            "orphan_vs_product",
            fct_sales.join(dim_product, "stock_code", "left_anti"),
        ),
        _count(
            "orphan_vs_customer",
            fct_sales.join(dim_customer, "customer_id", "left_anti"),
        ),
        _count(
            "fx_uncovered_dates",
            fct_sales.select("date").distinct().join(
                daily_fx_rates, "date", "left_anti"
            ),
        ),
        _count(
            "null_eur_conversion",
            fct_sales_eur.filter(
                F.col("unit_price_eur").isNull()
                | F.col("gross_amount_eur").isNull()
            ),
        ),
        _count(
            "negative_orders_or_items",
            agg_country_day.filter((F.col("orders") < 0) | (F.col("items") < 0)),
        ),
        _count(
            "fx_sanity_ratio",
            # |net_gbp − net_eur×0.8654| / |net_gbp| must stay ≤10%
            # (reference facts.py:544's constant); guard zero-revenue rows.
            agg_country_day.filter(
                (F.col("net_revenue_gbp") != 0)
                & (
                    F.abs(
                        F.col("net_revenue_gbp")
                        - F.col("net_revenue_eur") * F.lit(0.8654)
                    )
                    / F.abs(F.col("net_revenue_gbp"))
                    > 0.1
                )
            ),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out
