"""Pipeline orchestration (reference src/run.py:50-87).

Two modes:

- ``build_layers``: the whole pipeline as one lazy DAG of DataFrames
  (staging → dims → facts → agg → view) — what the query registry
  uses; Catalyst sees every layer at once and optimizes across them.
- ``run_pipeline``: materialized mode — each layer written to a
  parquet warehouse dir (the Spark analogue of the reference's
  DROP+CTAS layering), facts **partitioned by month** so downstream
  date-range queries prune partitions; this is the 100 TB layout.
  ``--rebuild`` maps to mode("overwrite") (reference src/run.py:41-42).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_retail_pipeline_spark.pipeline import staging
from duckdb_retail_pipeline_spark.pipeline.aggregates import build_agg_country_day
from duckdb_retail_pipeline_spark.pipeline.dimensions import (
    build_dim_calendar,
    build_dim_customer,
    build_dim_product,
)
from duckdb_retail_pipeline_spark.pipeline.facts import (
    build_daily_fx_rates,
    build_fct_sales,
    build_fct_sales_eur,
)
from duckdb_retail_pipeline_spark.pipeline.validate import validation_checks
from duckdb_retail_pipeline_spark.pipeline.views import build_monthly_sales_summary

LAYER_ORDER = (
    "raw_retail_data",
    "raw_fx_rates",
    "raw_uk_holidays",
    "dim_calendar",
    "dim_product",
    "dim_customer",
    "fct_sales",
    "daily_fx_rates",
    "fct_sales_eur",
    "agg_country_day",
    "v_monthly_sales_summary",
    "validation",
)

# One layer DAG per (session, dataset). Without this, every caller
# that asks for a layer rebuilds the whole upstream chain: a fresh
# spark.read.parquet produces a plan that does NOT canonicalize equal
# to the one already cached (file-index identity), so the .cache()
# calls below would register duplicate entries and recompute instead
# of hitting memory. Memoizing the DataFrames themselves is the
# engine analogue of the reference's persistent staging tables.
# memo.dataset_memo handles keying, mtime invalidation, and
# unpersisting superseded entries (shared with the dedup family).


def build_layers(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Phase 1-4 of the reference pipeline as one declarative DAG,
    memoized per (session, sf_dir)."""
    from duckdb_retail_pipeline_spark.memo import dataset_memo

    return dataset_memo(
        spark, sf_dir, "build_layers", lambda: _build_layers_uncached(spark, sf_dir)
    )


def _build_layers_uncached(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    raw = staging.load_staging(spark, sf_dir)
    # staging feeds four consumers (calendar bounds, both mode dims,
    # fct_sales) — cache it so the 5-way source join runs once per
    # build instead of per consumer
    raw["raw_retail_data"] = raw["raw_retail_data"].cache()
    # cached like the other dims: calendar feeds fct_sales, the agg
    # layer, and two validation checks — uncached, each action on
    # those replays its bounds aggregation + spine explode
    dim_calendar = build_dim_calendar(
        raw["raw_retail_data"], raw["raw_uk_holidays"]
    ).cache()
    # dims feed both fct_sales and the aggregation layer; fct_sales
    # feeds fx/eur/agg — cache each so every downstream layer reads
    # the computed result instead of replaying the mode windows and
    # the three-way join (cache keys on the canonicalized plan, so
    # repeated build_layers calls in one session share them)
    dim_product = build_dim_product(raw["raw_retail_data"]).cache()
    dim_customer = build_dim_customer(raw["raw_retail_data"]).cache()
    fct_sales = build_fct_sales(
        raw["raw_retail_data"], dim_calendar, dim_product, dim_customer
    ).cache()
    daily_fx = build_daily_fx_rates(raw["raw_fx_rates"], fct_sales)
    # eur facts feed the aggregation, the view chain and validation
    fct_sales_eur = build_fct_sales_eur(fct_sales, daily_fx).cache()
    # the agg layer feeds three consumers (the pl09 query surface,
    # the monthly view, and validation) and is the reference's
    # explicitly MATERIALIZED pre-aggregation table (facts.py:
    # 347-412) — uncached it was the only layer whose every action
    # replayed the full fact-table aggregation (bench r13: pl09 warm
    # ~0.97 s vs 0.05-0.12 s for the cached layers; the cold pass
    # still times the build). Few-K rows (date × country), so the
    # cache is dimension-sized.
    agg_country_day = build_agg_country_day(
        fct_sales_eur, dim_customer, dim_calendar
    ).cache()
    return {
        **raw,
        "dim_calendar": dim_calendar,
        "dim_product": dim_product,
        "dim_customer": dim_customer,
        "fct_sales": fct_sales,
        "daily_fx_rates": daily_fx,
        "fct_sales_eur": fct_sales_eur,
        "agg_country_day": agg_country_day,
        "v_monthly_sales_summary": build_monthly_sales_summary(agg_country_day),
        "validation": validation_checks(
            dim_calendar,
            dim_product,
            dim_customer,
            fct_sales,
            daily_fx,
            fct_sales_eur,
            agg_country_day,
        ),
    }


def run_pipeline(
    spark: SparkSession,
    sf_dir: str,
    warehouse_dir: str,
    rebuild: bool = True,
) -> dict[str, str]:
    """Materialize every layer to parquet, each layer reading the
    PREVIOUS layer's parquet (not its lazy plan) — same dataflow as
    the reference's sequential CTAS phases, and at scale the right
    call: each phase's shuffle output is persisted once and every
    consumer scans columnar files with pushdown."""
    mode = "overwrite" if rebuild else "errorifexists"
    paths: dict[str, str] = {}

    def write(name: str, df: DataFrame, partition_by: list[str] | None = None) -> DataFrame:
        path = os.path.join(warehouse_dir, name)
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)
        paths[name] = path
        return spark.read.parquet(path)

    raw = staging.load_staging(spark, sf_dir)
    raw_retail = write("raw_retail_data", raw["raw_retail_data"])
    raw_fx = write("raw_fx_rates", raw["raw_fx_rates"])
    raw_hol = write("raw_uk_holidays", raw["raw_uk_holidays"])

    dim_calendar = write("dim_calendar", build_dim_calendar(raw_retail, raw_hol))
    dim_product = write("dim_product", build_dim_product(raw_retail))
    dim_customer = write("dim_customer", build_dim_customer(raw_retail))

    fct = build_fct_sales(raw_retail, dim_calendar, dim_product, dim_customer)
    # date-partitioned fact layout: month granularity keeps file
    # counts sane while letting date-range scans prune (100 TB note)
    fct = fct.withColumn("sales_month", F.date_format("date", "yyyy-MM"))
    fct_sales = write("fct_sales", fct, partition_by=["sales_month"]).drop(
        "sales_month"
    )

    daily_fx = write("daily_fx_rates", build_daily_fx_rates(raw_fx, fct_sales))
    eur = build_fct_sales_eur(fct_sales, daily_fx).withColumn(
        "sales_month", F.date_format("date", "yyyy-MM")
    )
    fct_sales_eur = write("fct_sales_eur", eur, partition_by=["sales_month"]).drop(
        "sales_month"
    )
    agg = write(
        "agg_country_day",
        build_agg_country_day(fct_sales_eur, dim_customer, dim_calendar),
    )
    write("v_monthly_sales_summary", build_monthly_sales_summary(agg))
    write(
        "validation",
        validation_checks(
            dim_calendar,
            dim_product,
            dim_customer,
            fct_sales,
            daily_fx,
            fct_sales_eur,
            agg,
        ),
    )
    return paths
