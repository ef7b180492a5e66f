from __future__ import annotations

import os
import tempfile

from duckdb_retail_pipeline_spark.pipeline.run import LAYER_ORDER, run_pipeline


def test_run_pipeline_materializes_and_validates(spark, sf_dir):
    with tempfile.TemporaryDirectory() as wh:
        paths = run_pipeline(spark, sf_dir, wh, rebuild=True)
        assert set(paths) == set(LAYER_ORDER)
        for name, path in paths.items():
            assert os.path.isdir(path), name

        # facts are month-partitioned (the 100 TB layout)
        fct_dirs = os.listdir(paths["fct_sales"])
        assert any(d.startswith("sales_month=") for d in fct_dirs)

        # every reference-ported validation check must be clean
        validation = spark.read.parquet(paths["validation"]).collect()
        assert len(validation) == 8
        bad = {r["check_name"]: r["violations"] for r in validation if r["violations"]}
        assert not bad, f"validation violations: {bad}"

        # golden-surface schema contract (FIXTURES.md §2)
        agg = spark.read.parquet(paths["agg_country_day"])
        assert set(agg.columns) == {
            "date", "country", "orders", "items", "net_qty",
            "net_revenue_gbp", "net_revenue_eur", "is_weekend",
            "is_uk_holiday", "iso_week", "iso_year", "month", "year",
        }
        view = spark.read.parquet(paths["v_monthly_sales_summary"])
        assert set(view.columns) == {
            "year", "month", "month_start_date", "country", "trading_days",
            "total_orders", "total_items", "total_quantity",
            "total_revenue_gbp", "total_revenue_eur",
            "avg_daily_revenue_gbp", "avg_daily_orders", "avg_order_value_gbp",
        }


def test_rebuild_false_refuses_overwrite(spark, sf_dir):
    import pytest

    with tempfile.TemporaryDirectory() as wh:
        run_pipeline(spark, sf_dir, wh, rebuild=True)
        with pytest.raises(Exception):  # noqa: B017 — AnalysisException: path exists
            run_pipeline(spark, sf_dir, wh, rebuild=False)
