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


def test_layer_fill_is_dependency_pruned(spark, sf_dir):
    """r14 guide-§5 optimization pin: build_layers' mapping fills
    lazily per layer — accessing dim_calendar must not construct
    fct/eur/agg/validation plans (the eager dict billed ~1.5 s of
    downstream py4j plan construction to a pl03-only caller), and
    repeat access returns the SAME handle (shared .cache() entries,
    as before). Built on a tmp COPY of the dataset so unpersisting
    the test's cache entries cannot drop plan-canonical-equal
    entries shared with the session-memoized DAG other tests use."""
    import shutil

    from duckdb_retail_pipeline_spark.pipeline.run import LAYER_ORDER, _LayerDAG

    with tempfile.TemporaryDirectory() as tmp:
        data = os.path.join(tmp, "data")
        shutil.copytree(sf_dir, data)
        dag = _LayerDAG(spark, data)
        assert set(dag) == set()  # nothing built up front
        cal = dag["dim_calendar"]
        # only the ancestor chain (staging fills all three raw keys)
        assert set(dag) == {
            "raw_retail_data",
            "raw_fx_rates",
            "raw_uk_holidays",
            "dim_calendar",
        }
        assert dag["dim_calendar"] is cal  # same handle on repeat
        assert cal.count() > 0  # and it executes
        # every declared layer is reachable and the filled key set
        # is exactly the layer order — no layer lost in the rewrite
        for name in LAYER_ORDER:
            assert dag[name] is not None
        assert set(dag) == set(LAYER_ORDER)
        for df in dag.values():
            df.unpersist()
