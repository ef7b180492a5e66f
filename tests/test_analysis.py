from __future__ import annotations

import pytest

from duckdb_retail_pipeline_spark.pipeline import analysis
from duckdb_retail_pipeline_spark.pipeline.run import build_layers


def test_analyze_end_to_end(spark, sf_dir):
    out = analysis.analyze(spark, sf_dir)
    assert out["total_revenue_gbp"] > 0
    assert out["n_countries"] >= 5
    assert out["best_month_revenue"] > 0
    # view registered as the reference's EP2 does
    assert spark.sql("SELECT COUNT(*) FROM v_monthly_sales_summary").first()[0] > 0


def test_insight_frames_shapes(spark, sf_dir):
    layers = build_layers(spark, sf_dir)
    pdf = analysis.monthly_summary_pdf(layers["agg_country_day"])
    frames = analysis.insight_frames(pdf)
    assert len(frames["top5_countries"]) <= 5
    assert frames["country_totals"]["revenue_gbp"].sum() == pytest.approx(
        pdf["total_revenue_gbp"].sum()
    )
    assert (frames["monthly_aov"] > 0).all()


def test_render_without_matplotlib_is_stubbed(spark, sf_dir):
    if analysis.HAS_MPL:
        pytest.skip("matplotlib installed")
    layers = build_layers(spark, sf_dir)
    pdf = analysis.monthly_summary_pdf(layers["agg_country_day"])
    with pytest.raises(NotImplementedError):
        analysis.render_dashboard(pdf, "/tmp/never_written.png")
