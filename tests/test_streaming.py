from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_retail_pipeline_spark.streaming import events as SE


def test_sliding_windows_complete_mode(spark, sf_dir):
    stream = SE.read_events_stream(spark, sf_dir)
    agg = SE.sliding_event_counts(stream)
    out = SE.run_stream_to_memory(agg, spark, output_mode="complete")
    rows = out.collect()
    assert len(rows) > 0
    # sliding 1h/15min: every event lands in 4 windows
    total_batch = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert sum(r["n_events"] for r in rows) == 4 * total_batch


def test_streaming_session_windows(spark, sf_dir):
    stream = SE.read_events_stream(spark, sf_dir)
    agg = SE.session_windows(stream, gap="30 minutes")
    out = SE.run_stream_to_memory(agg, spark, output_mode="complete")
    rows = out.collect()
    assert len(rows) > 0
    assert all(r["session_end"] >= r["session_start"] for r in rows)


def test_stateful_running_totals(spark, sf_dir):
    stream = SE.read_events_stream(spark, sf_dir)
    out_stream = SE.stateful_user_running_totals(stream)
    out = SE.run_stream_to_memory(out_stream, spark, output_mode="update")
    rows = out.collect()
    assert len(rows) > 0
    # final state per user equals the batch per-user counts
    from duckdb_retail_pipeline_spark.catalog import load_events

    batch = (
        load_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    expected = {r["user_id"]: r["n"] for r in batch}
    got = {}
    for r in rows:  # update mode may emit per-batch rows; last wins
        got[r["user_id"]] = r["n_events"]
    assert got == expected
