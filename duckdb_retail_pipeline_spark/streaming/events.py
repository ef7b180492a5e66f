"""Structured Streaming surface over the events table.

The reference is pure batch (SURVEY.md §2.10) — this is the engine's
from-scratch streaming extension: windowed aggregation with
watermarks, session windows, and a stateful custom operator, all on
``readStream``. Batch twins of these queries live in
queries/extensions.py so the streaming results are oracle-checkable
(bounded input ⇒ streaming complete-mode output ≡ batch result).

At scale the source would be Kafka; the parquet directory source
used here exercises the identical logical plan — only the source
exchange differs.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming read of the events parquet (schema pinned from a
    batch probe — streaming sources need explicit schemas). Event
    time is normalized through the same catalog.normalize_event_ts
    used by the batch path, so ``ts`` is always TIMESTAMP (LTZ) —
    a watermark on TIMESTAMP_NTZ is an AnalysisException."""
    from ..catalog import ensure_session_conventions, normalize_event_ts

    # the NTZ->LTZ normalization below interprets naive event time in
    # the session timezone — enforce the pinned-UTC convention here
    # too (batch loads get it via load_table; a stream read might be
    # the session's first touch)
    ensure_session_conventions(spark)
    path = os.path.join(sf_dir, "events.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    # the streaming file source wants a directory: stream the sf dir
    # with a glob pinned to the events file
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return normalize_event_ts(stream)


def hourly_event_counts(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour windows with a 10-minute watermark: count and
    2-dp-exact value sum per (window, event_type)."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.round(F.col("value") * 100, 0).cast("bigint")) / F.lit(100.0)).alias(
                "total_value"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_event_counts(events: DataFrame) -> DataFrame:
    """Sliding windows (1 hour, every 15 minutes) — each event lands
    in 4 windows."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def session_windows(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Built-in session windows per user: a session closes after
    ``gap`` of inactivity."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def run_stream_to_memory(
    agg: DataFrame,
    spark: SparkSession,
    output_mode: str = "complete",
    timeout_s: int = 120,
) -> DataFrame:
    """Drive a (bounded) streaming aggregation to completion with an
    availableNow trigger into a memory sink; returns the final table.
    complete-mode emits every window, so on bounded input the result
    equals the batch aggregation — the oracle-comparison trick."""
    name = f"stream_out_{uuid.uuid4().hex[:10]}"
    ckpt = os.path.join(tempfile.gettempdir(), f"ckpt_{name}")
    q = (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(timeout_s)
    if not finished:
        # a silently-partial memory table would surface later as a
        # confusing oracle mismatch; fail loudly at the source
        q.stop()
        raise TimeoutError(
            f"streaming query {name!r} did not finish within {timeout_s}s"
        )
    return spark.table(name)


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming read of the documents parquet (schema pinned from a
    batch probe, same shape as read_events_stream)."""
    path = os.path.join(sf_dir, "documents.parquet")
    schema = spark.read.parquet(path).schema
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def streaming_exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Streaming ingestion dedup: canonical fingerprint + stateful
    ``dropDuplicates`` — Spark keeps the set of seen keys as
    streaming state, so each fingerprint is emitted exactly once
    across all micro-batches (the shape of a training-corpus
    ingestion pipeline that must never admit a duplicate document).

    Emits only the fingerprint: WHICH physical duplicate survives is
    an arrival-order artifact, the fingerprint set itself is
    deterministic. Unbounded state by design here (bounded input);
    a production stream would add ``withWatermark`` +
    ``dropDuplicatesWithinWatermark`` to cap state."""
    from ..functions import text as T

    return docs.select(T.fingerprint(text_col).alias("fp")).dropDuplicates(["fp"])


def stateful_user_running_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user running event count + value
    total via applyInPandasWithState — the escape hatch for stateful
    semantics the built-in windows can't express (reference has no
    streaming surface; this is the engine's extension).

    State carries integer CENTS (the money_sum convention): a double
    accumulator's value would depend on the order rows reach the
    state update (not deterministic under shuffle), while integer
    sums are associative — so the emitted totals are bit-exact
    against a batch/DuckDB oracle at any partitioning."""
    import pandas as pd  # noqa: PLC0415 — worker-side import
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id bigint, n_events bigint, total_value double"
    state_schema = "n bigint, cents bigint"

    def update(key, pdf_iter, state: GroupState):
        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdf_iter:
            n += len(pdf)
            cents += int((pdf["value"] * 100).round().astype("int64").sum())
        state.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [cents / 100.0]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_upsert_daily_totals(
    spark: SparkSession,
    sf_dir: str,
    dest_path: str,
    timeout_s: int = 120,
    max_files_per_trigger: int | None = None,
    glob: str = "events.parquet",
    checkpoint: str | None = None,
) -> DataFrame:
    """foreachBatch incremental sink — the lakehouse-style streaming
    MERGE, written the way it survives FAILURE REPLAY: foreachBatch
    delivers batches at-least-once, so an additive read-modify-write
    would double-count a replayed batch. Instead each micro-batch
    OVERWRITES its own ``batch=<id>/`` partition with its (day,
    event_type) partial aggregate — a replay overwrites the same
    path with the same bytes (idempotent), and the final result
    re-aggregates the associative integer partials across batch
    partitions. No driver round-trip, no read-modify-write race;
    the partial write is fully distributed. The final merged table
    is bit-identical to the single-pass batch aggregate at any
    batch boundaries AND under replay (pinned by the restart test in
    tests/test_streaming.py). At scale the per-batch partition write
    becomes a Delta/Iceberg transactional append keyed by batchId —
    identical plumbing, transactional rename instead of overwrite.

    Pass ``checkpoint`` to resume a previous run's offsets (the
    restart-recovery path); by default each call gets a fresh
    checkpoint dir.
    """
    # Hadoop path resolution glob-interprets load paths, so a
    # dest_path containing glob metacharacters cannot be re-read
    # safely after the write (PATH_NOT_FOUND, or silently reading a
    # SIBLING directory that matches the character class — r6 review,
    # reproduced). Fail fast before any work instead of writing a
    # sink that cannot be read back.
    if any(ch in dest_path for ch in "*?[]{}"):
        raise ValueError(
            f"dest_path {dest_path!r} contains glob metacharacters; "
            "Hadoop path resolution cannot address it unambiguously"
        )

    reader = spark.readStream.schema(
        spark.read.option("pathGlobFilter", glob).parquet(sf_dir).schema
    ).option("pathGlobFilter", glob)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    from ..catalog import normalize_event_ts

    stream = normalize_event_ts(reader.parquet(sf_dir))

    def write_partial(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.select(
                F.to_date("ts").alias("day"),
                "event_type",
                F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
            )
            .groupBy("day", "event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("pn"),
                F.sum("cents").cast("bigint").alias("pc"),
            )
            .write.mode("overwrite")
            .parquet(os.path.join(dest_path, f"batch={batch_id}"))
        )

    name = f"upsert_{uuid.uuid4().hex[:10]}"
    ckpt = checkpoint or os.path.join(tempfile.gettempdir(), f"ckpt_{name}")
    q = (
        stream.writeStream.foreachBatch(write_partial)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(f"streaming upsert {name!r} did not finish in {timeout_s}s")
    # an empty/globless source commits zero micro-batches, so no
    # batch=* partition exists — return an empty frame with the
    # output schema. The probe is the parquet read itself (catch
    # PATH_NOT_FOUND), NOT a driver-local glob.glob: on hdfs://s3a://
    # dest paths — the at-scale deployment — a local glob always
    # returns [] and would silently report an empty sink even though
    # the stream committed data (r6 ADVICE, medium).
    from pyspark.errors import AnalysisException

    try:
        committed = spark.read.option("basePath", dest_path).parquet(
            os.path.join(dest_path, "batch=*")
        )
    except AnalysisException as e:
        klass = e.getErrorClass() if hasattr(e, "getErrorClass") else None
        if "PATH_NOT_FOUND" not in (klass or str(e)):
            raise
        return spark.createDataFrame(
            [], "day date, event_type string, n_events bigint, total_value double"
        )
    return (
        committed.groupBy("day", "event_type")
        .agg(
            F.sum("pn").cast("bigint").alias("n_events"),
            (F.sum("pc") / F.lit(100.0)).alias("total_value"),
        )
    )
