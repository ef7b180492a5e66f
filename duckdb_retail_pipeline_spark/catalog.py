"""Testdata catalog: load the driver's parquet tables and register views.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file per table
under /root/testdata/sf{0.001,0.01,0.1}/.

At 100 TB these would be directory-per-table, partitioned (facts by
date) — `load_table` takes any path Spark can read, so the same code
path serves both. Reads are plain `spark.read.parquet`: Catalyst
handles column pruning + predicate pushdown into the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Fixed-cardinality tables (5 regions / 25 nations at ANY scale
# factor): always safe to broadcast. Everything else — including
# customer/part/supplier — scales with SF (the r2 lesson that removed
# the static broadcast hints: at 100 TB those are multi-TB tables),
# so broadcast decisions for them belong to AQE's runtime sizing, not
# a static list.
FIXED_SIZE_TABLES = ("region", "nation")

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def ensure_session_conventions(spark: SparkSession) -> None:
    """Idempotent session guard applied on every table load: the
    driver may hand us a session it built itself, and date/timestamp
    semantics (and therefore the DuckDB oracle comparison) require
    the UTC session timezone.

    ``nanosAsLong`` is part of the same contract and set HERE, not
    ad-hoc at the first events read: it changes the schema every
    later parquet read infers for TIMESTAMP(NANOS) columns, so
    setting it lazily made a session's schemas depend on whether
    events happened to load first. Under the contract it is ALWAYS
    on — every nanos column in this engine reads as bigint and goes
    through normalize_event_ts (exact ns→µs integer division)."""
    try:
        if spark.conf.get("spark.sql.session.timeZone") != "UTC":
            spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:  # noqa: BLE001 — never fail a read over a conf probe
        pass


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_session_conventions(spark)
    if name == "events":
        return load_events(spark, sf_dir)
    return _table_memo(spark, sf_dir, name, lambda: spark.read.parquet(table_path(sf_dir, name)))


def _table_memo(spark, sf_dir, tag, build):
    """Session-scoped relation memo for base-table reads. A bare
    ``spark.read.parquet`` costs ~90 ms of driver work PER CALL
    (footer/schema read + file listing + py4j) — measured r13: the
    headline bench spent ~1.9 s of its ~11 s warm total re-reading
    footers for tables whose files had not changed, and q21 alone
    paid 4 reads x 90 ms per pass. Memoizing the DataFrame HANDLE
    per (session, dataset, table) removes that driver-side re-read
    while keeping every action on the frame a full computation from
    the parquet inputs — the same plan-level (never result-level)
    memo the pipeline layer has used since r6 (run.py build_layers),
    applied one layer down. dataset_memo's per-file mtime signature
    re-validates on every call, so an in-session regeneration of the
    dataset still rebuilds instead of serving a stale file index —
    the exact staleness contract load_table already relied on
    build_layers for. At 100 TB the equivalent driver cost is the
    partitioned-table file listing (guide §6), which this memo
    likewise pays once per session instead of once per query."""
    from duckdb_retail_pipeline_spark.memo import dataset_memo

    return dataset_memo(spark, sf_dir, f"table:{tag}", build)


def normalize_event_ts(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Normalize an event-time column to TIMESTAMP (LTZ) from any of
    the source layouts the testdata has shipped over time:

    - ``bigint``: parquet TIMESTAMP(NANOS) read as raw longs via
      spark.sql.legacy.parquet.nanosAsLong — integer-divide to µs
      (``DIV 1000`` stays exact where double division would lose
      precision above 2^53; matches DuckDB's truncating ns→µs cast).
    - ``timestamp_ntz``: parquet TIMESTAMP(µs, isAdjustedToUTC=false)
      — cast to TIMESTAMP, which interprets the naive value in the
      session timezone. Exact under the pinned-UTC session
      (session.py / ensure_session_conventions), matching the
      oracle's epoch() semantics on the same naive values.
    - ``timestamp``: already LTZ — no-op.

    The single normalization point for batch load, streaming read,
    and any operator that needs watermark-able event time (Spark
    requires TIMESTAMP, not NTZ, for ``withWatermark``).
    """
    from pyspark.sql import functions as F

    ts_type = df.schema[ts_col].dataType.simpleString()
    if ts_type == "bigint":
        return df.withColumn(ts_col, F.timestamp_micros(F.expr(f"`{ts_col}` DIV 1000")))
    if ts_type == "timestamp_ntz":
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with a usable TIMESTAMP (LTZ) ``ts`` regardless of the
    parquet layout — see normalize_event_ts. Direct callers exist
    (x31's batch twin), so the conventions guard runs here too, not
    only via load_table."""
    ensure_session_conventions(spark)
    return _table_memo(
        spark,
        sf_dir,
        "events:normalized",
        lambda: normalize_event_ts(spark.read.parquet(table_path(sf_dir, "events"))),
    )


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view so Spark SQL text (CTEs,
    scalar subqueries, views) can reference them by name."""
    dfs = load_all(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
