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

# Dimension-sized tables: always broadcast-join candidates. Facts
# (orders/lineitem/events/documents/embeddings) scale with SF; dims
# stay small even at 100 TB.
DIM_TABLES = ("region", "nation", "customer", "supplier", "part")

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def ensure_session_conventions(spark: SparkSession) -> None:
    """Idempotent session guard applied on every table load: the
    driver may hand us a session it built itself, and date/timestamp
    semantics (and therefore the DuckDB oracle comparison) require
    the UTC session timezone."""
    try:
        if spark.conf.get("spark.sql.session.timeZone") != "UTC":
            spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:  # noqa: BLE001 — never fail a read over a conf probe
        pass


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_session_conventions(spark)
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(table_path(sf_dir, name))


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with a usable TimestampType ``ts``.

    The testdata writes ``ts`` as parquet TIMESTAMP(NANOS), which
    Spark's parquet reader rejects outright (PARQUET_TYPE_ILLEGAL).
    The Spark-native workaround: read nanos as raw longs
    (spark.sql.legacy.parquet.nanosAsLong) and integer-divide to
    microseconds — `DIV 1000` stays exact where double division
    would lose precision above 2^53. Matches DuckDB's ns→µs cast
    (truncation) for the oracle."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, "events"))
    ts_type = df.schema["ts"].dataType.simpleString()
    if ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view so Spark SQL text (CTEs,
    scalar subqueries, views) can reference them by name."""
    dfs = load_all(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
