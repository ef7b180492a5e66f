"""Window-function operators.

The reference's entire window surface is two functions (SURVEY.md
§2.5): LAST_VALUE-ignore-nulls forward fill and LAG gap detection.
Both are global ORDER BY date windows there; here every operator
takes optional partition columns because a single unpartitioned
window is the one thing that cannot scale — at 100 TB you partition
by series key (currency, user, …) and each partition's window runs
independently.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def _window(partition_by: Sequence[str] | None, order_by: str) -> WindowSpec:
    w = Window.partitionBy(*partition_by) if partition_by else Window.partitionBy()
    return w.orderBy(order_by)


def forward_fill(
    df: DataFrame,
    value_col: str,
    order_col: str,
    partition_by: Sequence[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Carry the last non-NULL ``value_col`` forward along
    ``order_col`` — exact semantic match of the reference's
    ``LAST_VALUE(x IGNORE NULLS) OVER (ORDER BY date ROWS BETWEEN
    UNBOUNDED PRECEDING AND CURRENT ROW)`` (src/models/facts.py:191-194).

    With ``partition_by=None`` this is a single-partition window
    (fine for a ~1k-row daily FX series; documented cost). For dense
    multi-series data pass the series key.
    """
    w = _window(partition_by, order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(out_col or value_col, F.last(value_col, ignorenulls=True).over(w))


def gaps(
    df: DataFrame,
    date_col: str,
    partition_by: Sequence[str] | None = None,
) -> DataFrame:
    """Rows where the previous date is more than 1 day back — the
    reference's calendar-continuity check (src/models/dimensions.py:129-138).
    Returns (date, prev_date, gap_days) for each gap."""
    w = _window(partition_by, date_col)
    return (
        df.select(*(partition_by or []), date_col)
        .withColumn("prev_date", F.lag(date_col).over(w))
        .withColumn("gap_days", F.datediff(F.col(date_col), F.col("prev_date")))
        .filter(F.col("gap_days") > 1)
    )


def sessionize(
    df: DataFrame,
    ts_col: str,
    user_col: str,
    gap_minutes: int = 30,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Assign batch session ids: a new session starts when the gap to
    the previous event of the same user exceeds ``gap_minutes``.
    lag + conditional cumsum — the standard two-window sessionizer;
    both windows share the same (user, ts) partitioning/ordering so
    Spark plans a single sort+shuffle. Pass unique ``tiebreak``
    columns when timestamps can collide (lag needs a total order to
    be deterministic)."""
    ts_type = df.schema[ts_col].dataType.simpleString()
    if ts_type == "timestamp_ntz":
        # A naive timestamp has no instant: the epoch cast below
        # interprets it in the session timezone, so a non-UTC session
        # would skew gaps across DST transitions. Callers should
        # normalize event time first (catalog.normalize_event_ts);
        # refuse the silent skew otherwise.
        tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
        if tz != "UTC":
            raise ValueError(
                f"sessionize on a TIMESTAMP_NTZ column requires the UTC "
                f"session convention (got session timeZone={tz!r}); "
                "normalize with catalog.normalize_event_ts first"
            )
    w = Window.partitionBy(user_col).orderBy(ts_col, *tiebreak)
    prev_ts = F.lag(ts_col).over(w)
    # Gap = difference of per-timestamp epoch-second FLOORS (NOT full
    # elapsed seconds — timestampdiff would shift session boundaries
    # on sub-second data). Spark's timestamp→long cast floors; the
    # oracle twins must spell FLOOR(epoch(ts)) explicitly because
    # DuckDB's CAST(double AS BIGINT) ROUNDS — a bare epoch() cast
    # diverges on gaps within ~1 s of the boundary (latent on current
    # data, review-caught). The ltz cast is identity for tz-aware
    # input; for NTZ it uses the UTC session enforced above.
    epoch = lambda c: c.cast("timestamp_ltz").cast("long")  # noqa: E731
    gap_s = epoch(F.col(ts_col)) - epoch(prev_ts)
    is_new = F.when(prev_ts.isNull() | (gap_s > gap_minutes * 60), 1).otherwise(0)
    return df.withColumn("__new_session", is_new).withColumn(
        "session_seq", F.sum("__new_session").over(w)
    ).drop("__new_session")


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: Column,
    k: int = 1,
    rank_col: str = "rn",
) -> DataFrame:
    """row_number ≤ k per group (deterministic if ``order_col`` is a
    total order — callers add a unique tie-break column)."""
    w = Window.partitionBy(*group_cols).orderBy(order_col)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
