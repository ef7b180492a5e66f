"""Spark-vs-DuckDB differential comparison, mirroring the driver's
order-insensitive row-count + column-name + value check."""

from __future__ import annotations

import datetime
import math
from typing import Any


def _norm_cell(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / tiny representation noise at 1e-9 relative
        return round(v, 9) if abs(v) < 1e12 else v
    if isinstance(v, int):
        return int(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    try:  # Decimal
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(v)
    except ImportError:
        pass
    return v


def normalize(rows: list[tuple], cols: list[str]) -> list[tuple]:
    """Sort columns by name, then rows by value — order-insensitive."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def assert_matches(spark_df, duck_con, oracle: str, name: str = "") -> None:
    # Convention check: compared outputs never expose DecimalType —
    # Spark SQL literal typing can silently produce decimals where
    # the DSL (and DuckDB) produce double.
    bad = [f.name for f in spark_df.schema.fields if "decimal" in f.dataType.simpleString()]
    assert not bad, f"{name}: decimal-typed output columns {bad}; cast to double"
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    d_res = duck_con.execute(oracle)
    d_cols = [c[0] for c in d_res.description]
    d_rows = [tuple(r) for r in d_res.fetchall()]

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}"
    )
    sn = normalize(s_rows, s_cols)
    dn = normalize(d_rows, d_cols)
    if sn != dn:
        diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs: {diffs}")
