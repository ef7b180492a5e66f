"""Excel sources (reference src/ingestion/retail_data.py:27-38,
holidays_data.py:26).

Excel is a driver-side format: workbooks don't split, so the scan
is pandas → Arrow → DataFrame (exactly the reference's strategy,
where pandas feeds a DuckDB replacement scan). At real scale the
play is convert-once-to-parquet then `spark.read` — `to_parquet_once`
does that conversion. openpyxl/xlrd are not in this container, so
everything gates on an import-try and tests exercise the
sheet-frame plumbing with injected frames.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

try:  # pragma: no cover - optional dep
    import openpyxl  # noqa: F401

    HAS_OPENPYXL = True
except ImportError:
    HAS_OPENPYXL = False


def read_excel_sheets(
    spark: SparkSession,
    path: str,
    sheet_tag_col: str = "source_sheet",
    reader: Callable[[str], dict[str, pd.DataFrame]] | None = None,
) -> DataFrame:
    """All sheets of a workbook, vertically unioned, each row tagged
    with its sheet name (reference retail_data.py:27-38: S1 + U2).

    ``reader`` is injectable so tests (and excel-less containers) can
    supply sheet frames; the default requires openpyxl.
    """
    if reader is None:
        if not HAS_OPENPYXL:
            raise NotImplementedError(
                "openpyxl is not installed in this environment; pass "
                "reader= or pre-convert the workbook to parquet"
            )

        def reader(p: str) -> dict[str, pd.DataFrame]:
            return pd.read_excel(p, sheet_name=None, engine="openpyxl")

    sheets = reader(path)
    out: DataFrame | None = None
    for name, pdf in sheets.items():
        df = spark.createDataFrame(pdf).withColumn(sheet_tag_col, F.lit(str(name)))
        out = df if out is None else out.unionByName(df)
    if out is None:
        raise ValueError(f"workbook {path!r} has no sheets")
    return out


def to_parquet_once(
    spark: SparkSession, excel_path: str, parquet_path: str, **kwargs
) -> str:
    """Convert a workbook to parquet so every later read is a
    splittable columnar scan with pushdown — the at-scale path."""
    read_excel_sheets(spark, excel_path, **kwargs).write.mode("overwrite").parquet(
        parquet_path
    )
    return parquet_path
