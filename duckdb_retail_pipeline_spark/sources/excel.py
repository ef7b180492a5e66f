"""Excel sources (reference src/ingestion/retail_data.py:27-38,
holidays_data.py:26).

Excel is a driver-side format: workbooks don't split, so the scan
is pandas → Arrow → DataFrame (exactly the reference's strategy,
where pandas feeds a DuckDB replacement scan). At real scale the
play is convert-once-to-parquet then `spark.read` — `to_parquet_once`
does that conversion.

openpyxl/xlrd are optional; when they're absent there is a built-in
CSV fallback so a no-extra-deps environment still has a working
ingest path: pass a ``.csv`` file (one sheet), a directory of
``*.csv`` files (one sheet per file), or export the workbook's
sheets as ``<workbook-stem>.<sheet-name>.csv`` siblings next to the
``.xlsx`` and pass the workbook path unchanged.
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


def _csv_fallback_reader(path: str) -> dict[str, pd.DataFrame]:
    """Sheet frames without any Excel library: a ``.csv`` path is one
    sheet; a directory yields one sheet per ``*.csv``; an ``.xlsx``
    path falls back to ``<stem>.<sheet>.csv`` sibling exports."""
    import glob
    import os

    base, ext = os.path.splitext(path)
    if ext.lower() == ".csv":
        return {os.path.basename(base): pd.read_csv(path)}
    if os.path.isdir(path):
        found = sorted(glob.glob(os.path.join(path, "*.csv")))
        names = [os.path.splitext(os.path.basename(f))[0] for f in found]
    else:
        found = sorted(glob.glob(glob.escape(base) + ".*.csv"))
        prefix = os.path.basename(base) + "."
        names = [
            os.path.splitext(os.path.basename(f))[0].removeprefix(prefix)
            for f in found
        ]
    if not found:
        raise NotImplementedError(
            "openpyxl is not installed and no CSV fallback was found "
            f"for {path!r}; pass reader=, export sheets as "
            "<stem>.<sheet>.csv, or pre-convert the workbook to parquet"
        )
    return {n: pd.read_csv(f) for n, f in zip(names, found)}


def read_excel_sheets(
    spark: SparkSession,
    path: str,
    sheet_tag_col: str = "source_sheet",
    reader: Callable[[str], dict[str, pd.DataFrame]] | None = None,
) -> DataFrame:
    """All sheets of a workbook, vertically unioned, each row tagged
    with its sheet name (reference retail_data.py:27-38: S1 + U2).

    ``reader`` is injectable so tests can supply sheet frames; the
    default uses openpyxl when present and otherwise the CSV fallback
    (see module docstring), so an excel-less container still ingests.
    """
    if reader is None:
        import os

        # a directory of per-sheet CSVs (the documented excel-less
        # shape) routes to the fallback even when openpyxl IS
        # installed — pd.read_excel on a directory raises
        if (
            not HAS_OPENPYXL
            or os.path.isdir(path)
            or path.lower().endswith(".csv")
        ):
            reader = _csv_fallback_reader
        else:

            def reader(p: str) -> dict[str, pd.DataFrame]:
                return pd.read_excel(p, sheet_name=None, engine="openpyxl")

    sheets = reader(path)
    out: DataFrame | None = None
    for name, pdf in sheets.items():
        if len(pdf) == 0:
            # a stray empty sheet has no inferable schema and would
            # abort the whole ingest (createDataFrame can't infer
            # from an empty object-dtype frame); skip it rather than
            # fail the sheets that carry data
            continue
        df = spark.createDataFrame(pdf).withColumn(sheet_tag_col, F.lit(str(name)))
        out = df if out is None else out.unionByName(df)
    if out is None:
        raise ValueError(f"workbook {path!r} has no non-empty sheets")
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
