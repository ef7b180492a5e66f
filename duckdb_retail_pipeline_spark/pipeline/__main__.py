"""CLI entry point mirroring the reference's EP1
(`python src/run.py --rawdir ... --db ... [--rebuild]`,
reference src/run.py:29-47):

    python -m duckdb_retail_pipeline_spark.pipeline \
        --sf-dir /root/testdata/sf0.01 \
        --warehouse /tmp/retail_wh --rebuild

Runs the four pipeline phases, prints per-layer row counts and the
validation check results (non-zero violations exit 1 — stricter than
the reference, which only logs warnings).
"""

from __future__ import annotations

import argparse
import sys

from duckdb_retail_pipeline_spark.pipeline.run import run_pipeline
from duckdb_retail_pipeline_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="duckdb_retail_pipeline_spark.pipeline")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--rebuild", action="store_true")
    args = ap.parse_args(argv)

    spark = get_spark(app_name="retail-pipeline")
    paths = run_pipeline(spark, args.sf_dir, args.warehouse, rebuild=args.rebuild)

    failures = 0
    for name, path in paths.items():
        df = spark.read.parquet(path)
        n = df.count()
        print(f"{name}: {n} rows -> {path}")
        if name == "validation":
            for row in df.collect():
                status = "OK" if row["violations"] == 0 else "VIOLATION"
                print(f"  [{status}] {row['check_name']}: {row['violations']}")
                failures += int(row["violations"])
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
