from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_retail_pipeline_spark.catalog import TABLES, table_path  # noqa: E402
from duckdb_retail_pipeline_spark.session import get_spark  # noqa: E402

SF_TEST_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("spark-warehouse"))
    s = get_spark(
        app_name="tests",
        master="local[*]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": wh},
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_TEST_DIR


@pytest.fixture(scope="session")
def duck(sf_dir):
    """DuckDB oracle connection with every testdata table registered
    as a view — mirrors the driver's harness."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'"
        )
    yield con
    con.close()
