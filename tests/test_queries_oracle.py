"""Differential gate: every registered query with an oracle must
hash-match DuckDB on the same parquet — the local mirror of the
driver's t2 correctness check."""

from __future__ import annotations

import pytest

from duckdb_retail_pipeline_spark.queries import REGISTRY

from tests.compare import assert_matches

ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle)
NO_ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if not s.oracle)

# Retired-query table (ROTATION.md RETIREMENT, written r12): a
# retired query exits the driver registry (and the 3-round staleness
# invariant) but KEEPS its local oracle row here forever — each entry
# is (name, fn, oracle_sql) moved verbatim from its register() call
# at retirement time. Empty until the first retirement; the scaffold
# exists so the policy's coverage guarantee is mechanical, not prose.
RETIRED: list[tuple] = []


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    assert_matches(df, duck, spec.oracle, name)


@pytest.mark.parametrize(
    "entry", RETIRED, ids=[e[0] for e in RETIRED]
)
def test_retired_query_matches_oracle(spark, duck, sf_dir, entry):
    name, fn, oracle = entry
    assert name not in REGISTRY  # retired = out of the driver window
    assert_matches(fn(spark, sf_dir), duck, oracle, name)


@pytest.mark.parametrize("name", NO_ORACLE_QUERIES)
def test_query_runs(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.queries()) >= set(e.oracle_sql())
