"""Differential gate: every registered query with an oracle must
hash-match DuckDB on the same parquet — the local mirror of the
driver's t2 correctness check."""

from __future__ import annotations

import pytest

from duckdb_retail_pipeline_spark.queries import REGISTRY

from tests.compare import assert_matches

ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle)
NO_ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if not s.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    assert_matches(df, duck, spec.oracle, name)


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
