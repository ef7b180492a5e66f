"""Named query registry — the driver-contract surface.

Every implemented operator from SURVEY.md §2 (plus the extension
surface) is registered here as a QuerySpec: a Spark callable
``(spark, sf_dir) -> DataFrame`` twinned with the ANSI-SQL string a
DuckDB oracle runs on the same parquet tables. ``__spark_entry__``
re-exports this registry.
"""

from __future__ import annotations

from duckdb_retail_pipeline_spark.queries.base import REGISTRY, QuerySpec, register

# importing the modules populates REGISTRY via their register() calls
from duckdb_retail_pipeline_spark.queries import advanced  # noqa: E402,F401
from duckdb_retail_pipeline_spark.queries import core  # noqa: E402,F401
from duckdb_retail_pipeline_spark.queries import retail  # noqa: E402,F401
from duckdb_retail_pipeline_spark.queries import extensions  # noqa: E402,F401

# -- driver-window prioritization -----------------------------------------
#
# The driver's CORRECTNESS gate records the FIRST 50 registry entries
# (dict insertion order). With 82 registered queries, registration
# order decides which queries get a hard driver-side oracle row. The
# curated block below puts the full reference pipeline (pl01-pl11),
# the §2 operator queries (q01-q25), the two rows that erred/no-oracle
# in round 1 (a05, a12), and one representative per LLM-pipeline
# capability (dedup, near-dup, ANN, events, streaming, grouped-map,
# chunking, curation, split, VARIANT) inside that window. Everything
# else keeps its local DuckDB-oracle pytest row (tests/
# test_queries_oracle.py runs ALL 82) and rotates into the driver
# window in later rounds; a01-a16 (minus a05/a12) were driver-green in
# CORRECTNESS_r01.json.
_PRIORITY = [
    *[n for n in REGISTRY if n.startswith("pl")],  # pl01-pl11 (11)
    *[n for n in REGISTRY if n.startswith("q")],   # q01-q25 (25)
    "a05_approx_aggregates",
    "a12_array_agg_surface",
    "x01_dedup_exact",
    "x07_minhash_lsh_pairs",
    "x09_simhash_pairs",
    "x10_embedding_cosine_topk",
    "x14_events_hourly",
    "x17_streaming_hourly",
    "x24_grouped_ols_trend",
    "x26_dedup_clusters",
    "x27_text_chunking",
    "x28_corpus_curation",
    "x29_stratified_split",
    "x30_variant_extract",
]
assert len(_PRIORITY) == 50, f"driver window must be exactly 50, got {len(_PRIORITY)}"
assert all(n in REGISTRY for n in _PRIORITY), "priority list names a missing query"

_ordered = {n: REGISTRY[n] for n in _PRIORITY}
_ordered.update({n: s for n, s in sorted(REGISTRY.items()) if n not in _ordered})
REGISTRY.clear()
REGISTRY.update(_ordered)

__all__ = ["REGISTRY", "QuerySpec", "register"]
