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
from duckdb_retail_pipeline_spark.queries import analytics  # noqa: E402,F401

# -- driver-window prioritization -----------------------------------------
#
# The driver's CORRECTNESS gate records the FIRST 50 registry entries
# (dict insertion order). Registration order therefore decides which
# of the (currently len(REGISTRY)) registered queries get a hard
# driver-side oracle row per round. The rotation schedule lives in
# ROTATION.md at the repo root: never-driver-checked queries enter
# first; remaining slots hold regression guards for code paths
# changed since the last green round, then the oldest-green block.
# Everything outside the window keeps its local DuckDB-oracle pytest
# row (tests/test_queries_oracle.py runs the WHOLE registry).
#
# Round-9 window (see ROTATION.md): CORRECTNESS_r08 landed 50/50
# (cumulative 141/141). The r8 verdict's #1 finding binds this
# window: six queries' last driver rows date to r5 — three rounds
# stale, a silent break of this file's own ≤2-rounds invariant — and
# the r6-green block (37 queries) is three rounds stale by r9.
# 6 + 37 = 43 slots are owed re-entry before anything else.
# Rule 1, never-checked: this round's two new registrations (x92,
# x93 — registered WITH their driver rows, the x90/x91 precedent).
# Rule 2, r8→r9 diff guards (5): x05 (the late-r8 rotating_persist
# churn fix changed the code under its _PREFIX_D_SLOT persist; its
# r7 row predates the fix — the one guard the r8 pre-draft owed),
# x90 (positional index split into memoized build + serve this
# round), x91 (recall-sweep config change this round), x60 (fresh
# runs stage partials and swap after commit this round), x07
# (memoized_count re-keyed for bounded growth this round).
# Rule 3, oldest-green re-entry, oldest-first: the six r5-stale
# queries FIRST (q01, q21, x01, x14, x19, x20), then the full
# 37-query r6-green block. 2 + 5 + 6 + 37 = 50. After this round a
# recount must show no registered query's last driver row older
# than r7 (the r8 verdict's done-condition). The r7-green block
# (48 queries) is two rounds old at r9 — invariant intact without
# re-entry — and takes rule-3 head priority in r10 together with
# whatever r8-green queries age out; headline queries outside the
# window are re-verified every round by the local full-registry
# pytest oracle gate.
_ROTATED_IN = [
    # never driver-green: this round's two new registrations
    "x92_copurchase_pagerank", "x93_frequent_tokens",
]
_GUARDS = [
    # r8→r9 diff guards
    "x05_ngram_jaccard_pairs", "x90_phrase_search",
    "x91_ann_index_upsert", "x60_streaming_upsert_sink",
    "x07_minhash_lsh_pairs",
    # oldest-green re-entry head: the six r5-stale queries (the r8
    # verdict's #1 — owed since r7 by the ≤2-rounds invariant)
    "q01_pricing_summary", "q21_multikey_star_agg",
    "x01_dedup_exact", "x14_events_hourly",
    "x19_media_schema", "x20_media_features",
    # oldest-green re-entry: the full r6-green block (last row r6)
    "a02_cube", "a03_intersect_except", "a04_unpivot",
    "a05_approx_aggregates", "a06_grouping_sets_sql",
    "a09_moving_average", "a10_string_functions",
    "a11_window_rank_surface", "a12_array_agg_surface",
    "a13_correlated_subqueries", "a14_regex_surface",
    "a15_exact_percentiles", "a16_correlated_avg_filter",
    "pl11_validation", "q03_top_customers",
    "x61_bpe_token_stats", "x62_seasonal_anomaly",
    "x63_cross_source_dups", "x64_vocab_oov",
    "x66_basket_pairs", "x67_rfm_segments",
    "x68_supplier_latency", "x69_deletion_audit",
    "x70_late_data_audit", "x71_fuzzy_entity_match",
    "x72_ab_test", "x73_histogram", "x74_token_budget",
    "x75_hypertable_rollup", "x76_rolling_distinct_users",
    "x77_skew_report", "x78_correlation_report",
    "x79_pareto_analysis", "x80_event_transitions",
    "x82_part_velocity", "x83_seasonal_index",
    "x84_cohort_ltv_curves",
]
_PRIORITY = _ROTATED_IN + _GUARDS
if len(_PRIORITY) != 50:  # not an assert: must survive python -O
    raise RuntimeError(
        f"driver window must be exactly 50 entries, got {len(_PRIORITY)}; "
        "update the rotation in queries/__init__.py and ROTATION.md"
    )
_missing = [n for n in _PRIORITY if n not in REGISTRY]
if _missing:
    raise RuntimeError(f"priority list names missing queries: {_missing}")

_ordered = {n: REGISTRY[n] for n in _PRIORITY}
_ordered.update({n: s for n, s in sorted(REGISTRY.items()) if n not in _ordered})
REGISTRY.clear()
REGISTRY.update(_ordered)

__all__ = ["REGISTRY", "QuerySpec", "register"]
