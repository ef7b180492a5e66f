"""duckdb_retail_pipeline_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference ETL/dimensional-warehouse pipeline
(hedmana/duckdb-retail-pipeline), built Spark-first:

- declarative DataFrame / Spark SQL plans (Catalyst optimizes),
- broadcast joins for dimensions, AQE for runtime re-planning,
- window functions for time-series (forward fill, gap detection),
- Structured Streaming for the events surface,
- Arrow-vectorized Pandas UDFs only where built-ins can't express
  the semantics (multimodal decode plumbing).

Layout:
    session    — SparkSession factory tuned for local[] & cluster
    catalog    — testdata table loading / view registration
    functions/ — scalar & aggregate helpers (DuckDB-parity date parts,
                 deterministic mode, vector math, text analysis)
    operators/ — relational + extension operators (joins, windows,
                 dedup, similarity, multimodal)
    sources/   — ingestion connectors (parquet, excel, ECB XML, csv)
    pipeline/  — the retail star-schema build (ingest → dims → facts
                 → aggs → views → validation)
    plans/     — plan-inspection utilities (pushdown/broadcast asserts)
    streaming/ — Structured Streaming event processing
    queries/   — the named query registry + DuckDB oracle twins
"""

__version__ = "0.1.0"
