"""python_btc_etl_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference ETL
application ``jaredr-branscum/python-btc-etl`` (see SURVEY.md), built
Spark-first: DataFrame/SQL logical plans optimized by Catalyst, Structured
Streaming for the file-arrival path, and Pandas UDFs only where no native
expression exists.

Layout
------
- ``session``     — tuned SparkSession factory (AQE, UTC, Arrow).
- ``catalog``     — testdata table loading + temp-view registration.
- ``sources``     — reference-parity OHLCV CSV source, parquet, streaming.
- ``operators``   — OHLCV re-agg, as-of/range joins, dedup, similarity,
                    text analysis, top-k, idempotent ingest.
- ``functions``   — reusable column-expression builders (vectors, scalars).
- ``plans``       — the query registry: every supported query as a
                    (Spark callable, DuckDB oracle SQL) pair.
- ``streaming``   — Structured Streaming ingest & windowed aggregation.
- ``multimodal``  — binary-column plumbing (decode stubs, metadata).
"""

__version__ = "0.1.0"
