"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference pipeline (clel-0/PE-Firm-Investment-Database-Pipeline).

Spark-first re-expression of the reference's operator inventory
(repo:SURVEY.md §2) plus the large-scale training-data-pipeline
extension surface (dedup, similarity search, text analysis,
multimodal columns, streaming).

Package layout:
- ``session``    — SparkSession factory tuned for local[N] testing and
                   cluster-shaped defaults (AQE, Arrow, shuffle sizing).
- ``sources``    — typed scans: parquet star schema, PERMISSIVE JSONL.
- ``functions``  — scalar/array column-expression libraries (text, urls,
                   scoring, years) — all JVM-side built-ins, no Python UDFs.
- ``plans``      — the named query plans registered in
                   ``__spark_entry__.queries()`` with DuckDB oracles.
- ``operators``  — composite operators (dedup, similarity, as-of join).
- ``streaming``  — Structured Streaming surface over the events table.
"""

__version__ = "0.1.0"
