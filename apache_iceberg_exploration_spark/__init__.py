"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference repo ``syafriedf/apache-iceberg-exploration``
(a medallion Bronze→Silver→Gold ELT pipeline over Iceberg — see SURVEY.md),
re-expressed Spark-first and extended with the large-scale training-data
pipeline operators (dedup, similarity search, multimodal columns, text
analysis).

Layout:
- ``session``    SparkSession factory (AQE on, UTC, tuned shuffle partitions)
- ``schemas``    explicit StructTypes for every table (no inference)
- ``registry``   query registry binding Spark callables to DuckDB oracle SQL
- ``sources``    IO: parquet/csv/json/jdbc readers+writers, lakehouse tables
- ``operators``  medallion parity, relational suite, dedup family, similarity,
                 text analysis, multimodal plumbing
- ``functions``  portable hashing / vector math helpers
- ``streaming``  Structured Streaming: watermarks, tumbling/sliding/session
- ``plans``      explain helpers used by tests to assert pushdown/broadcast
"""

__version__ = "0.1.0"
