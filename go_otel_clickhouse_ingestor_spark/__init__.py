"""PySpark-native analytics & streaming-ETL engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference ingestor ``florita1/go-otel-clickhouse-ingestor`` (a Go
synthetic/CDC -> ClickHouse streaming ETL tool), widened into a full
analytical query surface plus large-scale training-data-pipeline
operators (dedup, similarity search, multimodal columns, text
analysis).

Layout:
    session.py    SparkSession construction + scale-oriented conf
    tables.py     parquet table catalog over the driver fixtures
    registry.py   query registry: name -> (spark fn, duckdb oracle SQL)
    operators/    batch operators (relational, cdc, dedup, text, ...)
    functions/    reusable column-expression helpers
    sources/      fixture + streaming source builders
    streaming/    structured-streaming pipelines, sinks, metrics
    plans/        plan-inspection and tuning utilities
"""

__version__ = "0.1.0"
