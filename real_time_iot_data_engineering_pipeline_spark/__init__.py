"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference IoT pipeline
(shiva1137/real-time-iot-data-engineering-pipeline), re-expressed Spark-first.

Layout:
  session    - SparkSession builder with the reference's tuning surface
  sources    - table loaders (parquet fixtures, Kafka/file stream sources)
  sinks      - idempotent keyed sinks (the Mongo/Postgres-upsert equivalent)
  functions  - scalar/validation Column expression library
  operators  - relational operators (aggregation, dedup, joins, analytics,
               similarity, text) built on the DataFrame API
  streaming  - Structured Streaming pipeline (watermark, windowed agg,
               foreachBatch upsert, metrics listener)
  plans      - plan inspection helpers (explain/pushdown assertions)
"""

__version__ = "0.1.0"
