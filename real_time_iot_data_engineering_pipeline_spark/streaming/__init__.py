"""Structured Streaming runtime — the engine's continuous tier.

Re-expresses the reference's streaming job (spark_streaming/streaming_job.py:
readStream kafka -> from_json parse -> withWatermark + 5-minute windowed agg
-> outputMode(update) -> foreachBatch Mongo upsert) as one Spark plan over a
pluggable source: a file source for deterministic tests, the same Kafka
options for production (sources/kafka.py).
"""

from .listener import MetricsListener
from .pipeline import (
    dedup_stream,
    parse_event_stream,
    read_event_file_stream,
    run_pipeline,
    windowed_aggregate,
)
from .router import RouterSink, run_router, validated_stream

__all__ = [
    "MetricsListener",
    "RouterSink",
    "dedup_stream",
    "parse_event_stream",
    "read_event_file_stream",
    "run_pipeline",
    "run_router",
    "validated_stream",
    "windowed_aggregate",
]
