"""Incremental-sync semantics (SURVEY.md §2.1: mongo_to_postgres_sync.py).

The reference's cron sync reads rows newer than a high-watermark, upserts
them, then advances the watermark to max(processed_at) of the synced batch
(mongo_to_postgres_sync.py:109-143,475-479).  In Spark the watermark state is
subsumed by streaming checkpoints; the batch algebra is a filter + bounded
sort + global max.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

SYNC_FROM = "2024-01-25 00:00:00"


@register(
    "q_incremental_scan",
    oracle=f"""
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, value
    FROM events
    WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '{SYNC_FROM}'
    ORDER BY ts, event_id
    LIMIT 1000
    """,
)
def q_incremental_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-bounded incremental read: filter >= last_sync, ascending
    sort, batch limit (mongo_to_postgres_sync.py:109-143, BATCH_SIZE=1000).
    The >= filter is pushed to the parquet scan (min/max row-group pruning);
    the limit plans as TakeOrderedAndProject — no global sort."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("ts") >= F.lit(SYNC_FROM).cast("timestamp_ntz"))
        .select("event_id", "ts", "user_id", "value")
        .orderBy("ts", "event_id")
        .limit(1000)
    )


@register(
    "q_sync_watermark",
    oracle="""
    SELECT CAST(max(ts) AS TIMESTAMP) AS watermark, count(*) AS n_rows
    FROM events
    """,
)
def q_sync_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-watermark computation: max event time over the synced batch
    (mongo_to_postgres_sync.py:475-479)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.max("ts").alias("watermark"), F.count(F.lit(1)).alias("n_rows")
    )
