"""Deduplication operators (SURVEY.md §2.6).

The reference dedups twice: a stateful 5-second-bucket first-wins pass in the
validator (validation_consumer.py:353-409) and a spec'd batch dedup on
(sensor_id, timestamp) (Learning Guide.txt:1045 §2).  Both are expressed as
row_number()-over-key formulations rather than dropDuplicates so the surviving
row is DETERMINISTIC (dropDuplicates keeps an arbitrary row — SURVEY §7.4-3)
and oracle-checkable.

Scale posture: one hash shuffle on the dedup key; within each key-partition
the sort is tiny.  The streaming twin is dropDuplicatesWithinWatermark
(streaming/pipeline.py) whose state is bounded by the watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table


@register(
    "q_dedup_exact",
    oracle="""
    SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
               row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on (key, timestamp), first-wins by event_id
    (Learning Guide.txt:1045 §2 'remove duplicates: same sensor_id+timestamp')."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "ts").orderBy("event_id")
    return (
        ev.select("event_id", "user_id", "ts", "value", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "q_dedup_window",
    oracle="""
    SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value, bucket FROM (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
               time_bucket(INTERVAL '5 seconds', CAST(ts AS TIMESTAMP)) AS bucket,
               row_number() OVER (
                   PARTITION BY user_id,
                                time_bucket(INTERVAL '5 seconds', CAST(ts AS TIMESTAMP))
                   ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
        FROM events
        -- NULL event times generate no window in Spark (TimeWindow emits
        -- nothing), so the oracle must not invent a NULL bucket group
        -- (hostile-gate totality; such rows are DLQ'd upstream anyway)
        WHERE ts IS NOT NULL
    ) WHERE rn = 1
    """,
)
def q_dedup_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed near-dup dedup: first record per (key, 5-second bucket) wins
    (validation_consumer.py:353-409, DUPLICATE_WINDOW_SECONDS=5 at :77;
    first-wins per SURVEY §4.4-4)."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.window("ts", "5 seconds").getField("start")
    w = Window.partitionBy("user_id", "bucket").orderBy("ts", "event_id")
    return (
        ev.select(
            "event_id", "user_id", "ts", "value", bucket.alias("bucket")
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "q_upsert_last_write_wins",
    oracle="""
    SELECT user_id, window_start, event_id AS last_event_id, value AS last_value FROM (
        SELECT user_id,
               time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)) AS window_start,
               event_id, value,
               row_number() OVER (
                   PARTITION BY user_id,
                                time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP))
                   ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        FROM events
        -- same TimeWindow totality guard as q_dedup_window above
        WHERE ts IS NOT NULL
    ) WHERE rn = 1
    """,
)
def q_upsert_last_write_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed upsert, last write wins — the batch-algebra equivalent of the
    reference's ON CONFLICT (sensor_id, window_start) DO UPDATE sink
    (mongo_to_postgres_sync.py:378-399): latest record per key survives."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.window("ts", "5 minutes").getField("start")
    w = Window.partitionBy("user_id", "window_start").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.select(
            "user_id",
            bucket.alias("window_start"),
            "event_id",
            "value",
            "ts",
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "window_start",
            F.col("event_id").alias("last_event_id"),
            F.col("value").alias("last_value"),
        )
    )
