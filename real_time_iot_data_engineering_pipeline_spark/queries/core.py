"""Core relational spine: scan, decode, project, cast, parse, windowed agg.

Maps the reference's streaming job stages (spark_streaming/streaming_job.py:
205-353) onto bounded DataFrames over the driver fixtures — the `events`
table stands in for the IoT reading stream (FIXTURES.md role mapping).

Scale posture: every query is a single declarative plan — parquet scan with
pushed filters/pruned columns -> (optional) one shuffle for the keyed agg ->
projection.  Aggregations are partial+final (map-side combine) automatically;
nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import fround
from ..registry import register
from ..sources import load_table

# Pinned "now" for freshness-style logic: inside the events ts range
# (2024-01-01 .. 2024-01-31) so tests exercise both sides of the predicate.
NOW = "2024-01-20 00:00:00"


@register(
    "q_source_scan",
    oracle="""
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props
    FROM events
    """,
)
def q_source_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded source scan (streaming_job.py:205-230 read_from_kafka analog)."""
    return load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )


@register(
    "q_json_decode",
    oracle="""
    -- total function of arbitrary props, matching Spark's from_json("k INT"):
    -- k_value is non-NULL only for VALID json whose $.k is an INTEGRAL json
    -- NUMBER within int32 range (quoted "5", 1.5, overflow, malformed and
    -- missing all decode to NULL, never an error)
    SELECT event_id,
           CASE WHEN props IS NOT NULL AND json_valid(props)
                 AND json_type(props, '$.k') IN ('UBIGINT', 'BIGINT')
                THEN TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)
           END AS k_value
    FROM events
    """,
)
def q_json_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON payload decode + star-expand (streaming_job.py:233-271)."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_id", F.from_json("props", "k INT").alias("data")
    )
    return parsed.select("event_id", F.col("data.k").alias("k_value"))


@register(
    "q_project_rename",
    oracle="""
    SELECT event_id AS reading_id, user_id AS sensor_id,
           value AS temperature, event_type AS device_type
    FROM events
    """,
)
def q_project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column projection + rename (streaming_job.py:245-255)."""
    return load_table(spark, sf_dir, "events").select(
        F.col("event_id").alias("reading_id"),
        F.col("user_id").alias("sensor_id"),
        F.col("value").alias("temperature"),
        F.col("event_type").alias("device_type"),
    )


@register(
    "q_cast",
    oracle="""
    SELECT event_id,
           CAST(user_id AS INTEGER) AS user_int,
           CAST(event_id AS DOUBLE) AS event_double,
           CAST(value AS VARCHAR) AS value_str
    FROM events
    """,
)
def q_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type casts (streaming_job.py:248,346-349)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.col("user_id").cast("int").alias("user_int"),
        F.col("event_id").cast("double").alias("event_double"),
        F.col("value").cast("string").alias("value_str"),
    )


@register(
    "q_to_timestamp",
    oracle="""
    SELECT event_id,
           strptime(strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S'),
                    '%Y-%m-%d %H:%M:%S') AS ts_parsed
    FROM events
    """,
)
def q_to_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String->timestamp parse (streaming_job.py:258-261).

    try_to_timestamp gives the reference's tolerant null-on-unparseable
    semantics independent of the session's ANSI mode.
    """
    ev = load_table(spark, sf_dir, "events")
    s = F.date_format("ts", "yyyy-MM-dd HH:mm:ss")
    return ev.select(
        "event_id",
        F.try_to_timestamp(s, F.lit("yyyy-MM-dd HH:mm:ss"))
        .cast("timestamp_ntz")
        .alias("ts_parsed"),
    )


@register(
    "q_filter_notnull",
    oracle="""
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, value
    FROM events
    WHERE value IS NOT NULL AND ts IS NOT NULL AND user_id IS NOT NULL
    """,
)
def q_filter_notnull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-rejection filter (streaming_job.py:264-267) — pushed to the scan."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(
        F.col("value").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
    ).select("event_id", "ts", "user_id", "value")


@register(
    "q_tumbling_agg",
    oracle="""
    SELECT user_id,
           time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)) AS window_start,
           time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP))
             + INTERVAL '5 minutes' AS window_end,
           (floor((avg(value)) * 1e4 * (1 + 1e-12) + 0.5) / 1e4) AS avg_value,
           max(value) AS max_value,
           min(value) AS min_value,
           (floor((sum(value)) * 1e4 * (1 + 1e-12) + 0.5) / 1e4) AS total_value,
           count(*) AS cnt
    FROM events
    WHERE value IS NOT NULL AND ts IS NOT NULL
    GROUP BY 1, 2, 3
    """,
)
def q_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: 5-minute tumbling-window keyed aggregate.

    The reference's signature computation (streaming_job.py:278-353): per
    (sensor, 5-min window) avg/max/min/sum/count.  One hash-shuffle on the
    grouping key; Spark plans partial aggregation map-side so the shuffle
    carries one row per (user, window) per input partition — at 100 TB this
    is the canonical scalable shape (cardinality-bounded shuffle).
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("value").isNotNull() & F.col("ts").isNotNull())
        .groupBy("user_id", F.window("ts", "5 minutes").alias("w"))
        .agg(
            fround(F.avg("value"), 4).alias("avg_value"),
            F.max("value").alias("max_value"),
            F.min("value").alias("min_value"),
            fround(F.sum("value"), 4).alias("total_value"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "avg_value",
            "max_value",
            "min_value",
            "total_value",
            "cnt",
        )
    )


@register(
    "q_hourly_agg",
    oracle="""
    SELECT user_id,
           date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
           (floor((avg(value)) * 1e4 * (1 + 1e-12) + 0.5) / 1e4) AS avg_value,
           max(value) AS max_value,
           min(value) AS min_value,
           (floor((stddev_samp(value)) * 1e4 * (1 + 1e-12) + 0.5) / 1e4) AS stddev_value,
           (floor((sum(value)) * 1e4 * (1 + 1e-12) + 0.5) / 1e4) AS total_value,
           count(*) AS cnt
    FROM events
    GROUP BY 1, 2
    """,
)
def q_hourly_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly batch aggregate with stddev (Learning Guide.txt:1045 §3)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            fround(F.avg("value"), 4).alias("avg_value"),
            F.max("value").alias("max_value"),
            F.min("value").alias("min_value"),
            fround(F.stddev_samp("value"), 4).alias("stddev_value"),
            fround(F.sum("value"), 4).alias("total_value"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


@register(
    "q_daily_agg",
    oracle="""
    SELECT user_id,
           date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
           (floor((avg(value)) * 1e4 * (1 + 1e-12) + 0.5) / 1e4) AS avg_value,
           max(value) AS max_value,
           min(value) AS min_value,
           count(*) AS cnt
    FROM events
    GROUP BY 1, 2
    """,
)
def q_daily_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-sensor mart (Learning Guide.txt:1071 §2-L3).

    Day emitted as a midnight timestamp (not DATE) so both engines' pandas
    conversions agree exactly."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id", F.date_trunc("day", "ts").alias("day")).agg(
        fround(F.avg("value"), 4).alias("avg_value"),
        F.max("value").alias("max_value"),
        F.min("value").alias("min_value"),
        F.count(F.lit(1)).alias("cnt"),
    )


@register(
    "q_location_agg",
    oracle="""
    SELECT event_type,
           date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
           (floor((avg(value)) * 1e4 * (1 + 1e-12) + 0.5) / 1e4) AS avg_value,
           count(*) AS cnt,
           count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1, 2
    """,
)
def q_location_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-location/day mart (Learning Guide.txt:1071 §2-L3); event_type
    stands in for location."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type", F.date_trunc("day", "ts").alias("day")).agg(
        fround(F.avg("value"), 4).alias("avg_value"),
        F.count(F.lit(1)).alias("cnt"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "q_sort_limit",
    oracle="""
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, value
    FROM events
    ORDER BY ts DESC, event_id
    LIMIT 100
    """,
)
def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort + limit (mongo_to_postgres_sync.py:139).  Spark plans this as a
    TakeOrderedAndProject — per-partition top-k then a k-row merge on the
    driver, no global sort shuffle; exactly what you want at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("event_id", "ts", "user_id", "value")
        .orderBy(F.col("ts").desc(), "event_id")
        .limit(100)
    )


@register(
    "q_json_roundtrip",
    oracle="""
    SELECT event_id,
           -- json_merge_patch('{}', x) drops NULL-valued keys, matching
           -- Spark's to_json(struct(...)) null-field omission
           json_merge_patch('{}', to_json(struct_pack(
               event_id := event_id, user_id := user_id,
               event_type := event_type)))::VARCHAR AS payload
    FROM events
    """,
)
def q_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON encode of a struct (the Kafka-boundary to_json(struct(*)) —
    producer.py:198, SURVEY §2.7)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.to_json(F.struct("event_id", "user_id", "event_type")).alias("payload"),
    )


@register(
    "q_time_features",
    oracle="""
    SELECT event_id,
           hour(CAST(ts AS TIMESTAMP)) AS hour_of_day,
           day(CAST(ts AS TIMESTAMP)) AS day_of_month,
           month(CAST(ts AS TIMESTAMP)) AS month_of_year,
           (dayofweek(CAST(ts AS TIMESTAMP)) + 1) AS day_of_week,
           (dayofweek(CAST(ts AS TIMESTAMP)) IN (0, 6)) AS is_weekend,
           (hour(CAST(ts AS TIMESTAMP)) BETWEEN 7 AND 17) AS is_daytime
    FROM events
    """,
)
def q_time_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-part feature extraction (Learning Guide.txt:1071 §2-L2).

    Spark dayofweek: 1=Sunday..7=Saturday; DuckDB dayofweek: 0=Sunday..6,
    hence the +1 in the oracle.
    """
    ev = load_table(spark, sf_dir, "events")
    dow = F.dayofweek("ts")
    return ev.select(
        "event_id",
        F.hour("ts").alias("hour_of_day"),
        F.dayofmonth("ts").alias("day_of_month"),
        F.month("ts").alias("month_of_year"),
        dow.alias("day_of_week"),
        dow.isin(1, 7).alias("is_weekend"),
        F.hour("ts").between(7, 17).alias("is_daytime"),
    )


@register(
    "q_case_status",
    oracle=f"""
    SELECT event_id,
           CASE WHEN value IS NULL THEN 'Unknown'
                WHEN value > 15 THEN 'Faulty'
                WHEN value > 10 THEN 'Recalibration_needed'
                ELSE 'Working' END AS sensor_status,
           CAST(floor((epoch(TIMESTAMP '{NOW}') - floor(epoch(CAST(ts AS TIMESTAMP)))) / 60)
                AS BIGINT) AS freshness_minutes
    FROM events
    """,
)
def q_case_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/when status + freshness-in-minutes (Learning Guide.txt:1071 §2-L2).

    Freshness = floor(whole seconds of age / 60) against the pinned NOW so
    both engines agree on sub-minute boundaries.
    """
    ev = load_table(spark, sf_dir, "events")
    status = (
        F.when(F.col("value").isNull(), "Unknown")
        .when(F.col("value") > 15, "Faulty")
        .when(F.col("value") > 10, "Recalibration_needed")
        .otherwise("Working")
    )
    age_sec = F.expr(
        f"timestampdiff(SECOND, date_trunc('second', ts), TIMESTAMP_NTZ '{NOW}')"
    )
    return ev.select(
        "event_id",
        status.alias("sensor_status"),
        F.floor(age_sec / 60).alias("freshness_minutes"),
    )


@register(
    "q_hash_partition",
    oracle="""
    SELECT user_id,
           CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 3
                AS INT) AS partition_id,
           CAST(count(*) AS BIGINT) AS n
    FROM events
    GROUP BY user_id
    """,
)
def q_hash_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The producer's partition assignment: hash(sensor_id) % 3 keeps one
    sensor's readings ordered within a Kafka partition (data_generator/
    producer.py:227-243,281-289).  The hash is md5-derived so both engines
    compute the identical assignment (Spark's hash() is murmur3, which
    DuckDB cannot reproduce); in production the Kafka sink's `key` column
    (sources/kafka.py::to_kafka_sink_frame) delegates this to the broker's
    partitioner with the same key-stability guarantee."""
    ev = load_table(spark, sf_dir, "events")
    pid = F.expr(
        "cast(cast(conv(substr(md5(cast(user_id AS string)), 1, 15), 16, 10) "
        "AS bigint) % 3 AS int)"
    )
    return ev.groupBy("user_id").agg(
        pid.alias("partition_id"), F.count("*").cast("long").alias("n")
    )
