"""Driver-checkable twins of the serving layer's three endpoints
(reference api/main.py:1-17 placeholder + Learning Guide.txt:1084 spec).

Each endpoint's frame builder (serving.py) registers here with a fixed
parameterization so the driver hash-checks the exact read-path plans the
API serves: the full sensor listing, a 21-day daily analytics range for one
sensor, and the health probe against a pinned `now`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..functions.rounding import fround_sql
from ..registry import register
from ..serving import (
    classify_requests_frame,
    health_frame,
    sensor_analytics_frame,
    sensor_detail_frame,
    sensors_latest_frame,
)
from ..sources import load_table

# Fixed parameterization for the driver rows; every value exists at all
# shipped SFs (user 7 has 64-81 readings per fixture; the range is 21 days
# inside the fixtures' Jan-2024 span, under the spec's 90-day cap).
ANALYTICS_SENSOR = 7
ANALYTICS_START = "2024-01-05"
ANALYTICS_END = "2024-01-25"
# One day past the fixtures' last reading: the 24h window covers Jan 30 and
# freshness lands on both sides of the 300 s 'ok' bar across SFs (168 s at
# sf0.01 -> ok; 2024 s at sf0.001 -> stale), so both CASE branches get
# exercised by the parity suite.
HEALTH_NOW = "2024-01-31 00:00:00"


@register(
    "q_serve_latest",
    oracle="""
    SELECT user_id,
           ts AS last_ts,
           event_id AS last_event_id,
           value AS last_value,
           event_type AS location,
           CASE WHEN value > 90 THEN 'Faulty'
                WHEN value > 75 THEN 'Recalibration_needed'
                ELSE 'Working' END AS sensor_status
    FROM (
        SELECT *,
               row_number() OVER (
                   PARTITION BY user_id
                   ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def q_serve_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GET /sensors read path: latest reading per sensor with its derived
    status and location — struct-max argmax, one partial-agg shuffle (the
    oracle states the same semantics as a row_number window)."""
    return sensors_latest_frame(load_table(spark, sf_dir, "events"))


@register(
    "q_serve_analytics",
    oracle=f"""
    SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS bucket,
           CAST(count(*) AS BIGINT) AS n_readings,
           {fround_sql("avg(value)")} AS avg_value,
           max(value) AS max_value,
           min(value) AS min_value
    FROM events
    WHERE user_id = {ANALYTICS_SENSOR}
      AND CAST(ts AS TIMESTAMP) >= TIMESTAMP '{ANALYTICS_START} 00:00:00'
      AND CAST(ts AS TIMESTAMP) < TIMESTAMP '{ANALYTICS_END} 00:00:00' + INTERVAL 1 DAY
    GROUP BY 1
    """,
)
def q_serve_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GET /analytics/{{sensor_id}} read path: daily avg/max/min for sensor
    {ANALYTICS_SENSOR} over an inclusive 21-day range — both predicates on
    the scan (pushdown + partition pruning), one aggregate over the slice."""
    return sensor_analytics_frame(
        load_table(spark, sf_dir, "events"),
        ANALYTICS_SENSOR,
        ANALYTICS_START,
        ANALYTICS_END,
        "daily",
    )


@register(
    "q_serve_health",
    oracle=f"""
    WITH agg AS (
        SELECT max(CAST(ts AS TIMESTAMP)) AS latest_ts,
               CAST(count(CASE WHEN CAST(ts AS TIMESTAMP)
                                    >= TIMESTAMP '{HEALTH_NOW}' - INTERVAL 24 HOURS
                                AND CAST(ts AS TIMESTAMP) < TIMESTAMP '{HEALTH_NOW}'
                               THEN 1 END) AS BIGINT) AS n_recent_24h,
               CAST(count(CASE WHEN CAST(ts AS TIMESTAMP)
                                    >= TIMESTAMP '{HEALTH_NOW}' - INTERVAL 24 HOURS
                                AND CAST(ts AS TIMESTAMP) < TIMESTAMP '{HEALTH_NOW}'
                                AND value > 90
                               THEN 1 END) AS BIGINT) AS n_faulty_24h
        FROM events
    )
    SELECT latest_ts, n_recent_24h, n_faulty_24h,
           CAST(date_diff('microsecond', latest_ts,
                          TIMESTAMP '{HEALTH_NOW}') // 1000000 AS BIGINT)
               AS freshness_sec,
           CASE WHEN date_diff('microsecond', latest_ts,
                               TIMESTAMP '{HEALTH_NOW}') // 1000000 <= 300
                THEN 'ok' ELSE 'stale' END AS status
    FROM agg
    """,
)
def q_serve_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GET /health read path: freshness + last-24h volume/failure counts vs
    the pinned now={HEALTH_NOW} — one conditional-aggregation scan."""
    return health_frame(load_table(spark, sf_dir, "events"), HEALTH_NOW)


# --- round-7 additions: the rest of the spec'd API surface ----------------
# (Learning Guide.txt:1084 — /sensors query params + pagination, hourly
# granularity, the /sensors/{id} detail what-if, and the 400/404 error
# mapping — each as a driver-checkable read-path query.)

PAGE_LOCATION = "click"  # event_type stands in for city, as in q_location_agg
PAGE_LIMIT = 10
DETAIL_SENSOR = 7
HOURLY_START = "2024-01-10"
HOURLY_END = "2024-01-12"

_LATEST_CTE = """
    SELECT user_id,
           ts AS last_ts,
           event_id AS last_event_id,
           value AS last_value,
           event_type AS location,
           CASE WHEN value > 90 THEN 'Faulty'
                WHEN value > 75 THEN 'Recalibration_needed'
                ELSE 'Working' END AS sensor_status
    FROM (
        SELECT *,
               row_number() OVER (
                   PARTITION BY user_id
                   ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
"""


@register(
    "q_serve_sensors_page",
    oracle=f"""
    WITH latest AS ({_LATEST_CTE})
    SELECT * FROM latest
    WHERE location = '{PAGE_LOCATION}' AND sensor_status = 'Working'
    ORDER BY user_id
    LIMIT {PAGE_LIMIT}
    """,
)
def q_serve_sensors_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GET /sensors?location=&status=&limit=: the spec's filtered +
    paginated listing (query params location, status, limit — Learning
    Guide.txt:1084 §2).  Filters apply to the one-row-per-sensor argmax
    result; the limit lowers to TakeOrderedAndProject (sort carries only
    the page, never the full listing)."""
    return sensors_latest_frame(
        load_table(spark, sf_dir, "events"),
        location=PAGE_LOCATION,
        status="Working",
        limit=PAGE_LIMIT,
    )


@register(
    "q_serve_analytics_hourly",
    oracle=f"""
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket,
           CAST(count(*) AS BIGINT) AS n_readings,
           {fround_sql("avg(value)")} AS avg_value,
           max(value) AS max_value,
           min(value) AS min_value
    FROM events
    WHERE user_id = {DETAIL_SENSOR}
      AND CAST(ts AS TIMESTAMP) >= TIMESTAMP '{HOURLY_START} 00:00:00'
      AND CAST(ts AS TIMESTAMP) < TIMESTAMP '{HOURLY_END} 00:00:00' + INTERVAL 1 DAY
    GROUP BY 1
    """,
)
def q_serve_analytics_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GET /analytics/{{id}}?granularity=hourly: the spec's other
    granularity over an inclusive 3-day range — same pushed-down scan
    slice as the daily path, hour-truncated buckets."""
    return sensor_analytics_frame(
        load_table(spark, sf_dir, "events"),
        DETAIL_SENSOR,
        HOURLY_START,
        HOURLY_END,
        "hourly",
    )


@register(
    "q_serve_sensor_detail",
    oracle=f"""
    WITH one AS (
        SELECT *,
               row_number() OVER (
                   ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        FROM events WHERE user_id = {DETAIL_SENSOR}
    )
    SELECT user_id,
           max(CASE WHEN rn = 1 THEN ts END) AS last_ts,
           max(CASE WHEN rn = 1 THEN event_id END) AS last_event_id,
           max(CASE WHEN rn = 1 THEN value END) AS last_value,
           max(CASE WHEN rn = 1 THEN event_type END) AS location,
           CASE WHEN max(CASE WHEN rn = 1 THEN value END) > 90 THEN 'Faulty'
                WHEN max(CASE WHEN rn = 1 THEN value END) > 75
                     THEN 'Recalibration_needed'
                ELSE 'Working' END AS sensor_status,
           min(ts) AS first_ts,
           CAST(count(*) AS BIGINT) AS n_readings,
           {fround_sql("avg(value)")} AS avg_value,
           max(value) AS max_value,
           min(value) AS min_value
    FROM one
    GROUP BY user_id
    """,
)
def q_serve_sensor_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GET /sensors/{{id}} detail: sensor {DETAIL_SENSOR}'s latest reading
    (struct-max argmax, event_id tiebreak) plus lifetime stats, all from
    one aggregate over the sensor-pruned scan.  An unknown id yields an
    empty frame, which ServingLayer.sensor maps to the spec's 404."""
    return sensor_detail_frame(
        load_table(spark, sf_dir, "events"), DETAIL_SENSOR
    )


# Fixed request-audit batch: every validation rule and both error codes
# exercised, plus an SF-dependent existence case (sensor 100 exists from
# sf0.01 up, not at sf0.001 — both engines see the same fixture either way).
_REQUESTS = (
    (1, 7, "2024-01-05", "2024-01-25", "daily"),      # 200
    (2, 3, "2024-01-10", "2024-01-12", "hourly"),     # 200
    (3, 99999, "2024-01-05", "2024-01-10", "daily"),  # 404 everywhere
    (4, 7, "2024-01-25", "2024-01-05", "daily"),      # 400 start_after_end
    (5, 7, "2023-10-01", "2024-01-25", "daily"),      # 400 range_over_90_days
    (6, 7, "2024-01-05", "2024-01-25", "weekly"),     # 400 bad_granularity
    (7, 7, "not-a-date", "2024-01-25", "daily"),      # 400 bad_date_format
    (8, 100, "2024-01-05", "2024-01-10", "daily"),    # 404 at sf0.001, else 200
    (9, 7, "2024-02-10", "2024-02-20", "daily"),      # 404: range past the data
)
_REQUESTS_SCHEMA = T.StructType(
    [
        T.StructField("request_id", T.IntegerType()),
        T.StructField("sensor_id", T.IntegerType()),
        T.StructField("start_date", T.StringType()),
        T.StructField("end_date", T.StringType()),
        T.StructField("granularity", T.StringType()),
    ]
)
_REQUESTS_VALUES = ", ".join(
    f"({r[0]}, {r[1]}, '{r[2]}', '{r[3]}', '{r[4]}')" for r in _REQUESTS
)


@register(
    "q_serve_request_audit",
    oracle=f"""
    WITH requests(request_id, sensor_id, start_date, end_date, granularity)
        AS (VALUES {_REQUESTS_VALUES}),
    req AS (
        SELECT CAST(request_id AS INT) AS request_id,
               CAST(sensor_id AS INT) AS sensor_id,
               TRY_CAST(start_date AS DATE) AS start_d,
               TRY_CAST(end_date AS DATE) AS end_d,
               granularity
        FROM requests
    ),
    checked AS (
        SELECT *,
               CASE WHEN start_d IS NULL OR end_d IS NULL
                         THEN 'bad_date_format'
                    WHEN start_d > end_d THEN 'start_after_end'
                    WHEN date_diff('day', start_d, end_d) > 90
                         THEN 'range_over_90_days'
                    WHEN granularity NOT IN ('hourly', 'daily')
                         THEN 'bad_granularity'
               END AS reason
        FROM req
    ),
    counts AS (
        SELECT c.request_id, CAST(count(*) AS BIGINT) AS n_rows
        FROM checked c
        JOIN events e
          ON e.user_id = c.sensor_id
         AND CAST(e.ts AS TIMESTAMP) >= CAST(c.start_d AS TIMESTAMP)
         AND CAST(e.ts AS TIMESTAMP)
             < CAST(c.end_d AS TIMESTAMP) + INTERVAL 1 DAY
        WHERE c.reason IS NULL
        GROUP BY c.request_id
    )
    SELECT c.request_id, c.sensor_id, c.granularity,
           CAST(CASE WHEN c.reason IS NOT NULL THEN 400
                     WHEN n.n_rows IS NULL THEN 404
                     ELSE 200 END AS INT) AS status_code,
           COALESCE(c.reason,
                    CASE WHEN n.n_rows IS NULL THEN 'sensor_not_found' END)
               AS error_reason,
           COALESCE(n.n_rows, 0) AS n_rows
    FROM checked c LEFT JOIN counts n USING (request_id)
    ORDER BY c.request_id
    """,
)
def q_serve_request_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the API's error mapping (spec §3-4: 400 invalid
    parameters, 404 sensor not found, else 200) over a fixed request
    audit log: every guard rule fires on at least one request, both
    error codes and the happy path appear, and the 200 rows carry the
    count the endpoint would serve.

    Scale: the tiny request table broadcasts into the events scan (one
    pass over the fact table regardless of request count); see
    serving.classify_requests_frame."""
    requests = spark.createDataFrame(list(_REQUESTS), _REQUESTS_SCHEMA)
    return classify_requests_frame(
        load_table(spark, sf_dir, "events"), requests
    ).orderBy("request_id")
