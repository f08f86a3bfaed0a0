"""Driver-checkable twins of the serving layer's three endpoints
(reference api/main.py:1-17 placeholder + Learning Guide.txt:1084 spec).

Each endpoint's frame builder (serving.py) registers here with a fixed
parameterization so the driver hash-checks the exact read-path plans the
API serves: the full sensor listing, a 21-day daily analytics range for one
sensor, and the health probe against a pinned `now`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.rounding import fround_sql
from ..registry import register
from ..serving import health_frame, sensor_analytics_frame, sensors_latest_frame
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
