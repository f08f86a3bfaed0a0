"""The reference's dbt mart layer as Spark SQL over temp views.

The reference SPECS (never implements) a dbt project: staging view ->
intermediate feature view -> daily/hourly/location marts
(dbt/dbt_project.yml:26-33; Learning Guide.txt:1071 §2: stg_iot_readings
adds _row_number, int_iot_with_features adds time features + sensor_status,
mart_iot_daily_summary is 1 row/sensor/day).  SURVEY §1.4 maps dbt to
"temp views + spark.sql" — this module IS that mapping: the three layers are
chained CTEs in one SQL statement, so a dbt user's mental model (refs
between models) transfers directly, and Catalyst fuses the layers into a
single plan (views cost nothing — no materialization between layers).

Scale: the fused plan is scan -> projection (features) -> one partial+final
aggregation on (user, day); the _row_number staging column partitions by the
natural key (user_id, high cardinality), not a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.rounding import fround_sql
from ..registry import register
from ..sources import load_table

# The three dbt layers as CTEs, with every engine-divergent fragment a
# format parameter so the two renderings cannot drift structurally.
_MART_SQL = """
WITH stg_readings AS (          -- stg_iot_readings (Learning Guide §2-L1)
    SELECT event_id, user_id, {ts} AS ts, event_type, value,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY {ts}, event_id) AS _row_number
    FROM {src}
    WHERE value IS NOT NULL
),
int_features AS (               -- int_iot_with_features (§2-L2)
    SELECT *,
           date_trunc('day', ts) AS reading_date,  -- midnight timestamp, not
                                                   -- DATE: pandas parity
                                                   -- (see analytics._daily)
           (extract(hour FROM ts) >= 7 AND extract(hour FROM ts) < 18)
               AS is_daytime,
           {is_weekend} AS is_weekend,
           CASE WHEN value > 90 THEN 'Faulty'
                WHEN value > 75 THEN 'Recalibration_needed'
                ELSE 'Working' END AS sensor_status
    FROM stg_readings
)
SELECT user_id, reading_date,   -- mart_iot_daily_summary (§2-L3)
       CAST(COUNT(*) AS BIGINT) AS n_readings,
       {avg_value} AS avg_value,
       MAX(value) AS max_value,
       MIN(value) AS min_value,
       {daytime_share} AS daytime_share,
       CAST({n_flagged} AS BIGINT) AS n_flagged
FROM int_features
GROUP BY user_id, reading_date
"""

_SPARK_MART = _MART_SQL.format(
    src="events_v",
    ts="ts",
    # Spark dayofweek: Sunday=1 .. Saturday=7
    is_weekend="(dayofweek(ts) IN (1, 7))",
    avg_value=fround_sql("AVG(value)"),
    daytime_share=fround_sql("AVG(CAST(is_daytime AS DOUBLE))"),
    n_flagged="COUNT(CASE WHEN sensor_status <> 'Working' THEN 1 END)",
)

_DUCK_MART = _MART_SQL.format(
    src="events",
    ts="CAST(ts AS TIMESTAMP)",
    # DuckDB dayofweek: Sunday=0 .. Saturday=6
    is_weekend="(dayofweek(CAST(ts AS TIMESTAMP)) IN (0, 6))",
    avg_value=fround_sql("AVG(value)"),
    daytime_share=fround_sql("AVG(CAST(is_daytime AS DOUBLE))"),
    n_flagged="COUNT(CASE WHEN sensor_status <> 'Working' THEN 1 END)",
)
# inside int_features, `ts` is already the cast CTE column on both engines —
# the raw {ts} fragment only feeds the staging layer, so fix the weekend
# fragment to reference the CTE column:
_DUCK_MART = _DUCK_MART.replace(
    "(dayofweek(CAST(ts AS TIMESTAMP)) IN (0, 6))", "(dayofweek(ts) IN (0, 6))"
)


@register("q_mart_daily_sql", oracle=_DUCK_MART)
def q_mart_daily_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dbt three-layer flow through the SQL entry point: register the
    source as a temp view, run staging->features->mart as chained CTEs —
    the same engine surface dbt-on-Spark compiles to."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_v")
    return spark.sql(_SPARK_MART)
