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
from pyspark.sql import functions as F

from ..functions.rounding import fround_sql
from ..registry import register
from ..sources import load_table

# The staging + intermediate dbt layers as CTEs, shared by every mart, with
# every engine-divergent fragment a format parameter so the two renderings
# cannot drift structurally.
_LAYERS_SQL = """
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
"""

# mart_iot_daily_summary (§2-L3): 1 row per sensor per day.
_DAILY_MART = """
SELECT user_id, reading_date,
       CAST(COUNT(*) AS BIGINT) AS n_readings,
       {avg_value} AS avg_value,
       MAX(value) AS max_value,
       MIN(value) AS min_value,
       {daytime_share} AS daytime_share,
       CAST({n_flagged} AS BIGINT) AS n_flagged
FROM int_features
GROUP BY user_id, reading_date
"""

# mart_iot_hourly_summary (§2-L3): 1 row per sensor per hour.  daytime_share
# is omitted — is_daytime is constant within an hour, so the column would be
# redundant at this grain.
_HOURLY_MART = """
SELECT user_id, date_trunc('hour', ts) AS reading_hour,
       CAST(COUNT(*) AS BIGINT) AS n_readings,
       {avg_value} AS avg_value,
       MAX(value) AS max_value,
       MIN(value) AS min_value,
       CAST({n_flagged} AS BIGINT) AS n_flagged
FROM int_features
GROUP BY user_id, date_trunc('hour', ts)
"""

# mart_iot_location_stats (§2-L3): 1 row per location per day, aggregated
# across all sensors in the location (event_type stands in for location —
# same mapping as queries/core.py::q_location_agg).
_LOCATION_MART = """
SELECT event_type AS location, reading_date,
       CAST(COUNT(*) AS BIGINT) AS n_readings,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_sensors,
       {avg_value} AS avg_value,
       MAX(value) AS max_value,
       MIN(value) AS min_value,
       {daytime_share} AS daytime_share,
       CAST({n_flagged} AS BIGINT) AS n_flagged
FROM int_features
GROUP BY event_type, reading_date
"""


def _render(mart_select: str, engine: str) -> str:
    """Render layers + one mart for 'spark' or 'duck'; the divergent
    fragments live here and nowhere else."""
    shared = dict(
        avg_value=fround_sql("AVG(value)"),
        daytime_share=fround_sql("AVG(CAST(is_daytime AS DOUBLE))"),
        n_flagged="COUNT(CASE WHEN sensor_status <> 'Working' THEN 1 END)",
    )
    if engine == "spark":
        # Spark dayofweek: Sunday=1 .. Saturday=7
        layers = _LAYERS_SQL.format(
            src="events_v", ts="ts", is_weekend="(dayofweek(ts) IN (1, 7))"
        )
    else:
        # DuckDB dayofweek: Sunday=0 .. Saturday=6.  The staging {ts}
        # fragment needs the VARCHAR->TIMESTAMP cast, but inside
        # int_features `ts` is already the cast CTE column.
        layers = _LAYERS_SQL.format(
            src="events",
            ts="CAST(ts AS TIMESTAMP)",
            is_weekend="(dayofweek(ts) IN (0, 6))",
        )
    return layers + mart_select.format(**shared)


def daily_mart_frame(spark: SparkSession, events: DataFrame) -> DataFrame:
    """The daily mart over an arbitrary events frame (the dbt model body,
    decoupled from the fixture loader so incremental refresh and tests can
    feed their own source)."""
    events.createOrReplaceTempView("events_v")
    return spark.sql(_render(_DAILY_MART, "spark"))


@register("q_mart_daily_sql", oracle=_render(_DAILY_MART, "duck"))
def q_mart_daily_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dbt three-layer flow through the SQL entry point: register the
    source as a temp view, run staging->features->mart as chained CTEs —
    the same engine surface dbt-on-Spark compiles to."""
    return daily_mart_frame(spark, load_table(spark, sf_dir, "events"))


@register("q_mart_hourly_sql", oracle=_render(_HOURLY_MART, "duck"))
def q_mart_hourly_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mart_iot_hourly_summary (dbt/dbt_project.yml:26-33; Learning
    Guide.txt:1071 §2-L3 'grain: 1 row per sensor per hour') through the
    same chained-CTE layers as the daily mart."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_v")
    return spark.sql(_render(_HOURLY_MART, "spark"))


@register("q_mart_location_sql", oracle=_render(_LOCATION_MART, "duck"))
def q_mart_location_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mart_iot_location_stats (dbt/dbt_project.yml:26-33; Learning
    Guide.txt:1071 §2-L3 'grain: 1 row per location per day, aggregates
    across all sensors in location').  Low-cardinality (location, day)
    grain stays scale-safe because groupBy does map-side partial
    aggregation — only #locations x #days rows ever shuffle; COUNT(DISTINCT)
    expands to a two-phase partial_agg(distinct keys) -> final count, never
    a per-group row buffer."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_v")
    return spark.sql(_render(_LOCATION_MART, "spark"))


def mart_daily_incremental_refresh(
    spark: SparkSession, events: DataFrame, sink, epoch_id: int
) -> DataFrame:
    """dbt incremental model with merge strategy (Learning Guide.txt:1071
    §2 item 5: 'make daily_summary incremental — only process new dates,
    incremental_strategy: merge').

    Computes the daily mart ONLY for days at or after the sink's high-water
    date and merges it keyed on (user_id, reading_date) via KeyedParquetSink
    (the engine's MERGE twin).  The boundary day is REPROCESSED (>=, not >):
    late rows for the newest stored day re-aggregate and the keyed merge
    overwrites — the standard one-interval lookback that makes the refresh
    idempotent and late-tolerant without full recompute.

    The watermark read is a single-row collect (the sync-state `get` —
    SURVEY §2.1/mongo_to_postgres_sync.py:129-139); everything else stays
    distributed.  At scale the day filter prunes partitions when events are
    date-partitioned on disk.  Returns the processed slice (for
    observability / tests)."""
    mart = daily_mart_frame(spark, events)
    if sink.exists():
        hwm = sink.read().agg(F.max("reading_date").alias("h")).collect()[0].h
        processed = mart.filter(F.col("reading_date") >= F.lit(hwm))
    else:
        processed = mart
    sink.upsert(processed, epoch_id)
    return processed
