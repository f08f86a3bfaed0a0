"""Beyond-reference windowing families: sliding and session windows.

The reference uses only 5-minute tumbling windows (SURVEY §2.8 — "no
sliding or session windows anywhere"); Spark gives both for free
(F.window(slide), F.session_window), and a user extending the reference
pipeline reaches for them immediately (overlap-smoothed dashboards,
visit/sessionization analytics).  Both are exact-oracled:

- sliding windows: a row in a 10-min/5-min-slide window belongs to exactly
  two epoch-aligned starts — time_bucket(5m, ts) and that minus 5m — so the
  oracle materializes the assignment as a 2-way UNION ALL;
- session windows (5-min inactivity gap): classic sessionization —
  session id = running count of gap-breaks per key, then one group-by.

Scale: sliding windows multiply shuffle rows by window/slide (2x here) but
partial aggregation still reduces map-side; session windows shuffle by key
once (Spark's SessionWindow exec merges per key in state — batch mode sorts
within key partitions, high-cardinality user_id keys, no stragglers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import fround, fround_sql
from ..registry import register
from ..sources import load_table

SESSION_GAP = "5 minutes"


@register(
    "q_sliding_agg",
    oracle=f"""
    WITH assigned AS (
        SELECT user_id, value,
               time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)) AS wstart
        FROM events WHERE value IS NOT NULL
        UNION ALL
        SELECT user_id, value,
               time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP))
                   - INTERVAL '5 minutes' AS wstart
        FROM events WHERE value IS NOT NULL
    )
    SELECT user_id, wstart AS window_start,
           wstart + INTERVAL '10 minutes' AS window_end,
           CAST(count(*) AS BIGINT) AS n,
           {fround_sql("avg(value)")} AS avg_value
    FROM assigned
    GROUP BY user_id, wstart
    """,
)
def q_sliding_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding every 5 minutes per key: each reading
    lands in exactly two overlapping windows — the smoothed-dashboard twin
    of the reference's tumbling aggregate."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = F.window("ts", "10 minutes", "5 minutes")
    return (
        ev.groupBy("user_id", w.alias("w"))
        .agg(
            F.count("*").cast("long").alias("n"),
            fround(F.avg("value"), 4).alias("avg_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n",
            "avg_value",
        )
    )


@register(
    "q_session_agg",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
               CASE WHEN CAST(ts AS TIMESTAMP)
                         - lag(CAST(ts AS TIMESTAMP)) OVER w > INTERVAL '5 minutes'
                      OR lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events WHERE value IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP))
    ),
    sessions AS (
        SELECT user_id, ts, value,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS session_id
        FROM ordered
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL '5 minutes' AS session_end,
           CAST(count(*) AS BIGINT) AS n,
           {fround_sql("sum(value)")} AS sum_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def q_session_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization per key: a session closes after 5 minutes of
    inactivity; window end = last event + gap (Spark session_window
    semantics, mirrored in the oracle by a running count of gap-breaks)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = F.session_window("ts", SESSION_GAP)
    return (
        ev.groupBy("user_id", w.alias("w"))
        .agg(
            F.count("*").cast("long").alias("n"),
            fround(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n",
            "sum_value",
        )
    )
