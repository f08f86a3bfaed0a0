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

from ..functions.rounding import fround
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


# --- round-7: CDC apply + snapshot diff --------------------------------
# The reference sync is pure upsert (mongo_to_postgres_sync.py:378-399 ON
# CONFLICT DO UPDATE); a real change-data-capture feed also carries
# deletes.  events stands in for the change log: each row is a change to
# key user_id ordered by (ts, event_id), and event_type='error' marks a
# tombstone (delete) — deterministic in both engines.

CDC_T1 = "2024-01-15 00:00:00"
CDC_T2 = "2024-01-31 00:00:00"


def _cdc_state(spark: SparkSession, sf_dir: str, upto: str) -> DataFrame:
    """Materialize the keyed state implied by the change log at time
    `upto`: last change per key wins; a last-change tombstone removes the
    key.  One struct-max argmax shuffle (same plan family as the keyed
    upsert sink, sinks/keyed_parquet.py) — never a window over history."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts") < F.lit(upto).cast("timestamp_ntz")
    )
    return (
        ev.groupBy("user_id")
        .agg(
            F.max(
                F.struct(
                    "ts",
                    "event_id",
                    (F.col("event_type") == "error").alias("is_delete"),
                    "value",
                )
            ).alias("m"),
            F.count("*").cast("bigint").alias("n_changes"),
        )
        .filter(~F.col("m.is_delete"))
        .select(
            "user_id",
            F.col("m.ts").alias("last_ts"),
            F.col("m.value").alias("last_value"),
            "n_changes",
        )
    )


_CDC_STATE_SQL = """
    SELECT user_id, last_ts, last_value, n_changes
    FROM (
        SELECT user_id,
               ts AS last_ts,
               value AS last_value,
               event_type = 'error' AS is_delete,
               CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT)
                   AS n_changes,
               row_number() OVER (
                   PARTITION BY user_id
                   ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        FROM events
        WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '{upto}'
    ) WHERE rn = 1 AND NOT is_delete
"""


@register(
    "q_cdc_apply",
    oracle=_CDC_STATE_SQL.format(upto=CDC_T2) + " ORDER BY user_id",
)
def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a change-data-capture log to a keyed table: last change per
    key wins, tombstones (event_type='error' stand-in) delete the key —
    the MERGE semantics a warehouse sync needs beyond the reference's
    upsert-only ON CONFLICT path.

    Scale: map-side partial struct-max per key, one hash shuffle on the
    high-cardinality key, no window over history; tombstone filtering
    happens on the one-row-per-key aggregate."""
    return _cdc_state(spark, sf_dir, CDC_T2).orderBy("user_id")


@register(
    "q_snapshot_diff",
    oracle=f"""
    WITH v1 AS ({_CDC_STATE_SQL.format(upto=CDC_T1)}),
    v2 AS ({_CDC_STATE_SQL.format(upto=CDC_T2)})
    SELECT coalesce(v1.user_id, v2.user_id) AS user_id,
           CASE WHEN v1.user_id IS NULL THEN 'added'
                WHEN v2.user_id IS NULL THEN 'removed'
                WHEN v1.last_ts <> v2.last_ts
                     OR v1.last_value <> v2.last_value THEN 'changed'
                ELSE 'unchanged' END AS change_type,
           v1.last_value AS v1_value,
           v2.last_value AS v2_value
    FROM v1 FULL OUTER JOIN v2 ON v1.user_id = v2.user_id
    ORDER BY user_id
    """,
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diff two versions of the CDC-derived keyed table (state at T1 vs
    T2): per key, added / removed / changed / unchanged with both values —
    the audit a warehouse runs after every sync window (and the batch twin
    of comparing two KeyedParquetSink versions).

    Scale: each snapshot is one argmax aggregate; the diff is a single
    full-outer sort-merge join on the key — both sides arrive hash-
    partitioned by that key, so the join reuses the aggregation exchange
    (no extra shuffle)."""
    v1 = _cdc_state(spark, sf_dir, CDC_T1).select(
        F.col("user_id").alias("u1"),
        F.col("last_ts").alias("t1"),
        F.col("last_value").alias("v1_value"),
    )
    v2 = _cdc_state(spark, sf_dir, CDC_T2).select(
        F.col("user_id").alias("u2"),
        F.col("last_ts").alias("t2"),
        F.col("last_value").alias("v2_value"),
    )
    joined = v1.join(v2, v1.u1 == v2.u2, "full_outer")
    change = (
        F.when(F.col("u1").isNull(), "added")
        .when(F.col("u2").isNull(), "removed")
        .when(
            (F.col("t1") != F.col("t2"))
            | (F.col("v1_value") != F.col("v2_value")),
            "changed",
        )
        .otherwise("unchanged")
    )
    return joined.select(
        F.coalesce("u1", "u2").alias("user_id"),
        change.alias("change_type"),
        "v1_value",
        "v2_value",
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# Incremental view maintenance: merge partial-aggregate state with a delta
# ---------------------------------------------------------------------------


@register(
    "q_ivm_merge",
    oracle="""
    SELECT user_id,
           date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
           CAST(count(*) AS BIGINT) AS n_readings,
           (floor((sum(value)) * 1e6 * (1 + 1e-12) + 0.5) / 1e6) AS sum_value,
           (floor((sum(value) / count(*)) * 1e6 * (1 + 1e-12) + 0.5) / 1e6)
               AS avg_value,
           max(value) AS max_value,
           min(value) AS min_value
    FROM events
    GROUP BY 1, 2
    ORDER BY user_id, day
    """,
)
def q_ivm_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for the daily mart: the standing mart
    is kept as PARTIAL aggregate state (sum/count/max/min per key — all
    algebraic, hence mergeable), a late-arriving delta batch (here:
    every 10th event by id, hitting the SAME days as the state) is
    pre-aggregated the same way, and the refreshed mart is the MERGE of
    the two partial states — never a rescan of history.  The oracle is
    the full recompute over all events, proving merge == recompute.

    This is the maintenance algebra behind the dbt incremental model
    (queries/marts.py mart_daily_incremental_refresh) stated as a
    certifiable query: at 100 TB, a day of late data costs one delta
    pre-aggregation plus a merge keyed on the (bounded) mart key — the
    historical fact table is never read again.

    Scale: two filtered partial aggregations (each with map-side
    combine) and a final re-aggregation of two mart-sized frames; AVG is
    derived from merged sum/count, the only way avg survives a merge."""
    ev = load_table(spark, sf_dir, "events")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(
            "user_id", F.date_trunc("day", "ts").alias("day")
        ).agg(
            F.count("*").alias("cnt"),
            F.sum("value").alias("s"),
            F.max("value").alias("mx"),
            F.min("value").alias("mn"),
        )

    state = partial(ev.filter(F.col("event_id") % 10 != 0))
    delta = partial(ev.filter(F.col("event_id") % 10 == 0))
    merged = (
        state.unionByName(delta)
        .groupBy("user_id", "day")
        .agg(
            F.sum("cnt").cast("long").alias("n_readings"),
            F.sum("s").alias("s"),
            F.max("mx").alias("max_value"),
            F.min("mn").alias("min_value"),
        )
    )
    return merged.select(
        "user_id",
        "day",
        "n_readings",
        fround(F.col("s"), 6).alias("sum_value"),
        fround(F.col("s") / F.col("n_readings"), 6).alias("avg_value"),
        "max_value",
        "min_value",
    ).orderBy("user_id", "day")
