"""Batch oracle twins of the streaming stateful folds.

streaming/stateful.py carries three applyInPandasWithState operators
(Misra-Gries heavy hitters, Welford z-score moments, online CUSUM) whose
correctness is golden-tested but — being streaming — can't earn driver
CORRECTNESS rows.  Each operator here re-expresses the SAME mathematics as
a bounded, deterministic batch query with a DuckDB oracle, so the stateful
tier's math gains hard-signal certification (round-5 verdict ask #4):

- q_misra_gries     <-> heavy_hitters_stream (stateful.py:308-390)
- q_welford_stats   <-> zscore_stream's (n, mean, M2) state (stateful.py:210-256)
- q_cusum_alarm     <-> cusum_stream's s+/s- Lindley recursion (stateful.py:121-151)

Reference parity: the reference pipeline has no sketch tier at all (its
validation consumer is row-at-a-time Python, data_quality/
validation_consumer.py); these operators are part of the 100 TB brief's
"training-data pipeline" surface, not reference ports.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import fround, fround_sql
from ..registry import register
from ..sources import load_table

# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters: bounded-memory candidates + exact recount
# ---------------------------------------------------------------------------

# Global support threshold: heavy <=> count > N / SUPPORT_K.
SUPPORT_K = 125
# Per-partition Misra-Gries capacity.  An item with global count > N/K is,
# by averaging, above n_p/K in at least one partition; MG with C counters
# guarantees survival of every item with partition count > n_p/(C+1), so
# C = 2K makes the per-partition candidate union a SUPERSET of the global
# heavy hitters REGARDLESS of row order or partitioning — which is why the
# final output is deterministic even though intermediate summaries aren't.
MG_CAPACITY = 2 * SUPPORT_K


def _mg_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """One Misra-Gries summary per partition (streaming fold of
    stateful.py:_misra_gries, minus cross-batch state): at most MG_CAPACITY
    counters live at any moment, independent of partition size or key
    cardinality."""
    summary: dict[int, int] = {}
    for pdf in batches:
        for k in pdf["key"]:
            k = int(k)
            if k in summary:
                summary[k] += 1
            elif len(summary) < MG_CAPACITY:
                summary[k] = 1
            else:  # decrement-all eviction
                summary = {kk: c - 1 for kk, c in summary.items() if c > 1}
    yield pd.DataFrame({"key": sorted(summary)})


@register(
    "q_misra_gries",
    oracle=f"""
    WITH keyed AS (
        SELECT user_id AS key FROM events WHERE user_id IS NOT NULL
    ),
    tot AS (SELECT CAST(count(*) AS DOUBLE) AS n_total FROM keyed)
    SELECT k.key AS user_id,
           CAST(count(*) AS BIGINT) AS n,
           {fround_sql("count(*) / any_value(t.n_total)", 6)} AS support
    FROM keyed k, tot t
    GROUP BY k.key
    HAVING count(*) > any_value(t.n_total) / {SUPPORT_K}
    """,
)
def q_misra_gries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters above 1/{SUPPORT_K} support via the Misra-Gries
    two-phase plan: (1) a bounded-memory MG summary per partition
    (mapInPandas, <= {MG_CAPACITY} counters each — the batch form of
    streaming/stateful.py::heavy_hitters_stream), whose union is a
    guaranteed superset of the true heavy hitters; (2) an exact recount
    restricted to those candidates by a broadcast semi-join, then the
    support filter.

    Unlike q_heavy_hitters' exact groupBy (state = O(distinct keys)), this
    plan's aggregation state is bounded by |candidates| <= partitions x
    {MG_CAPACITY} — the shape that survives an unbounded key domain at
    100 TB.  The MG summaries are order-dependent; the final output is not
    (superset guarantee + exact recount), which is what makes it
    oracle-checkable."""
    keyed = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select(F.col("user_id").cast("long").alias("key"))
    )
    candidates = keyed.mapInPandas(_mg_partition, "key long").dropDuplicates(
        ["key"]
    )
    total = keyed.agg(F.count("*").cast("double").alias("n_total"))
    return (
        keyed.join(F.broadcast(candidates), "key")
        .groupBy("key")
        .agg(F.count("*").cast("long").alias("n"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n") > F.col("n_total") / SUPPORT_K)
        .select(
            F.col("key").alias("user_id"),
            "n",
            fround(F.col("n") / F.col("n_total"), 6).alias("support"),
        )
    )


# ---------------------------------------------------------------------------
# Welford moments: the z-score stream's exact state triple, per sensor
# ---------------------------------------------------------------------------

WELFORD_MIN_OBS = 5  # stateful.py ZSCORE_MIN_OBS


@register(
    "q_welford_stats",
    oracle=f"""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n,
           {fround_sql("avg(value)", 6)} AS mean,
           {fround_sql("var_samp(value) * (count(*) - 1)", 4)} AS m2,
           {fround_sql("var_samp(value)", 6)} AS variance,
           {fround_sql("stddev_samp(value)", 6)} AS std,
           {fround_sql("stddev_samp(value) / avg(value)", 6)} AS cv
    FROM events
    WHERE user_id IS NOT NULL AND value IS NOT NULL
    GROUP BY user_id
    HAVING count(*) >= {WELFORD_MIN_OBS}
    """,
)
def q_welford_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-sensor Welford state (n, mean, M2) plus derived variance/std/cv —
    the exact batch value of the state zscore_stream
    (streaming/stateful.py:210-256) carries across micro-batches, so the
    stream's moment math is certified against a DuckDB oracle.

    Scale: Spark's avg/var_samp are merge-stable central-moment partial
    aggregates (Chan et al. pairwise merge — the same numerics class as
    Welford's online form), computed in ONE pass with map-side combine;
    state is O(groups), never O(rows).  M2 = var_samp * (n-1) recovers the
    raw state field."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    return (
        ev.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.avg("value").alias("_mean"),
            F.var_samp("value").alias("_var"),
            F.stddev_samp("value").alias("_std"),
        )
        .filter(F.col("n") >= WELFORD_MIN_OBS)
        .select(
            "user_id",
            "n",
            fround(F.col("_mean"), 6).alias("mean"),
            fround(F.col("_var") * (F.col("n") - 1), 4).alias("m2"),
            fround(F.col("_var"), 6).alias("variance"),
            fround(F.col("_std"), 6).alias("std"),
            fround(F.col("_std") / F.col("_mean"), 6).alias("cv"),
        )
    )


# ---------------------------------------------------------------------------
# Online CUSUM via the Lindley closed form
# ---------------------------------------------------------------------------

CUSUM_SLACK = "2.0"  # stateful.py cusum_stream default slack
# Alarm threshold.  The stream's default (30.0) is tuned for short
# micro-batch series; over the fixture's full ~70-reading series every
# sensor's natural excursion crosses it, so the batch twin uses a level
# that splits the fleet (~60% alarmed at sf0.01) and exercises both
# verdicts plus the null first_alarm_ts path.
CUSUM_H = "400.0"


@register(
    "q_cusum_alarm",
    oracle=f"""
    WITH base AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value
        FROM events
        WHERE user_id IS NOT NULL AND value IS NOT NULL AND ts IS NOT NULL
    ),
    mu AS (SELECT {fround_sql("avg(value)", 4)} AS mu0 FROM base),
    cum AS (
        SELECT b.user_id, b.ts, b.event_id,
               sum(b.value - m.mu0 - {CUSUM_SLACK}) OVER w AS c_pos,
               sum(m.mu0 - b.value - {CUSUM_SLACK}) OVER w AS c_neg
        FROM base b, mu m
        WINDOW w AS (
            PARTITION BY b.user_id ORDER BY b.ts, b.event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        )
    ),
    lindley AS (
        SELECT user_id, ts, event_id,
               c_pos - least(min(c_pos) OVER w, 0) AS s_pos,
               c_neg - least(min(c_neg) OVER w, 0) AS s_neg
        FROM cum
        WINDOW w AS (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        )
    ),
    flagged AS (
        SELECT user_id, ts, s_pos, s_neg,
               ({fround_sql("s_pos", 6)} > {CUSUM_H}
                OR {fround_sql("s_neg", 6)} > {CUSUM_H}) AS alarm
        FROM lindley
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n,
           {fround_sql("max(s_pos)", 4)} AS max_s_pos,
           {fround_sql("max(s_neg)", 4)} AS max_s_neg,
           min(CASE WHEN alarm THEN ts END) AS first_alarm_ts,
           coalesce(bool_or(alarm), FALSE) AS alarmed
    FROM flagged
    GROUP BY user_id
    """,
)
def q_cusum_alarm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-sensor online CUSUM (Page 1954) as a batch query: the one-sided
    sums s+ = max(0, s+ + (x - mu0 - slack)) and s- = max(0, s- + (mu0 - x
    - slack)) that cusum_stream (streaming/stateful.py:121-151) folds
    row-by-row have the Lindley closed form

        S_t = C_t - min(0, min_{{j<=t}} C_j),   C_t = cumsum(y),

    so the whole recursion becomes two cumulative windows — no Python fold,
    no recursion, pure whole-stage-codegen window math.  Output per sensor:
    max excursions and the FIRST alarm timestamp (identical to the
    restart-after-alarm stream up to that first alarm, which is the part
    the closed form can certify; post-alarm restarts are streaming-only
    behavior covered by tests/test_stateful.py).

    Scale: one shuffle on user_id; both window passes reuse that partition
    ordering.  mu0 is the (4dp-quantized) global mean via a broadcast
    scalar, and alarms compare 6dp-quantized sums so both engines sit on
    the same side of the threshold."""
    base = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("value").isNotNull()
        & F.col("ts").isNotNull()
    )
    mu = base.agg(fround(F.avg("value"), 4).alias("mu0"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    slack = F.expr(f"CAST({CUSUM_SLACK} AS DOUBLE)")
    h = F.expr(f"CAST({CUSUM_H} AS DOUBLE)")
    cum = base.crossJoin(F.broadcast(mu)).select(
        "user_id",
        "ts",
        "event_id",
        F.sum(F.col("value") - F.col("mu0") - slack).over(w).alias("c_pos"),
        F.sum(F.col("mu0") - F.col("value") - slack).over(w).alias("c_neg"),
    )
    lindley = cum.select(
        "user_id",
        "ts",
        (F.col("c_pos") - F.least(F.min("c_pos").over(w), F.lit(0.0))).alias(
            "s_pos"
        ),
        (F.col("c_neg") - F.least(F.min("c_neg").over(w), F.lit(0.0))).alias(
            "s_neg"
        ),
    )
    flagged = lindley.withColumn(
        "alarm", (fround(F.col("s_pos"), 6) > h) | (fround(F.col("s_neg"), 6) > h)
    )
    return flagged.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n"),
        fround(F.max("s_pos"), 4).alias("max_s_pos"),
        fround(F.max("s_neg"), 4).alias("max_s_neg"),
        F.min(F.when(F.col("alarm"), F.col("ts"))).alias("first_alarm_ts"),
        F.coalesce(F.max("alarm"), F.lit(False)).alias("alarmed"),
    )
