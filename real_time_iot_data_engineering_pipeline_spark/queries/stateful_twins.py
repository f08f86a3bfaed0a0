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


# ---------------------------------------------------------------------------
# TTL dedup: chained suppress-within-TTL-of-last-ACCEPTED (rate-limiter state)
# ---------------------------------------------------------------------------

TTL_SEC = 7200  # suppress events within 2 h of the last accepted one


def _ttl_fold_partition(batches):
    """Chained TTL fold over one PARTITION of key-sorted events: an event
    is accepted iff it is its key's first, or falls strictly more than
    TTL_SEC after the key's last ACCEPTED event.  Chained acceptance is
    genuinely sequential (each verdict depends on the previous accepted
    time, not the previous event), so no window function expresses it.

    This is the batch twin of a streaming applyInPandasWithState keyed
    TTL state, in the same shape: a per-key state dict (n, n_accepted,
    first_acc, last_acc — four scalars) carried ACROSS Arrow batches,
    emitted once at partition end.  A per-GROUP applyInPandas variant
    paid ~5 ms of pandas frame overhead per key (48 s for 7.5k keys at
    sf0.1); folding whole partitions amortizes that to one pass over
    int64 microsecond arrays."""
    ttl_us = TTL_SEC * 1_000_000
    state: dict = {}  # (user_id, event_type) -> [n, n_acc, first_us, last_acc_us]
    for pdf in batches:
        ts_us = pdf["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        uids = pdf["user_id"].to_numpy()
        # Normalize NULL keys ONCE per Arrow batch (vectorized — a per-row
        # pd.isna() call measured 1.65x on the whole query): a nullable
        # bigint arrives as float64 NaN, and NaN != NaN would give every
        # such row its OWN dict key (and sorted()/int() crash on
        # None/NaN) — the SQL group semantics the oracle has is ONE group
        # per NULL key (hostile-gate suite trap).
        if uids.dtype.kind == "i":
            uid_list = uids.tolist()
        else:
            isna = pd.isna(uids)
            uid_list = [
                None if b else int(u) for u, b in zip(uids.tolist(), isna.tolist())
            ]
        et_list = [
            e if isinstance(e, str) else None
            for e in pdf["event_type"].tolist()
        ]
        for i in range(len(ts_us)):
            k = (uid_list[i], et_list[i])
            s = state.get(k)
            if s is None:
                state[k] = [1, 1, ts_us[i], ts_us[i]]
            else:
                s[0] += 1
                if ts_us[i] > s[3] + ttl_us:
                    s[1] += 1
                    s[3] = ts_us[i]
    if state:
        # None-safe deterministic order (output order is cosmetic; the
        # driver compare is order-insensitive, but determinism is free)
        keys = sorted(
            state,
            key=lambda k: (
                k[0] is None,
                k[0] if k[0] is not None else 0,
                k[1] is None,
                k[1] if k[1] is not None else "",
            ),
        )
        rows = [state[k] for k in keys]
        yield pd.DataFrame(
            {
                "user_id": pd.array([k[0] for k in keys], dtype="Int64"),
                "event_type": [k[1] for k in keys],
                "n_events": [r[0] for r in rows],
                "n_accepted": [r[1] for r in rows],
                "first_accepted": pd.Series(
                    [r[2] for r in rows], dtype="int64"
                ).astype("datetime64[us]"),
                "last_accepted": pd.Series(
                    [r[3] for r in rows], dtype="int64"
                ).astype("datetime64[us]"),
            }
        )


@register(
    "q_ttl_dedup",
    oracle=f"""
    WITH RECURSIVE e AS (
        SELECT user_id, event_type, ts, event_id,
               row_number() OVER (
                   PARTITION BY user_id, event_type ORDER BY ts, event_id
               ) AS rn
        FROM events WHERE ts IS NOT NULL
    ),
    acc AS (
        SELECT user_id, event_type, ts, event_id, rn,
               ts AS last_acc, TRUE AS accepted
        FROM e WHERE rn = 1
        UNION ALL
        SELECT e.user_id, e.event_type, e.ts, e.event_id, e.rn,
               CASE WHEN e.ts > a.last_acc + INTERVAL {TTL_SEC} SECOND
                    THEN e.ts ELSE a.last_acc END,
               e.ts > a.last_acc + INTERVAL {TTL_SEC} SECOND
        FROM e JOIN acc a
          ON e.user_id = a.user_id AND e.event_type = a.event_type
         AND e.rn = a.rn + 1
    )
    SELECT user_id, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN accepted THEN 1 ELSE 0 END) AS BIGINT)
               AS n_accepted,
           min(CASE WHEN accepted THEN ts END) AS first_accepted,
           max(CASE WHEN accepted THEN ts END) AS last_accepted
    FROM acc
    GROUP BY user_id, event_type
    ORDER BY user_id, event_type
    """,
)
def q_ttl_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained TTL dedup (alert-suppression semantics): per sensor/metric
    key, accept an event only if it falls more than {TTL_SEC} s after the
    last ACCEPTED event — NOT the last event, which is what separates this
    from gap-based sessionization and makes the fold genuinely sequential
    (a window lag() cannot express it; the DuckDB oracle needs a
    recursive CTE stepping one row at a time).

    Scale: one hash exchange on (user_id, event_type) + an in-partition
    sort, then a single Arrow mapInPandas pass per partition — millions
    of independent keys shard across executors, per-key state is four
    scalars carried across Arrow batches (exactly the streaming
    applyInPandasWithState layout), and the output is one row per key,
    so nothing downstream sees raw events.  The partition+sort makes the
    result independent of physical partitioning (every key lives whole
    in one partition, rows arrive in (ts, event_id) order).  Timestamps
    compare at full microsecond precision in both engines (int64 us vs
    native TIMESTAMP)."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select("user_id", "event_type", "ts", "event_id")
    )
    out_schema = (
        "user_id bigint, event_type string, n_events bigint, "
        "n_accepted bigint, first_accepted timestamp_ntz, "
        "last_accepted timestamp_ntz"
    )
    return (
        ev.repartition("user_id", "event_type")
        .sortWithinPartitions("user_id", "event_type", "ts", "event_id")
        .mapInPandas(_ttl_fold_partition, out_schema)
        .orderBy("user_id", "event_type")
    )


# ---------------------------------------------------------------------------
# Fixed-window rate limiting: first N per key per tumbling window
# ---------------------------------------------------------------------------

RATE_WINDOW_MIN = 10  # tumbling window width
RATE_LIMIT_N = 3  # accepted events per key per window


@register(
    "q_rate_limit",
    oracle=f"""
    WITH ranked AS (
        SELECT user_id,
               time_bucket(INTERVAL {RATE_WINDOW_MIN} MINUTE, ts) AS win,
               row_number() OVER (
                   PARTITION BY user_id,
                       time_bucket(INTERVAL {RATE_WINDOW_MIN} MINUTE, ts)
                   ORDER BY ts, event_id
               ) AS rn
        FROM events WHERE ts IS NOT NULL
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN rn <= {RATE_LIMIT_N} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_accepted,
           CAST(count(DISTINCT win) AS BIGINT) AS n_windows,
           CAST(sum(CASE WHEN rn > {RATE_LIMIT_N} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_throttled
    FROM ranked
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def q_rate_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-window rate limiter (batch twin of a keyed streaming
    throttle): per sensor, admit the first {RATE_LIMIT_N} events of every
    tumbling {RATE_WINDOW_MIN}-minute window by (ts, event_id) order and
    throttle the rest; report per-sensor admitted/throttled totals.

    Scale: the ranking window partitions by (user_id, window-bucket) —
    cardinality grows with keys x time, so partitions stay small and
    shard evenly regardless of per-key volume (a hot sensor's events
    split across its windows); the per-user rollup partial-aggregates.
    window() bucketing matches DuckDB's time_bucket on the NTZ domain."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select("user_id", "ts", "event_id")
    )
    bucketed = ev.withColumn(
        "win",
        F.window("ts", f"{RATE_WINDOW_MIN} minutes").start,
    )
    w = Window.partitionBy("user_id", "win").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    ranked = bucketed.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum((F.col("rn") <= RATE_LIMIT_N).cast("long"))
            .cast("long")
            .alias("n_accepted"),
            F.countDistinct("win").cast("long").alias("n_windows"),
            F.sum((F.col("rn") > RATE_LIMIT_N).cast("long"))
            .cast("long")
            .alias("n_throttled"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Exponentially time-decayed counts (round 7)
# ---------------------------------------------------------------------------

DECAY_NOW = "2024-01-31 00:00:00"
DECAY_TAU_SEC = 7 * 86400  # 7-day e-folding time


@register(
    "q_decayed_counts",
    oracle=f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           {fround_sql(
               "sum(exp(-(date_diff('microsecond', CAST(ts AS TIMESTAMP), "
               f"TIMESTAMP '{DECAY_NOW}') / 1000000.0) / {DECAY_TAU_SEC}.0))",
               6,
           )} AS decayed_count,
           {fround_sql(
               "sum(exp(-(date_diff('microsecond', CAST(ts AS TIMESTAMP), "
               f"TIMESTAMP '{DECAY_NOW}') / 1000000.0) / {DECAY_TAU_SEC}.0))"
               " / count(*)",
               6,
           )} AS freshness
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_decayed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed event counts per key at a pinned `now`
    (tau = 7 days): the batch twin of a decayed heavy-hitters stream state,
    where each arrival adds weight 1 and all weights decay as
    exp(-age/tau).  `freshness` = decayed/raw count in (0, 1] ranks keys by
    how recent their traffic is — the trending-topics ordering.

    The streaming fold keeps one (count, last_ts) pair per key and decays
    lazily on arrival: count' = count * exp(-(t - last_ts)/tau) + 1, which
    telescopes to exactly this batch sum — same math, O(keys) state.

    Scale: single scan, map-side partial sums per (bounded) key; the sum is
    fround-quantized at 6 dp on both engines so summation regrouping
    cannot flip the hash."""
    ev = load_table(spark, sf_dir, "events")
    age_sec = (
        F.expr(f"timestampdiff(MICROSECOND, ts, TIMESTAMP_NTZ '{DECAY_NOW}')")
        / F.lit(1_000_000.0)
    ).cast("double")
    weight = F.exp(-age_sec / F.lit(float(DECAY_TAU_SEC)))
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            fround(F.sum(weight), 6).alias("decayed_count"),
            fround(F.sum(weight) / F.count("*"), 6).alias("freshness"),
        )
        .orderBy("event_type")
    )
