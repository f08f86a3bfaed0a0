"""Summary/sketch operators over `events`: per-type quantile summaries and
distinct-user counts — the monitoring aggregates a pipeline publishes about
itself (latency/value distributions, reach).

Pattern (same as the LSH recall contract in tests/test_similarity.py): the
REGISTERED query computes the exact statistic so it is oracle-checkable
bit-for-bit; the sketch twin (approx_percentile's KLL-style summary,
approx_count_distinct's HyperLogLog++) is quality-tested against the exact
result in tests/test_sketches.py.  At 100 TB the sketches are the first
choice — mergeable, bounded-memory partial aggregates — while the exact
forms stay available when the group cardinality and value-domain sizes
allow (both are two-phase partial aggs, not sorts; see docstrings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import fround, fround_sql
from ..registry import register
from ..sources import load_table

QUANTILES = (0.5, 0.9, 0.99)


@register(
    "q_quantile_summary",
    oracle=f"""
    SELECT event_type,
           {fround_sql("quantile_cont(value, 0.5)")} AS p50,
           {fround_sql("quantile_cont(value, 0.9)")} AS p90,
           {fround_sql("quantile_cont(value, 0.99)")} AS p99,
           CAST(count(*) AS BIGINT) AS n
    FROM events
    GROUP BY event_type
    """,
)
def q_quantile_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type value distribution summary: exact linear-interpolated
    p50/p90/p99 plus row count.

    Scale: Spark's exact `percentile` is a hash-accumulating partial
    aggregate (value -> count map, merged map-side) — no per-group sort —
    but its state is O(distinct values per group), so on an unbounded
    value domain the production path is `approx_percentile` (bounded
    KLL-style summary, same two-phase shape); the sketch's error vs this
    exact form is pinned in tests/test_sketches.py.  The exact form is
    registered because the driver oracle demands bit-reproducibility."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        fround(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        fround(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
        fround(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
        F.count("*").cast("long").alias("n"),
    )


@register(
    "q_distinct_users",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def q_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type reach: exact distinct-user count plus event count.

    Scale: exact count-distinct is two-phase — first a partial dedup on
    (event_type, user_id), then a count — so it shuffles one row per
    distinct pair, never materializes a per-group set.  When that shuffle
    volume itself is the problem (billions of distinct keys), the
    HyperLogLog++ sketch (`approx_count_distinct`) cuts state to KBs per
    group at a ~2% default error — its accuracy vs this exact form is
    pinned in tests/test_sketches.py."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.count("*").cast("long").alias("n_events"),
    )


@register(
    "q_mad_outliers",
    oracle=f"""
    WITH med AS (
        SELECT event_type,
               {fround_sql("quantile_cont(value, 0.5)")} AS med
        FROM events WHERE value IS NOT NULL
        GROUP BY event_type
    ),
    mad AS (
        SELECT e.event_type,
               {fround_sql("quantile_cont(abs(e.value - m.med), 0.5)")} AS mad
        FROM events e JOIN med m ON e.event_type = m.event_type
        WHERE e.value IS NOT NULL
        GROUP BY e.event_type
    )
    SELECT e.event_type, m.med, d.mad,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN abs(e.value - m.med) > 3 * d.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM events e
    JOIN med m ON e.event_type = m.event_type
    JOIN mad d ON e.event_type = d.event_type
    WHERE e.value IS NOT NULL
    GROUP BY e.event_type, m.med, d.mad
    """,
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection by median absolute deviation: per sensor
    type, the median, the MAD (median of |value - median|), and how many
    readings sit beyond 3 MADs — the z-score flagger's (q_zscore_flag)
    robust twin, immune to the very outliers it hunts.

    Scale: exact MAD is irreducibly multi-pass (the second median depends
    on the first), so the plan is three scans, each a partial-aggregating
    groupBy on event_type with the 5-row median/MAD tables BROADCAST back
    between passes — no fact shuffle anywhere.  The production single-pass
    variant swaps both medians for approx_percentile (same plan shape,
    bounded state); the exact form is registered for the driver oracle's
    bit-reproducibility, mirroring q_quantile_summary's contract.

    Determinism: both medians are 4 dp-quantized BEFORE the deviation /
    threshold comparisons, so |v - med| and 3*mad are IEEE-identical
    across engines and boundary membership cannot flip on interpolation
    ulps."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    ).select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        fround(F.expr("percentile(value, 0.5)"), 4).alias("med")
    )
    with_med = ev.join(F.broadcast(med), "event_type")
    mad = with_med.groupBy("event_type").agg(
        fround(F.expr("percentile(abs(value - med), 0.5)"), 4).alias("mad")
    )
    return (
        with_med.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(
                F.when(
                    F.abs(F.col("value") - F.col("med")) > 3 * F.col("mad"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
    )
