"""Behavioral / reshaping analytics over `events`: wide pivot, heavy
hitters, sequential funnel, and cohort retention.

These are the product-analytics queries a user of the reference pipeline
writes the week after the dashboards exist (the reference's Learning
Guide stops at flat aggregates): which device types dominate each day
(pivot), which (type, sensor) pairs flood the stream (heavy hitters), how
often does the view -> click -> purchase sequence complete (funnel), and
how long do sensors keep reporting after first contact (retention).

Scale design (SCALE.md "Behavioral analytics"):
- pivot: explicit value vocabulary (no hidden distinct-scan job); compiles
  to ONE pass of conditional partial aggregates — shuffle carries
  days x |vocab| cells, not rows.
- heavy hitters: exact two-phase groupBy (partial agg collapses map-side);
  the sketch twin (count-min) is quality-pinned in tests/test_behavior.py,
  mirroring the sketches-family contract.
- funnel: each stage is an equi-join on the HIGH-cardinality user key with
  the time ordering as a residual predicate — never a per-user sort of the
  whole stream; stage inputs are pre-filtered to their event type so join
  sides shrink monotonically.
- retention: first-seen derivation is a partial-agg min; the cohort matrix
  is days x offsets cells after a distinct on (cohort, offset, user).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.prefix import (
    bucketed_row_number,
    bucketed_running_sum,
    ntile_from_rank,
)
from ..functions.rounding import fround, fround_sql
from ..registry import register
from ..sources import load_table
from ..sources.tables import is_large_input

# The fixture's device/event vocabulary (TESTDATA.md).  Supplying it to
# pivot() skips the extra distinct-values job Spark otherwise runs, and at
# 100 TB the vocabulary is schema knowledge, not something to rediscover.
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")

# Heavy-hitter support threshold: pairs at or above this count.
_HH_MIN_COUNT = 15

_FUNNEL_WINDOW_HOURS = 24


@register(
    "q_pivot_daily",
    oracle=f"""
    SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
           {fround_sql("avg(value) FILTER (WHERE event_type = 'click')")} AS click,
           {fround_sql("avg(value) FILTER (WHERE event_type = 'error')")} AS error,
           {fround_sql("avg(value) FILTER (WHERE event_type = 'purchase')")} AS purchase,
           {fround_sql("avg(value) FILTER (WHERE event_type = 'signup')")} AS signup,
           {fround_sql("avg(value) FILTER (WHERE event_type = 'view')")} AS view
    FROM events
    WHERE ts IS NOT NULL
    GROUP BY 1
    """,
)
def q_pivot_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-to-wide reshape: one row per day, one mean-value column per
    event type.  With the vocabulary passed explicitly, Spark's pivot
    compiles to conditional aggregates in a single pass — the plan is
    identical to hand-written FILTER aggregates and shuffles only
    days x |vocab| cells."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .pivot("event_type", list(EVENT_TYPES))
        .agg(fround(F.avg("value"), 4))
    )


@register(
    "q_heavy_hitters",
    oracle=f"""
    SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS n
    FROM events
    GROUP BY event_type, user_id
    HAVING count(*) >= {_HH_MIN_COUNT}
    """,
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact frequent-pair mining: (device type, sensor) combinations at or
    above the support threshold — the flood/hot-key detector.  Exact is a
    two-phase partial aggregate (map-side collapse, then HAVING on the
    merged counts); the bounded-memory twin for an unbounded key domain is
    a count-min sketch, quality-pinned against these exact counts in
    tests/test_behavior.py (overestimate-only, eps*N additive bound)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type", "user_id")
        .agg(F.count("*").cast("long").alias("n"))
        .filter(F.col("n") >= _HH_MIN_COUNT)
    )


@register(
    "q_funnel",
    oracle=f"""
    WITH v AS (
        SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t_view
        FROM events WHERE event_type = 'view' AND ts IS NOT NULL
        GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t_click
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > v.t_view
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t_purchase
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > c.t_click
        GROUP BY e.user_id
    )
    SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
           CAST(1 + (c.user_id IS NOT NULL)::INT
                  + (p.user_id IS NOT NULL)::INT AS BIGINT) AS stages,
           coalesce(p.t_purchase <= v.t_view + INTERVAL {_FUNNEL_WINDOW_HOURS} HOUR,
                    FALSE) AS converted
    FROM v LEFT JOIN c ON v.user_id = c.user_id
           LEFT JOIN p ON v.user_id = p.user_id
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential funnel view -> click -> purchase per user: earliest view,
    earliest click strictly after it, earliest purchase strictly after
    that; `converted` = full sequence inside 24 h of the first view.

    Each stage joins on the HIGH-cardinality user key (hash join) with the
    time ordering as a residual — the stream is never per-user sorted, and
    stage inputs are type-pruned before the join so sides shrink
    monotonically."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())

    def stage(event_type: str) -> DataFrame:
        return ev.filter(F.col("event_type") == event_type).select("user_id", "ts")

    v = stage("view").groupBy("user_id").agg(F.min("ts").alias("t_view"))
    c = (
        stage("click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        stage("purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "t_view",
            "t_click",
            "t_purchase",
            (
                F.lit(1)
                + F.col("t_click").isNotNull().cast("int")
                + F.col("t_purchase").isNotNull().cast("int")
            )
            .cast("long")
            .alias("stages"),
            F.coalesce(
                F.col("t_purchase")
                <= F.expr(
                    f"timestampadd(HOUR, {_FUNNEL_WINDOW_HOURS}, t_view)"
                ),
                F.lit(False),
            ).alias("converted"),
        )
    )


@register(
    "q_click_attribution",
    oracle="""
    SELECT v.user_id,
           v.event_id AS view_id,
           CAST(v.ts AS TIMESTAMP) AS view_ts,
           c.event_id AS click_id,
           CAST(c.ts AS TIMESTAMP) AS click_ts,
           c.value AS click_value
    FROM events v JOIN events c
      ON v.user_id = c.user_id
     AND CAST(c.ts AS TIMESTAMP) >= CAST(v.ts AS TIMESTAMP)
     AND CAST(c.ts AS TIMESTAMP) <= CAST(v.ts AS TIMESTAMP) + INTERVAL 10 MINUTE
    WHERE v.event_type = 'view' AND c.event_type = 'click'
    """,
)
def q_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval self-join: every (view, click) pair for the same user with
    the click inside [view_ts, view_ts + 10 min] — the attribution join.

    This is the BATCH TWIN of the stream-stream interval join
    (streaming/stream_join.py::attribute_clicks): it calls the SAME
    operator code — withWatermark is a no-op in batch — so the oracle
    check here certifies the join semantics and the golden tests in
    tests/test_stream_join.py certify the streaming-only behavior (state
    eviction, outer-side NULL emission after watermark).  The join key
    (user) is high-cardinality, so the equi-join hash-shuffles both sides
    and the time window rides as a residual predicate."""
    from ..streaming.stream_join import attribute_clicks

    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    views = ev.filter(F.col("event_type") == "view")
    clicks = ev.filter(F.col("event_type") == "click")
    return attribute_clicks(views, clicks)


@register(
    "q_retention",
    oracle="""
    WITH first_seen AS (
        SELECT user_id,
               min(date_trunc('day', CAST(ts AS TIMESTAMP))) AS cohort_day
        FROM events WHERE ts IS NOT NULL
        GROUP BY user_id
    )
    SELECT f.cohort_day,
           CAST(date_diff('day', f.cohort_day,
                          date_trunc('day', CAST(e.ts AS TIMESTAMP))) AS BIGINT)
               AS offset_days,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM events e JOIN first_seen f ON e.user_id = f.user_id
    WHERE e.ts IS NOT NULL
    GROUP BY 1, 2
    """,
)
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: sensors grouped by first-contact day, with
    the distinct count still reporting at each day offset.  First-seen is a
    partial-agg min on the high-cardinality user key; the join back is
    user-keyed (hash); the matrix itself is days x offsets cells after the
    two-phase distinct."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts")).alias("cohort_day")
    )
    return (
        ev.join(first_seen, "user_id")
        .select(
            "cohort_day",
            F.datediff(F.date_trunc("day", "ts"), F.col("cohort_day"))
            .cast("long")
            .alias("offset_days"),
            "user_id",
        )
        .groupBy("cohort_day", "offset_days")
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
    )


# ---------------------------------------------------------------------------
# Audience set operations (INTERSECT / EXCEPT)
# ---------------------------------------------------------------------------


@register(
    "q_audience_setops",
    oracle="""
    WITH p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
         e AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
    SELECT user_id, 'both' AS segment
    FROM (SELECT user_id FROM p INTERSECT SELECT user_id FROM e)
    UNION ALL
    SELECT user_id, 'purchase_only' AS segment
    FROM (SELECT user_id FROM p EXCEPT SELECT user_id FROM e)
    UNION ALL
    SELECT user_id, 'error_only' AS segment
    FROM (SELECT user_id FROM e EXCEPT SELECT user_id FROM p)
    """,
)
def q_audience_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience segmentation via relational set operations: sensors that
    both purchased and errored (INTERSECT), purchased cleanly (EXCEPT), or
    only errored — the symmetric-difference breakdown behind any
    "affected users" incident report.

    Scale: INTERSECT/EXCEPT compile to hash-partitioned aggregates /
    left-semi and left-anti joins on the HIGH-cardinality user key — the
    two distinct inputs collapse map-side first, so the shuffled sides are
    |distinct users|, not |events|; no broadcast, no sort."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    e = ev.filter(F.col("event_type") == "error").select("user_id").distinct()
    return (
        p.intersect(e).select("user_id", F.lit("both").alias("segment"))
        .unionAll(
            p.subtract(e).select("user_id", F.lit("purchase_only").alias("segment"))
        )
        .unionAll(
            e.subtract(p).select("user_id", F.lit("error_only").alias("segment"))
        )
    )


@register(
    "q_value_deciles",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id,
               {fround_sql("sum(value)")} AS total_value
        FROM events
        WHERE value IS NOT NULL
        GROUP BY user_id
    ),
    bucketed AS (
        SELECT user_id, total_value,
               CAST(ntile(10) OVER (ORDER BY total_value DESC, user_id)
                    AS BIGINT) AS decile
        FROM per_user
    )
    SELECT decile,
           CAST(count(*) AS BIGINT) AS n_users,
           {fround_sql("sum(total_value)")} AS total_value,
           {fround_sql("min(total_value)")} AS min_value,
           {fround_sql("max(total_value)")} AS max_value
    FROM bucketed
    GROUP BY decile
    ORDER BY decile
    """,
)
def q_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User lifetime-value decile table: per-user total value, ntile(10)
    over the descending totals, then per-decile population and value
    range — the marketing-segmentation staple.

    Scale: ntile needs a TOTAL order, but not a single-partition window —
    the rank comes from functions/prefix.bucketed_row_number (per-user
    totals map into order-preserving value-range buckets, row_number runs
    PARTITIONED by bucket, integer bucket-count offsets restore the
    global rank bit-exactly) and ntile is then pure arithmetic on
    (rank, n): the first n%10 deciles hold ceil(n/10) users.  The input
    is the per-user AGGREGATE (|users| rows, already collapsed by a
    partial-agg groupBy), never the raw stream.  Totals are 4 dp-quantized
    before ranking with user_id tiebreaks, so decile boundaries are
    engine-exact.  Below the adaptive scale switch (is_large_input, the
    q_rank_per_group crossover) the plain unpartitioned window wins and
    is taken instead — both paths are rank-identical and oracle-pinned
    (tests force the bucketed path via SPARK_GRAFT_SCALE_SWITCH_BYTES=0)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    per_user = ev.groupBy("user_id").agg(
        fround(F.sum("value"), 4).alias("total_value")
    )
    if is_large_input(sf_dir, "events"):
        n_tot = per_user.agg(F.count("*").cast("long").alias("_n"))
        bucketed = (
            bucketed_row_number(
                per_user,
                "total_value",
                ["user_id"],
                descending=True,
            )
            .join(F.broadcast(n_tot))
            .withColumn(
                "decile", ntile_from_rank(F.col("rk"), F.col("_n"), 10)
            )
        )
    else:
        # Below the switch, ntile itself is the cheapest exact plan: one
        # window over the pre-reduced per-user rows, no total-count
        # subquery, no broadcast — the r4-baseline shape (the r10 bench
        # probe measured the n_tot-join variant at 2.1x calib-normalized).
        bucketed = per_user.withColumn(
            "decile",
            F.ntile(10)
            .over(Window.orderBy(F.col("total_value").desc(), "user_id"))
            .cast("long"),
        )
    return (
        bucketed.groupBy("decile")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            fround(F.sum("total_value"), 4).alias("total_value"),
            fround(F.min("total_value"), 4).alias("min_value"),
            fround(F.max("total_value"), 4).alias("max_value"),
        )
        .orderBy("decile")
    )


@register(
    "q_event_pairs",
    oracle="""
    WITH d AS (
        SELECT DISTINCT user_id, event_type FROM events
    )
    SELECT a.event_type AS e1, b.event_type AS e2,
           CAST(count(*) AS BIGINT) AS n_users
    FROM d a
    JOIN d b ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY a.event_type, b.event_type
    ORDER BY n_users DESC, e1, e2
    """,
)
def q_event_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type co-occurrence (market-basket pairs): for every
    unordered pair of event types, how many users performed both.  The
    oracle states it as the textbook distinct self-join; this
    implementation instead collapses each user to their sorted distinct
    type set ONCE and expands i<j pairs inside the array domain — a
    nested SQL lambda, no second shuffle, no join.

    Scale: the self-join form shuffles the distinct table twice and its
    join explodes per-user k^2 rows through the network; the array form
    moves each user exactly once and the k^2 expansion (k = |event
    types| per user, single digits) happens in the scan stage.  This is
    the same basket pattern as frequent-itemset candidate generation at
    100 TB."""
    per_user = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .groupBy("user_id")
        .agg(F.array_sort(F.collect_set("event_type")).alias("types"))
    )
    pairs = per_user.select(
        F.explode(
            F.expr(
                "flatten(transform(types, (x, i) ->"
                " transform(slice(types, i + 2, size(types)),"
                " y -> struct(x AS e1, y AS e2))))"
            )
        ).alias("p")
    ).select("p.e1", "p.e2")
    return (
        pairs.groupBy("e1", "e2")
        .agg(F.count("*").cast("long").alias("n_users"))
        .orderBy(F.col("n_users").desc(), "e1", "e2")
    )


@register(
    "q_behavior_signatures",
    oracle="""
    WITH d AS (
        SELECT DISTINCT user_id, event_type FROM events
    ),
    sigs AS (
        SELECT user_id,
               string_agg(event_type, ',' ORDER BY event_type) AS signature,
               CAST(count(*) AS BIGINT) AS n_types
        FROM d
        GROUP BY user_id
    )
    SELECT signature, n_types,
           CAST(count(*) AS BIGINT) AS n_users
    FROM sigs
    GROUP BY signature, n_types
    ORDER BY n_users DESC, signature
    """,
)
def q_behavior_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral-signature segmentation: collapse each user's distinct
    event types into one canonical ordered CSV signature, then count the
    population of every signature — the segmentation table behind "how
    many users view+click but never purchase".

    Scale: the ordered-list aggregate (DuckDB string_agg ... ORDER BY) is
    expressed in Spark as array_join(array_sort(collect_set())) —
    collect_set's state is bounded by |event types| (single digits), NOT
    by user activity, so the aggregate is safe at any fan-in; sorting
    happens per user over that tiny set, never as a global sort.  Both
    engines canonicalize by the same byte order, making the signature
    string hash-comparable.  The second aggregate runs over |signatures|
    (<= 2^|types|) rows — metadata scale."""
    d = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
    )
    sigs = d.groupBy("user_id").agg(
        F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias(
            "signature"
        ),
        F.count("*").cast("long").alias("n_types"),
    )
    return (
        sigs.groupBy("signature", "n_types")
        .agg(F.count("*").cast("long").alias("n_users"))
        .orderBy(F.col("n_users").desc(), "signature")
    )


@register(
    "q_first_touch",
    oracle=f"""
    SELECT user_id,
           min(struct_pack(ts := CAST(ts AS TIMESTAMP), id := event_id,
                           et := event_type)).et AS first_type,
           min(CAST(ts AS TIMESTAMP)) AS first_ts,
           max(struct_pack(ts := CAST(ts AS TIMESTAMP), id := event_id,
                           et := event_type)).et AS last_type,
           max(CAST(ts AS TIMESTAMP)) AS last_ts,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events
    WHERE ts IS NOT NULL
    GROUP BY user_id
    """,
)
def q_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last-touch attribution base: each user's first and last
    event type and timestamp plus their event count — the argmin/argmax
    aggregate surface (min_by/max_by over a struct ordering key in Spark;
    DuckDB 1.0's arg_min only takes scalar orderings, so the oracle uses
    the equivalent min-over-(ordering, payload)-struct idiom, the same
    trick as q_semantic_dedup's assignment) — replacing the
    window-rank-filter idiom with a SINGLE partial-aggregating pass.

    Scale: where row_number()=1 would sort every user's history inside a
    window, min_by keeps one (ordering, payload) candidate per group per
    map task and merges — no per-user sort, no window state, one shuffle
    of |users| pre-reduced rows.  Ordering is the total (ts, event_id)
    struct so ties at equal timestamps resolve identically on both
    engines (struct comparison is lexicographic in both)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    ordkey = F.struct(F.col("ts"), F.col("event_id"))
    return ev.groupBy("user_id").agg(
        F.min_by("event_type", ordkey).alias("first_type"),
        F.min("ts").alias("first_ts"),
        F.max_by("event_type", ordkey).alias("last_type"),
        F.max("ts").alias("last_ts"),
        F.count("*").cast("long").alias("n_events"),
    )


@register(
    "q_markov_transitions",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events WHERE ts IS NOT NULL
    ),
    c AS (
        SELECT prev_type, event_type AS next_type,
               CAST(count(*) AS BIGINT) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, next_type
    )
    SELECT prev_type, next_type, n,
           {fround_sql("n / CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE)", 6)}
               AS prob
    FROM c
    ORDER BY prev_type, next_type
    """,
)
def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: for each (previous event type -> next event type) pair,
    the transition count and the row-normalized probability — the
    sequence-statistics pass that feeds next-event prediction baselines
    and behavioral-anomaly scoring (a user whose transitions have low
    probability under the fleet matrix is an outlier).

    Scale: ONE shuffle of the event stream, keyed by the high-cardinality
    user_id, drives the lag window (per-user partitions are small —
    hundreds of events — so window state is bounded); the transition
    aggregation then partial-aggregates to at most |types|^2 rows, and
    row normalization is a window over that tiny matrix, not the stream.
    Ordering inside each user is the total (ts, event_id) key, so both
    engines pair identical (prev, next) instances."""
    seq = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select(
            "event_type",
            F.lag("event_type")
            .over(
                Window.partitionBy("user_id").orderBy(
                    F.asc("ts"), F.asc("event_id")
                )
            )
            .alias("prev_type"),
        )
    )
    counts = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    return counts.select(
        "prev_type",
        "next_type",
        "n",
        fround(
            F.col("n")
            / F.sum("n").over(Window.partitionBy("prev_type")).cast("double"),
            6,
        ).alias("prob"),
    ).orderBy("prev_type", "next_type")


# Two-sample comparison pair for the Welch test: the experiment frame
# treats 'purchase' values as treatment and 'click' values as control.
_TT_A = "purchase"
_TT_B = "click"
# Two-sided 5% critical value for the normal approximation (df here is
# in the thousands, where t and z are indistinguishable at 3 decimals).
_TT_CRIT = "1.96"


@register(
    "q_welch_ttest",
    oracle=f"""
    WITH s AS (
        SELECT event_type,
               CAST(count(value) AS BIGINT) AS n,
               avg(value) AS m,
               var_samp(value) AS v
        FROM events
        WHERE event_type IN ('{_TT_A}', '{_TT_B}') AND value IS NOT NULL
        GROUP BY event_type
    ),
    w AS (
        SELECT a.n AS n_a, b.n AS n_b,
               a.m AS m_a, b.m AS m_b,
               a.v / a.n AS se2_a, b.v / b.n AS se2_b
        FROM s a, s b
        WHERE a.event_type = '{_TT_A}' AND b.event_type = '{_TT_B}'
    )
    SELECT n_a, n_b,
           {fround_sql("m_a")} AS mean_a,
           {fround_sql("m_b")} AS mean_b,
           {fround_sql("m_a - m_b", 6)} AS diff,
           {fround_sql("(m_a - m_b) / sqrt(se2_a + se2_b)", 6)} AS t_stat,
           {fround_sql(
               "power(se2_a + se2_b, 2) / "
               "(power(se2_a, 2) / (n_a - 1) + power(se2_b, 2) / (n_b - 1))",
               2,
           )} AS df,
           abs({fround_sql("(m_a - m_b) / sqrt(se2_a + se2_b)", 6)})
               > {_TT_CRIT} AS significant
    FROM w
    """,
)
def q_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance two-sample t-test between the
    '{_TT_A}' and '{_TT_B}' value distributions: group means, the t
    statistic, the Welch-Satterthwaite degrees of freedom, and a
    two-sided 5% significance verdict — the A/B-experiment readout
    every product pipeline bolts onto its event stream.

    Scale: the entire test reduces to TWO partial-aggregating group
    aggregates (count/mean/sample-variance per arm, computed in one
    pass over the filtered stream); the test statistic itself is
    arithmetic over a 2-row table.  No data volume appears anywhere
    past the first aggregate, so the operator is scan-bound at any
    scale — the canonical map-side-combine shape.  var_samp matches
    between engines because both implement the n-1 denominator over
    identical input bits."""
    s = (
        load_table(spark, sf_dir, "events")
        .filter(
            F.col("event_type").isin(_TT_A, _TT_B)
            & F.col("value").isNotNull()
        )
        .groupBy("event_type")
        .agg(
            F.count("value").cast("long").alias("n"),
            F.avg("value").alias("m"),
            F.var_samp("value").alias("v"),
        )
    )
    a = s.filter(F.col("event_type") == _TT_A).select(
        F.col("n").alias("n_a"),
        F.col("m").alias("m_a"),
        (F.col("v") / F.col("n")).alias("se2_a"),
    )
    b = s.filter(F.col("event_type") == _TT_B).select(
        F.col("n").alias("n_b"),
        F.col("m").alias("m_b"),
        (F.col("v") / F.col("n")).alias("se2_b"),
    )
    w = a.crossJoin(F.broadcast(b))
    t_stat = fround(
        (F.col("m_a") - F.col("m_b"))
        / F.sqrt(F.col("se2_a") + F.col("se2_b")),
        6,
    )
    df_expr = fround(
        F.pow(F.col("se2_a") + F.col("se2_b"), 2)
        / (
            F.pow(F.col("se2_a"), 2) / (F.col("n_a") - 1)
            + F.pow(F.col("se2_b"), 2) / (F.col("n_b") - 1)
        ),
        2,
    )
    return w.select(
        "n_a",
        "n_b",
        fround(F.col("m_a"), 4).alias("mean_a"),
        fround(F.col("m_b"), 4).alias("mean_b"),
        fround(F.col("m_a") - F.col("m_b"), 6).alias("diff"),
        t_stat.alias("t_stat"),
        df_expr.alias("df"),
        (F.abs(t_stat) > F.expr(f"CAST({_TT_CRIT} AS DOUBLE)")).alias(
            "significant"
        ),
    )


# ---------------------------------------------------------------------------
# Distribution-drift detection: KS two-sample test and PSI
# ---------------------------------------------------------------------------

# KS asymptotic critical coefficient at alpha=0.05 (two-sided).
_KS_CRIT = "1.358"
# Mid-month split point for the PSI window comparison.
_PSI_SPLIT = "2024-01-16"
# Industry-standard PSI bands: < 0.1 stable, < 0.25 moderate, else shifted.
# The fixture is stationary (natural PSI 0.004-0.009), so deterministic
# second-half shifts are PLANTED — identically in both engines — to
# exercise the non-stable verdicts (error x1.5 -> moderate, signup x2.5
# -> shifted), the same planted-fixture idiom as q_decontaminate's
# canaries.
_PSI_STABLE = "0.1"
_PSI_MODERATE = "0.25"


@register(
    "q_ks_test",
    oracle=f"""
    WITH base AS (
        SELECT value FROM events
        WHERE event_type = 'purchase' AND value IS NOT NULL
    ),
    vals AS (
        SELECT 'natural' AS cmp, 'a' AS side, value FROM base
        UNION ALL
        SELECT 'natural', 'b', value FROM events
        WHERE event_type = 'view' AND value IS NOT NULL
        UNION ALL
        SELECT 'planted', 'a', value FROM base
        UNION ALL
        SELECT 'planted', 'b', value * 2.0 FROM base
    ),
    n AS (
        SELECT cmp,
               CAST(count(*) FILTER (side = 'a') AS BIGINT) AS n_a,
               CAST(count(*) FILTER (side = 'b') AS BIGINT) AS n_b
        FROM vals GROUP BY cmp
    ),
    g AS (
        SELECT cmp, value,
               count(*) FILTER (side = 'a') AS ca,
               count(*) FILTER (side = 'b') AS cb
        FROM vals GROUP BY cmp, value
    ),
    c AS (
        SELECT cmp,
               sum(ca) OVER (PARTITION BY cmp ORDER BY value) AS cum_a,
               sum(cb) OVER (PARTITION BY cmp ORDER BY value) AS cum_b
        FROM g
    ),
    d AS (
        SELECT c.cmp,
               max(abs(c.cum_a / CAST(n.n_a AS DOUBLE)
                       - c.cum_b / CAST(n.n_b AS DOUBLE))) AS d_raw
        FROM c JOIN n USING (cmp) GROUP BY c.cmp
    )
    SELECT d.cmp, n.n_a, n.n_b,
           {fround_sql("d.d_raw", 6)} AS d_stat,
           {fround_sql(
               f"{_KS_CRIT} * sqrt((n.n_a + n.n_b) / (CAST(n.n_a AS DOUBLE) * n.n_b))",
               6,
           )} AS crit,
           {fround_sql("d.d_raw", 6)} > {fround_sql(
               f"{_KS_CRIT} * sqrt((n.n_a + n.n_b) / (CAST(n.n_a AS DOUBLE) * n.n_b))",
               6,
           )} AS drift
    FROM d JOIN n USING (cmp)
    ORDER BY cmp
    """,
)
def q_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kolmogorov-Smirnov two-sample test: the supremum distance between
    empirical CDFs, with the alpha=0.05 asymptotic critical value and a
    drift verdict — the distribution-shape companion to q_welch_ttest's
    mean comparison.  Two labeled comparisons run side by side: 'natural'
    (purchase vs view values — stationary, no drift) and 'planted'
    (purchase vs a deterministic 2x-scaled copy — drift fires at every
    fixture size, since D~0.5 dominates even sf0.001's critical value), so both
    verdicts are oracle-exercised.

    Scale: the ECDF grid is the DISTINCT value table with conditional
    counts (partial-aggregated before its shuffle); the running sums are a
    window partitioned per comparison.  A single comparison's grid is one
    ordered partition — the documented scale path replaces it with a
    t-digest/binned ECDF whose grid is resolution-bounded, changing the
    supremum's granularity, not the plan shape.  Everything is exact
    integer cumulative counts divided once at the end, so both engines
    see identical doubles."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    base = ev.filter(F.col("event_type") == "purchase").select("value")
    view = ev.filter(F.col("event_type") == "view").select("value")
    vals = (
        base.select(F.lit("natural").alias("cmp"), F.lit("a").alias("side"), "value")
        .unionAll(view.select(F.lit("natural"), F.lit("b"), "value"))
        .unionAll(base.select(F.lit("planted"), F.lit("a"), "value"))
        .unionAll(
            base.select(
                F.lit("planted"), F.lit("b"), (F.col("value") * 2.0).alias("value")
            )
        )
    )
    n = vals.groupBy("cmp").agg(
        F.count(F.when(F.col("side") == "a", 1)).cast("long").alias("n_a"),
        F.count(F.when(F.col("side") == "b", 1)).cast("long").alias("n_b"),
    )
    g = vals.groupBy("cmp", "value").agg(
        F.count(F.when(F.col("side") == "a", 1)).alias("ca"),
        F.count(F.when(F.col("side") == "b", 1)).alias("cb"),
    )
    w = Window.partitionBy("cmp").orderBy("value")
    c = g.select(
        "cmp",
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
    )
    d = (
        c.join(n, "cmp")
        .groupBy("cmp")
        .agg(
            F.max(
                F.abs(
                    F.col("cum_a") / F.col("n_a").cast("double")
                    - F.col("cum_b") / F.col("n_b").cast("double")
                )
            ).alias("d_raw")
        )
    )
    crit = fround(
        F.expr(f"CAST({_KS_CRIT} AS DOUBLE)")
        * F.sqrt(
            (F.col("n_a") + F.col("n_b"))
            / (F.col("n_a").cast("double") * F.col("n_b"))
        ),
        6,
    )
    return (
        d.join(n, "cmp")
        .select(
            "cmp",
            "n_a",
            "n_b",
            fround(F.col("d_raw"), 6).alias("d_stat"),
            crit.alias("crit"),
            (fround(F.col("d_raw"), 6) > crit).alias("drift"),
        )
        .orderBy("cmp")
    )


@register(
    "q_psi",
    oracle=f"""
    WITH e AS (
        SELECT event_type,
               CASE WHEN date_trunc('day', ts) < TIMESTAMP '{_PSI_SPLIT}'
                        THEN value
                    WHEN event_type = 'error' THEN value * 1.5
                    WHEN event_type = 'signup' THEN value * 2.5
                    ELSE value END AS value,
               date_trunc('day', ts) < TIMESTAMP '{_PSI_SPLIT}' AS early
        FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
    ),
    b AS (
        SELECT event_type, early,
               least(CAST(floor(value / 50.0) AS INT), 9) AS bin
        FROM e
    ),
    c AS (
        SELECT event_type, bin,
               CAST(count(*) FILTER (early) AS BIGINT) AS ca,
               CAST(count(*) FILTER (NOT early) AS BIGINT) AS cb
        FROM b GROUP BY event_type, bin
    ),
    n AS (
        SELECT event_type, sum(ca) AS na, sum(cb) AS nb
        FROM c GROUP BY event_type
    ),
    s AS (
        SELECT c.event_type,
               sum(((c.ca + 1.0) / (n.na + 10.0) - (c.cb + 1.0) / (n.nb + 10.0))
                   * ln(((c.ca + 1.0) / (n.na + 10.0))
                        / ((c.cb + 1.0) / (n.nb + 10.0)))) AS psi_raw
        FROM c JOIN n USING (event_type)
        GROUP BY c.event_type
    )
    SELECT event_type,
           {fround_sql("psi_raw", 6)} AS psi,
           CASE WHEN {fround_sql("psi_raw", 6)} < {_PSI_STABLE} THEN 'stable'
                WHEN {fround_sql("psi_raw", 6)} < {_PSI_MODERATE} THEN 'moderate'
                ELSE 'shifted' END AS stability
    FROM s
    ORDER BY event_type
    """,
)
def q_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index per event type between the first and
    second half of the month: 10 fixed equi-width value bins, Laplace
    (+1) smoothed shares, psi = sum((p-q)*ln(p/q)), classified against
    the industry-standard 0.1/0.25 bands — the binned drift monitor a
    feature store runs per column per day.  The deterministic planted
    shift on 'error' makes the non-stable branches fire; the other four
    types read 'stable' (natural PSI 0.004-0.009); signup's 2.5x shift
    lands 'shifted', so all three classes are oracle-exercised.

    Scale: fixed bin edges mean NO quantile pass — binning is a floor()
    in codegen, counts partial-aggregate to |types| x 10 cells, and the
    PSI reduction runs over that tiny table.  This is the shape that
    survives 100 TB trivially: one scan, one cell-sized shuffle, no
    global ordering anywhere (contrast q_ks_test, whose exact ECDF needs
    per-comparison ordering — PSI is the resolution-bounded version)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    early = F.date_trunc("day", "ts") < F.lit(_PSI_SPLIT).cast("timestamp")
    shifted = (
        F.when(early, F.col("value"))
        .when(F.col("event_type") == "error", F.col("value") * 1.5)
        .when(F.col("event_type") == "signup", F.col("value") * 2.5)
        .otherwise(F.col("value"))
    )
    b = ev.select(
        "event_type",
        early.alias("early"),
        F.least(F.floor(shifted / 50.0).cast("int"), F.lit(9)).alias("bin"),
    )
    c = b.groupBy("event_type", "bin").agg(
        F.count(F.when(F.col("early"), 1)).cast("long").alias("ca"),
        F.count(F.when(~F.col("early"), 1)).cast("long").alias("cb"),
    )
    n = c.groupBy("event_type").agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    p = (F.col("ca") + 1.0) / (F.col("na") + 10.0)
    q = (F.col("cb") + 1.0) / (F.col("nb") + 10.0)
    s = (
        c.join(n, "event_type")
        .groupBy("event_type")
        .agg(F.sum((p - q) * F.log(p / q)).alias("psi_raw"))
    )
    psi6 = fround(F.col("psi_raw"), 6)
    stability = (
        F.when(psi6 < F.expr(f"CAST({_PSI_STABLE} AS DOUBLE)"), F.lit("stable"))
        .when(
            psi6 < F.expr(f"CAST({_PSI_MODERATE} AS DOUBLE)"),
            F.lit("moderate"),
        )
        .otherwise(F.lit("shifted"))
    )
    return s.select(
        "event_type",
        psi6.alias("psi"),
        stability.alias("stability"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Numeric correlation matrix and chi-square independence test
# ---------------------------------------------------------------------------

_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")

_CORR_PAIRS = [
    (a, b)
    for i, a in enumerate(_CORR_COLS)
    for b in _CORR_COLS[i + 1 :]
]


@register(
    "q_corr_matrix",
    oracle="\nUNION ALL\n".join(
        f"""SELECT '{a}' AS col_a, '{b}' AS col_b,
               {fround_sql(f"corr({a}, {b})", 6)} AS pearson
        FROM lineitem"""
        for a, b in _CORR_PAIRS
    )
    + "\nORDER BY col_a, col_b",
)
def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation over the fact table's numeric measures
    (upper triangle of the correlation matrix) — the profiling pass a
    feature platform runs before model training to catch collinear or
    accidentally-derived columns (on this synthetic fixture every
    measure is independent — all |r| < 0.01 — so the matrix doubles as
    a null-case regression: a refactor that accidentally correlates
    columns shows up immediately).

    Scale: ALL pairs compute in ONE scan — each corr(a, b) is a
    single-pass co-moment aggregate and Spark evaluates the {len(_CORR_PAIRS)}
    of them side by side in the same partial+final aggregation (one
    row out, no shuffle of data rows).  The column list is schema
    knowledge; widening it grows the aggregate buffer, never the scan
    count.  The oracle states it as per-pair scans UNIONed (DuckDB
    dedups them); hash equality proves the one-pass form computes the
    same matrix."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [
        fround(F.corr(a, b), 6).alias(f"{a}__{b}") for a, b in _CORR_PAIRS
    ]
    wide = li.agg(*aggs)
    stack_expr = ", ".join(
        f"'{a}', '{b}', {a}__{b}" for a, b in _CORR_PAIRS
    )
    return (
        wide.select(
            F.expr(
                f"stack({len(_CORR_PAIRS)}, {stack_expr})"
                " AS (col_a, col_b, pearson)"
            )
        )
        .orderBy("col_a", "col_b")
    )


# Chi-square critical value at alpha=0.05 for (5-1)*(2-1)=4 dof.
_CHI2_CRIT = "9.488"
_CHI_SPLIT = "2024-01-16"


@register(
    "q_chi_square",
    oracle=f"""
    WITH base AS (
        SELECT event_type, event_id,
               date_trunc('day', ts) < TIMESTAMP '{_CHI_SPLIT}' AS early
        FROM events WHERE ts IS NOT NULL
    ),
    e AS (
        SELECT 'natural' AS cmp, event_type, early FROM base
        UNION ALL
        SELECT 'planted', event_type, early FROM base
        WHERE NOT (event_type = 'click' AND NOT early AND event_id % 10 < 5)
    ),
    o AS (
        SELECT cmp, event_type, early, CAST(count(*) AS DOUBLE) AS obs
        FROM e GROUP BY cmp, event_type, early
    ),
    rt AS (
        SELECT cmp, event_type, sum(obs) AS row_tot
        FROM o GROUP BY cmp, event_type
    ),
    ct AS (SELECT cmp, early, sum(obs) AS col_tot FROM o GROUP BY cmp, early),
    n AS (SELECT cmp, sum(obs) AS grand FROM o GROUP BY cmp),
    cells AS (
        SELECT o.cmp, o.obs,
               rt.row_tot * ct.col_tot / n.grand AS exp
        FROM o
        JOIN rt ON rt.cmp = o.cmp AND rt.event_type = o.event_type
        JOIN ct ON ct.cmp = o.cmp AND ct.early = o.early
        JOIN n ON n.cmp = o.cmp
    )
    SELECT cmp, CAST(count(*) AS BIGINT) AS n_cells,
           CAST(4 AS INT) AS dof,
           {fround_sql("sum((obs - exp) * (obs - exp) / exp)", 4)} AS chi2,
           {fround_sql("sum((obs - exp) * (obs - exp) / exp)", 6)}
               > {_CHI2_CRIT} AS dependent
    FROM cells
    GROUP BY cmp
    ORDER BY cmp
    """,
)
def q_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between event type and time period
    (first vs second half of the month) — the categorical drift detector
    beside q_psi's numeric one: a shift in the MIX of event types across
    periods rejects independence.  A deterministic plant (half the
    second-half clicks removed by event_id hash, identically in both
    engines — sized so the rejection fires even at the smallest
    fixture's sample size) breaks the fixture's natural independence; the 'natural'
    and 'planted' tables run side by side so BOTH verdicts are
    oracle-exercised.

    Scale: the contingency table is a partial-aggregating count to
    |types| x 2 cells; margins and the statistic are arithmetic over
    that tiny table (the margin 'joins' are broadcast-sized).  Nothing
    downstream of the first aggregate sees data volume."""
    base = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select(
            "event_type",
            "event_id",
            (
                F.date_trunc("day", "ts")
                < F.lit(_CHI_SPLIT).cast("timestamp")
            ).alias("early"),
        )
    )
    planted = base.filter(
        ~(
            (F.col("event_type") == "click")
            & ~F.col("early")
            & (F.col("event_id") % 10 < 5)
        )
    )
    e = base.select(
        F.lit("natural").alias("cmp"), "event_type", "early"
    ).unionAll(
        planted.select(F.lit("planted").alias("cmp"), "event_type", "early")
    )
    o = e.groupBy("cmp", "event_type", "early").agg(
        F.count("*").cast("double").alias("obs")
    )
    rt = o.groupBy("cmp", "event_type").agg(F.sum("obs").alias("row_tot"))
    ct = o.groupBy("cmp", "early").agg(F.sum("obs").alias("col_tot"))
    n = o.groupBy("cmp").agg(F.sum("obs").alias("grand"))
    cells = (
        o.join(F.broadcast(rt), ["cmp", "event_type"])
        .join(F.broadcast(ct), ["cmp", "early"])
        .join(F.broadcast(n), "cmp")
        .select(
            "cmp",
            "obs",
            (
                F.col("row_tot") * F.col("col_tot") / F.col("grand")
            ).alias("exp"),
        )
    )
    stat = F.sum(
        (F.col("obs") - F.col("exp"))
        * (F.col("obs") - F.col("exp"))
        / F.col("exp")
    )
    agg = cells.groupBy("cmp").agg(
        F.count("*").cast("long").alias("n_cells"),
        stat.alias("chi2_raw"),
    )
    return agg.select(
        "cmp",
        "n_cells",
        F.lit(4).cast("int").alias("dof"),
        fround(F.col("chi2_raw"), 4).alias("chi2"),
        (
            fround(F.col("chi2_raw"), 6)
            > F.expr(f"CAST({_CHI2_CRIT} AS DOUBLE)")
        ).alias("dependent"),
    ).orderBy("cmp")


@register(
    "q_revenue_gini",
    oracle=f"""
    WITH rev AS (
        SELECT o_custkey, sum(o_totalprice) AS revenue
        FROM orders GROUP BY o_custkey
        HAVING sum(o_totalprice) IS NOT NULL
    ),
    ranked AS (
        SELECT revenue,
               row_number() OVER (ORDER BY revenue, o_custkey) AS rk
        FROM rev
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               sum(revenue) AS tot,
               sum(rk * revenue) AS wsum
        FROM ranked
    ),
    topd AS (
        SELECT sum(revenue) AS top_rev
        FROM ranked, s WHERE rk > s.n - CAST(ceil(s.n / 10.0) AS BIGINT)
    )
    SELECT s.n AS n_customers,
           {fround_sql("s.tot", 2)} AS total_revenue,
           {fround_sql("2.0 * s.wsum / (s.n * s.tot) - (s.n + 1.0) / s.n", 6)}
               AS gini,
           {fround_sql("topd.top_rev / s.tot", 6)} AS top_decile_share
    FROM s, topd
    """,
)
def q_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration: the Gini coefficient over per-customer
    revenue (rank formula G = 2*sum(rank*x)/(n*sum(x)) - (n+1)/n) plus
    the top-decile revenue share — the whale-concentration readout that
    tells a business whether its revenue base is diversified or five
    accounts ARE the business.

    Scale: revenue partial-aggregates per customer first; the rank over
    |customers| pre-reduced rows comes from
    functions/prefix.bucketed_row_number — revenue-range buckets, a
    bucket-PARTITIONED row_number, and integer bucket-count offsets
    restore the global (revenue, custkey) rank bit-exactly with no
    single-partition sort (a quantile-sketch Lorenz approximation remains
    the O(1)-memory fallback if even |customers|/B per task is too much).
    The closed-form needs no self-join or per-percentile pass.
    Deterministic (revenue, custkey) ordering makes tied revenues rank
    identically on both engines.  Below the adaptive scale switch
    (is_large_input) the plain window is cheaper and taken instead; the
    bucketed path stays test-forced via SPARK_GRAFT_SCALE_SWITCH_BYTES=0."""
    # Customers whose every o_totalprice is NULL aggregate to NULL revenue
    # and carry no concentration information; they are excluded by contract
    # (the engines would otherwise rank the NULL on opposite ends — Spark
    # sorts NULLS FIRST ascending, DuckDB NULLS LAST — and the top-decile
    # share would go NULL.  Found by the hostile-relational suite.)
    rev = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("revenue"))
        .filter(F.col("revenue").isNotNull())
    )
    ranked = bucketed_row_number(
        rev,
        "revenue",
        ["o_custkey"],
        descending=False,
        bucketed=is_large_input(sf_dir, "orders"),
    ).select("revenue", "rk")
    s = ranked.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("revenue").alias("tot"),
        F.sum(F.col("rk") * F.col("revenue")).alias("wsum"),
    )
    topd = (
        ranked.crossJoin(F.broadcast(s))
        .filter(
            F.col("rk")
            > F.col("n") - F.ceil(F.col("n") / 10.0).cast("long")
        )
        .agg(F.sum("revenue").alias("top_rev"))
    )
    return (
        s.crossJoin(F.broadcast(topd))
        .select(
            F.col("n").alias("n_customers"),
            fround(F.col("tot"), 2).alias("total_revenue"),
            fround(
                2.0 * F.col("wsum") / (F.col("n") * F.col("tot"))
                - (F.col("n") + 1.0) / F.col("n"),
                6,
            ).alias("gini"),
            fround(F.col("top_rev") / F.col("tot"), 6).alias(
                "top_decile_share"
            ),
        )
    )


@register(
    "q_conversion_latency",
    oracle=f"""
    WITH v AS (
        SELECT user_id, min(ts) AS t_view FROM events
        WHERE ts IS NOT NULL AND event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS t_click
        FROM events e JOIN v USING (user_id)
        WHERE e.event_type = 'click' AND e.ts > v.t_view
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS t_purchase
        FROM events e JOIN c USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        GROUP BY e.user_id
    ),
    lat AS (
        SELECT 'view_to_click' AS stage,
               date_diff('microsecond', v.t_view, c.t_click) / 1e6 AS s
        FROM v JOIN c USING (user_id)
        UNION ALL
        SELECT 'click_to_purchase',
               date_diff('microsecond', c.t_click, p.t_purchase) / 1e6
        FROM c JOIN p USING (user_id)
        UNION ALL
        SELECT 'view_to_purchase',
               date_diff('microsecond', v.t_view, p.t_purchase) / 1e6
        FROM v JOIN p USING (user_id)
    )
    SELECT stage, CAST(count(*) AS BIGINT) AS n_users,
           {fround_sql("avg(s)", 2)} AS mean_s,
           {fround_sql("quantile_cont(s, 0.5)", 2)} AS p50_s,
           {fround_sql("quantile_cont(s, 0.9)", 2)} AS p90_s
    FROM lat GROUP BY stage
    ORDER BY stage
    """,
)
def q_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution per funnel stage: for the users who
    complete each transition of q_funnel's view -> click -> purchase
    sequence, the count, mean, and exact p50/p90 latencies in seconds —
    the numbers that turn a conversion FUNNEL into a conversion SLA
    ('half convert within X, the slow tail within Y').

    Scale: identical join posture to q_funnel (stage inputs type-pruned,
    user-keyed hash joins, min-aggregates partial); latencies are
    microsecond-exact timestamp differences (the cross-engine-safe
    differencing of q_gap_interp), and the stage statistics reduce
    3 x |converting users| rows with the same exact-percentile
    aggregate as q_quantile_summary (production swaps in
    approx_percentile, the pinned-error sketch twin)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())

    def stage(t: str) -> DataFrame:
        return ev.filter(F.col("event_type") == t).select("user_id", "ts")

    v = stage("view").groupBy("user_id").agg(F.min("ts").alias("t_view"))
    c = (
        stage("click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        stage("purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )

    def lat(df: DataFrame, a: str, b: str, name: str) -> DataFrame:
        return df.select(
            F.lit(name).alias("stage"),
            (
                F.expr(f"timestampdiff(MICROSECOND, {a}, {b})") / 1e6
            ).alias("s"),
        )

    lats = (
        lat(v.join(c, "user_id"), "t_view", "t_click", "view_to_click")
        .unionAll(
            lat(
                c.join(p, "user_id"),
                "t_click",
                "t_purchase",
                "click_to_purchase",
            )
        )
        .unionAll(
            lat(
                v.join(p, "user_id"),
                "t_view",
                "t_purchase",
                "view_to_purchase",
            )
        )
    )
    return (
        lats.groupBy("stage")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            fround(F.avg("s"), 2).alias("mean_s"),
            fround(F.expr("percentile(s, 0.5)"), 2).alias("p50_s"),
            fround(F.expr("percentile(s, 0.9)"), 2).alias("p90_s"),
        )
        .orderBy("stage")
    )


# Benford chi-square critical value at alpha=0.05, 8 dof.
_BENFORD_CRIT = "15.507"


@register(
    "q_benford",
    oracle=f"""
    WITH digits AS (
        SELECT CAST(floor(o_totalprice
                          / power(10, floor(log10(o_totalprice))))
                    AS INT) AS d
        FROM orders WHERE o_totalprice > 0
    ),
    o AS (
        SELECT d, CAST(count(*) AS BIGINT) AS n FROM digits GROUP BY d
    ),
    t AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM o),
    cells AS (
        SELECT o.d, o.n,
               t.total * log10(1.0 + 1.0 / o.d) AS expected
        FROM o, t
    )
    SELECT d AS first_digit, n,
           {fround_sql("expected", 2)} AS expected,
           {fround_sql("(n - expected) * (n - expected) / expected", 4)}
               AS chi2_term,
           (SELECT {fround_sql(
               "sum((n - expected) * (n - expected) / expected)", 4
           )} FROM cells) > {_BENFORD_CRIT} AS deviates
    FROM cells
    ORDER BY first_digit
    """,
)
def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of order totals: observed first-digit counts
    against the log10(1 + 1/d) expectation, per-digit chi-square terms,
    and a single 5% deviation verdict — the forensic-accounting screen
    for fabricated or systematically generated amounts.  (The synthetic
    fixture's uniform prices deviate decisively — which is precisely
    what Benford flags about artificial data.)

    Scale: first-digit extraction is two math functions in codegen, the
    digit histogram partial-aggregates to NINE cells, and everything
    after is arithmetic over those cells — the whole operator reduces at
    scan speed regardless of table size."""
    digits = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 0)
        .select(
            F.floor(
                F.col("o_totalprice")
                / F.pow(10.0, F.floor(F.log10("o_totalprice")))
            )
            .cast("int")
            .alias("d")
        )
    )
    o = digits.groupBy("d").agg(F.count("*").cast("long").alias("n"))
    t = o.agg(F.sum("n").cast("double").alias("total"))
    cells = o.crossJoin(F.broadcast(t)).select(
        "d",
        "n",
        (F.col("total") * F.log10(1.0 + 1.0 / F.col("d"))).alias("expected"),
    )
    stat = cells.agg(
        fround(
            F.sum(
                (F.col("n") - F.col("expected"))
                * (F.col("n") - F.col("expected"))
                / F.col("expected")
            ),
            4,
        ).alias("chi2")
    )
    return (
        cells.crossJoin(F.broadcast(stat))
        .select(
            F.col("d").alias("first_digit"),
            "n",
            fround(F.col("expected"), 2).alias("expected"),
            fround(
                (F.col("n") - F.col("expected"))
                * (F.col("n") - F.col("expected"))
                / F.col("expected"),
                4,
            ).alias("chi2_term"),
            (F.col("chi2") > F.expr(f"CAST({_BENFORD_CRIT} AS DOUBLE)")).alias(
                "deviates"
            ),
        )
        .orderBy("first_digit")
    )


@register(
    "q_abc_classes",
    oracle=f"""
    WITH rev AS (
        SELECT l_partkey,
               sum(l_extendedprice * (1 - l_discount)) AS revenue
        FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT sum(revenue) AS grand FROM rev),
    ranked AS (
        SELECT l_partkey, revenue,
               sum(revenue) OVER (
                   ORDER BY revenue DESC, l_partkey
               ) / tot.grand AS cum_share
        FROM rev, tot
    ),
    classed AS (
        SELECT l_partkey, revenue,
               CASE WHEN cum_share <= 0.8 THEN 'A'
                    WHEN cum_share <= 0.95 THEN 'B'
                    ELSE 'C' END AS abc
        FROM ranked
    )
    SELECT abc, CAST(count(*) AS BIGINT) AS n_parts,
           {fround_sql("sum(revenue)", 2)} AS revenue,
           {fround_sql("sum(revenue) / (SELECT grand FROM tot)", 6)} AS share
    FROM classed
    GROUP BY abc
    ORDER BY abc
    """,
)
def q_abc_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification of parts by discounted revenue: parts
    are ranked by revenue, the running cumulative share cuts A (first
    80% of revenue), B (to 95%), C (tail), and the operator reports each
    class's part count, revenue, and share — the inventory-priority
    split behind 'A-items get daily counts, C-items get yearly'.

    Scale: revenue partial-aggregates per part; the running cumulative
    over |parts| pre-reduced rows comes from
    functions/prefix.bucketed_running_sum — revenue-range buckets, a
    bucket-PARTITIONED cumulative window, per-bucket sums prefix-summed
    as a <=B-row broadcast — so no single task ever holds the part
    table (the sibling caveat in q_revenue_gini); the class rollup is
    three cells.  Regrouped float addition can differ from strict
    sequential summation (and from DuckDB's) by ULPs, which is exactly
    why class membership compares the share at 9 dp: both engines
    quantize before the boundary test, so a sub-ULP regrouping
    difference cannot flip a part's class.  Below the adaptive scale
    switch (is_large_input) the plain cumulative window is cheaper and
    taken instead (strictly sequential addition, no regrouping at all);
    the bucketed path stays test-forced via
    SPARK_GRAFT_SCALE_SWITCH_BYTES=0."""
    rev = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
    )
    tot = rev.agg(F.sum("revenue").alias("t"))
    ranked = (
        bucketed_running_sum(
            rev,
            "revenue",
            "revenue",
            ["l_partkey"],
            descending=True,
            out_col="_cum",
            bucketed=is_large_input(sf_dir, "lineitem"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "l_partkey",
            "revenue",
            (F.col("_cum") / F.col("t")).alias("cum_share"),
        )
    )
    cs9 = fround(F.col("cum_share"), 9)
    classed = ranked.select(
        "revenue",
        F.when(cs9 <= 0.8, F.lit("A"))
        .when(cs9 <= 0.95, F.lit("B"))
        .otherwise(F.lit("C"))
        .alias("abc"),
    )
    return (
        classed.groupBy("abc")
        .agg(
            F.count("*").cast("long").alias("n_parts"),
            F.sum("revenue").alias("rev_raw"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "abc",
            "n_parts",
            fround(F.col("rev_raw"), 2).alias("revenue"),
            fround(F.col("rev_raw") / F.col("t"), 6).alias("share"),
        )
        .orderBy("abc")
    )


# ---------------------------------------------------------------------------
# Wilson-interval CTR ranking: never rank segments by the raw proportion
# ---------------------------------------------------------------------------

WILSON_Z = 1.96  # 95% interval
WILSON_TOP_K = 20


@register(
    "q_ctr_wilson",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_views,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_clicks
        FROM events WHERE user_id IS NOT NULL
        GROUP BY user_id
    ),
    scored AS (
        SELECT user_id, n_views, n_clicks,
               n_views + n_clicks AS n_trials,
               n_clicks / CAST(n_views + n_clicks AS DOUBLE) AS p
        FROM per_user WHERE n_views + n_clicks > 0
    ),
    wilson AS (
        SELECT user_id, n_views, n_clicks, n_trials,
               {fround_sql("p", 6)} AS click_share,
               {fround_sql(
                   f"(p + {WILSON_Z * WILSON_Z} / (2 * n_trials)"
                   f" - {WILSON_Z} * sqrt((p * (1 - p)"
                   f" + {WILSON_Z * WILSON_Z} / (4 * n_trials))"
                   f" / n_trials)) / (1 + {WILSON_Z * WILSON_Z} / n_trials)",
                   6)} AS wilson_lb
        FROM scored
    ),
    topk AS (
        SELECT * FROM wilson ORDER BY wilson_lb DESC, user_id
        LIMIT {WILSON_TOP_K}
    )
    SELECT user_id, n_views, n_clicks, n_trials, click_share, wilson_lb,
           CAST(row_number() OVER (ORDER BY wilson_lb DESC, user_id)
               AS BIGINT) AS rnk
    FROM topk
    ORDER BY rnk
    """,
)
def q_ctr_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click-propensity ranking by the Wilson score lower bound (z=1.96):
    each user's share of click events among their click+view interactions
    (named click_share, NOT ctr — views here are independent events, not
    impressions that contain the clicks), ranked by the 95% confidence
    lower bound instead of the raw proportion — the textbook fix for
    "1/1 beats 480/1000"; top-{WILSON_TOP_K} by the bound.  Ranking orders the
    ROUNDED bound so placement can never flip on a float whisker between
    engines.

    Scale: one map-side-combined groupBy on the user key; Wilson algebra
    is pure arithmetic per group row; the top-{WILSON_TOP_K} cut is
    TakeOrderedAndProject over the per-user summary, and the only
    row_number window runs over the constant-size top-k set — never an
    unpartitioned window over a data-proportional domain."""
    z, z2 = WILSON_Z, WILSON_Z * WILSON_Z
    per_user = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
            .cast("long")
            .alias("n_views"),
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            .cast("long")
            .alias("n_clicks"),
        )
    )
    scored = (
        per_user.withColumn("n_trials", F.col("n_views") + F.col("n_clicks"))
        .filter(F.col("n_trials") > 0)
        .withColumn("p", F.col("n_clicks") / F.col("n_trials").cast("double"))
    )
    wilson = scored.select(
        "user_id",
        "n_views",
        "n_clicks",
        "n_trials",
        fround(F.col("p"), 6).alias("click_share"),
        fround(
            (
                F.col("p")
                + F.lit(z2) / (2 * F.col("n_trials"))
                - F.lit(z)
                * F.sqrt(
                    (
                        F.col("p") * (1 - F.col("p"))
                        + F.lit(z2) / (4 * F.col("n_trials"))
                    )
                    / F.col("n_trials")
                )
            )
            / (1 + F.lit(z2) / F.col("n_trials")),
            6,
        ).alias("wilson_lb"),
    )
    topk = wilson.orderBy(F.desc("wilson_lb"), "user_id").limit(WILSON_TOP_K)
    w = Window.orderBy(F.desc("wilson_lb"), "user_id")
    return topk.withColumn(
        "rnk", F.row_number().over(w).cast("long")
    ).orderBy("rnk")


# ---------------------------------------------------------------------------
# Active-user rollup: DAU / WAU / MAU + stickiness
# ---------------------------------------------------------------------------

WAU_DAYS = 7
MAU_DAYS = 30


@register(
    "q_active_users",
    oracle=f"""
    WITH user_days AS (
        SELECT DISTINCT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day
        FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    spine AS (SELECT DISTINCT day FROM user_days),
    wau_expand AS (
        SELECT user_id, day + i * INTERVAL '1 day' AS target_day
        FROM user_days, (SELECT unnest(generate_series(0, {WAU_DAYS - 1})) AS i)
    ),
    mau_expand AS (
        SELECT user_id, day + i * INTERVAL '1 day' AS target_day
        FROM user_days, (SELECT unnest(generate_series(0, {MAU_DAYS - 1})) AS i)
    ),
    dau AS (
        SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
        FROM user_days GROUP BY day
    ),
    wau AS (
        SELECT target_day AS day,
               CAST(count(DISTINCT user_id) AS BIGINT) AS wau
        FROM wau_expand JOIN spine ON target_day = spine.day
        GROUP BY target_day
    ),
    mau AS (
        SELECT target_day AS day,
               CAST(count(DISTINCT user_id) AS BIGINT) AS mau
        FROM mau_expand JOIN spine ON target_day = spine.day
        GROUP BY target_day
    )
    SELECT dau.day, dau.dau, wau.wau, mau.mau,
           {fround_sql("dau.dau / CAST(mau.mau AS DOUBLE)")} AS stickiness
    FROM dau JOIN wau USING (day) JOIN mau USING (day)
    ORDER BY day
    """,
)
def q_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The product-analytics staple: daily / trailing-{WAU_DAYS}-day /
    trailing-{MAU_DAYS}-day active users per calendar day plus the
    DAU/MAU stickiness ratio.  Distinct-over-sliding-window cannot
    partial-aggregate directly, so each (user, day) activity row is
    EXPANDED to the {WAU_DAYS}/{MAU_DAYS} future days it keeps the user
    active for and the distinct count becomes a plain per-day aggregate —
    the shuffle-friendly standard plan (no inequality join, no per-day
    re-scan); the expansion joins the observed-day spine so phantom days
    past the data edge never appear.

    Scale: user-day dedup is one (user, day)-keyed exchange; the x7/x30
    expansion multiplies only the DEDUPED activity rows, not raw events,
    and each expanded row is (bigint, date); at extreme scale the distinct
    counts swap for HLL sketches (the q_distinct_users approx-twin
    pattern) without changing the plan shape."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    user_days = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).distinct()
    spine = user_days.select("day").distinct()

    def rolling(n_days: int, alias: str) -> DataFrame:
        expanded = user_days.select(
            "user_id",
            F.explode(
                F.expr(f"sequence(day, day + interval {n_days - 1} days, interval 1 day)")
            ).alias("target_day"),
        )
        return (
            expanded.join(
                spine.withColumnRenamed("day", "target_day"), "target_day"
            )
            .groupBy(F.col("target_day").alias("day"))
            .agg(F.countDistinct("user_id").cast("long").alias(alias))
        )

    dau = user_days.groupBy("day").agg(
        F.countDistinct("user_id").cast("long").alias("dau")
    )
    wau = rolling(WAU_DAYS, "wau")
    mau = rolling(MAU_DAYS, "mau")
    return (
        dau.join(wau, "day")
        .join(mau, "day")
        .select(
            "day",
            "dau",
            "wau",
            "mau",
            fround(F.col("dau") / F.col("mau").cast("double"), 4).alias(
                "stickiness"
            ),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Mix-shift monitor: monthly order-priority mix vs the overall mix
# ---------------------------------------------------------------------------


@register(
    "q_mix_shift",
    oracle=f"""
    WITH cell AS (
        SELECT date_trunc('month', CAST(o_orderdate AS TIMESTAMP)) AS month,
               o_orderpriority AS priority,
               CAST(count(*) AS BIGINT) AS n
        FROM orders GROUP BY 1, 2
    ),
    overall AS (
        SELECT priority, sum(n) AS n_p FROM cell GROUP BY priority
    ),
    tot AS (SELECT sum(n_p) AS n_total FROM overall),
    scored AS (
        SELECT c.month, c.priority, c.n,
               sum(c.n) OVER (PARTITION BY c.month) * o.n_p / t.n_total
                   AS expected
        FROM cell c JOIN overall o USING (priority), tot t
    )
    SELECT month,
           CAST(sum(n) AS BIGINT) AS n_orders,
           {fround_sql(
               "sum((n - expected) * (n - expected) / expected)", 4)} AS chi2,
           CAST(count(*) AS BIGINT) - 1 AS dof
    FROM scored
    GROUP BY month
    ORDER BY month
    """,
)
def q_mix_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical mix-shift monitor: each month's order-priority mix
    tested against the corpus-wide mix with a per-month chi-square
    (expected cell = month volume x overall share) — the drift check a
    pipeline runs on every categorical dimension, the composition-over-
    time sibling of q_psi (numeric drift) and q_chi_square (two-sample).
    Months whose chi2 spikes above ~dof signal a real mix change.

    Scale: cell counts partial-aggregate on (month, priority); the
    overall mix is #priorities rows joined back on the priority key; the
    month-total window runs over the bounded (month x priority) cell
    table, never raw orders."""
    cell = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.date_trunc("month", "o_orderdate").alias("month"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.count("*").cast("long").alias("n"))
    )
    overall = cell.groupBy("priority").agg(F.sum("n").alias("n_p"))
    tot = overall.agg(F.sum("n_p").alias("n_total"))
    w = Window.partitionBy("month")
    scored = (
        cell.join(F.broadcast(overall), "priority")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "expected",
            F.sum("n").over(w) * F.col("n_p") / F.col("n_total"),
        )
    )
    return (
        scored.groupBy("month")
        .agg(
            F.sum("n").cast("long").alias("n_orders"),
            fround(
                F.sum(
                    (F.col("n") - F.col("expected"))
                    * (F.col("n") - F.col("expected"))
                    / F.col("expected")
                ),
                4,
            ).alias("chi2"),
            (F.count("*") - 1).cast("long").alias("dof"),
        )
        .orderBy("month")
    )
