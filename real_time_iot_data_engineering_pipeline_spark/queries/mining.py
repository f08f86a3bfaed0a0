"""Classical data-mining / statistics tier: survival analysis, customer
segmentation, association rules, and rank/robust/time-series tests.

The reference pipeline ends at threshold alerts and mart aggregates
(spark_streaming/streaming_job.py window aggregates, Learning Guide §5-6);
every operations team that runs such a pipeline bolts these textbook
analyses onto the marts next: how long do devices/users survive before
churning (Kaplan-Meier), which customers deserve attention (RFM), which
products co-occur (market basket / lift), did the distribution move
(Mann-Whitney), is the series trending or autocorrelated beyond what the
existing OLS/Pearson queries assume (Theil-Sen / Mann-Kendall /
Durbin-Watson), and how bursty is the event arrival process (Fano /
burstiness).  All are expressed as Catalyst-native column algebra — no
UDFs, no collects (scalar totals ride broadcast crossJoins, the house
pattern) — and every float that crosses an engine boundary is fround'd.

Scale design notes (each query's docstring elaborates):
- The only unpartitioned windows run over METADATA-scale domains that do
  not grow with data volume: distinct day-durations (<= observation-window
  days), distinct quantized test values (bounded value domain), and the
  daily calendar series.  Data-proportional windows (inter-event gaps)
  partition by the high-cardinality (user, type) key.
- Scalar thresholds (global max date, totals, quantile bounds) are
  single-row aggregates broadcast back over the stream — never a
  driver-side collect in the plan.
- Exact `percentile` is swapped for `approx_percentile` on unbounded
  domains at cluster scale (same plan shape); the fixture keeps the exact
  twin so the oracle can certify values bit-for-bit.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import fround, fround_sql
from ..registry import register
from ..sources import load_table

# ---------------------------------------------------------------------------
# Kaplan-Meier survival over user activity spans
# ---------------------------------------------------------------------------

# A user whose last event precedes the end of the observed stream by more
# than this many days has churned (the "death" event); later exits are
# right-censored (still alive when observation stopped).
KM_CHURN_GAP_DAYS = 7

_KM_PER_USER_SQL = f"""
    SELECT user_id,
           date_diff('day', CAST(min(ts) AS DATE), CAST(max(ts) AS DATE))
               AS duration,
           CASE WHEN date_diff('day', CAST(max(ts) AS DATE),
                    (SELECT CAST(max(ts) AS DATE) FROM events
                     WHERE ts IS NOT NULL)) > {KM_CHURN_GAP_DAYS}
                THEN 1 ELSE 0 END AS died
    FROM events
    WHERE ts IS NOT NULL
    GROUP BY user_id
"""


@register(
    "q_kaplan_meier",
    oracle=f"""
    WITH per_user AS ({_KM_PER_USER_SQL}),
    lev AS (
        SELECT duration,
               CAST(sum(died) AS BIGINT) AS n_deaths,
               CAST(sum(1 - died) AS BIGINT) AS n_censored
        FROM per_user GROUP BY duration
    ),
    risk AS (
        SELECT duration, n_deaths, n_censored,
               (SELECT count(*) FROM per_user)
                   - coalesce(sum(n_deaths + n_censored) OVER (
                         ORDER BY duration
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS n_risk
        FROM lev
    )
    SELECT duration AS duration_day,
           CAST(n_risk AS BIGINT) AS n_risk, n_deaths, n_censored,
           CASE WHEN max(CASE WHEN n_deaths >= n_risk THEN 1 ELSE 0 END)
                         OVER (ORDER BY duration) = 1
                THEN 0.0
                ELSE {fround_sql(
                    "exp(sum(ln(CASE WHEN n_deaths < n_risk THEN"
                    " 1 - n_deaths / CAST(n_risk AS DOUBLE) ELSE 1 END))"
                    " OVER (ORDER BY duration))", 6)}
           END AS survival
    FROM risk
    ORDER BY duration_day
    """,
)
def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve over user activity lifetimes: each user's
    duration is the day-span from first to last event; a user silent for
    more than {KM_CHURN_GAP_DAYS} days before the stream's end has churned
    (death), anyone active near the end is right-censored.  Output is the
    classic life table — at-risk count, deaths, censored exits, and the
    product-limit survival estimate per distinct duration.

    The survival product is computed as exp of a running sum of logs (the
    distributed form of a cumulative product); a zero factor (everyone at
    risk dies) is handled by a running zero-seen flag rather than ln(0),
    which the two engines disagree on (Spark NULL, DuckDB -inf).

    Scale: one partial-aggregating pass per user (high-cardinality key),
    then all windows run over DISTINCT DURATIONS — bounded by the
    observation window's day count, i.e. metadata scale that does not
    grow with data volume.  The stream-end scalar broadcasts back via a
    single-row crossJoin, never a collect."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    end = ev.agg(F.max(F.to_date("ts")).alias("_end"))
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.to_date(F.min("ts")).alias("_first"),
            F.to_date(F.max("ts")).alias("_last"),
        )
        .crossJoin(F.broadcast(end))
        .select(
            F.datediff("_last", "_first").alias("duration"),
            (
                F.datediff("_end", "_last") > KM_CHURN_GAP_DAYS
            ).cast("int").alias("died"),
        )
    )
    lev = per_user.groupBy("duration").agg(
        F.sum("died").cast("long").alias("n_deaths"),
        F.sum(1 - F.col("died")).cast("long").alias("n_censored"),
    )
    total = per_user.agg(F.count("*").alias("_total"))
    prior = (
        Window.orderBy("duration")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    upto = Window.orderBy("duration").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = (
        lev.crossJoin(F.broadcast(total))
        .withColumn(
            "n_risk",
            F.col("_total")
            - F.coalesce(
                F.sum(F.col("n_deaths") + F.col("n_censored")).over(prior),
                F.lit(0),
            ),
        )
    )
    factor = F.log(
        F.when(
            F.col("n_deaths") < F.col("n_risk"),
            1 - F.col("n_deaths") / F.col("n_risk").cast("double"),
        ).otherwise(F.lit(1.0))
    )
    zero_seen = F.max(
        F.when(F.col("n_deaths") >= F.col("n_risk"), 1).otherwise(0)
    ).over(upto)
    return risk.select(
        F.col("duration").alias("duration_day"),
        F.col("n_risk").cast("long").alias("n_risk"),
        "n_deaths",
        "n_censored",
        F.when(zero_seen == 1, F.lit(0.0))
        .otherwise(fround(F.exp(F.sum(factor).over(upto)), 6))
        .alias("survival"),
    ).orderBy("duration_day")


# ---------------------------------------------------------------------------
# RFM customer segmentation
# ---------------------------------------------------------------------------

# Quintile split points shared by all three RFM dimensions.
_RFM_PS = (0.2, 0.4, 0.6, 0.8)
_RFM_PS_SQL = "[" + ", ".join(str(p) for p in _RFM_PS) + "]"
_RFM_PS_SPARK = "array(" + ", ".join(f"{p}D" for p in _RFM_PS) + ")"

# Segment rules, applied in order (first match wins) — the standard RFM
# playbook labels.
_RFM_CASE_SQL = """
    CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
              THEN 'champion'
         WHEN f_score >= 4 THEN 'loyal'
         WHEN m_score >= 4 THEN 'big_spender'
         WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
         WHEN r_score <= 2 THEN 'hibernating'
         ELSE 'regular' END
"""


@register(
    "q_rfm_segments",
    oracle=f"""
    WITH per_cust AS (
        SELECT o_custkey,
               date_diff('day', CAST(max(o_orderdate) AS DATE),
                   (SELECT CAST(max(o_orderdate) AS DATE) FROM orders))
                   AS recency,
               CAST(count(*) AS BIGINT) AS frequency,
               {fround_sql("sum(o_totalprice)", 2)} AS monetary
        FROM orders
        GROUP BY o_custkey
    ),
    th AS (
        SELECT quantile_cont(recency, {_RFM_PS_SQL}) AS rq,
               quantile_cont(frequency, {_RFM_PS_SQL}) AS fq,
               quantile_cont(monetary, {_RFM_PS_SQL}) AS mq
        FROM per_cust
    ),
    scored AS (
        SELECT o_custkey, recency, frequency, monetary,
               5 - ((recency > rq[1])::INT + (recency > rq[2])::INT
                    + (recency > rq[3])::INT + (recency > rq[4])::INT)
                   AS r_score,
               1 + (frequency > fq[1])::INT + (frequency > fq[2])::INT
                 + (frequency > fq[3])::INT + (frequency > fq[4])::INT
                   AS f_score,
               1 + (monetary > mq[1])::INT + (monetary > mq[2])::INT
                 + (monetary > mq[3])::INT + (monetary > mq[4])::INT
                   AS m_score
        FROM per_cust, th
    )
    SELECT {_RFM_CASE_SQL} AS segment,
           CAST(count(*) AS BIGINT) AS n_customers,
           {fround_sql("avg(recency)")} AS avg_recency_days,
           {fround_sql("avg(frequency)")} AS avg_frequency,
           {fround_sql("avg(monetary)", 2)} AS avg_monetary
    FROM scored
    GROUP BY segment
    ORDER BY segment
    """,
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) segmentation of the customer
    base: per-customer metrics from the orders stream, quintile scores per
    dimension against global thresholds, and the standard segment labels
    (champion / loyal / big_spender / at_risk / hibernating / regular)
    rolled up to per-segment counts and averages.

    Quintile scoring uses THRESHOLD COMPARISON against the four exact
    quantile split points — not ntile() — because ntile needs a global
    single-partition window (a straggler at scale) while thresholds come
    from one partial-aggregated percentile pass and broadcast back onto
    the per-customer rows.  Monetary sums are quantized (fround 2) before
    thresholding so both engines compare identical bits.

    Scale: per-customer aggregation partial-aggregates map-side on the
    customer key; the threshold row is single-row broadcast; the final
    rollup has <= 6 groups.  On an unbounded customer domain swap
    `percentile` for `approx_percentile` (same plan, sketch-merged) —
    the fixture keeps the exact form so the oracle certifies values."""
    orders = load_table(spark, sf_dir, "orders")
    end = orders.agg(F.max(F.to_date("o_orderdate")).alias("_end"))
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.to_date(F.max("o_orderdate")).alias("_last"),
            F.count("*").cast("long").alias("frequency"),
            fround(F.sum("o_totalprice"), 2).alias("monetary"),
        )
        .crossJoin(F.broadcast(end))
        .select(
            "o_custkey",
            F.datediff("_end", "_last").alias("recency"),
            "frequency",
            "monetary",
        )
    )
    th = per_cust.agg(
        F.expr(f"percentile(recency, {_RFM_PS_SPARK})").alias("rq"),
        F.expr(f"percentile(frequency, {_RFM_PS_SPARK})").alias("fq"),
        F.expr(f"percentile(monetary, {_RFM_PS_SPARK})").alias("mq"),
    )

    def _score(col: str, q: str, reverse: bool) -> Column:
        hits = sum(
            (F.col(col) > F.col(q)[i]).cast("int") for i in range(4)
        )
        return (5 - hits) if reverse else (1 + hits)

    scored = per_cust.crossJoin(F.broadcast(th)).select(
        "recency",
        "frequency",
        "monetary",
        _score("recency", "rq", reverse=True).alias("r_score"),
        _score("frequency", "fq", reverse=False).alias("f_score"),
        _score("monetary", "mq", reverse=False).alias("m_score"),
    )
    return (
        scored.select(
            F.expr(_RFM_CASE_SQL).alias("segment"),
            "recency",
            "frequency",
            "monetary",
        )
        .groupBy("segment")
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            fround(F.avg("recency")).alias("avg_recency_days"),
            fround(F.avg("frequency")).alias("avg_frequency"),
            fround(F.avg("monetary"), 2).alias("avg_monetary"),
        )
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# Market-basket association rules over order contents
# ---------------------------------------------------------------------------

# Minimum co-occurrence count for a brand pair to be reported (prunes the
# rule tail and, at scale, keeps the pair table far smaller than the
# baskets table).
BASKET_MIN_PAIR = 20
BASKET_TOP_K = 20

_BASKET_ITEMS_SQL = """
    SELECT DISTINCT l_orderkey, p_brand
    FROM lineitem JOIN part ON l_partkey = p_partkey
"""


@register(
    "q_market_basket",
    oracle=f"""
    WITH items AS ({_BASKET_ITEMS_SQL}),
    n_ord AS (
        SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
        FROM items
    ),
    brand_n AS (
        SELECT p_brand, CAST(count(*) AS BIGINT) AS n FROM items
        GROUP BY p_brand
    ),
    pairs AS (
        SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
               CAST(count(*) AS BIGINT) AS n_ab
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
        GROUP BY a.p_brand, b.p_brand
        HAVING count(*) >= {BASKET_MIN_PAIR}
    )
    SELECT brand_a, brand_b, n_ab, na.n AS n_a, nb.n AS n_b, n_orders,
           {fround_sql("n_ab / CAST(n_orders AS DOUBLE)", 6)} AS support,
           {fround_sql("n_ab / CAST(na.n AS DOUBLE)", 6)} AS confidence,
           {fround_sql(
               "(CAST(n_ab AS DOUBLE) * n_orders) / (CAST(na.n AS DOUBLE) * nb.n)",
               4)} AS lift
    FROM pairs
    JOIN brand_n na ON brand_a = na.p_brand
    JOIN brand_n nb ON brand_b = nb.p_brand
    CROSS JOIN n_ord
    ORDER BY (CAST(n_ab AS DOUBLE) * n_orders) / (CAST(na.n AS DOUBLE) * nb.n)
             DESC, brand_a, brand_b
    LIMIT {BASKET_TOP_K}
    """,
)
def q_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules at the brand level: for every brand
    pair co-occurring in at least {BASKET_MIN_PAIR} orders, the classic
    support / confidence / lift triple, top-{BASKET_TOP_K} by lift — the
    "what sells together" readout every commerce pipeline derives from
    its order stream.

    Scale: baskets come from ONE broadcast join (part is a dimension);
    the pair stream self-joins baskets on the order key, so both sides
    shuffle-partition identically and co-locate, and the per-order blowup
    is bounded by the basket size cap (TPC-H orders hold <= 7 items —
    C(13,2) worst case here), keeping the join output linear in orders.
    Pair counts partial-aggregate map-side onto the tiny brand-pair
    domain; ranking arithmetic is exact-integer ratios (products < 2^53),
    so top-k membership cannot flip on float noise between engines, and
    the final top-k is TakeOrderedAndProject."""
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # The distinct basket table fans into FOUR subtrees (n_ord, brand_n,
    # both self-join legs); lazily composed, the lineitem scan + broadcast
    # join + distinct ran once per leg.  One eager checkpoint of the
    # 2-column table bounds it at one pass (r12, guide §5).
    items = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_orderkey", "p_brand")
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_ord = items.agg(
        F.countDistinct("l_orderkey").cast("long").alias("n_orders")
    )
    brand_n = items.groupBy("p_brand").agg(
        F.count("*").cast("long").alias("n")
    )
    a = items.select("l_orderkey", F.col("p_brand").alias("brand_a"))
    b = items.select("l_orderkey", F.col("p_brand").alias("brand_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count("*").cast("long").alias("n_ab"))
        .filter(F.col("n_ab") >= BASKET_MIN_PAIR)
    )
    na = brand_n.select(
        F.col("p_brand").alias("brand_a"), F.col("n").alias("n_a")
    )
    nb = brand_n.select(
        F.col("p_brand").alias("brand_b"), F.col("n").alias("n_b")
    )
    lift_key = (F.col("n_ab").cast("double") * F.col("n_orders")) / (
        F.col("n_a").cast("double") * F.col("n_b")
    )
    return (
        pairs.join(F.broadcast(na), "brand_a")
        .join(F.broadcast(nb), "brand_b")
        .crossJoin(F.broadcast(n_ord))
        .select(
            "brand_a",
            "brand_b",
            "n_ab",
            "n_a",
            "n_b",
            "n_orders",
            fround(F.col("n_ab") / F.col("n_orders").cast("double"), 6).alias(
                "support"
            ),
            fround(F.col("n_ab") / F.col("n_a").cast("double"), 6).alias(
                "confidence"
            ),
            fround(lift_key, 4).alias("lift"),
            lift_key.alias("_k"),
        )
        .orderBy(F.col("_k").desc(), "brand_a", "brand_b")
        .limit(BASKET_TOP_K)
        .drop("_k")
    )


# ---------------------------------------------------------------------------
# Mann-Whitney U rank test between two event-type value distributions
# ---------------------------------------------------------------------------

_MW_A = "click"
_MW_B = "view"
# Two-sided 5% critical value on the normal approximation.
_MW_CRIT = "1.96"


@register(
    "q_mann_whitney",
    oracle=f"""
    WITH obs AS (
        SELECT CAST(floor(value) AS BIGINT) AS qv,
               CASE WHEN event_type = '{_MW_A}' THEN 1 ELSE 0 END AS is_a
        FROM events
        WHERE value IS NOT NULL AND event_type IN ('{_MW_A}', '{_MW_B}')
    ),
    lev AS (
        SELECT qv, CAST(count(*) AS BIGINT) AS t,
               CAST(sum(is_a) AS BIGINT) AS n_a_q
        FROM obs GROUP BY qv
    ),
    ranked AS (
        SELECT qv, t, n_a_q,
               coalesce(sum(t) OVER (ORDER BY qv
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   + (t + 1) / 2.0 AS midrank
        FROM lev
    ),
    tot AS (
        SELECT CAST(sum(n_a_q) AS BIGINT) AS n1,
               CAST(sum(t - n_a_q) AS BIGINT) AS n2,
               sum(n_a_q * midrank) AS r1,
               sum(CAST(t AS DOUBLE) * t * t - t) AS tie_term
        FROM ranked
    )
    SELECT n1 AS n_a, n2 AS n_b,
           r1 - n1 * (n1 + 1) / 2.0 AS u_stat,
           {fround_sql(
               "(r1 - n1 * (n1 + 1) / 2.0 - CAST(n1 AS DOUBLE) * n2 / 2.0)"
               " / sqrt(CAST(n1 AS DOUBLE) * n2 / 12.0"
               " * ((n1 + n2 + 1) - tie_term"
               " / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2 - 1))))", 6)} AS z,
           abs({fround_sql(
               "(r1 - n1 * (n1 + 1) / 2.0 - CAST(n1 AS DOUBLE) * n2 / 2.0)"
               " / sqrt(CAST(n1 AS DOUBLE) * n2 / 12.0"
               " * ((n1 + n2 + 1) - tie_term"
               " / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2 - 1))))", 6)})
               > {_MW_CRIT} AS significant
    FROM tot
    """,
)
def q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test between the '{_MW_A}' and
    '{_MW_B}' value distributions — the nonparametric sibling of
    q_welch_ttest for when normality is off the table.  Values are
    quantized to integer bins (floor), midranks computed per bin with the
    textbook tie correction, and the U statistic normalized to a z score.

    Ranking avoids the global sort entirely: observations aggregate to
    per-bin counts (partial agg on a BOUNDED value domain, ~500 bins),
    and the cumulative-rank window runs over those bins only — metadata
    scale, unlike a naive row_number over billions of rows.  All rank
    arithmetic is exact-integer (< 2^53) so both engines produce
    bit-identical U; only the final z is quantized.  floor() is used for
    binning (exact on every double) rather than round(), whose
    half-boundary semantics differ across engines."""
    obs = (
        load_table(spark, sf_dir, "events")
        .filter(
            F.col("value").isNotNull()
            & F.col("event_type").isin(_MW_A, _MW_B)
        )
        .select(
            F.floor("value").cast("long").alias("qv"),
            F.when(F.col("event_type") == _MW_A, 1).otherwise(0).alias("is_a"),
        )
    )
    lev = obs.groupBy("qv").agg(
        F.count("*").cast("long").alias("t"),
        F.sum("is_a").cast("long").alias("n_a_q"),
    )
    prior = Window.orderBy("qv").rowsBetween(Window.unboundedPreceding, -1)
    ranked = lev.withColumn(
        "midrank",
        F.coalesce(F.sum("t").over(prior), F.lit(0))
        + (F.col("t") + 1) / F.lit(2.0),
    )
    tot = ranked.agg(
        F.sum("n_a_q").cast("long").alias("n1"),
        F.sum(F.col("t") - F.col("n_a_q")).cast("long").alias("n2"),
        F.sum(F.col("n_a_q") * F.col("midrank")).alias("r1"),
        F.sum(
            F.col("t").cast("double") * F.col("t") * F.col("t") - F.col("t")
        ).alias("tie_term"),
    )
    u = F.col("r1") - F.col("n1") * (F.col("n1") + 1) / F.lit(2.0)
    n1d = F.col("n1").cast("double")
    n12 = (F.col("n1") + F.col("n2")).cast("double")
    z = fround(
        (u - n1d * F.col("n2") / F.lit(2.0))
        / F.sqrt(
            n1d
            * F.col("n2")
            / F.lit(12.0)
            * (
                (F.col("n1") + F.col("n2") + 1)
                - F.col("tie_term") / (n12 * (F.col("n1") + F.col("n2") - 1))
            )
        ),
        6,
    )
    return tot.select(
        F.col("n1").alias("n_a"),
        F.col("n2").alias("n_b"),
        u.alias("u_stat"),
        z.alias("z"),
        (F.abs(z) > F.expr(f"CAST({_MW_CRIT} AS DOUBLE)")).alias(
            "significant"
        ),
    )


# ---------------------------------------------------------------------------
# Daily-revenue calendar series (shared by the trend / autocorrelation tests)
# ---------------------------------------------------------------------------

# Fixed anchor for the integer day index (house idiom, temporal.py: a fixed
# epoch keeps the index engine-portable and join-stable across runs).
_DAY_ANCHOR = "1995-01-01"

_DAILY_REV_SQL = f"""
    SELECT date_diff('day', DATE '{_DAY_ANCHOR}',
                     CAST(o_orderdate AS DATE)) AS x,
           {fround_sql("sum(o_totalprice)", 2)} AS y
    FROM orders
    GROUP BY 1
"""


def _daily_rev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(x = day index from the fixed anchor, y = quantized daily revenue).

    The quantization (fround 2) happens FIRST so every downstream statistic
    — pairwise slopes, residuals, rolling bands — is computed from
    bit-identical inputs in both engines; raw double sums differ by
    summation order."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.datediff(
                F.to_date("o_orderdate"), F.lit(_DAY_ANCHOR).cast("date")
            ).alias("x")
        )
        .agg(fround(F.sum("o_totalprice"), 2).alias("y"))
    )


# ---------------------------------------------------------------------------
# Distributed exact median (quantile_cont semantics, no single-buffer agg)
# ---------------------------------------------------------------------------

_MEDIAN_BUCKETS = 4096


# Stop refining once the rank-bracketing slice is this small: a window
# sort over <= this many rows is a single sub-100ms task.
_MEDIAN_SELECT_MAX = 65536


def _dist_median(vals: DataFrame, col: str, out: str) -> DataFrame:
    """Exact linear-interpolated median (quantile_cont semantics) of a
    non-empty numeric column, as a 1-row DataFrame — WITHOUT Spark's
    `percentile` aggregate, whose per-value hash-map buffer merges into a
    single reducer and takes ~9 s on 3M mostly-distinct doubles (measured;
    it is the wrong shape at any scale).

    ITERATIVE histogram refinement (r12 rework): the r<=12 single-level
    histogram assumed one bucketing pass spreads the mass, but the
    Theil-Sen slope distribution is a point mass around 0 with ~1e7
    tails — ONE central bucket held 1.28M of 2.9M rows, and the
    selection window then sorted those rows in a single task (2.8 s of
    the query's 5 s; the exact single-giant-key shape guide §2.5 warns
    AQE cannot split).  Now the covering bucket range is re-bucketed
    until the rank-bracketing slice holds <= {_MEDIAN_SELECT_MAX} rows
    (point masses collapse via the min==max early exit), and only that
    slice is window-sorted:

    1. bounds pass: count/min/max -> the two 0-based ranks
       k_lo = floor(0.5(n-1)), k_hi = ceil(0.5(n-1));
    2. refinement passes: per-bucket counts onto a CONSTANT
       {_MEDIAN_BUCKETS}-bucket domain over the current [mn, mx]; the
       <= {_MEDIAN_BUCKETS}-row histogram is a driver-bounded scalar
       (the monitor-bin-histogram class), from which the bucket span
       covering [k_lo, k_hi] and its below-span row count are read;
       filter to the span, recompute its min/max, repeat while the
       slice is large and still shrinking;
    3. selection pass: row_number over the final slice only, offset by
       the below-slice count, and interpolate
       v_lo + (v_hi - v_lo) * frac — the same formula quantile_cont and
       Spark's percentile use, so the oracle certifies values unchanged.

    The loop is a driver-side scalar control flow (the
    connected_components convergence pattern); every data pass is one
    partial-aggregated histogram over the (caller-checkpointed) values.
    Degenerate all-equal slices exit via min == max (v_lo = v_hi, the
    interpolation is exact regardless of frac)."""
    v = F.col(col)
    n, mn, mx = vals.agg(
        F.count(col), F.min(col), F.max(col)
    ).first()
    pos = 0.5 * (n - 1)
    klo, khi = math.floor(pos), math.ceil(pos)
    cur, remaining, before = vals.select(v.alias("_v")), n, 0
    for _ in range(8):
        if mn == mx or remaining <= _MEDIAN_SELECT_MAX:
            break
        w = (mx - mn) / _MEDIAN_BUCKETS
        if not w > 0:  # adjacent-double underflow: bucketing cannot split
            break
        b_expr = F.least(
            F.floor((F.col("_v") - F.lit(mn)) / F.lit(w)).cast("int"),
            F.lit(_MEDIAN_BUCKETS - 1),
        )
        hist = dict(
            cur.groupBy(b_expr.alias("_b"))
            .agg(F.count("*").alias("_c"))
            .collect()
        )
        run, blo, bhi, span_before = 0, None, None, 0
        for bkt in sorted(hist):
            c = hist[bkt]
            if blo is None and run + c > klo - before:
                blo, span_before = bkt, run
            if run + c > khi - before:
                bhi = bkt
                break
            run += c
        nxt = cur.filter((b_expr >= blo) & (b_expr <= bhi))
        span_count = sum(hist[b] for b in sorted(hist) if blo <= b <= bhi)
        if span_count >= remaining:  # no shrink: fall through to selection
            break
        before += span_before
        remaining = span_count
        cur = nxt
        mn, mx = cur.agg(F.min("_v"), F.max("_v")).first()
    if mn == mx:
        # Constant slice: both bracketing ranks hold this value and the
        # interpolation collapses to it — no sort of the point mass.
        return vals.sparkSession.range(1).select(
            F.lit(float(mn)).alias(out)
        )
    rank = F.row_number().over(Window.orderBy("_v")) - 1 + F.lit(before)
    picked = cur.select("_v", rank.alias("_rank")).filter(
        (F.col("_rank") == F.lit(klo)) | (F.col("_rank") == F.lit(khi))
    )
    return picked.agg(
        (
            F.min(F.when(F.col("_rank") == F.lit(klo), F.col("_v")))
            + (
                F.max(F.when(F.col("_rank") == F.lit(khi), F.col("_v")))
                - F.min(F.when(F.col("_rank") == F.lit(klo), F.col("_v")))
            )
            * (F.lit(pos) - F.lit(float(klo)))
        ).alias(out)
    )


# ---------------------------------------------------------------------------
# Theil-Sen robust slope + Mann-Kendall trend test on daily revenue
# ---------------------------------------------------------------------------

_MK_CRIT = "1.96"

_MK_Z_SQL = (
    "CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var_s) "
    "WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var_s) ELSE 0.0 END"
)


@register(
    "q_theil_sen",
    oracle=f"""
    WITH daily AS ({_DAILY_REV_SQL}),
    pairs AS (
        SELECT (b.y - a.y) / (b.x - a.x) AS slope,
               CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END
                   AS sgn
        FROM daily a JOIN daily b ON a.x < b.x
    ),
    ties AS (
        SELECT CAST(count(*) AS DOUBLE) AS t FROM daily GROUP BY y
    ),
    st AS (
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM daily) AS n,
               (SELECT quantile_cont(slope, 0.5) FROM pairs) AS b_med,
               (SELECT CAST(sum(sgn) AS BIGINT) FROM pairs) AS s_stat,
               (SELECT coalesce(sum(t * (t - 1) * (2 * t + 5)), 0)
                FROM ties) AS tie_sum
    ),
    stv AS (
        SELECT n, b_med, s_stat,
               (CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5) - tie_sum) / 18.0
                   AS var_s
        FROM st
    ),
    ic AS (
        SELECT quantile_cont(y - (SELECT b_med FROM stv) * x, 0.5) AS a_med
        FROM daily
    )
    SELECT n AS n_days,
           {fround_sql("b_med", 6)} AS sen_slope,
           {fround_sql("a_med", 4)} AS sen_intercept,
           s_stat AS mk_s,
           {fround_sql(_MK_Z_SQL, 6)} AS mk_z,
           CASE WHEN {fround_sql(_MK_Z_SQL, 6)} > {_MK_CRIT}
                     THEN 'increasing'
                WHEN {fround_sql(_MK_Z_SQL, 6)} < -{_MK_CRIT}
                     THEN 'decreasing'
                ELSE 'none' END AS trend
    FROM stv, ic
    """,
)
def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend estimate plus the Mann-Kendall test on the
    daily-revenue series: the median of all pairwise slopes (insensitive
    to outlier days, unlike q_trend_slope's OLS), the matching median
    intercept, and the tie-corrected Mann-Kendall S/z with a 5% trend
    verdict — the standard nonparametric "is this series drifting"
    readout.

    Scale: the O(days^2) pair table is over the DAILY series — a calendar
    domain that grows with the covered time range, not with data volume
    (2.4k days -> 2.9M pairs regardless of SF).  The join is an
    inequality self-join of a dimension-sized table (broadcast NL by
    design — both sides metadata scale); revenue is quantized before any
    pair arithmetic so both engines compute identical slope/sign bits.
    The slope median uses _dist_median (histogram-bucketed exact
    selection) — Spark's `percentile` aggregate on the 2.9M-value pair
    stream merges a per-value hash map into one reducer and measured 9 s
    at sf0.01; the bucketed form does three parallel passes instead.
    The intercept median runs over the DAYS table (2.4k rows), where the
    built-in exact percentile is the right tool."""
    # The daily series feeds SIX subtrees (pair legs a/b, ties, n, the
    # intercept pass) and the pair expansion feeds FOUR more (the sgn sum
    # plus _dist_median's three selection passes): lazily composed, the
    # r<=12 plan compiled to 33 parquet scans / 101 exchanges and re-ran
    # the O(days^2) expansion per pass.  Both tables are metadata-scale
    # (days, and days^2/2 slope rows), so eager localCheckpoints bound the
    # whole query at ONE orders scan + ONE pair expansion (guide §5:
    # cut lineage of a small, many-consumer intermediate).
    daily = _daily_rev(spark, sf_dir).localCheckpoint(eager=True)
    a = daily.repartition(16).select(
        F.col("x").alias("xa"), F.col("y").alias("ya")
    )
    b = daily.select(F.col("x").alias("xb"), F.col("y").alias("yb"))
    pairs = (
        a.join(b, F.col("xa") < F.col("xb"))
        .select(
            ((F.col("yb") - F.col("ya")) / (F.col("xb") - F.col("xa"))).alias(
                "slope"
            ),
            F.when(F.col("yb") > F.col("ya"), 1)
            .when(F.col("yb") < F.col("ya"), -1)
            .otherwise(0)
            .alias("sgn"),
        )
        .localCheckpoint(eager=True)
    )
    ties = daily.groupBy("y").agg(F.count("*").cast("double").alias("t"))
    tie_sum = ties.agg(
        F.coalesce(
            F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)),
            F.lit(0.0),
        ).alias("tie_sum")
    )
    # 1-row: st is consumed by both the intercept pass and the final row;
    # without the checkpoint each consumer replays the median's selection
    # pass and the sgn aggregation.
    b_med = _dist_median(pairs, "slope", "b_med").localCheckpoint(eager=True)
    st = (
        pairs.agg(F.sum("sgn").cast("long").alias("s_stat"))
        .crossJoin(F.broadcast(b_med))
        .crossJoin(F.broadcast(daily.agg(F.count("*").alias("n"))))
        .crossJoin(F.broadcast(tie_sum))
        .withColumn(
            "var_s",
            (
                F.col("n").cast("double")
                * (F.col("n") - 1)
                * (2 * F.col("n") + 5)
                - F.col("tie_sum")
            )
            / F.lit(18.0),
        )
    )
    ic = daily.crossJoin(F.broadcast(st.select("b_med"))).agg(
        F.expr("percentile(y - b_med * x, 0.5D)").alias("a_med")
    )
    z = fround(
        F.when(
            F.col("s_stat") > 0,
            (F.col("s_stat") - 1) / F.sqrt(F.col("var_s")),
        )
        .when(
            F.col("s_stat") < 0,
            (F.col("s_stat") + 1) / F.sqrt(F.col("var_s")),
        )
        .otherwise(F.lit(0.0)),
        6,
    )
    crit = F.expr(f"CAST({_MK_CRIT} AS DOUBLE)")
    return st.crossJoin(F.broadcast(ic)).select(
        F.col("n").cast("long").alias("n_days"),
        fround(F.col("b_med"), 6).alias("sen_slope"),
        fround(F.col("a_med"), 4).alias("sen_intercept"),
        F.col("s_stat").alias("mk_s"),
        z.alias("mk_z"),
        F.when(z > crit, "increasing")
        .when(z < -crit, "decreasing")
        .otherwise("none")
        .alias("trend"),
    )


# ---------------------------------------------------------------------------
# Durbin-Watson autocorrelation test on detrended daily revenue
# ---------------------------------------------------------------------------

# Rule-of-thumb DW bands: < 1.5 positive autocorrelation, > 2.5 negative.
_DW_LO = "1.5"
_DW_HI = "2.5"


@register(
    "q_durbin_watson",
    oracle=f"""
    WITH daily AS ({_DAILY_REV_SQL}),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               sum(CAST(x AS DOUBLE)) AS sx, sum(y) AS sy,
               sum(CAST(x AS DOUBLE) * y) AS sxy,
               sum(CAST(x AS DOUBLE) * x) AS sxx
        FROM daily
    ),
    fit AS (
        SELECT n,
               (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b,
               (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
                   AS a
        FROM s
    ),
    resid AS (
        SELECT x, y - (a + b * x) AS e,
               lag(y - (a + b * x)) OVER (ORDER BY x) AS e_prev
        FROM daily, fit
    ),
    dw AS (
        SELECT sum(CASE WHEN e_prev IS NULL THEN 0
                        ELSE (e - e_prev) * (e - e_prev) END)
                   / sum(e * e) AS d
        FROM resid
    )
    SELECT n AS n_days,
           {fround_sql("b", 6)} AS ols_slope,
           {fround_sql("d", 4)} AS dw_stat,
           CASE WHEN {fround_sql("d", 4)} < {_DW_LO} THEN 'positive'
                WHEN {fround_sql("d", 4)} > {_DW_HI} THEN 'negative'
                ELSE 'none' END AS autocorrelation
    FROM fit, dw
    """,
)
def q_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson test for lag-1 autocorrelation in the residuals of an
    OLS fit to the daily-revenue series — the standard "is the trend
    model missing serial structure" diagnostic that complements
    q_autocorr (raw ACF) and q_trend_slope (the fit itself).

    Scale: the OLS coefficients come from ONE partial-aggregated pass of
    moment sums (n, Σx, Σy, Σxy, Σx²) — no per-row state; residuals are a
    pure column expression against the broadcast 1-row fit; the lag
    window runs over the daily calendar series (metadata scale — days,
    not data volume).  Moment sums are order-dependent doubles, so the
    slope may differ between engines by ~1e-12 relative; the DW ratio
    inherits ~1e-10 of that, orders below the fround(4) quantum."""
    daily = _daily_rev(spark, sf_dir)
    s = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("x").cast("double")).alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast("double") * F.col("y")).alias("sxy"),
        F.sum(F.col("x").cast("double") * F.col("x")).alias("sxx"),
    )
    b_expr = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    fit = s.select(
        "n",
        b_expr.alias("b"),
        ((F.col("sy") - b_expr * F.col("sx")) / F.col("n")).alias("a"),
    )
    e = F.col("y") - (F.col("a") + F.col("b") * F.col("x"))
    resid = daily.crossJoin(F.broadcast(fit)).select(
        "x",
        e.alias("e"),
        F.lag(e).over(Window.orderBy("x")).alias("e_prev"),
    )
    dw = resid.agg(
        (
            F.sum(
                F.when(F.col("e_prev").isNull(), F.lit(0.0)).otherwise(
                    (F.col("e") - F.col("e_prev"))
                    * (F.col("e") - F.col("e_prev"))
                )
            )
            / F.sum(F.col("e") * F.col("e"))
        ).alias("d")
    )
    d4 = fround(F.col("d"), 4)
    return fit.crossJoin(F.broadcast(dw)).select(
        F.col("n").alias("n_days"),
        fround(F.col("b"), 6).alias("ols_slope"),
        d4.alias("dw_stat"),
        F.when(d4 < F.expr(f"CAST({_DW_LO} AS DOUBLE)"), "positive")
        .when(d4 > F.expr(f"CAST({_DW_HI} AS DOUBLE)"), "negative")
        .otherwise("none")
        .alias("autocorrelation"),
    )


# ---------------------------------------------------------------------------
# Bollinger-band breakouts on per-priority daily revenue
# ---------------------------------------------------------------------------

# Rolling window length in trading-days and the band half-width in sigmas.
BOLLINGER_DAYS = 20
BOLLINGER_SIGMA = 2

_PRIORITY_DAILY_SQL = f"""
    SELECT o_orderpriority AS priority,
           date_diff('day', DATE '{_DAY_ANCHOR}',
                     CAST(o_orderdate AS DATE)) AS x,
           {fround_sql("sum(o_totalprice)", 2)} AS y
    FROM orders
    GROUP BY 1, 2
"""


@register(
    "q_bollinger",
    oracle=f"""
    WITH daily AS ({_PRIORITY_DAILY_SQL}),
    win AS (
        SELECT priority, x, y,
               count(*) OVER w AS n_win,
               avg(y) OVER w AS mid_raw,
               stddev_samp(y) OVER w AS sd
        FROM daily
        WINDOW w AS (PARTITION BY priority ORDER BY x
                     ROWS BETWEEN {BOLLINGER_DAYS - 1} PRECEDING
                     AND CURRENT ROW)
    ),
    bands AS (
        SELECT priority, x, y,
               {fround_sql("mid_raw", 4)} AS mid,
               {fround_sql(f"mid_raw - {BOLLINGER_SIGMA} * sd", 4)} AS lower,
               {fround_sql(f"mid_raw + {BOLLINGER_SIGMA} * sd", 4)} AS upper
        FROM win
        WHERE n_win = {BOLLINGER_DAYS}
    )
    SELECT priority, x AS day_index, y AS revenue, mid, lower, upper,
           CASE WHEN y > upper THEN 'above' ELSE 'below' END AS breakout
    FROM bands
    WHERE y > upper OR y < lower
    ORDER BY priority, day_index
    """,
)
def q_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger-band breakout detection on per-priority daily revenue:
    a {BOLLINGER_DAYS}-day rolling mean +/- {BOLLINGER_SIGMA} sigma band
    per order priority, emitting only the days whose (quantized) revenue
    escapes the band — the volatility-aware upgrade over q_zscore_flag's
    global-stats outliers.

    Scale: the rolling window runs over per-priority DAILY series —
    calendar-domain rows, metadata scale; at cluster scale the partition
    key would be the high-cardinality series id (sensor, SKU), same plan.
    Revenue is quantized before windowing and the band edges are
    quantized before comparison, so the breakout set is identical across
    engines even though stddev accumulates in different orders (engine
    sigma differences ~1e-13 relative never cross the fround(4) quantum).
    Warm-up rows (fewer than {BOLLINGER_DAYS} days of history) are
    excluded — a band over a partial window is statistically undefined."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.datediff(
                F.to_date("o_orderdate"), F.lit(_DAY_ANCHOR).cast("date")
            ).alias("x"),
        )
        .agg(fround(F.sum("o_totalprice"), 2).alias("y"))
    )
    w = (
        Window.partitionBy("priority")
        .orderBy("x")
        .rowsBetween(-(BOLLINGER_DAYS - 1), Window.currentRow)
    )
    win = daily.select(
        "priority",
        "x",
        "y",
        F.count("*").over(w).alias("n_win"),
        F.avg("y").over(w).alias("mid_raw"),
        F.stddev_samp("y").over(w).alias("sd"),
    ).filter(F.col("n_win") == BOLLINGER_DAYS)
    bands = win.select(
        "priority",
        "x",
        "y",
        fround(F.col("mid_raw"), 4).alias("mid"),
        fround(
            F.col("mid_raw") - BOLLINGER_SIGMA * F.col("sd"), 4
        ).alias("lower"),
        fround(
            F.col("mid_raw") + BOLLINGER_SIGMA * F.col("sd"), 4
        ).alias("upper"),
    )
    return (
        bands.filter(
            (F.col("y") > F.col("upper")) | (F.col("y") < F.col("lower"))
        )
        .select(
            "priority",
            F.col("x").alias("day_index"),
            F.col("y").alias("revenue"),
            "mid",
            "lower",
            "upper",
            F.when(F.col("y") > F.col("upper"), "above")
            .otherwise("below")
            .alias("breakout"),
        )
        .orderBy("priority", "day_index")
    )


# ---------------------------------------------------------------------------
# Arrival-process burstiness per event type
# ---------------------------------------------------------------------------


@register(
    "q_burstiness",
    oracle=f"""
    WITH gaps AS (
        SELECT event_type,
               date_diff('microsecond',
                   lag(ts) OVER (PARTITION BY user_id, event_type
                                 ORDER BY ts, event_id),
                   ts) AS gap_us
        FROM events
        WHERE ts IS NOT NULL
    ),
    g AS (
        SELECT event_type,
               CAST(count(gap_us) AS BIGINT) AS n_gaps,
               avg(CAST(gap_us AS DOUBLE)) AS mu,
               stddev_samp(CAST(gap_us AS DOUBLE)) AS sd
        FROM gaps
        WHERE gap_us IS NOT NULL
        GROUP BY event_type
    ),
    d AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events WHERE ts IS NOT NULL
        GROUP BY 1, 2
    ),
    f AS (
        SELECT event_type,
               var_samp(CAST(cnt AS DOUBLE)) / avg(CAST(cnt AS DOUBLE))
                   AS fano
        FROM d GROUP BY event_type
    )
    SELECT g.event_type, n_gaps,
           {fround_sql("mu / 1e6", 2)} AS mean_gap_s,
           {fround_sql("(sd - mu) / (sd + mu)", 6)} AS burstiness,
           {fround_sql("fano", 4)} AS fano_daily
    FROM g JOIN f ON g.event_type = f.event_type
    ORDER BY g.event_type
    """,
)
def q_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrival-process burstiness per event type: the Goh-Barabasi
    burstiness coefficient B = (sigma - mu) / (sigma + mu) over
    inter-event gaps within each (user, type) stream (B ~ -1 periodic,
    ~0 Poisson, -> 1 bursty), plus the Fano factor (variance-to-mean) of
    daily event counts — the two standard "is this traffic clumpy"
    statistics a capacity planner derives from the event stream.

    Scale: the gap window partitions by the HIGH-CARDINALITY (user_id,
    event_type) key — parallelism grows with users, no stragglers — and
    gaps are exact integer microsecond differences (timestampdiff /
    date_diff), so both engines aggregate identical values (sums stay
    < 2^53).  Both statistics then partial-aggregate onto the tiny
    event-type domain.  Ordering ties on identical timestamps break by
    event_id, keeping lag() deterministic across engines."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    gaps = ev.select(
        "event_type",
        F.expr(
            "timestampdiff(MICROSECOND, "
            "lag(ts) OVER (PARTITION BY user_id, event_type "
            "ORDER BY ts, event_id), ts)"
        ).alias("gap_us"),
    )
    g = (
        gaps.filter(F.col("gap_us").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("gap_us").cast("long").alias("n_gaps"),
            F.avg(F.col("gap_us").cast("double")).alias("mu"),
            F.stddev_samp(F.col("gap_us").cast("double")).alias("sd"),
        )
    )
    d = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").cast("long").alias("cnt"))
    f = d.groupBy("event_type").agg(
        (
            F.var_samp(F.col("cnt").cast("double"))
            / F.avg(F.col("cnt").cast("double"))
        ).alias("fano")
    )
    return (
        g.join(f, "event_type")
        .select(
            "event_type",
            "n_gaps",
            fround(F.col("mu") / F.lit(1e6), 2).alias("mean_gap_s"),
            fround(
                (F.col("sd") - F.col("mu")) / (F.col("sd") + F.col("mu")), 6
            ).alias("burstiness"),
            fround(F.col("fano"), 4).alias("fano_daily"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Discount elasticity of demand per brand
# ---------------------------------------------------------------------------


@register(
    "q_price_elasticity",
    oracle=f"""
    WITH obs AS (
        SELECT p_brand, l_discount AS disc,
               ln(l_quantity) AS ln_qty
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_quantity > 0
    )
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n,
           {fround_sql("avg(disc)", 6)} AS avg_discount,
           {fround_sql("regr_slope(ln_qty, disc)", 4)} AS elasticity,
           {fround_sql("corr(ln_qty, disc)", 6)} AS correlation
    FROM obs
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def q_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discount elasticity of demand per brand: the OLS slope of
    log-quantity on discount depth (semi-elasticity — percent quantity
    change per discount point) with the raw correlation — the pricing
    team's first regression over any order stream.

    Scale: ONE broadcast dimension join (part) and one
    partial-aggregating regr_slope/corr pass onto the 25-brand domain —
    the moment sums (n, Σx, Σy, Σxy, Σx², Σy²) combine map-side, so the
    operator is scan-bound at any volume.  ln(quantity) is exact on both
    engines' identical input bits; moment-sum ordering differences stay
    ~1e-14 relative, far below the output quanta."""
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    obs = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 0)
        .select("l_partkey", "l_discount", F.log("l_quantity").alias("ln_qty"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    )
    return (
        obs.groupBy("p_brand")
        .agg(
            F.count("*").cast("long").alias("n"),
            fround(F.avg("l_discount"), 6).alias("avg_discount"),
            fround(F.regr_slope(F.col("ln_qty"), F.col("l_discount")), 4).alias(
                "elasticity"
            ),
            fround(F.corr(F.col("ln_qty"), F.col("l_discount")), 6).alias(
                "correlation"
            ),
        )
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------------------
# Repeat-purchase intervals
# ---------------------------------------------------------------------------


@register(
    "q_repeat_interval",
    oracle=f"""
    WITH gaps AS (
        SELECT date_diff('day',
                   lag(o_orderdate) OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate, o_orderkey),
                   o_orderdate) AS gap
        FROM orders
    ),
    g AS (SELECT gap FROM gaps WHERE gap IS NOT NULL),
    custs AS (
        SELECT CAST(count(*) AS BIGINT) AS n_customers,
               CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_repeat
        FROM (SELECT count(*) AS c FROM orders GROUP BY o_custkey)
    ),
    lev AS (
        SELECT gap, CAST(count(*) AS BIGINT) AS c FROM g GROUP BY gap
    ),
    cum AS (
        SELECT gap, c,
               coalesce(sum(c) OVER (ORDER BY gap
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS before
        FROM lev
    ),
    tot AS (
        SELECT CAST(sum(c) AS BIGINT) AS n,
               sum(gap * c) / CAST(sum(c) AS DOUBLE) AS mean_gap
        FROM lev
    ),
    med AS (
        SELECT
            (SELECT min(gap) FROM cum, tot
             WHERE before + c > floor(0.5 * (n - 1))) AS v_lo,
            (SELECT min(gap) FROM cum, tot
             WHERE before + c > ceil(0.5 * (n - 1))) AS v_hi,
            (SELECT 0.5 * (n - 1) - floor(0.5 * (n - 1)) FROM tot) AS frac
    )
    SELECT n_customers, n_repeat,
           {fround_sql("n_repeat / CAST(n_customers AS DOUBLE)", 6)}
               AS repeat_rate,
           n AS n_gaps,
           {fround_sql("mean_gap", 4)} AS mean_gap_days,
           {fround_sql("v_lo + (v_hi - v_lo) * frac", 4)} AS median_gap_days
    FROM custs, tot, med
    """,
)
def q_repeat_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase cadence: the share of customers who ever reorder,
    and the mean and exact median of the day gaps between a customer's
    consecutive orders — the lifecycle statistic behind replenishment
    campaigns and churn clocks (complements q_retention's cohort grid
    and q_kaplan_meier's survival curve).

    Scale: gaps come from ONE lag window partitioned by the
    high-cardinality customer key; the median is computed from
    PER-VALUE COUNTS — day gaps are bounded integers, so the cumulative
    window runs over the distinct-gap domain (<= calendar days,
    metadata scale) and interpolates quantile_cont semantics exactly —
    never a global sort or a single-buffer percentile over the gap
    stream (the q_theil_sen lesson applied where the value domain is
    discrete)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = orders.select(
        F.datediff(
            F.to_date("o_orderdate"), F.to_date(F.lag("o_orderdate").over(w))
        ).alias("gap")
    ).filter(F.col("gap").isNotNull())
    custs = (
        orders.groupBy("o_custkey")
        .agg(F.count("*").alias("c"))
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.sum(F.when(F.col("c") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_repeat"),
        )
    )
    # The per-gap count table is calendar-bounded (<= distinct day gaps)
    # and fans into cum, tot, and both median brackets; without the
    # checkpoint each consumer replays the customer lag window over
    # orders (the query's only data-scale pass).
    lev = (
        gaps.groupBy("gap")
        .agg(F.count("*").cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    before_w = Window.orderBy("gap").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = lev.withColumn(
        "before", F.coalesce(F.sum("c").over(before_w), F.lit(0))
    )
    tot = lev.agg(
        F.sum("c").cast("long").alias("n"),
        (F.sum(F.col("gap") * F.col("c")) / F.sum("c").cast("double")).alias(
            "mean_gap"
        ),
    )
    ranked = cum.crossJoin(F.broadcast(tot))
    v_lo = ranked.filter(
        F.col("before") + F.col("c")
        > F.floor(F.lit(0.5) * (F.col("n") - 1))
    ).agg(F.min("gap").alias("v_lo"))
    v_hi = ranked.filter(
        F.col("before") + F.col("c") > F.ceil(F.lit(0.5) * (F.col("n") - 1))
    ).agg(F.min("gap").alias("v_hi"))
    frac = F.lit(0.5) * (F.col("n") - 1) - F.floor(
        F.lit(0.5) * (F.col("n") - 1)
    )
    return (
        custs.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(v_lo))
        .crossJoin(F.broadcast(v_hi))
        .select(
            "n_customers",
            "n_repeat",
            fround(
                F.col("n_repeat") / F.col("n_customers").cast("double"), 6
            ).alias("repeat_rate"),
            F.col("n").alias("n_gaps"),
            fround(F.col("mean_gap"), 4).alias("mean_gap_days"),
            fround(
                F.col("v_lo") + (F.col("v_hi") - F.col("v_lo")) * frac, 4
            ).alias("median_gap_days"),
        )
    )


# ---------------------------------------------------------------------------
# Item-item co-occurrence recommendations ("customers also bought")
# ---------------------------------------------------------------------------

ALSO_MIN_CO = 2  # a single co-order is noise, not a signal
ALSO_TOP_K = 3


@register(
    "q_also_bought",
    oracle=f"""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    part_n AS (
        SELECT l_partkey, CAST(count(*) AS BIGINT) AS n FROM items
        GROUP BY l_partkey
    ),
    pairs AS (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb,
               CAST(count(*) AS BIGINT) AS n_ab
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
        HAVING count(*) >= {ALSO_MIN_CO}
    ),
    both_dirs AS (
        SELECT pa AS part_id, pb AS rec_part_id, n_ab FROM pairs
        UNION ALL
        SELECT pb AS part_id, pa AS rec_part_id, n_ab FROM pairs
    ),
    scored AS (
        SELECT part_id, rec_part_id, n_ab, na.n AS n_a, nb.n AS n_b,
               CAST(n_ab * n_ab AS DOUBLE) / (na.n * nb.n) AS cos2
        FROM both_dirs
        JOIN part_n na ON part_id = na.l_partkey
        JOIN part_n nb ON rec_part_id = nb.l_partkey
    ),
    ranked AS (
        SELECT *, row_number() OVER (
                   PARTITION BY part_id
                   ORDER BY cos2 DESC, rec_part_id) AS rnk
        FROM scored
    )
    SELECT part_id, rec_part_id, n_ab, n_a, n_b,
           {fround_sql("sqrt(cos2)", 6)} AS cosine, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= {ALSO_TOP_K}
    ORDER BY part_id, rnk
    """,
)
def q_also_bought(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item co-occurrence recommendations: for every part, the
    top-{ALSO_TOP_K} parts most often sharing an order with it (>=
    {ALSO_MIN_CO} co-orders), ranked by basket cosine
    n_ab / sqrt(n_a x n_b) — the brand-level rules (q_market_basket)
    made item-granular, which is the table a "customers also bought"
    service actually reads.

    Scale: baskets self-join on the order key (bounded basket size keeps
    the pair stream linear in orders), pair counts partial-aggregate onto
    the sparse co-occurrence domain, per-part supports join back on the
    part key (co-partitioned equi-joins).  Ranking compares the exact
    integer ratio n_ab^2/(n_a x n_b) evaluated as one IEEE division —
    bit-identical across engines — and the per-part top-{ALSO_TOP_K}
    compiles to WindowGroupLimit, so the rank-k set is pushed map-side,
    never a global sort."""
    # items fans into part_n and both self-join legs (3 subtrees), and
    # pairs feeds both directions of the union (2 subtrees): lazily
    # composed, the lineitem distinct ran 3x and the basket self-join +
    # pair aggregation 2x.  Two eager checkpoints of these small keyed
    # tables bound each at one pass (r12, guide §5).
    items = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .localCheckpoint(eager=True)
    )
    part_n = items.groupBy("l_partkey").agg(
        F.count("*").cast("long").alias("n")
    )
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
        )
        .agg(F.count("*").cast("long").alias("n_ab"))
        .filter(F.col("n_ab") >= ALSO_MIN_CO)
        .localCheckpoint(eager=True)
    )
    both_dirs = pairs.select(
        F.col("pa").alias("part_id"), F.col("pb").alias("rec_part_id"), "n_ab"
    ).unionByName(
        pairs.select(
            F.col("pb").alias("part_id"),
            F.col("pa").alias("rec_part_id"),
            "n_ab",
        )
    )
    na = part_n.select(
        F.col("l_partkey").alias("part_id"), F.col("n").alias("n_a")
    )
    nb = part_n.select(
        F.col("l_partkey").alias("rec_part_id"), F.col("n").alias("n_b")
    )
    scored = (
        both_dirs.join(na, "part_id")
        .join(nb, "rec_part_id")
        .withColumn(
            "cos2",
            (F.col("n_ab") * F.col("n_ab")).cast("double")
            / (F.col("n_a") * F.col("n_b")),
        )
    )
    w = Window.partitionBy("part_id").orderBy(
        F.desc("cos2"), F.col("rec_part_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= ALSO_TOP_K)
        .select(
            "part_id",
            "rec_part_id",
            "n_ab",
            "n_a",
            "n_b",
            fround(F.sqrt("cos2"), 6).alias("cosine"),
            "rnk",
        )
        .orderBy("part_id", "rnk")
    )


# ---------------------------------------------------------------------------
# Hill tail-index estimator (how heavy is the revenue tail?)
# ---------------------------------------------------------------------------

HILL_K = 100


@register(
    "q_hill_tail",
    oracle=f"""
    WITH topk AS (
        SELECT o_totalprice AS x FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT {HILL_K}
    ),
    moments AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               min(x) AS x_k,
               sum(ln(x)) AS sum_ln
        FROM topk
    )
    SELECT k, {fround_sql("x_k", 2)} AS x_k,
           {fround_sql("(k - 1) / (sum_ln - k * ln(x_k))", 6)} AS hill_alpha,
           {fround_sql("1.0 / ((k - 1) / (sum_ln - k * ln(x_k)))", 6)}
               AS tail_index_inv
    FROM moments
    """,
)
def q_hill_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the revenue tail index over the top-{HILL_K}
    order totals: alpha = (k-1) / (sum ln x_i - k ln x_k) with x_k the
    k-th largest — the standard answer to "is this distribution
    power-law-heavy (alpha < 2 => infinite variance) or merely skewed?",
    complementing the Zipf exponent (q_zipf_fit), Benford audit and Gini
    concentration already in the family.

    Scale: the top-k cut is TakeOrderedAndProject (k rows cross the wire,
    never a global sort); min/sum-of-logs fold into ONE partial aggregate
    over those k rows, so the estimator's cost is the scan that feeds the
    top-k heap."""
    topk = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_totalprice").alias("x"), "o_orderkey")
        .orderBy(F.desc("x"), "o_orderkey")
        .limit(HILL_K)
    )
    moments = topk.agg(
        F.count("*").cast("long").alias("k"),
        F.min("x").alias("x_k"),
        F.sum(F.log("x")).alias("sum_ln"),
    )
    alpha = (F.col("k") - 1) / (
        F.col("sum_ln") - F.col("k") * F.log("x_k")
    )
    return moments.select(
        "k",
        fround(F.col("x_k"), 2).alias("x_k"),
        fround(alpha, 6).alias("hill_alpha"),
        fround(F.lit(1.0) / alpha, 6).alias("tail_index_inv"),
    )


# ---------------------------------------------------------------------------
# Market concentration: HHI and CR4 per nation
# ---------------------------------------------------------------------------

CR_K = 4


@register(
    "q_market_concentration",
    oracle=f"""
    WITH supp_rev AS (
        SELECT s.s_nationkey AS nationkey, l.l_suppkey AS suppkey,
               {fround_sql("sum(l.l_extendedprice * (1 - l.l_discount))")}
                   AS rev
        FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY s.s_nationkey, l.l_suppkey
    ),
    nat AS (
        SELECT nationkey,
               CAST(count(*) AS BIGINT) AS n_suppliers,
               sum(rev) AS total_rev,
               sum(rev * rev) AS sumsq
        FROM supp_rev GROUP BY nationkey
    ),
    ranked AS (
        SELECT nationkey, rev,
               row_number() OVER (PARTITION BY nationkey
                                  ORDER BY rev DESC, suppkey) AS rnk
        FROM supp_rev
    ),
    topk AS (
        SELECT nationkey, sum(rev) AS top_rev
        FROM ranked WHERE rnk <= {CR_K} GROUP BY nationkey
    )
    SELECT n.n_name AS nation, nat.n_suppliers,
           {fround_sql("nat.total_rev", 2)} AS total_revenue,
           {fround_sql("10000 * nat.sumsq / (nat.total_rev * nat.total_rev)", 2)}
               AS hhi,
           {fround_sql("topk.top_rev / nat.total_rev")} AS cr4
    FROM nat
    JOIN topk USING (nationkey)
    JOIN nation n ON nat.nationkey = n.n_nationkey
    ORDER BY nation
    """,
)
def q_market_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-concentration audit per nation: the Herfindahl-Hirschman
    index (10000 x sum of squared supplier revenue shares — the
    antitrust-screening scale where >2500 is 'highly concentrated') and
    the CR{CR_K} top-{CR_K} concentration ratio, beside the Gini/ABC
    views of the same question.  Supplier revenues are quantized to 4 dp
    BEFORE ranking and squaring (the q_top_supplier idiom) so share
    arithmetic and top-{CR_K} membership are engine-stable.

    Scale: one fact scan with the supplier dim broadcast; per-supplier
    revenue partial-aggregates on the (nation, supplier) key; HHI terms
    fold in the same nation-keyed aggregate, and the top-{CR_K} rank
    filter compiles to WindowGroupLimit over the aggregated supplier
    rows (never facts)."""
    supp = F.broadcast(
        load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    )
    supp_rev = (
        load_table(spark, sf_dir, "lineitem")
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.col("s_nationkey").alias("nationkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .agg(
            fround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("rev")
        )
    )
    nat = supp_rev.groupBy("nationkey").agg(
        F.count("*").cast("long").alias("n_suppliers"),
        F.sum("rev").alias("total_rev"),
        F.sum(F.col("rev") * F.col("rev")).alias("sumsq"),
    )
    w = Window.partitionBy("nationkey").orderBy(F.desc("rev"), "suppkey")
    topk = (
        supp_rev.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= CR_K)
        .groupBy("nationkey")
        .agg(F.sum("rev").alias("top_rev"))
    )
    nation = F.broadcast(
        load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    )
    return (
        nat.join(topk, "nationkey")
        .join(nation, F.col("nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            "n_suppliers",
            fround(F.col("total_rev"), 2).alias("total_revenue"),
            fround(
                10000 * F.col("sumsq") / (F.col("total_rev") * F.col("total_rev")),
                2,
            ).alias("hhi"),
            fround(F.col("top_rev") / F.col("total_rev"), 4).alias("cr4"),
        )
        .orderBy("nation")
    )


# ---------------------------------------------------------------------------
# One-way ANOVA across day-of-week groups (the weekday-effect test)
# ---------------------------------------------------------------------------


@register(
    "q_weekday_anova",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               dayofweek(CAST(o_orderdate AS DATE)) + 1 AS dow,
               sum(o_totalprice) AS revenue
        FROM orders GROUP BY 1, 2
    ),
    grp AS (
        SELECT dow, CAST(count(*) AS BIGINT) AS n_g,
               sum(revenue) AS s_g,
               sum(revenue * revenue) AS ss_g
        FROM daily GROUP BY dow
    ),
    tot AS (
        SELECT CAST(sum(n_g) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS g,
               sum(s_g * s_g / n_g) - sum(s_g) * sum(s_g) / sum(n_g) AS ssb,
               sum(ss_g) - sum(s_g * s_g / n_g) AS ssw
        FROM grp
    )
    SELECT n AS n_days, g AS n_groups,
           {fround_sql("ssb", -4)} AS ss_between,
           {fround_sql("ssw", -4)} AS ss_within,
           {fround_sql("(ssb / (g - 1)) / (ssw / (n - g))")} AS f_stat,
           {fround_sql("ssb / (ssb + ssw)")} AS eta_sq
    FROM tot
    """,
)
def q_weekday_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA for a weekday effect on daily revenue: between/within
    sums of squares over the day-of-week groups, the F statistic and the
    eta-squared effect size — the k-group generalization completing the
    two-sample family (Welch t, Mann-Whitney, KS, chi-square, runs test).
    F near 1 with tiny eta-squared = no weekday seasonality; large F
    flags a real weekly cycle worth modeling (q_seasonal_decompose).

    Scale: the daily series is calendar-bounded; sums of squares fold
    into SEVEN group rows via map-side partial aggregation and the F
    arithmetic runs on a single summary row — nothing about the plan
    depends on raw order volume beyond the first scan."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.to_date("o_orderdate").alias("day"),
            F.dayofweek(F.to_date("o_orderdate")).alias("dow"),
        )
        .agg(F.sum("o_totalprice").alias("revenue"))
    )
    grp = daily.groupBy("dow").agg(
        F.count("*").cast("long").alias("n_g"),
        F.sum("revenue").alias("s_g"),
        F.sum(F.col("revenue") * F.col("revenue")).alias("ss_g"),
    )
    tot = grp.agg(
        F.sum("n_g").cast("long").alias("n"),
        F.count("*").cast("long").alias("g"),
        (
            F.sum(F.col("s_g") * F.col("s_g") / F.col("n_g"))
            - F.sum("s_g") * F.sum("s_g") / F.sum("n_g")
        ).alias("ssb"),
        (
            F.sum("ss_g") - F.sum(F.col("s_g") * F.col("s_g") / F.col("n_g"))
        ).alias("ssw"),
    )
    return tot.select(
        F.col("n").alias("n_days"),
        F.col("g").alias("n_groups"),
        fround(F.col("ssb"), -4).alias("ss_between"),
        fround(F.col("ssw"), -4).alias("ss_within"),
        fround(
            (F.col("ssb") / (F.col("g") - 1)) / (F.col("ssw") / (F.col("n") - F.col("g"))),
            4,
        ).alias("f_stat"),
        fround(F.col("ssb") / (F.col("ssb") + F.col("ssw")), 4).alias("eta_sq"),
    )


# ---------------------------------------------------------------------------
# Symbolic motif counting over the daily revenue series
# ---------------------------------------------------------------------------

MOTIF_UP = 1.02  # >2% day-over-day move = U; < -2% = D; else S
MOTIF_LEN = 3


@register(
    "q_revenue_motifs",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               {fround_sql("sum(o_totalprice)")} AS revenue
        FROM orders GROUP BY 1
    ),
    sym AS (
        SELECT day,
               CASE WHEN revenue > {MOTIF_UP} * lag(revenue) OVER w THEN 'U'
                    WHEN {MOTIF_UP} * revenue < lag(revenue) OVER w THEN 'D'
                    ELSE 'S' END AS s
        FROM daily
        WINDOW w AS (ORDER BY day)
        QUALIFY lag(revenue) OVER w IS NOT NULL
    ),
    motifs AS (
        SELECT s || lead(s, 1) OVER v || lead(s, 2) OVER v AS motif
        FROM sym
        WINDOW v AS (ORDER BY day)
        QUALIFY lead(s, 2) OVER v IS NOT NULL
    ),
    hist AS (
        SELECT motif, CAST(count(*) AS BIGINT) AS n FROM motifs GROUP BY motif
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_motifs FROM hist)
    SELECT motif, n, n_motifs,
           {fround_sql("n / CAST(n_motifs AS DOUBLE)")} AS share
    FROM hist, tot
    ORDER BY n DESC, motif
    """,
)
def q_revenue_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symbolic motif mining on the daily revenue series: discretize each
    day-over-day move into U (> +2%), D (< -2%) or S (steady), slide a
    {MOTIF_LEN}-symbol window, and rank the motif histogram — the SAX-style
    symbolic view of series dynamics that surfaces recurring patterns
    (UDU oscillation, SSS plateaus) no moment statistic shows; beside
    q_markov_transitions (event symbols) and q_runs_test (binary runs).

    Symbol assignment compares ROUNDED revenues against the exact ratio
    (revenue > 1.02 x prev as one multiply-compare, never a division), so
    the discretization cannot flip between engines.

    Scale: the series is calendar-bounded (one row per day), so the lag/
    lead windows run over a metadata-scale domain — at cluster scale the
    window partitions by the series id exactly like q_bollinger; the
    motif histogram domain is <= 27 rows."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(fround(F.sum("o_totalprice"), 4).alias("revenue"))
    )
    w = Window.orderBy("day")
    sym = (
        daily.withColumn("prev", F.lag("revenue").over(w))
        .filter(F.col("prev").isNotNull())
        .withColumn(
            "s",
            F.when(F.col("revenue") > MOTIF_UP * F.col("prev"), "U")
            .when(MOTIF_UP * F.col("revenue") < F.col("prev"), "D")
            .otherwise("S"),
        )
    )
    motifs = (
        sym.withColumn("s1", F.lead("s", 1).over(w))
        .withColumn("s2", F.lead("s", 2).over(w))
        .filter(F.col("s2").isNotNull())
        .select(F.concat("s", "s1", "s2").alias("motif"))
    )
    hist = motifs.groupBy("motif").agg(F.count("*").cast("long").alias("n"))
    tot = hist.agg(F.sum("n").cast("long").alias("n_motifs"))
    return (
        hist.crossJoin(F.broadcast(tot))
        .select(
            "motif",
            "n",
            "n_motifs",
            fround(F.col("n") / F.col("n_motifs").cast("double"), 4).alias(
                "share"
            ),
        )
        .orderBy(F.desc("n"), "motif")
    )
