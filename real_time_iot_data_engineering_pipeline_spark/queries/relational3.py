"""Round-6 relational analytics: repeat-purchase behavior and supply-base
concentration — join-heavy operators whose plans demonstrate the keyed
big-big join + tiny-dimension broadcast shape at TPC-H scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import fround, fround_sql
from ..registry import register
from ..sources import load_table


@register(
    "q_order_reorder_rate",
    oracle=f"""
    WITH cp AS (
        SELECT o.o_custkey AS custkey, l.l_partkey AS partkey,
               count(DISTINCT l.l_orderkey) AS n_orders,
               epoch(max(o.o_orderdate)) - epoch(min(o.o_orderdate))
                   AS span_sec
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_custkey, l.l_partkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_reorder_pairs,
           {fround_sql(
               "sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END)"
               " / CAST(count(*) AS DOUBLE)",
               6,
           )} AS reorder_rate,
           {fround_sql(
               "avg(CASE WHEN n_orders >= 2 THEN"
               " span_sec / 86400.0 / (n_orders - 1) END)",
               4,
           )} AS avg_reorder_gap_days
    FROM cp
    """,
)
def q_order_reorder_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase report: of all (customer, part) pairs ever ordered,
    what fraction was ordered in >=2 distinct orders, and the average
    spacing (order-date span / (n_orders - 1)) of those reorders — the
    loyalty/replenishment signal behind also-bought recommendations.

    Scale: ONE keyed big-big equi-join (lineitem -> orders on the order
    key; at 100 TB both sides bucket on l_orderkey so the join is
    co-located), then a partial-aggregating groupBy on the (cust, part)
    pair key and a scalar rollup.  count(DISTINCT l_orderkey) inside the
    pair group is the two-phase expand Spark plans natively."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    cp = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("custkey"),
            F.col("l_partkey").alias("partkey"),
        )
        .agg(
            F.countDistinct("l_orderkey").alias("n_orders"),
            (
                F.unix_timestamp(F.max("o_orderdate"))
                - F.unix_timestamp(F.min("o_orderdate"))
            ).alias("span_sec"),
        )
    )
    reordered = F.col("n_orders") >= 2
    return cp.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum(reordered.cast("long")).cast("long").alias("n_reorder_pairs"),
        fround(
            F.sum(reordered.cast("long")) / F.count("*").cast("double"), 6
        ).alias("reorder_rate"),
        fround(
            F.avg(
                F.when(
                    reordered,
                    F.col("span_sec")
                    / F.lit(86400.0)
                    / (F.col("n_orders") - 1),
                )
            ),
            4,
        ).alias("avg_reorder_gap_days"),
    )


@register(
    "q_supplier_herfindahl",
    oracle=f"""
    WITH ps AS (
        SELECT l_partkey AS partkey, l_suppkey AS suppkey,
               sum(l_quantity) AS qty
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    per_part AS (
        SELECT partkey,
               CAST(count(*) AS BIGINT) AS n_suppliers,
               sum(qty * qty) / (sum(qty) * sum(qty)) AS h
        FROM ps GROUP BY partkey
    )
    SELECT n_suppliers,
           CAST(count(*) AS BIGINT) AS n_parts,
           {fround_sql("avg(h)", 6)} AS avg_hhi,
           {fround_sql("min(h)", 6)} AS min_hhi,
           {fround_sql("max(h)", 6)} AS max_hhi
    FROM per_part
    GROUP BY n_suppliers
    """,
)
def q_supplier_herfindahl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply-base concentration: per part, the Herfindahl index of
    supplier quantity shares (sum of squared shares; 1 = single-sourced),
    rolled up by supplier-count bucket — the supply-risk histogram a
    procurement dashboard shows (how much of the catalog is effectively
    single-sourced despite having many listed suppliers).

    Scale: two stacked partial aggregations on part-keyed data —
    (part, supplier) quantity, then per-part share-square sum via a
    window over the per-part supplier rows (bounded fan-in: suppliers per
    part), then a |distinct supplier-count|-row rollup.  No joins at all."""
    ps = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .agg(F.sum("l_quantity").alias("qty"))
    )
    per_part = ps.groupBy("partkey").agg(
        F.count("*").cast("long").alias("n_suppliers"),
        (
            F.sum(F.col("qty") * F.col("qty"))
            / (F.sum("qty") * F.sum("qty"))
        ).alias("h"),
    )
    return per_part.groupBy("n_suppliers").agg(
        F.count("*").cast("long").alias("n_parts"),
        fround(F.avg("h"), 6).alias("avg_hhi"),
        fround(F.min("h"), 6).alias("min_hhi"),
        fround(F.max("h"), 6).alias("max_hhi"),
    )


@register(
    "q_order_priority_exists",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 analog (order-priority checking): orders placed in 1996
    with at least one line item shipped more than 30 days after the order
    date, counted per priority — the classic EXISTS-correlated-subquery
    shape.  The fixture schema carries no commit/receipt dates
    (TESTDATA.md), so ship-vs-order lateness stands in for Q4's
    commit-vs-receipt predicate.

    Scale: the EXISTS compiles to a LEFT SEMI hash join keyed on the
    order key (first match short-circuits; no duplication of the orders
    side however many line items qualify).  The orderdate range filter
    pushes into the orders scan, shrinking the build side before the
    join; at 100 TB both tables bucket on the order key so the semi join
    is co-located, and the tiny priority rollup partial-aggregates."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    qualifying = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")),
        "left_semi",
    )
    return (
        qualifying.groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q_late_shipment_mix",
    oracle=f"""
    SELECT l.l_returnflag,
           CAST(sum(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                          AND o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS late_high_count,
           CAST(sum(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                          AND o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS late_low_count,
           CAST(count(*) AS BIGINT) AS line_count,
           {fround_sql(
               "sum(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY"
               " THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE)",
               6,
           )} AS late_frac
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
)
def q_late_shipment_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 analog (shipping-priority mix): per return flag, how many
    line items shipped more than 90 days after their order date split by
    high (URGENT/HIGH) vs lower order priority, plus the overall late
    fraction — Q12's conditional-aggregation-over-a-join shape with
    ship-vs-order lateness standing in for the schema's missing
    shipmode/receipt columns.

    Scale: ONE keyed big-big equi-join on the order key (co-located under
    bucketing; no filter, so the join IS the query) followed by a 3-group
    conditional rollup that partial-aggregates map-side — the shuffle
    carries 3 keys x a handful of counters, nothing else."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        "INTERVAL 90 DAY"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    # CASE-exact counting (F.when ... otherwise 0), NOT sum(bool.cast):
    # a NULL ship/order date makes `late` three-valued NULL, which the
    # cast-and-sum idiom SKIPS (an all-NULL group sums to NULL and the
    # pandas bridge floats the int column) while the oracle's CASE maps
    # it to 0.  when/otherwise routes NULL conditions to the ELSE branch,
    # matching SQL CASE in both engines (hostile-relational suite trap).
    one_if = lambda cond: F.sum(F.when(cond, 1).otherwise(0))  # noqa: E731
    return (
        j.groupBy("l_returnflag")
        .agg(
            one_if(late & high).cast("long").alias("late_high_count"),
            one_if(late & ~high).cast("long").alias("late_low_count"),
            F.count("*").cast("long").alias("line_count"),
            fround(
                one_if(late) / F.count("*").cast("double"), 6
            ).alias("late_frac"),
        )
        .orderBy("l_returnflag")
    )
