"""Relational analytics over the TPC-H-ish warehouse tables (customer /
orders / lineitem / supplier / nation / region, TESTDATA.md).

The reference's batch tier serves flat per-table aggregates; a user who
lands warehouse tables next to the stream immediately writes multi-join
analytical SQL over them.  This family exercises the join-planning
machinery the single-table families cannot: multi-way join ordering,
broadcast dimension chains, star-schema pruning, semi joins with
cross-side residuals, and top-k termination over joined aggregates.

Scale design (SCALE.md "Relational analytics"):
- dimension chains (region -> nation -> supplier/customer) broadcast —
  each is KBs; the fact tables (orders, lineitem) NEVER broadcast and
  join each other on their natural key via shuffle hash/sort-merge,
  which AQE can convert or skew-split at runtime;
- filters sit on the scan side of every join (predicate pushdown is
  plan-asserted) so the fact join sees post-filter cardinality;
- top-k over the joined aggregate terminates via TakeOrderedAndProject
  (per-partition top-k, driver merges partitions x k rows);
- the EXISTS form is a LeftSemi with the time-ordering residual inside
  the join condition — one pass, no distinct, no post-join dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import fround, fround_sql
from ..registry import register
from ..sources import load_table

_REVENUE = "l_extendedprice * (1 - l_discount)"


@register(
    "q_pricing_summary",
    oracle=f"""
    SELECT l_returnflag,
           l_linestatus,
           {fround_sql("sum(l_quantity)")} AS sum_qty,
           {fround_sql("sum(l_extendedprice)")} AS sum_base_price,
           {fround_sql("sum(l_extendedprice * (1 - l_discount))")} AS sum_disc_price,
           {fround_sql("sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))")} AS sum_charge,
           {fround_sql("avg(l_quantity)")} AS avg_qty,
           {fround_sql("avg(l_extendedprice)")} AS avg_price,
           {fround_sql("avg(l_discount)")} AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report (TPC-H Q1 shape): the canonical scan-heavy
    aggregate — 8 running aggregates over computed expressions, grouped by
    two low-cardinality flags.  Everything stays inside whole-stage
    codegen; partial aggregation collapses each partition to at most
    |flags x statuses| rows before the one tiny shuffle, so the query is
    pure scan bandwidth at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp_ntz")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            fround(F.sum("l_quantity"), 4).alias("sum_qty"),
            fround(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            fround(F.sum(disc_price), 4).alias("sum_disc_price"),
            fround(F.sum(disc_price * (1 + F.col("l_tax"))), 4).alias(
                "sum_charge"
            ),
            fround(F.avg("l_quantity"), 4).alias("avg_qty"),
            fround(F.avg("l_extendedprice"), 4).alias("avg_price"),
            fround(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").cast("long").alias("count_order"),
        )
    )


@register(
    "q_ship_priority",
    oracle=f"""
    SELECT l_orderkey,
           {fround_sql("sum(l_extendedprice * (1 - l_discount))")} AS revenue,
           o_orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1996-01-01'
      AND l_shipdate  > TIMESTAMP '1996-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unshipped-revenue top-10 (TPC-H Q3 shape): segment-filtered
    customers x pre-cutoff orders x post-cutoff lineitems, ranked by
    discounted revenue.  Customers broadcast (dimension-sized after the
    segment filter); orders<->lineitem is the one fact-fact shuffle; the
    top-10 terminates as TakeOrderedAndProject with l_orderkey as the
    deterministic tiebreak."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > F.lit("1996-01-01").cast("timestamp_ntz"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(fround(F.sum(F.expr(_REVENUE)), 4).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q_region_revenue",
    oracle=f"""
    SELECT n_name,
           {fround_sql("sum(l_extendedprice * (1 - l_discount))")} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def q_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier volume (TPC-H Q5 shape): six-way star join — the
    region->nation dimension chain prunes suppliers/customers to one
    region BEFORE the fact joins, every dimension broadcasts, and the
    c_nationkey = s_nationkey residual ("customer and supplier in the
    same nation") rides the lineitem<->supplier join."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = (
        load_table(spark, sf_dir, "nation")
        .join(
            F.broadcast(region),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .groupBy("n_name")
        .agg(fround(F.sum(F.expr(_REVENUE)), 4).alias("revenue"))
    )


@register(
    "q_priority_fill",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o.o_orderkey
                    AND l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q_priority_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority checking (TPC-H Q4 shape): quarterly orders with at
    least one lineitem shipped after the order date, counted per priority.
    The EXISTS compiles to ONE LeftSemi join with the cross-side
    l_shipdate > o_orderdate residual inside the join condition — no
    distinct pass, no row duplication to undo."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
        )
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("n_orders"))
    )


@register(
    "q_returned_revenue",
    oracle=f"""
    SELECT c_custkey,
           c_name,
           {fround_sql("sum(l_extendedprice * (1 - l_discount))")} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item reporting (TPC-H Q10 shape): top-20 customers by
    revenue lost to returns.  Aggregates on the high-cardinality customer
    key BEFORE attaching the name (broadcast join-back), so the shuffle
    carries (custkey, partial sum) pairs, and the top-20 terminates as
    TakeOrderedAndProject with c_custkey as the deterministic tiebreak."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    per_cust = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(fround(F.sum(F.expr(_REVENUE)), 4).alias("revenue"))
    )
    return (
        per_cust.join(F.broadcast(cust), per_cust.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "revenue")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q_min_cost_supplier",
    oracle=f"""
    WITH ps AS (
        SELECT l_partkey, l_suppkey,
               {fround_sql("min(l_extendedprice / l_quantity)")} AS unit_cost
        FROM lineitem
        WHERE l_quantity > 0
        GROUP BY l_partkey, l_suppkey
    ),
    best AS (
        SELECT l_partkey, min(unit_cost) AS min_cost FROM ps GROUP BY l_partkey
    ),
    pick AS (
        SELECT ps.l_partkey, best.min_cost, min(ps.l_suppkey) AS pick_suppkey
        FROM ps JOIN best
          ON ps.l_partkey = best.l_partkey AND ps.unit_cost = best.min_cost
        GROUP BY ps.l_partkey, best.min_cost
    )
    SELECT p_partkey, p_name, p_brand, s_name, n_name, min_cost
    FROM pick
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = pick_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    ORDER BY min_cost DESC, p_partkey
    LIMIT 100
    """,
)
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-cost supplier per part (TPC-H Q2 shape, with observed unit
    cost from lineitem standing in for the partsupp catalog the fixtures
    don't ship).  The classic correlated scalar subquery — "the supplier
    whose cost equals the minimum cost for that part" — expressed directly
    in its decorrelated form: the per-part argmin collapses into ONE
    aggregation via min(struct(cost, suppkey)), so Spark never runs the
    subquery per row and never joins the costs table against itself.

    Scale: lineitem shuffles once on (partkey, suppkey) for the unit-cost
    agg; the argmin reuses the partkey hash distribution (co-partitioned,
    AQE-coalesced); part/supplier/nation attach as broadcast dims; top-100
    terminates as TakeOrderedAndProject.  The self-join the SQL form
    implies (ps JOIN best) never materializes — struct-min is one pass."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 0)
        .select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
    )
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        fround(F.min(F.col("l_extendedprice") / F.col("l_quantity")), 4).alias(
            "unit_cost"
        )
    )
    pick = (
        ps.groupBy("l_partkey")
        .agg(F.min(F.struct("unit_cost", "l_suppkey")).alias("m"))
        .select(
            "l_partkey",
            F.col("m.unit_cost").alias("min_cost"),
            F.col("m.l_suppkey").alias("pick_suppkey"),
        )
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_name", "p_brand")
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        pick.join(F.broadcast(part), pick.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), pick.pick_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("p_partkey", "p_name", "p_brand", "s_name", "n_name", "min_cost")
        .orderBy(F.desc("min_cost"), F.asc("p_partkey"))
        .limit(100)
    )


@register(
    "q_large_orders",
    oracle=f"""
    WITH big AS (
        SELECT l_orderkey
        FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(l_quantity) > 200
    )
    SELECT c.c_name,
           o.o_orderkey,
           o.o_orderdate,
           o.o_totalprice,
           {fround_sql("sum(l.l_quantity)")} AS total_qty
    FROM orders o
    JOIN big ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume orders (TPC-H Q18 shape): an aggregate used as a FILTER
    — "orders whose total quantity exceeds 200" — then re-joined to its
    own detail rows plus the customer dimension.  The IN-subquery form
    becomes an explicit aggregate + semi-style equi-join, which is what a
    decorrelating optimizer produces anyway, but written directly so the
    plan is deterministic.

    Scale: lineitem shuffles ONCE on l_orderkey for the qualifying-key
    aggregate; the detail re-join reuses that same hash distribution
    (co-partitioned, AQE-coalesced, no second full shuffle of lineitem
    beyond the join itself); the qualifying-key set is a tiny fraction of
    orders (sum > 200 selects ~5%) so AQE typically demotes that side to a
    broadcast at runtime.  customer attaches as a broadcast dim AFTER the
    fact aggregation; top-100 terminates via TakeOrderedAndProject.

    Reference parity: the reference has no multi-join tier (batch_layer
    serves single-table aggregates) — this extends the warehouse family
    beyond it, per the round brief."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("order_qty"))
        .filter(F.col("order_qty") > 200)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(big, orders.o_orderkey == big.big_orderkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(fround(F.sum("l_quantity"), 4).alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "q_disjunctive_revenue",
    oracle=f"""
    SELECT p.p_brand,
           {fround_sql("sum(l.l_extendedprice * (1 - l.l_discount))")} AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 40)
    GROUP BY p.p_brand
    ORDER BY p.p_brand
    """,
)
def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive-predicate revenue (TPC-H Q19 shape): an OR-of-ANDs
    join predicate mixing columns from BOTH sides — the classic test of
    predicate decomposition.  Catalyst splits the disjunction into its
    single-side implications: the part scan receives
    `p_brand IN (...) AND p_size <= 35`-style pushed filters, the
    lineitem scan receives the OR of the quantity ranges (l_quantity
    between 1 and 40), and only the mixed residual is evaluated on the
    joined rows — so both scans prune BEFORE the join instead of
    filtering its cross product after.

    Scale: part (post-filter, dimension-sized) broadcasts; lineitem never
    shuffles — scan, pushed range filter, broadcast hash probe, partial
    agg to |brands| rows.  The whole query is one codegen pass over the
    fact scan at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 30)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 40)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .groupBy("p_brand")
        .agg(
            fround(F.sum(F.expr(_REVENUE)), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("p_brand")
    )


@register(
    "q_nation_volume",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {fround_sql("sum(volume)")} AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM (
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS l_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    )
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilateral shipping volume (TPC-H Q7 shape): revenue between a
    nation PAIR in both directions, by shipment year.  The signature
    planner feature is the disjunction over the (supplier-nation,
    customer-nation) pair — it cannot be pushed to either scan alone,
    but each disjunct's single-side implication CAN: both nation dims
    pre-filter to the 2-nation set before the fact joins.

    Scale: nation -> supplier and nation -> customer chains broadcast
    (each dimension-sized after the 2-nation prune); lineitem and orders
    join on l_orderkey as the one fact-fact shuffle (AQE-convertible /
    skew-splittable); the pair disjunction evaluates as the residual on
    the joined row; the final agg is |2 x 2 x years| rows."""
    nations = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(
            F.broadcast(nations.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "supp_nation")
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .join(
            F.broadcast(nations.select("n_nationkey", F.col("n_name").alias("cust_nation"))),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", "cust_nation")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            fround(F.sum(F.expr(_REVENUE)), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q_dormant_rich",
    oracle=f"""
    WITH avg_bal AS (
        SELECT {fround_sql("avg(c_acctbal)", 6)} AS ab
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_custkey, c.c_name,
           {fround_sql("c.c_acctbal")} AS acctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.ab
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY c.c_custkey
    """,
)
def q_dormant_rich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dormant high-balance customers (TPC-H Q22 shape): a scalar
    aggregate subquery (global positive-balance average) feeding a
    filter, then NOT EXISTS against orders — the canonical
    scalar-subquery + anti-join pattern.

    Scale: the scalar average is a single-row partial aggregate that
    broadcasts into the filter (never a SinglePartition exchange of
    customer rows); the NOT EXISTS is a LeftAnti equi-join on custkey —
    the orders side ships only its join column through the exchange, and
    the anti join needs no pre-distinct (semi/anti semantics dedup for
    free).  The average is quantized at 6 dp on both engines so the
    threshold comparison cannot flip on summation-order ulps."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(fround(F.avg("c_acctbal"), 6).alias("ab"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select(
            "c_custkey",
            "c_name",
            fround(F.col("c_acctbal"), 4).alias("acctbal"),
        )
        .orderBy("c_custkey")
    )


@register(
    "q_promo_share",
    oracle=f"""
    SELECT {fround_sql(
        "100.0 * sum(CASE WHEN p.p_type = 'PROMO' "
        "THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0.0 END) "
        "/ sum(l.l_extendedprice * (1 - l.l_discount))"
    )} AS promo_share,
           {fround_sql(
        "sum(CASE WHEN p.p_type = 'PROMO' "
        "THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0.0 END)"
    )} AS promo_revenue,
           {fround_sql("sum(l.l_extendedprice * (1 - l.l_discount))")} AS total_revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01'
    """,
)
def q_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion revenue share (TPC-H Q14 shape): the conditional-
    aggregate-over-join pattern — one scan computes both the guarded and
    the unguarded sum, and the report is their ratio.  The alternative
    (two filtered subqueries self-joined) would scan lineitem twice;
    the CASE form is the one-pass shape every reporting layer should
    emit.

    Scale: the shipdate range pushes into the lineitem scan; part
    broadcasts; both sums partial-aggregate to ONE row per partition, so
    the query is a single codegen pass over the pruned fact scan at
    100 TB.  The ratio divides two engine-identical ordered sums and is
    quantized at 4 dp (summation-order ulps are 1e-16 relative, far
    below the fround bias)."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        )
        .select("l_partkey", "l_extendedprice", "l_discount")
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            fround(F.lit(100.0) * F.sum(promo_rev) / F.sum(rev), 4).alias(
                "promo_share"
            ),
            fround(F.sum(promo_rev), 4).alias("promo_revenue"),
            fround(F.sum(rev), 4).alias("total_revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
