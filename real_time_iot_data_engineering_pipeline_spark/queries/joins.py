"""Join operators (SURVEY.md §2.3 — the reference's spec'd enrichment joins,
Learning Guide.txt:1045 §5 and :1071 §2).

Scale posture: dimension tables (supplier/nation/region) are broadcast —
no shuffle of the fact side; the anti join ships only the key column.  The
fact-fact path relies on AQE for skew handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import fround, fround_sql
from ..registry import register
from ..sources import load_table


@register(
    "q_join_inner",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal, n_name, r_name
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-dim equi inner join chain (dbt int_iot_with_features analog,
    Learning Guide.txt:1071 §2-L2)."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        customer.join(
            F.broadcast(nation),
            customer.c_nationkey == nation.n_nationkey,
            "inner",
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey, "inner")
        .select("c_custkey", "c_name", "c_acctbal", "n_name", "r_name")
    )


@register(
    "q_join_broadcast",
    oracle="""
    SELECT s_name,
           (floor((sum(l_extendedprice * (1 - l_discount))) * 1e2 * (1 + 1e-12) + 0.5) / 1e2) AS revenue,
           count(*) AS n_items
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_name
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast hash join of the big fact against a small dim
    (Learning Guide.txt:1045 §5 'broadcast join for device_metadata').

    F.broadcast pins the strategy: the fact side streams through map-side
    hash probes with zero shuffle for the join; only the post-join group-by
    (bounded by |supplier|) shuffles."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        lineitem.join(
            F.broadcast(supplier),
            lineitem.l_suppkey == supplier.s_suppkey,
            "inner",
        )
        .groupBy("s_name")
        .agg(
            fround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity anti join (dbt relationship test analog,
    Learning Guide.txt:1071 §3): keys on the left with no match on the right."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# Skew-safe salted join
# ---------------------------------------------------------------------------

SALT_N = 16


@register(
    "q_join_salted",
    oracle="""
    WITH weights AS (
        SELECT event_type, CAST(count(*) AS DOUBLE) AS type_n,
               avg(value) AS type_avg
        FROM events WHERE value IS NOT NULL GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n,
           (floor((sum(e.value / w.type_avg)) * 1e4 * (1 + 1e-12) + 0.5) / 1e4)
               AS sum_rel_value
    FROM events e JOIN weights w USING (event_type)
    WHERE e.value IS NOT NULL
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe salted join: the fact side's join key (event_type, ~5
    values) is exactly the key distribution where a shuffled equi-join
    stragglers — every row of a hot key lands on one reducer.  Salting
    decomposes each hot key into SALT_N sub-keys: the fact side tags
    rows with a deterministic salt, the dimension side replicates each
    row SALT_N times, and the join runs on (key, salt) with SALT_N-fold
    finer granularity.  Result is provably identical to the unsalted
    join (the oracle IS the unsalted join).

    Scale: this is the pattern for skewed BIG-big joins where the dim
    side is too large to broadcast — replication costs SALT_N x |dim|
    rows, tiny next to the fact shuffle it de-stragglers; AQE's skew
    split handles moderate skew automatically, salting handles the
    extreme tail deterministically.  The demo dimension (per-type
    weights) is derived in-query so the oracle sees identical values."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    weights = ev.groupBy("event_type").agg(
        F.count("*").cast("double").alias("type_n"),
        F.avg("value").alias("type_avg"),
    )
    salted_dim = weights.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(SALT_N - 1)))
    )
    salted_fact = ev.withColumn(
        "salt", (F.col("event_id") % SALT_N).cast("int")
    )
    j = salted_fact.join(salted_dim, ["event_type", "salt"])
    return (
        j.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            fround(F.sum(F.col("value") / F.col("type_avg")), 4).alias(
                "sum_rel_value"
            ),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Bloom-prefiltered join
# ---------------------------------------------------------------------------

BLOOM_M = 1 << 17  # filter size in bits (16 KiB broadcast)
BLOOM_K = 3  # hash probes per key
_BLOOM_WORDS = BLOOM_M // 64


def _bloom_positions(col: str) -> str:
    """The {BLOOM_K} deterministic bit positions for a key: xxhash64 with
    distinct seeds, folded into the {BLOOM_M}-bit domain."""
    return ", ".join(
        f"pmod(xxhash64({col}, {s}), {BLOOM_M})" for s in range(BLOOM_K)
    )


@register(
    "q_bloom_join",
    oracle=f"""
    SELECT date_trunc('month', l.l_shipdate) AS ship_month,
           CAST(count(*) AS BIGINT) AS n_lines,
           {fround_sql("sum(l.l_extendedprice * (1 - l.l_discount))", 2)}
               AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY date_trunc('month', l.l_shipdate)
    ORDER BY ship_month
    """,
)
def q_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered join: revenue by ship month for line items of
    1996 URGENT orders.  The selective build side (filtered orders) is
    condensed into a {BLOOM_M}-bit Bloom filter — {BLOOM_K} xxhash64
    probes per key, bits packed into a dense array<bigint> of
    {_BLOOM_WORDS} words via bit_or aggregation — broadcast to the probe
    side, which drops non-matching line items BEFORE the join shuffle
    with O(1) element_at + bit-test probes (whole-stage codegen; never a
    linear array scan).  False positives are then removed by the exact
    equi-join, so the result is provably identical to the plain join
    (the oracle IS the plain join).

    This makes explicit what Spark's runtime row-level filtering
    (spark.sql.optimizer.runtime.bloomFilter.enabled, pinned live in
    tests/test_aqe.py) injects for selective joins — shown as a query
    because at 100 TB the probe-side shuffle is THE cost, and pre-shuffle
    filtering is the only lever that shrinks it.  The broadcast is
    {BLOOM_M}/8 bytes regardless of build-side volume."""
    orders_f = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    # build: positions -> (word, bit) -> per-word bit_or.  The filter is a
    # <= {_BLOOM_WORDS}-row (word, bits) relation, broadcast as a hash
    # table rather than flattened to one array row: probing then lowers to
    # broadcast HASH joins inside whole-stage codegen.  (A one-row array
    # variant fused the probe filter into a BroadcastNestedLoopJoin
    # condition, which Spark evaluates INTERPRETED, row at a time — 6x
    # slower at sf0.1.)
    words = (
        orders_f.select(
            F.explode(
                F.expr(f"array({_bloom_positions('o_orderkey')})")
            ).alias("pos")
        )
        .select(
            F.expr("cast(pos div 64 as int)").alias("w"),
            F.expr("shiftleft(1L, cast(pos % 64 as int))").alias("b"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(b)").alias("bits"))
    )
    # probe: one broadcast hash join per hash function; an inner join IS
    # the word-presence test (a missing word means every bit is 0), and
    # the residual tests the specific bit.
    candidate = li
    for s in range(BLOOM_K):
        ws = words.select(
            F.col("w").alias(f"w{s}"), F.col("bits").alias(f"bits{s}")
        )
        candidate = (
            candidate.withColumn(
                f"p{s}",
                F.expr(f"pmod(xxhash64(l_orderkey, {s}), {BLOOM_M})"),
            )
            .withColumn(f"w{s}_", F.expr(f"cast(p{s} div 64 as int)"))
            .join(
                F.broadcast(ws),
                F.col(f"w{s}_") == F.col(f"w{s}"),
            )
            .filter(
                F.expr(
                    f"(bits{s} & shiftleft(1L, cast(p{s} % 64 as int))) != 0"
                )
            )
        )
    j = candidate.join(
        orders_f.select("o_orderkey"),
        candidate.l_orderkey == F.col("o_orderkey"),
    )
    return (
        j.groupBy(F.date_trunc("month", "l_shipdate").alias("ship_month"))
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            fround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .orderBy("ship_month")
    )
