"""Join operators (SURVEY.md §2.3 — the reference's spec'd enrichment joins,
Learning Guide.txt:1045 §5 and :1071 §2).

Scale posture: dimension tables (supplier/nation/region) are broadcast —
no shuffle of the fact side; the anti join ships only the key column.  The
fact-fact path relies on AQE for skew handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import fround
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
