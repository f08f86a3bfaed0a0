"""Hostile-RELATIONAL parity: the fifth hostile suite (events, documents,
embeddings, gate payloads are the other four) — registered TPC-H-family
queries AND their DuckDB oracles run on a planted mini-warehouse whose
every row is a trap the driver's referentially-intact fixture never sets:

- BROKEN FOREIGN KEYS everywhere: a nation pointing at a nonexistent
  region, customers/suppliers pointing at nonexistent nations, orders for
  nonexistent customers, lineitems for nonexistent orders/parts/suppliers.
  Inner joins must drop the orphans and outer joins must keep them — in
  BOTH engines identically.
- NULL JOIN KEYS (o_custkey, l_partkey, l_suppkey, c_nationkey,
  n_regionkey): SQL null-semantics says they match nothing; any engine
  that hashes NULLs into a bucket-0 match would diverge here.
- DEGENERATE NUMERICS: zero and negative quantities/prices/balances,
  discount exactly 0, exactly 1 (revenue multiplies to zero), and an
  out-of-domain 1.5 (negative revenue), NULL tax/totalprice.
- DUPLICATE PRIMARY KEYS (two orders sharing o_orderkey, two lineitems
  sharing (orderkey, linenumber)): join multiplicity must agree.
- BOUNDARY & NULL DATES: order dates exactly at midnight year boundaries,
  NULL o_orderdate/l_shipdate.
- EMPTY GROUPS: a region with no nations, a customer with no orders, an
  order with no lineitems — exercising COUNT(*)=0 vs no-row semantics.

Two classes of queries are exercised:

1. _PARITY_QUERIES: every registered relational query that is a TOTAL
   function of an arbitrary warehouse — engine and oracle must agree to
   the hash on the hostile rows.
2. _EXCLUDED (documented): queries whose registered fixture CONTRACT is
   narrower than arbitrary input — statistical operators that require a
   minimum series length (regression/autocorrelation over daily revenue)
   or that derive planted corpora from fixture-shaped values.  Their
   exclusion reasons are asserted in code so a future widening removes
   them from the list consciously rather than silently.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from real_time_iot_data_engineering_pipeline_spark import registry
from .oracle_utils import compare

registry.load_all()

_TS = dt.datetime.fromisoformat


def _write(path, name, cols, types, rows):
    pq.write_table(
        pa.table(
            {
                c: pa.array([r[i] for r in rows], type=t)
                for i, (c, t) in enumerate(zip(cols, types))
            }
        ),
        f"{path}/{name}.parquet",
    )


@pytest.fixture(scope="module")
def hostile_rel_sf(tmp_path_factory) -> str:
    path = str(tmp_path_factory.mktemp("hostile_rel"))
    i32, i64, f64, s, ts = (
        pa.int32(),
        pa.int64(),
        pa.float64(),
        pa.string(),
        pa.timestamp("us"),
    )

    _write(
        path,
        "region",
        ["r_regionkey", "r_name"],
        [i32, s],
        [
            (0, "AMERICA"),
            (1, "ASIA"),
            (9, "EMPTY"),  # no nations point here
        ],
    )
    _write(
        path,
        "nation",
        ["n_nationkey", "n_name", "n_regionkey"],
        [i32, s, i32],
        [
            (1, "BRAZIL", 0),
            (2, "JAPAN", 1),
            (3, "ORPHANIA", 99),  # broken FK -> region
            (4, "NULLAND", None),  # NULL region key
        ],
    )
    _write(
        path,
        "customer",
        ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
        [i64, s, i32, f64, s],
        [
            (1, "Customer#1", 1, 100.0, "BUILDING"),
            (2, "Customer#2", 2, -50.0, "MACHINERY"),  # negative balance
            (3, "Customer#3", 77, 0.0, "BUILDING"),  # broken FK -> nation
            (4, "Customer#4", None, 10.0, None),  # NULL nation + segment
            (5, "Customer#1", 1, 100.0, "BUILDING"),  # duplicate name row
            (6, "Customer#6", 2, None, "AUTOMOBILE"),  # NULL balance, no orders
        ],
    )
    _write(
        path,
        "supplier",
        ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
        [i64, s, i32, f64],
        [
            (1, "Supplier#1", 1, 500.0),
            (2, "Supplier#2", 2, -1.0),
            (3, "Supplier#3", 77, None),  # broken FK + NULL balance
            (4, "Supplier#4", None, 0.0),  # NULL nation
        ],
    )
    _write(
        path,
        "part",
        ["p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"],
        [i64, s, s, s, i32, f64],
        [
            (1, "green part", "Brand#1", "ECONOMY", 0, 10.0),  # size 0
            (2, "red part", "Brand#13", "STANDARD", 50, -5.0),  # negative price
            (3, "blue part", None, None, None, None),  # NULL everything
        ],
    )
    _write(
        path,
        "orders",
        [
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        ],
        [i64, i64, s, f64, ts, s],
        [
            (1, 1, "O", 1000.0, _TS("1995-01-01 00:00:00"), "1-URGENT"),
            (2, 1, "F", 0.0, _TS("1995-12-31 00:00:00"), "5-LOW"),  # zero price
            (3, 2, "P", -10.0, _TS("1996-01-01 00:00:00"), "3-MEDIUM"),
            (4, 88, "O", 50.0, _TS("1996-06-15 00:00:00"), "2-HIGH"),  # orphan cust
            (5, None, "F", 60.0, _TS("1997-01-01 00:00:00"), None),  # NULL cust
            (6, 3, "X", None, None, "4-NOT SPECIFIED"),  # odd status, NULLs
            (7, 2, "O", 70.0, _TS("1998-08-02 00:00:00"), "1-URGENT"),
            (7, 2, "O", 70.0, _TS("1998-08-02 00:00:00"), "1-URGENT"),  # dup PK
            (9, 4, "F", 80.0, _TS("1999-02-28 00:00:00"), "5-LOW"),  # no lineitems? (has below)
            (10, 1, "O", 90.0, _TS("2000-02-29 00:00:00"), "2-HIGH"),  # leap day, no lineitems
        ],
    )
    _write(
        path,
        "lineitem",
        [
            "l_orderkey",
            "l_partkey",
            "l_suppkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_returnflag",
            "l_linestatus",
            "l_shipdate",
        ],
        [i64, i64, i64, i32, f64, f64, f64, f64, s, s, ts],
        [
            (1, 1, 1, 1, 5.0, 100.0, 0.0, 0.05, "N", "O", _TS("1995-01-02 00:00:00")),
            (1, 2, 2, 2, 0.0, 50.0, 1.0, 0.0, "R", "F", _TS("1995-02-01 00:00:00")),  # qty 0, disc 1
            (2, 1, 1, 1, -3.0, -30.0, 0.5, None, "A", "F", _TS("1996-01-01 00:00:00")),  # negatives
            (3, 3, 3, 1, 2.0, 20.0, 1.5, 0.1, None, "O", None),  # disc>1, NULL flag/date
            (4, 1, 1, 1, 7.0, 70.0, 0.1, 0.0, "N", "O", _TS("1996-07-01 00:00:00")),  # orphan order's line
            (5, None, None, 1, 4.0, 40.0, 0.2, 0.0, "R", "O", _TS("1997-01-15 00:00:00")),  # NULL part/supp
            (6, 2, 2, 1, 6.0, 60.0, 0.0, 0.0, "A", "F", _TS("1997-05-05 00:00:00")),
            (7, 1, 2, 1, 8.0, 80.0, 0.3, 0.0, "N", "O", _TS("1998-08-03 00:00:00")),
            (9, 2, 1, 1, 9.0, 90.0, 0.0, 0.0, "R", "F", _TS("1999-03-01 00:00:00")),
            (9, 2, 1, 1, 9.5, 95.0, 0.0, 0.0, "R", "F", _TS("1999-03-02 00:00:00")),  # dup (okey, lineno)
            (99, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", _TS("1999-06-01 00:00:00")),  # orphan line
        ],
    )
    return path


@pytest.fixture(scope="module")
def hostile_rel_duck(hostile_rel_sf):
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{hostile_rel_sf}/{t}.parquet'"
        )
    yield con
    con.close()


# Relational queries that are TOTAL functions of an arbitrary warehouse.
_PARITY_QUERIES = (
    "q_join_inner",
    "q_join_broadcast",
    "q_join_anti",
    "q_region_revenue",
    "q_nation_volume",
    "q_mkt_share",
    "q_ship_priority",
    "q_returned_revenue",
    "q_custdist",
    "q_top_supplier",
    "q_pricing_summary",
    "q_promo_share",
    "q_small_qty_revenue",
    "q_large_orders",
    "q_disjunctive_revenue",
    "q_late_shipment_mix",
    "q_order_priority_exists",
    "q_waiting_suppliers",
    "q_excess_suppliers",
    "q_important_parts",
    "q_min_cost_supplier",
    "q_part_supplier_count",
    "q_product_profit",
    "q_priority_fill",
    "q_open_orders",
    "q_dormant_rich",
    "q_market_concentration",
    "q_supplier_herfindahl",
    "q_revenue_gini",
    "q_abc_classes",
    "q_mix_shift",
    "q_price_index",
    "q_market_basket",
    "q_also_bought",
    "q_order_reorder_rate",
    "q_rfm_segments",
    "q_cycle_time",
    "q_bloom_join",
    "q_bloom_membership",
)

# Queries whose registered contract is narrower than arbitrary input —
# reason asserted, so removal is conscious.  (The statistical tier needs
# a minimum daily-series length; the linkage/partition tiers derive
# planted corpora from fixture-shaped values.)
_EXCLUDED = {
    "q_benford": "needs a first-digit population; 10-order table is degenerate",
    "q_bollinger": "20-day rolling stddev needs a daily revenue series",
    "q_corr_matrix": "pairwise corr over daily aggregates needs a series",
    "q_forecast_revenue": "Holt fit needs a monthly series",
    "q_holt_linear": "Holt fit needs a monthly series",
    "q_hill_tail": "tail estimator needs n >= k order statistics",
    "q_price_elasticity": "log-log regression needs price variation per part",
    "q_quantile_bins": "ntile contract calibrated to fixture row count",
    "q_repeat_interval": "inter-order gaps need repeat customers per segment",
    "q_revenue_motifs": "motif mining needs >= window-length daily series",
    "q_weekday_anova": "F-stat needs >= 2 rows per weekday group",
    "q_name_linkage": "planted corpus derived from fixture supplier names",
    "q_partition_plan": "asserts pruning stats on the fixture's layout",
}


@pytest.mark.parametrize("name", _PARITY_QUERIES)
def test_hostile_relational_parity(spark, hostile_rel_sf, hostile_rel_duck, name):
    sdf = registry.QUERIES[name](spark, hostile_rel_sf).toPandas()
    ddf = hostile_rel_duck.execute(registry.ORACLES[name]).fetchdf()
    problems = compare(sdf, ddf)
    assert not problems, f"{name}: " + " | ".join(problems)


def test_orphan_lineitems_never_reach_revenue(spark, hostile_rel_sf):
    """The FK traps land where they should: order 99 exists only in
    lineitem, so no inner-join revenue rollup may count its 10.0, and
    NULL custkey order 5 belongs to no customer."""
    rows = registry.QUERIES["q_region_revenue"](spark, hostile_rel_sf).collect()
    # Only nations 1 (BRAZIL->AMERICA) and 2 (JAPAN->ASIA) can contribute:
    # customers of nations 77/NULL and orders of customers 88/NULL drop out.
    regions = {r[0] for r in rows}
    assert regions <= {"AMERICA", "ASIA"}
