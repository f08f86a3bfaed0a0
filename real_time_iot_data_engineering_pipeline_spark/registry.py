"""Query registry: name -> (spark, sf_dir) -> DataFrame, plus DuckDB oracle SQL.

Every operator from SURVEY.md §2 with a query id registers here; the driver
(and tests/test_oracle_parity.py) compares each Spark result against its
oracle at sf=0.01 on row count + schema + order-insensitive value hash.

Column-name contract: every computed column is aliased identically in the
Spark query and the oracle SQL (the driver sorts columns by name before
hashing).  Float aggregates are rounded (typically 4 dp) on BOTH sides so
summation-order differences between engines can't flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable
from importlib import import_module

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

_QUERY_MODULES = (
    "queries.core",
    "queries.validation",
    "queries.iot",
    "queries.analytics",
    "queries.joins",
    "queries.dedup",
    "queries.incremental",
    "queries.text",
    "queries.similarity",
    "queries.multimodal",
    "queries.marts",
    "queries.windows",
    "queries.prep",
    "queries.curation",
    "queries.report",
    "queries.sketches",
    "queries.temporal",
    "queries.behavior",
    "queries.relational",
    "queries.relational2",
    "queries.ranking",
    "queries.corpus",
    "queries.serve",
    "queries.linkage",
    "queries.mining",
    "queries.lexical",
    "queries.stateful_twins",
    "queries.summaries",
    "queries.manifest",
    "queries.embedding_ops",
    "queries.relational3",
    "queries.quality",
)

# The driver's correctness harness checks the FIRST 50 entries of queries()
# in insertion order.  Names listed here are re-ordered to the front after
# all modules load, so queries that still need a hard-signal CORRECTNESS row
# (new this round, or past the 50-cut in a previous round) are guaranteed to
# land inside the window.  Everything not listed follows in registration
# order; every query that falls outside the window as a result already
# holds a green driver row (CORRECTNESS_r01 and/or _r02).
_DRIVER_PRIORITY = (
    # round-7 rotation.  CORRECTNESS_r06 converted all 50 round-6 window
    # slots to green rows (driver coverage now 245/245 cumulatively), so the
    # window re-fronts (a) the five queries whose code changed AFTER their
    # certifying round — their green rows predate the rewrite, re-cert is
    # the hard signal — and (b) every query NEW this round.
    #
    # (a) round-6 rewrites needing re-certification:
    "q_value_deciles",  # adaptive bucketed-prefix plan (functions/prefix.py)
    "q_revenue_gini",  # adaptive bucketed-prefix plan
    "q_abc_classes",  # adaptive bucketed-prefix plan
    "q_knn_classify",  # Arrow-batched BLAS scorer (+ r7 tie-aware top-k fix)
    "q_cosupply_triangles",  # triangle_stats extraction (linkage.py refactor)
    # (b) NEW this round — published-heuristic quality filters (queries/quality.py):
    "q_gopher_rules",
    "q_c4_filters",
    "q_code_detect",
    "q_boilerplate",
    # CCNet ppl tiles (queries/ranking.py):
    "q_ccnet_buckets",
    # relational completions — TPC-H Q4/Q12 analog shapes (queries/relational3.py):
    "q_order_priority_exists",
    "q_late_shipment_mix",
    # temporal: volume monitoring, cross-correlogram, Holt smoothing:
    "q_volume_anomaly",
    "q_cross_corr",
    "q_holt_linear",
    # sequential stateful twins (queries/stateful_twins.py):
    "q_ttl_dedup",
    "q_rate_limit",
    # join strategies (queries/joins.py):
    "q_join_salted",
    "q_bloom_join",
    # embedding clustering diagnostics (queries/embedding_ops.py):
    "q_kmeans_step",
    "q_silhouette",
    # sketches (queries/summaries.py):
    "q_cms_heavy_hitters",
    "q_kmv_setops",
    # graph (queries/linkage.py):
    "q_local_clustering",
    # API spec surface completion (queries/serve.py — verdict r6 ask #3):
    "q_serve_sensors_page",
    "q_serve_analytics_hourly",
    "q_serve_sensor_detail",
    "q_serve_request_audit",
    # CDC / warehouse-maintenance surface (queries/incremental.py):
    "q_cdc_apply",
    "q_snapshot_diff",
    # privacy + feature-engineering (queries/prep.py):
    "q_k_anonymity",
    "q_lag_features",
    # decayed-counter stateful twin (queries/stateful_twins.py):
    "q_decayed_counts",
    # layout audit (queries/manifest.py):
    "q_pruning_audit",
    # blocked near-dup adjudication (queries/text.py):
    "q_editdist_refine",
    # round-7 second batch:
    "q_quality_ensemble",  # cleaning-policy composition (queries/quality.py)
    "q_url_dedup",  # URL canonicalization dedup (queries/prep.py)
    "q_ivm_merge",  # partial-agg mart merge == recompute (queries/incremental.py)
    "q_power_iteration",  # Gram top-eigenvector step (queries/embedding_ops.py)
    "q_label_propagation",  # semi-supervised LPA round (queries/linkage.py)
)

# Added AFTER the 50-query window filled (the slots above are this round's
# must-verify set: never-driver-verified + new/rewritten queries).  These
# order immediately after the window (positions 51+), hold green local
# parity rows (tests/test_oracle_parity.py), and are next round's
# front-load candidates once the slots above convert to hard CORRECTNESS
# rows.
_NEXT_ROUND_PRIORITY: tuple[str, ...] = ()


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; oracle=None means rows-only check (non-SQL-expressible)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query id: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import all query modules (idempotent) and apply the driver-priority
    ordering so the registry's insertion order puts unverified queries inside
    the driver's 50-query correctness window."""
    pkg = __name__.rsplit(".", 1)[0]
    for mod in _QUERY_MODULES:
        import_module(f"{pkg}.{mod}")
    front = [
        n
        for group in (_DRIVER_PRIORITY, _NEXT_ROUND_PRIORITY)
        for n in group
        if n in QUERIES
    ]
    rest = [n for n in QUERIES if n not in set(front)]
    ordered = front + rest
    for reg in (QUERIES, ORACLES):
        reordered = {n: reg[n] for n in ordered if n in reg}
        reg.clear()
        reg.update(reordered)
