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
    "queries.ranking",
)

# The driver's correctness harness checks the FIRST 50 entries of queries()
# in insertion order.  Names listed here are re-ordered to the front after
# all modules load, so queries that still need a hard-signal CORRECTNESS row
# (new this round, or past the 50-cut in a previous round) are guaranteed to
# land inside the window.  Everything not listed follows in registration
# order; every query that falls outside the window as a result already
# holds a green driver row (CORRECTNESS_r01 and/or _r02).
_DRIVER_PRIORITY = (
    # never driver-verified as of round 2 (fell past the 50-query cut)
    "q_token_count",
    "q_lang_id",
    "q_quality_score",
    "q_doc_fingerprint",
    "q_embed_knn",
    "q_embed_knn_lsh",
    "q_embed_ivf",
    "q_embed_near_dup",
    "q_multimodal_features",
    "q_multimodal_resize",
    "q_multimodal_framesample",
    "q_mart_daily_sql",
    "q_sliding_agg",
    "q_session_agg",
    # new in round 3
    "q_mart_hourly_sql",
    "q_mart_location_sql",
    "q_quality_alerts",
    # rewritten/modified in round 3 — prior rows no longer certify the new code
    "q_rank_per_group",
    "q_topk_per_group",
    "q_validate_iot",
    # new in round 3 (training-data prep + clustering)
    "q_pii_redact",
    "q_train_test_split",
    "q_embed_centroids",
    "q_doc_dup_groups",
    "q_sample_stratified",
    "q_doc_chunk",
    "q_sequence_pack",
    # new in round 3 (corpus curation: decontamination, quality, semdedup)
    "q_decontaminate",
    "q_repetition_filter",
    "q_semantic_dedup",
    # new in round 3 (corpus reporting + mixing)
    "q_vocab_topk",
    "q_corpus_stats",
    "q_tfidf_topterms",
    "q_mixture_weights",
    # new in round 3 (summary sketches)
    "q_quantile_summary",
    "q_distinct_users",
    # new in round 3 (temporal joins / hypertable rollup)
    "q_asof_join",
    "q_range_join",
    "q_rollup_hypertable",
    # new in round 3 (behavioral analytics)
    "q_pivot_daily",
    "q_heavy_hitters",
    "q_funnel",
    "q_retention",
    # new in round 3 (relational multi-join analytics)
    "q_ship_priority",
    "q_region_revenue",
    "q_priority_fill",
    "q_returned_revenue",
    # new in round 3 (stream-stream join batch twin)
    "q_click_attribution",
    # new in round 3 (relational: pricing summary)
    "q_pricing_summary",
    # new in round 3 (temporal: sensor outage gaps)
    "q_reading_gaps",
)

# Added AFTER the 50-query window filled (the slots above are this round's
# must-verify set: never-driver-verified + new/rewritten queries).  These
# order immediately after the window (positions 51+), hold green local
# parity rows (tests/test_oracle_parity.py), and are next round's
# front-load candidates once the slots above convert to hard CORRECTNESS
# rows.
_NEXT_ROUND_PRIORITY = (
    "q_gap_fill",
    "q_cube_summary",
    "q_paragraph_dedup",
    "q_quality_buckets",
    "q_audience_setops",
    "q_min_cost_supplier",
    "q_length_histogram",
    "q_dedup_survivor",
    "q_semantic_decontaminate",
    "q_large_orders",
    "q_disjunctive_revenue",
    "q_embed_quantize",
    "q_bm25_rank",
    "q_unigram_ppl",
    "q_hard_negatives",
    "q_winsorize",
    "q_nation_volume",
    "q_dormant_rich",
    "q_promo_share",
    "q_token_entropy",
)


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
