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
)

# The driver's correctness harness checks the FIRST 50 entries of queries()
# in insertion order.  Names listed here are re-ordered to the front after
# all modules load, so queries that still need a hard-signal CORRECTNESS row
# (new this round, or past the 50-cut in a previous round) are guaranteed to
# land inside the window.  Everything not listed follows in registration
# order; every query that falls outside the window as a result already
# holds a green driver row (CORRECTNESS_r01 and/or _r02).
_DRIVER_PRIORITY = (
    # round-6 rotation: the final 31 never-driver-certified queries (the
    # round-5 backlog that didn't fit the 50-slot window — all 50 r5 window
    # entries converted to hard CORRECTNESS_r05 rows, zero failures).
    # Certifying these takes driver coverage to 226/226.
    "q_lang_confusion",
    "q_tokenizer_fertility",
    "q_link_prediction",
    "q_embed_outliers",
    "q_price_elasticity",
    "q_repeat_interval",
    "q_degree_distribution",
    "q_cluster_keywords",
    "q_dup_group_stats",
    "q_simhash_pairs",
    "q_readability",
    "q_skew_report",
    "q_join_cardinality",
    "q_also_bought",
    "q_ctr_wilson",
    "q_hill_tail",
    "q_doc_containment",
    "q_pack_efficiency",
    "q_mixture_sample",
    "q_vocab_coverage",
    "q_dataset_manifest",
    "q_active_users",
    "q_market_concentration",
    "q_cluster_purity",
    "q_integrity_audit",
    "q_eval_grams",
    "q_weekday_anova",
    "q_revenue_motifs",
    "q_price_index",
    "q_mix_shift",
    "q_embed_anisotropy",
    # round-6 NEW queries (registration freeze lifted with the verdict's
    # ≤19-new cap — every new query earns its driver row the round it
    # ships; 31 backlog + 19 new = exactly the 50-slot window).
    # Batch oracle twins of the stateful streaming folds:
    "q_misra_gries",
    "q_welford_stats",
    "q_cusum_alarm",
    # mergeable summaries / operational planning (queries/summaries.py):
    "q_bottomk_sample",
    "q_quantile_bins",
    "q_hll_distinct",
    "q_bloom_membership",
    "q_partition_plan",
    # corpus manifest / curation planning (queries/manifest.py):
    "q_shingle_profile",
    "q_token_budget_plan",
    "q_source_fingerprint",
    "q_dedup_cost_curve",
    "q_doc_length_bands",
    "q_stopword_profile",
    "q_minhash_band_tuning",
    # embedding-corpus health (queries/embedding_ops.py):
    "q_embed_centroid_drift",
    "q_label_balance",
    # relational behavior (queries/relational3.py):
    "q_order_reorder_rate",
    "q_supplier_herfindahl",
)

# Added AFTER the 50-query window filled (the slots above are this round's
# must-verify set: never-driver-verified + new/rewritten queries).  These
# order immediately after the window (positions 51+), hold green local
# parity rows (tests/test_oracle_parity.py), and are next round's
# front-load candidates once the slots above convert to hard CORRECTNESS
# rows.
_NEXT_ROUND_PRIORITY: tuple[str, ...] = (
    # round-6 late rewrites of already-certified queries — outputs are
    # locally parity-green (sf0.001 + sf0.01 + sf0.1) but the driver rows
    # certifying them predate the rewrite, so re-front them in the
    # round-7 window:
    # 1) global single-partition windows replaced by ADAPTIVE two-phase
    #    bucketed prefix plans (functions/prefix.py):
    "q_value_deciles",
    "q_revenue_gini",
    "q_abc_classes",
    # 2) interpreted zip_with cosine scorer replaced by the Arrow-batched
    #    BLAS stage (24x at the 10x fixture, parity-pinned at 4 scales):
    "q_knn_classify",
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
