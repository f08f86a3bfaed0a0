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
)

# The driver's correctness harness checks the FIRST 50 entries of queries()
# in insertion order.  Names listed here are re-ordered to the front after
# all modules load, so queries that still need a hard-signal CORRECTNESS row
# (new this round, or past the 50-cut in a previous round) are guaranteed to
# land inside the window.  Everything not listed follows in registration
# order; every query that falls outside the window as a result already
# holds a green driver row (CORRECTNESS_r01 and/or _r02).
_DRIVER_PRIORITY = (
    # round-5 rotation: first 50 of the 81 queries that held only local
    # parity rows after round 4 (all 50 round-4 window entries converted to
    # hard CORRECTNESS_r04 rows, zero failures).  The eval-scorecard family
    # is front-loaded — these are the queries a 100 TB dedup/ANN deployment
    # tunes bands/bits against, so their oracle rows matter most.
    "q_minhash_eval",
    "q_simhash_eval",
    "q_ann_recall",
    "q_embed_binary_eval",
    "q_embed_truncation_eval",
    # remaining round-4 backlog, original registration order
    "q_repeated_substrings",
    "q_bigram_ppl",
    "q_markov_transitions",
    "q_name_linkage",
    "q_cosupply_triangles",
    "q_ewma_daily",
    "q_welch_ttest",
    "q_bpe_pairs",
    "q_curation_pipeline",
    "q_ks_test",
    "q_psi",
    "q_trend_slope",
    "q_autocorr",
    "q_cusum",
    "q_hour_profile",
    "q_knn_classify",
    "q_pagerank",
    "q_corr_matrix",
    "q_chi_square",
    "q_gap_interp",
    "q_heaps_law",
    "q_pq_codes",
    "q_rolling_corr",
    "q_revenue_gini",
    "q_conversion_latency",
    "q_source_quality_report",
    "q_open_orders",
    "q_source_divergence",
    "q_source_overlap",
    "q_seasonal_decompose",
    "q_benford",
    "q_abc_classes",
    "q_cycle_time",
    "q_runs_test",
    "q_kaplan_meier",
    "q_rfm_segments",
    "q_market_basket",
    "q_mann_whitney",
    "q_theil_sen",
    "q_durbin_watson",
    "q_bollinger",
    "q_burstiness",
    "q_skipgram_pairs",
    "q_zipf_fit",
    "q_ngram_novelty",
)

# Added AFTER the 50-query window filled (the slots above are this round's
# must-verify set: never-driver-verified + new/rewritten queries).  These
# order immediately after the window (positions 51+), hold green local
# parity rows (tests/test_oracle_parity.py), and are next round's
# front-load candidates once the slots above convert to hard CORRECTNESS
# rows.
_NEXT_ROUND_PRIORITY: tuple[str, ...] = (
    # round-6 must-verify queue: the 31 queries the 50-slot round-5 window
    # could not hold (81-entry backlog minus the 50 rotated above).  New
    # query registration is frozen until this queue clears (round-4 verdict
    # ask #2) — only bug-fix replacements may register.
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
