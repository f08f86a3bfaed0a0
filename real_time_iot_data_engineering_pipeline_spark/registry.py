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
    "queries.setjoin",
)

# The driver's correctness harness checks the FIRST 50 entries of queries()
# in insertion order.  Names listed here are re-ordered to the front after
# all modules load, so queries that still need a hard-signal CORRECTNESS row
# (new this round, or past the 50-cut in a previous round) are guaranteed to
# land inside the window.  Everything not listed follows in registration
# order; every query that falls outside the window as a result already
# holds a green driver row (CORRECTNESS_r01 and/or _r02).
_DRIVER_PRIORITY = (
    # round-11 rotation: CERTIFICATION-FRESHNESS pass, continuing the
    # oldest-cert-first policy.  CORRECTNESS_r10 converted all 50 round-10
    # slots to green rows; the staleness tail is now 29 queries last
    # certified in round 4 (age 7 at the round-11 build — past the 6-round
    # cadence bar, so they MUST rotate in: the whole r10 overflow queue)
    # and 46 certified in round 5.  Window = 3 new + 3 re-fronts + all 29
    # r4 + the alphabetically-first 15 of the 46 r5; the remaining 31 r5
    # overflow to _NEXT_ROUND_PRIORITY (scheduled, so cadence-green).
    # (Amended in-round: a 4th new operator, q_ivfadc_residual_knn,
    # took the window slot of q_embed_binary_eval, which moved to the
    # overflow front — window = 4 new + 3 re-fronts + 29 r4 + 14 r5.)
    # -- new in round 11 (never certified):
    "q_ivf_adc_knn",
    "q_dsir_weights",
    "q_rrf_fusion",
    "q_ivfadc_residual_knn",
    # -- code changed in round 11 (listed in tests' _RECERTIFY, exempt
    # from the oldest-first invariant): the Kneser-Ney perplexity gate's
    # keep threshold is now derived in-query from the corpus NLL quantile
    # instead of the fixture-pinned 3.39 (VERDICT r10 #6); q_kmeans_step's
    # quantization became fround_guarded and q_dod_change gained the
    # NULL-day totality guard (VERDICT r10 #4, hostile-quarantine
    # conversions — fixture results bit-identical, but the certifying
    # rows predate the new code/oracle text).
    "q_kn_doc_ppl",
    "q_kmeans_step",
    "q_dod_change",
    # -- last driver-certified round 4 (all 29 — the r10 overflow queue):
    "q_important_parts",
    "q_keyword_extract",
    "q_large_orders",
    "q_length_histogram",
    "q_mad_outliers",
    "q_min_cost_supplier",
    "q_missing_days",
    "q_mkt_share",
    "q_nation_volume",
    "q_paragraph_dedup",
    "q_part_supplier_count",
    "q_pmi_collocations",
    "q_product_profit",
    "q_profile_events",
    "q_promo_share",
    "q_quality_buckets",
    "q_scd2_intervals",
    "q_semantic_decontaminate",
    "q_serve_analytics",
    "q_serve_health",
    "q_serve_latest",
    "q_sessionize",
    "q_small_qty_revenue",
    "q_sparse_cosine_topk",
    "q_token_entropy",
    "q_top_supplier",
    "q_unigram_ppl",
    "q_waiting_suppliers",
    "q_winsorize",
    # -- last driver-certified round 5 (first 19 of 46):
    "q_ann_recall",
    "q_autocorr",
    "q_benford",
    "q_bigram_ppl",
    "q_bollinger",
    "q_bpe_pairs",
    "q_burstiness",
    "q_chi_square",
    "q_conversion_latency",
    "q_corr_matrix",
    "q_curation_pipeline",
    "q_cusum",
    "q_cycle_time",
    "q_durbin_watson",
)

# Rotation OVERFLOW queue: stale-certified queries that did not fit in this
# round's 50-slot window.  They order immediately after the window
# (positions 51+) and are the mandatory front of next round's rotation —
# the cadence guard (tests/test_oracle_parity.py) treats window+overflow as
# "scheduled for re-cert" when enforcing the <=6-round freshness bar.
_NEXT_ROUND_PRIORITY: tuple[str, ...] = (
    # -- last driver-certified round 5 (remaining 31 of 46; q_gap_interp
    # and q_heaps_law dropped out of the window when the two round-11
    # hostile-conversion re-fronts took their slots, q_embed_truncation_eval
    # and q_ewma_daily when the two new round-11 operators
    # q_dsir_weights / q_rrf_fusion joined the front, q_embed_binary_eval
    # when q_ivfadc_residual_knn did):
    "q_embed_binary_eval",
    "q_embed_truncation_eval",
    "q_ewma_daily",
    "q_gap_interp",
    "q_heaps_law",
    "q_hour_profile",
    "q_kaplan_meier",
    "q_ks_test",
    "q_mann_whitney",
    "q_market_basket",
    "q_markov_transitions",
    "q_minhash_eval",
    "q_name_linkage",
    "q_ngram_novelty",
    "q_open_orders",
    "q_pagerank",
    "q_pq_codes",
    "q_psi",
    "q_repeated_substrings",
    "q_rfm_segments",
    "q_rolling_corr",
    "q_runs_test",
    "q_seasonal_decompose",
    "q_simhash_eval",
    "q_skipgram_pairs",
    "q_source_divergence",
    "q_source_overlap",
    "q_source_quality_report",
    "q_theil_sen",
    "q_trend_slope",
    "q_welch_ttest",
    "q_zipf_fit",
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
