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
    # round-12 rotation: CERTIFICATION-FRESHNESS pass, continuing the
    # oldest-cert-first policy.  CORRECTNESS_r11 converted all 50 round-11
    # slots to green rows; the staleness tail is now 32 queries last
    # certified in round 5 (age 7 at the round-12 build — past the 6-round
    # cadence bar, so they MUST rotate in: the whole r11 overflow queue)
    # and 49 certified in round 6.  Window = 2 new + 4 code-change
    # re-fronts + all 32 r5 + 12 of the 49 r6 (the alphabetically-first
    # 14 minus q_doc_length_bands and q_doc_containment); the remaining
    # 37 r6 overflow to _NEXT_ROUND_PRIORITY (scheduled, so
    # cadence-green).  (Amended in-round: the new operators q_semdedup
    # and q_doremi_weights took two r6 slots — the r11 amendment
    # precedent; q_doc_length_bands and q_doc_containment moved to the
    # overflow front rather than q_dup_group_stats, which has waited
    # since the r11 window already.)
    # -- new in round 12 (never certified):
    "q_semdedup",
    "q_doremi_weights",
    # -- code changed in round 12 (listed in tests' _RECERTIFY, exempt
    # from the oldest-first invariant): q_kn_doc_ppl fuses the NLL-quantile
    # keep-threshold pass into the per-doc aggregation (VERDICT r11 #3b);
    # q_sparse_cosine_topk gains the real per-term posting cap with
    # candidate-then-verify rescoring (VERDICT r11 #4); q_cc_incremental's
    # standing store becomes a materialized-parquet setup step (plus the
    # materialized LSH band index) so the benched operator is the actual
    # delta merge (VERDICT r11 #5); q_dsir_weights' logw rounding becomes
    # fround_guarded (ADVICE r11).  (q_simhash_eval also changed —
    # lineage checkpoint, bit-identical results — but already sits in the
    # r5 rotation group below.)
    "q_kn_doc_ppl",
    "q_sparse_cosine_topk",
    "q_cc_incremental",
    "q_dsir_weights",
    # -- last driver-certified round 5 (all 32 — the r11 overflow queue):
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
    # -- last driver-certified round 6 (first 14 of 49):
    "q_active_users",
    "q_also_bought",
    "q_bloom_membership",
    "q_bottomk_sample",
    "q_cluster_keywords",
    "q_cluster_purity",
    "q_ctr_wilson",
    "q_cusum_alarm",
    "q_dataset_manifest",
    "q_dedup_cost_curve",
    "q_degree_distribution",
    "q_dup_group_stats",
)

# Rotation OVERFLOW queue: stale-certified queries that did not fit in this
# round's 50-slot window.  They order immediately after the window
# (positions 51+) and are the mandatory front of next round's rotation —
# the cadence guard (tests/test_oracle_parity.py) treats window+overflow as
# "scheduled for re-cert" when enforcing the <=6-round freshness bar.
_NEXT_ROUND_PRIORITY: tuple[str, ...] = (
    # -- last driver-certified round 6 (remaining 37 of 49; 12 took the
    # window slots left after the two new round-12 operators, the four
    # code-change re-fronts and the mandatory 32 r5 rotations;
    # q_doc_length_bands and q_doc_containment dropped out of the window
    # when q_semdedup / q_doremi_weights joined the front):
    "q_doc_containment",
    "q_doc_length_bands",
    "q_embed_anisotropy",
    "q_embed_centroid_drift",
    "q_embed_outliers",
    "q_eval_grams",
    "q_hill_tail",
    "q_hll_distinct",
    "q_integrity_audit",
    "q_join_cardinality",
    "q_label_balance",
    "q_lang_confusion",
    "q_link_prediction",
    "q_market_concentration",
    "q_minhash_band_tuning",
    "q_misra_gries",
    "q_mix_shift",
    "q_order_reorder_rate",
    "q_pack_efficiency",
    "q_partition_plan",
    "q_price_elasticity",
    "q_price_index",
    "q_quantile_bins",
    "q_readability",
    "q_repeat_interval",
    "q_revenue_motifs",
    "q_shingle_profile",
    "q_simhash_pairs",
    "q_skew_report",
    "q_source_fingerprint",
    "q_stopword_profile",
    "q_supplier_herfindahl",
    "q_token_budget_plan",
    "q_tokenizer_fertility",
    "q_vocab_coverage",
    "q_weekday_anova",
    "q_welford_stats",
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
