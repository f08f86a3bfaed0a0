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
    # round-8 rotation.  CORRECTNESS_r07 converted 49 of the 50 round-7
    # window slots to green rows; the one red was q_quality_ensemble, whose
    # ArrayType(StringType) drop_reasons column broke the driver's pandas
    # canonicalizer (unhashable list).  It is re-fronted after the
    # array_join(';') serialization fix (queries/quality.py), alongside
    # every query NEW in round 8 (appended below as they land).
    "q_quality_ensemble",
    # NEW in round 8:
    "q_dedup_incremental",  # delta-vs-standing-store MinHash (queries/text.py)
    "q_dedup_exact_incremental",  # content-hash delta-vs-store twin (text.py)
    "q_label_propagation_converged",  # LPA to fixpoint (queries/linkage.py)
    "q_token_budget_pack",  # greedy corpus packing under a token budget (text.py)
    "q_batch_novelty",  # delta-vs-store shingle novelty (text.py)
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
