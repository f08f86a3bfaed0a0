"""Semantic goldens for the round-9 additions: the prefix-filter exact
set-similarity join (q_jaccard_setjoin) and the leakage-safe group split
(q_group_split).

The losslessness proof follows the q_name_linkage protocol: an UNFILTERED
brute-force twin (all-pairs over the same hashed shingle sets, no prefix,
no length filter) must produce the identical pair set — the prefix filter
may only prune pairs that could never pass the threshold.
"""

from __future__ import annotations

import pytest

from real_time_iot_data_engineering_pipeline_spark import registry
from real_time_iot_data_engineering_pipeline_spark.queries.setjoin import (
    _TOKS_DUCK,
    TAU_NUM,
)
from real_time_iot_data_engineering_pipeline_spark.queries.text import (
    _NEAR_CORPUS_SQL,
)
from .oracle_utils import duck_connection

registry.load_all()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


_BRUTE_SQL = f"""
    WITH corpus AS ({_NEAR_CORPUS_SQL}),
    toks AS ({_TOKS_DUCK}),
    sized AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
        FROM toks a JOIN toks b
          ON a.token = b.token AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT i.doc_a, i.doc_b
    FROM inter i
    JOIN sized sa ON sa.doc_id = i.doc_a
    JOIN sized sb ON sb.doc_id = i.doc_b
    WHERE {10 + TAU_NUM} * i.n_common >= {TAU_NUM} * (sa.n + sb.n)
"""


def test_prefix_filter_is_lossless(spark, sf_dir, duck):
    """Candidate generation must lose NOTHING: the registered query's pair
    set equals the all-pairs brute force at the same threshold."""
    got = {
        (r.doc_a, r.doc_b)
        for r in registry.QUERIES["q_jaccard_setjoin"](spark, sf_dir).collect()
    }
    want = {tuple(r) for r in duck.execute(_BRUTE_SQL).fetchall()}
    assert got == want, (
        f"missed={sorted(want - got)[:5]} extra={sorted(got - want)[:5]}"
    )


def test_planted_near_dups_surface(spark, sf_dir):
    """Every planted truncation (doc_id + 200000) of a >=12-word original
    must appear as a pair with its original: losing two trailing shingles
    keeps Jaccard at (k-2)/k >= 0.8 for k >= 10 shingles."""
    rows = registry.QUERIES["q_jaccard_setjoin"](spark, sf_dir).collect()
    pairs = {(r.doc_a, r.doc_b) for r in rows}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from pyspark.sql import functions as F

    from real_time_iot_data_engineering_pipeline_spark.functions.tokenize import WS

    words = F.size(F.split(F.trim("text"), WS))
    originals = [
        r.doc_id
        for r in docs.filter((F.col("doc_id") % 10 == 0) & (words >= 12))
        .select("doc_id")
        .collect()
    ]
    assert originals, "fixture has no >=12-word planted originals"
    missing = [d for d in originals if (d, d + 200000) not in pairs]
    assert not missing, f"planted near-dups missed: {missing[:10]}"


def test_jaccard_values_exact(spark, sf_dir):
    """Reported jaccard must equal n_common/(n_a+n_b-n_common) rounded, and
    every reported pair must actually clear the exact-integer threshold."""
    for r in registry.QUERIES["q_jaccard_setjoin"](spark, sf_dir).collect():
        assert (10 + TAU_NUM) * r.n_common >= TAU_NUM * (r.n_a + r.n_b)
        expect = r.n_common / (r.n_a + r.n_b - r.n_common)
        assert abs(r.jaccard - expect) < 1e-4, (r.doc_a, r.doc_b)


def test_setjoin_plan_has_no_cartesian(spark, sf_dir):
    plan = registry.QUERIES["q_jaccard_setjoin"](
        spark, sf_dir
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_group_split_never_straddles(spark, sf_dir):
    """The invariant the operator exists for: all members of a duplicate
    group land in ONE split, and every planted copy (doc_id + 100000)
    shares its original's split."""
    rows = registry.QUERIES["q_group_split"](spark, sf_dir).collect()
    by_group: dict[int, set[str]] = {}
    split_of: dict[int, str] = {}
    for r in rows:
        by_group.setdefault(r.group_id, set()).add(r.split)
        split_of[r.doc_id] = r.split
    straddlers = {g: s for g, s in by_group.items() if len(s) > 1}
    assert not straddlers, f"groups straddling splits: {straddlers}"
    planted = [d for d in split_of if d >= 100000]
    assert planted, "fixture planted no exact dups"
    for d in planted:
        assert split_of[d] == split_of[d - 100000], d


def test_group_split_proportions(spark, sf_dir):
    """The md5 bucket must keep the 80/10/10 shape at GROUP granularity
    (loose bands: the fixture has only ~500 groups)."""
    rows = registry.QUERIES["q_group_split"](spark, sf_dir).collect()
    groups = {r.group_id: r.split for r in rows}
    n = len(groups)
    frac_train = sum(1 for s in groups.values() if s == "train") / n
    assert 0.70 <= frac_train <= 0.90, frac_train


# ---------------------------------------------------------------------------
# Property test: the prefix-filter THEOREM itself (pure Python, no Spark)
# ---------------------------------------------------------------------------

from collections import Counter
from itertools import combinations

from hypothesis import given, settings
from hypothesis import strategies as st


def _prefix_candidates(sets: dict[int, frozenset], tau_num: int) -> set:
    """Pure-Python twin of the operator's candidate stage: global
    df-ascending order, per-set prefix p = n - ceil(tau*n) + 1 (same
    exact-integer ceil), symmetric length filter."""
    df = Counter(t for s in sets.values() for t in s)
    key = lambda t: (df[t], t)  # noqa: E731 — the query's (df, token) order
    pref = {}
    for i, s in sets.items():
        n = len(s)
        p = n - ((tau_num * n + 9) // 10) + 1
        pref[i] = set(sorted(s, key=key)[:p])
    out = set()
    for a, b in combinations(sorted(sets), 2):
        na, nb = len(sets[a]), len(sets[b])
        if 10 * min(na, nb) >= tau_num * max(na, nb) and pref[a] & pref[b]:
            out.add((a, b))
    return out


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.frozensets(st.integers(0, 25), min_size=1, max_size=15),
        min_size=2,
        max_size=8,
    )
)
def test_prefix_filter_theorem_never_loses_a_similar_pair(set_list):
    """For EVERY pair with Jaccard >= tau (exact integers), the prefix
    candidate stage must retain it — the guarantee the operator's whole
    design rests on, checked over random small universes where sets
    collide, nest, and tie in every way the fixture can't arrange."""
    sets = dict(enumerate(set_list))
    cands = _prefix_candidates(sets, TAU_NUM)
    for a, b in combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if 10 * inter >= TAU_NUM * union:  # J >= tau
            assert (a, b) in cands, (
                f"prefix filter lost a similar pair: {sets[a]} vs {sets[b]} "
                f"(J = {inter}/{union})"
            )
