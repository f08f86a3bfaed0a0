"""Posting-cap guard for the sparse-cosine inverted index
(queries/corpus.py::sparse_cosine_pairs): on a degenerate vocabulary —
one boilerplate term shared by EVERY document — the absolute per-term
cap must bound candidate generation to O(cap^2) instead of O(n^2),
while candidate-then-verify rescoring keeps every reported cosine
exact over the full (uncapped) kept vectors.  The registered
q_sparse_cosine_topk's fixtures never reach the cap (max kept-index
posting 338 at sf0.1 vs cap 2048), so this binding path gets its own
synthetic fixture; the non-binding path is covered by the DuckDB
oracle in tests/test_oracle_parity.py.
"""

from __future__ import annotations

import itertools
import math

import pytest
from pyspark.sql import functions as F

from real_time_iot_data_engineering_pipeline_spark.queries.corpus import (
    SPARSE_POSTING_CAP,
    _sparse_capped_index,
    sparse_cosine_pairs,
)

N_DOCS = 60
CAP = 8
N_PLANTED = 5  # docs (2i, 2i+1) share sig{i}


def _skewed_unit_rows():
    """Synthetic kept-index: every doc holds the boilerplate term 'hdr';
    docs 2i/2i+1 (i < N_PLANTED) additionally share a discriminative
    'sig{i}'; all other docs hold a private 'uniq{d}'.  Weights are
    pre-unit-normalized per doc (hdr light, so planted docs fall OUTSIDE
    hdr's top-cap posting entries and their hdr contribution can only
    come from the verify phase)."""
    rows = []
    for d in range(N_DOCS):
        planted = d < 2 * N_PLANTED
        # hdr weight: heavier for non-planted high-doc_id docs so the
        # top-cap of hdr's posting list is all non-planted docs.
        hdr = 0.2 if planted else 0.2 + 0.01 * d
        other = math.sqrt(1.0 - hdr * hdr)
        tok = f"sig{d // 2}" if planted else f"uniq{d}"
        rows.append((d, "hdr", hdr))
        rows.append((d, tok, other))
    return rows


def _unit_df(spark):
    return spark.createDataFrame(
        _skewed_unit_rows(), "doc_id long, token string, nw double"
    )


def _brute_cosines():
    vecs: dict[int, dict[str, float]] = {}
    for d, t, w in _skewed_unit_rows():
        vecs.setdefault(d, {})[t] = w
    out = {}
    for a, b in itertools.combinations(sorted(vecs), 2):
        shared = set(vecs[a]) & set(vecs[b])
        if shared:
            out[(a, b)] = (
                sum(vecs[a][t] * vecs[b][t] for t in shared),
                len(shared),
            )
    return out


class TestSparsePostingCap:
    def test_fixture_cap_never_binds_at_test_sf(self, spark, sf_dir):
        # Guard the "oracle stays exact" premise: the registered query's
        # kept-index posting lists must stay under the production cap on
        # the test fixtures, or the DuckDB oracle would silently diverge.
        from real_time_iot_data_engineering_pipeline_spark.queries.ranking import (
            WS_CLASS,
        )
        from real_time_iot_data_engineering_pipeline_spark.sources import (
            load_table,
        )

        toks = (
            load_table(spark, sf_dir, "documents")
            .filter(F.col("text").isNotNull())
            .select(
                "doc_id",
                F.explode(
                    F.split(F.trim(F.lower("text")), WS_CLASS)
                ).alias("w"),
            )
        )
        max_df = (
            toks.groupBy("doc_id", "w")
            .count()
            .groupBy("w")
            .count()
            .agg(F.max("count"))
            .first()[0]
        )
        # kept-index postings are a subset of raw unigram df, which
        # upper-bounds any bigram df
        assert max_df < SPARSE_POSTING_CAP

    def test_candidate_fanout_is_bounded(self, spark):
        unit = _unit_df(spark)
        cand_index, hot_unit = _sparse_capped_index(unit, CAP)
        # hdr (60 postings > cap) is the only hot term, truncated to cap
        hot = cand_index.filter(F.col("_hot")).collect()
        assert {r["token"] for r in hot} == {"hdr"}
        assert len(hot) == CAP
        assert hot_unit.count() == N_DOCS  # verify side stays uncapped
        a = cand_index.select(
            F.col("doc_id").alias("da"), "token"
        )
        b = cand_index.select(F.col("doc_id").alias("db"), "token")
        n_cand = (
            a.join(b, ["token"])
            .filter(F.col("da") < F.col("db"))
            .select("da", "db")
            .distinct()
            .count()
        )
        # uncapped would be C(60,2)=1770 via hdr alone; capped: hdr
        # contributes at most C(cap,2) pairs + the planted sig pairs
        assert n_cand <= CAP * (CAP - 1) // 2 + N_PLANTED
        assert n_cand < N_DOCS * (N_DOCS - 1) // 2 // 10

    def test_survivors_rescored_exactly_from_uncapped_postings(self, spark):
        res = {
            (r["doc_a"], r["doc_b"]): (r["cosine"], r["shared_terms"])
            for r in sparse_cosine_pairs(_unit_df(spark), CAP, 50).collect()
        }
        brute = _brute_cosines()
        # Every planted pair survives candidacy through its sig term and
        # must report the EXACT cosine including the hdr contribution —
        # both planted docs were truncated out of hdr's capped posting
        # list, so a non-verifying implementation would undercount.
        for i in range(N_PLANTED):
            pair = (2 * i, 2 * i + 1)
            assert pair in res
            cos, shared = res[pair]
            exp_cos, exp_shared = brute[pair]
            assert shared == exp_shared == 2
            assert cos == pytest.approx(round(exp_cos, 4), abs=1e-9)
        # And every reported pair (also the hdr-only survivors inside the
        # cap) carries its exact brute-force cosine: the cap may DROP
        # pairs, never mis-score one.
        for pair, (cos, shared) in res.items():
            exp_cos, exp_shared = brute[pair]
            assert shared == exp_shared
            assert cos == pytest.approx(round(exp_cos, 4), abs=1e-9)

    def test_no_hot_terms_degenerates_to_exact_all_pairs(self, spark):
        unit = _unit_df(spark)
        capped = {
            (r["doc_a"], r["doc_b"]): (r["cosine"], r["shared_terms"])
            for r in sparse_cosine_pairs(unit, N_DOCS + 1, 2000).collect()
        }
        brute = {
            p: (round(c, 4), s) for p, (c, s) in _brute_cosines().items()
        }
        assert set(capped) == set(brute)  # nothing dropped, nothing extra
        for pair, (cos, shared) in capped.items():
            exp_cos, exp_shared = brute[pair]
            assert shared == exp_shared
            assert cos == pytest.approx(exp_cos, abs=1e-9)
