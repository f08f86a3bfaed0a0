"""Golden tests for queries/ranking.py: recompute BM25 and the unigram-LM
NLL filter in pure Python (collections.Counter + math.log) and compare to
the engine output — a third implementation guarding the shared formula
against a both-engines-wrong bug (the DuckDB oracle alone can't catch a
mistake that is symmetric in the Spark query and the SQL twin).
"""

from __future__ import annotations

import math
import re
from collections import Counter

import pyarrow.parquet as pq
import pytest

from real_time_iot_data_engineering_pipeline_spark import registry
from real_time_iot_data_engineering_pipeline_spark.queries.ranking import (
    BM25_K,
    BM25_TERMS,
    NLL_KEEP,
    WS_CLASS,
)

registry.load_all()

_WS = re.compile(WS_CLASS)


def _tokenized_corpus(sf_dir: str) -> dict[int, list[str]]:
    tbl = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
    return {
        int(r.doc_id): _WS.split(r.text.strip().lower())
        for r in tbl.itertuples()
    }


class TestRankingGoldens:
    def test_bm25_matches_python_recompute(self, spark, sf_dir):
        docs = _tokenized_corpus(sf_dir)
        n_docs = float(len(docs))
        dl = {d: float(len(t)) for d, t in docs.items()}
        avgdl = sum(dl.values()) / n_docs
        tf = {
            d: {t: float(c) for t, c in Counter(toks).items() if t in BM25_TERMS}
            for d, toks in docs.items()
        }
        df = Counter(t for perdoc in tf.values() for t in perdoc)
        k1, b = 1.2, 0.75
        scores = {}
        for d, perdoc in tf.items():
            if not perdoc:
                continue
            s = 0.0
            for t, f in perdoc.items():
                idf = math.log((n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
                s += idf * (f * 2.2) / (f + k1 * (1.0 - b + b * dl[d] / avgdl))
            scores[d] = s
        # Mirror the engine's tiebreak: rank by the 6dp-quantized score
        # (desc), then doc_id — two docs whose raw scores differ by <1e-6
        # quantize equal and the engine orders them by doc_id.
        expect = sorted(
            scores.items(), key=lambda kv: (-round(kv[1], 6), kv[0])
        )[:BM25_K]
        rows = registry.QUERIES["q_bm25_rank"](spark, sf_dir).collect()
        assert len(rows) == BM25_K
        for row, (doc_id, score) in zip(rows, expect):
            assert row["doc_id"] == doc_id
            assert row["bm25"] == pytest.approx(score, abs=2e-4)

    def test_unigram_ppl_matches_python_recompute(self, spark, sf_dir):
        docs = _tokenized_corpus(sf_dir)
        vocab = Counter(t for toks in docs.values() for t in toks)
        total = float(sum(vocab.values()))
        rows = registry.QUERIES["q_unigram_ppl"](spark, sf_dir).collect()
        assert len(rows) == len(docs)
        keeps = {r["keep"] for r in rows}
        assert keeps == {True, False}, "threshold must split the corpus"
        for r in rows[:100]:
            toks = docs[r["doc_id"]]
            assert r["n_tokens"] == len(toks)
            nll = sum(-math.log(vocab[t] / total) for t in toks) / len(toks)
            assert r["avg_nll"] == pytest.approx(nll, abs=2e-4)
            assert r["keep"] == (round(nll, 5) <= float(NLL_KEEP)) or abs(
                nll - float(NLL_KEEP)
            ) < 1e-4


class TestQualityContracts:
    def test_quantize_error_bound(self, spark, sf_dir):
        """Uint8 quantization's reconstruction error is bounded by the
        quantization step: per-dim error <= (span/255)/2, so per-vector
        MSE <= mean of (span_d/510)^2.  Validates the operator's quality
        contract, not just cross-engine equality."""
        import numpy as np
        import pyarrow.parquet as pq

        tbl = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
        mat = np.stack(
            tbl["embedding"]
            .map(lambda v: np.asarray(v, dtype=np.float32).astype(np.float64))
            .to_numpy()
        )
        span = mat.max(axis=0) - mat.min(axis=0)
        bound = float(np.mean((span / 510.0) ** 2)) * 1.001  # fp slack
        rows = registry.QUERIES["q_embed_quantize"](spark, sf_dir).collect()
        assert rows and all(r["mse"] <= bound for r in rows)

    def test_winsorize_clip_invariants(self, spark, sf_dir):
        """Every clipped value must lie inside its type's [lo, hi] band,
        the flag must fire exactly when clipping changed the value, and
        at most ~10% of rows per type may be clipped (p05/p95 bounds)."""
        from collections import Counter

        rows = registry.QUERIES["q_winsorize"](spark, sf_dir).collect()
        assert rows
        clipped_by_type: Counter = Counter()
        total_by_type: Counter = Counter()
        for r in rows:
            total_by_type[r["event_type"]] += 1
            if r["was_clipped"]:
                clipped_by_type[r["event_type"]] += 1
                # Both columns are rounded to 4dp while the flag compares
                # raw values: a value outside the bound by <5e-5 rounds to
                # the same 4dp as its clip, so tolerate sub-resolution
                # clips instead of requiring strict inequality.
                assert r["clipped"] != r["value"] or abs(
                    r["clipped"] - r["value"]
                ) < 1e-4
            else:
                assert r["clipped"] == r["value"]
        for t, n in total_by_type.items():
            # p05/p95 exact bounds clip at most ~10% (+ slack for ties
            # and the 4dp output rounding at tiny per-type counts)
            assert clipped_by_type[t] <= 0.12 * n + 2, t


class TestPackEfficiency:
    def test_consistent_with_packing_assignment(self, spark, sf_dir):
        from collections import defaultdict

        from real_time_iot_data_engineering_pipeline_spark.queries.prep import (
            PACK_TOKENS,
        )

        packed = registry.QUERIES["q_sequence_pack"](spark, sf_dir).collect()
        stats = defaultdict(lambda: [0, 0, 0])  # docs, max_seq, tokens
        for r in packed:
            st = stats[r.shard]
            st[0] += 1
            st[1] = max(st[1], r.seq_in_shard)
            st[2] += r.n_tokens
        rows = registry.QUERIES["q_pack_efficiency"](spark, sf_dir).collect()
        assert {r.shard for r in rows} == set(stats)
        for r in rows:
            docs, max_seq, tokens = stats[r.shard]
            assert (r.n_docs, r.n_seqs, r.total_tokens) == (
                docs,
                max_seq + 1,
                tokens,
            )
            assert r.capacity == r.n_seqs * PACK_TOKENS
            # packing never wastes more than one open sequence per shard
            assert r.total_tokens > (r.n_seqs - 1) * PACK_TOKENS
            assert 0 < r.utilization <= 1.5


class TestKneserNey:
    @staticmethod
    def _kn_tables(docs):
        from collections import Counter, defaultdict

        bic = Counter()
        for toks in docs.values():
            for a, b in zip(toks, toks[1:]):
                bic[(a, b)] += 1
        c1 = Counter()
        n1p_right = Counter()
        n1p_left = Counter()
        for (a, b), c in bic.items():
            c1[a] += c
            n1p_right[a] += 1
            n1p_left[b] += 1
        n_types = float(len(bic))
        D = 0.75
        p = {
            (a, b): (c - D) / c1[a]
            + (D * n1p_right[a] / c1[a]) * (n1p_left[b] / n_types)
            for (a, b), c in bic.items()
        }
        return bic, p

    def test_kn_model_matches_python_recompute(self, spark, sf_dir):
        """Every emitted p_kn equals the textbook fixed-discount KN formula
        recomputed in pure python, and the model is a proper conditional
        distribution: for each context w1, the observed-bigram rows sum to
        1 minus exactly the backoff mass lambda(w1) * P_cont(unseen-after-
        w1) reserved for continuations never seen after w1 — i.e. adding
        that mass back recovers 1 to float precision."""
        docs = _tokenized_corpus(sf_dir)
        bic, want = self._kn_tables(docs)
        rows = registry.QUERIES["q_kn_bigram_lm"](spark, sf_dir).collect()
        assert len(rows) == len(bic)
        from collections import Counter, defaultdict

        c1 = Counter()
        n1p_right = Counter()
        n1p_left = Counter()
        seen_after = defaultdict(set)
        for (a, b), c in bic.items():
            c1[a] += c
            n1p_right[a] += 1
            n1p_left[b] += 1
            seen_after[a].add(b)
        n_types = float(len(bic))
        by_ctx: dict[str, float] = {}
        for r in rows:
            assert r["c12"] == bic[(r["w1"], r["w2"])]
            assert r["p_kn"] == pytest.approx(want[(r["w1"], r["w2"])], abs=6e-5)
            by_ctx[r["w1"]] = by_ctx.get(r["w1"], 0.0) + want[(r["w1"], r["w2"])]
        for w1, s in by_ctx.items():
            lam = 0.75 * n1p_right[w1] / c1[w1]
            p_cont_unseen = sum(
                n1p_left[b] for b in n1p_left if b not in seen_after[w1]
            ) / n_types
            assert s + lam * p_cont_unseen == pytest.approx(1.0, abs=1e-9), w1

    def test_kn_doc_ppl_matches_python_recompute(self, spark, sf_dir):
        docs = _tokenized_corpus(sf_dir)
        _, p = self._kn_tables(docs)
        rows = registry.QUERIES["q_kn_doc_ppl"](spark, sf_dir).collect()
        scored = [d for d, toks in docs.items() if len(toks) >= 2]
        assert len(rows) == len(scored)
        keeps = {r["keep"] for r in rows}
        assert keeps == {True, False}, "threshold must split the corpus"
        for r in rows[:100]:
            toks = docs[r["doc_id"]]
            assert r["n_tokens"] == len(toks)
            nll = sum(
                -math.log(p[(a, b)]) for a, b in zip(toks, toks[1:])
            ) / (len(toks) - 1)
            assert r["avg_nll_kn"] == pytest.approx(nll, abs=2e-4)

    def test_kn_continuation_beats_raw_frequency(self, spark, tmp_path):
        """The KN property worth having, driven on a planted corpus (the
        driver fixture's synthetic vocabulary has frequency and context
        diversity perfectly correlated, so the contrast must be planted):
        'francisco' occurs MORE often than 'cat' but only ever after
        'san', so in a NOVEL context ('the') the smoothed backoff mass
        must prefer the context-diverse word — the thing q_bigram_ppl's
        raw-count interpolation gets backwards."""
        import pyarrow as pa
        import pyarrow.parquet as pq_mod

        texts = ["san francisco " * 6 + "the cat sat", "a cat ran", "my cat"]
        pq_mod.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                    "text": pa.array(texts, type=pa.string()),
                    "lang": pa.array(["en"] * len(texts), type=pa.string()),
                    "source": pa.array(["s"] * len(texts), type=pa.string()),
                    "n_chars": pa.array(
                        [len(t) for t in texts], type=pa.int64()
                    ),
                }
            ),
            f"{tmp_path}/documents.parquet",
        )
        rows = {
            (r["w1"], r["w2"]): r
            for r in registry.QUERIES["q_kn_bigram_lm"](
                spark, str(tmp_path)
            ).collect()
        }
        # francisco: 6 occurrences, 1 left context; cat: 3 occurrences,
        # 3 left contexts.  The continuation share inside any row's
        # backoff term is n1p_left/n_types; compare the two words' model
        # rows after stripping the discounted-count term.
        fr = rows[("san", "francisco")]
        cat = rows[("a", "cat")]
        assert fr["c12"] == 6 and cat["c12"] == 1
        # reconstruct each row's backoff component: p_kn - (c12-D)/c1
        from collections import Counter

        bic = Counter()
        for t in texts:
            toks = t.strip().lower().split()
            for a, b in zip(toks, toks[1:]):
                bic[(a, b)] += 1
        c1 = Counter()
        for (a, b), c in bic.items():
            c1[a] += c
        back_fr = fr["p_kn"] - (6 - 0.75) / c1["san"]
        back_cat = cat["p_kn"] - (1 - 0.75) / c1["a"]
        # per unit of lambda, cat's continuation share (3 contexts) must
        # exceed francisco's (1 context): normalize out lambda = D*N1+/c1.
        n1p_right = Counter()
        for (a, b), _ in bic.items():
            n1p_right[a] += 1
        lam_fr = 0.75 * n1p_right["san"] / c1["san"]
        lam_cat = 0.75 * n1p_right["a"] / c1["a"]
        assert back_cat / lam_cat > back_fr / lam_fr
        # and despite francisco's 2x raw frequency, its continuation share
        # is the smaller one: P_cont(francisco) < P_cont(cat).
        assert (back_fr / lam_fr) * 3 == pytest.approx(
            back_cat / lam_cat, rel=0.02
        )


def _fround(x: float, n: int = 4) -> float:
    s = 10.0**n
    return math.floor(x * s * (1.0 + 1e-12) + 0.5) / s


class TestRRFFusion:
    """Third implementation of the reciprocal-rank fusion: recompute both
    rankings and the fused top-k in pure Python and require exact
    agreement — rank integers and the 6 dp score must match bit-for-bit
    (the formula is exact-rounded division plus a fixed-order two-term
    sum, so no tolerance is needed)."""

    def _python_rrf(self, sf_dir: str):
        from real_time_iot_data_engineering_pipeline_spark.queries.ranking import (
            RRF_TOPK,
        )

        docs = _tokenized_corpus(sf_dir)
        # unigram-LM nll ranking (ascending)
        vocab = Counter(t for toks in docs.values() for t in toks)
        total = float(sum(vocab.values()))
        nll_q = {}
        for d, toks in docs.items():
            tf = Counter(toks)
            num = sum(float(c) * -math.log(vocab[t] / total) for t, c in tf.items())
            nll_q[d] = _fround(num / float(len(toks)), 6)
        lm_rank = {
            d: i + 1
            for i, d in enumerate(sorted(nll_q, key=lambda d: (nll_q[d], d)))
        }
        # BM25 ranking (descending) over matched docs
        n_docs = float(len(docs))
        dl = {d: float(len(t)) for d, t in docs.items()}
        avgdl = sum(dl.values()) / n_docs
        tf = {
            d: {t: float(c) for t, c in Counter(toks).items() if t in BM25_TERMS}
            for d, toks in docs.items()
        }
        tf = {d: m for d, m in tf.items() if m}
        df = Counter(t for perdoc in tf.values() for t in perdoc)
        k1, b = 1.2, 0.75
        score_q = {}
        for d, m in tf.items():
            s = sum(
                math.log((n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
                * (c * 2.2)
                / (c + k1 * (1.0 - b + b * dl[d] / avgdl))
                for t, c in m.items()
            )
            score_q[d] = _fround(s, 6)
        bm_rank = {
            d: i + 1
            for i, d in enumerate(
                sorted(score_q, key=lambda d: (-score_q[d], d))
            )
        }
        fused = {
            d: 1.0 / (60.0 + lm_rank[d])
            + (1.0 / (60.0 + bm_rank[d]) if d in bm_rank else 0.0)
            for d in lm_rank
        }
        top = sorted(fused, key=lambda d: (-_fround(fused[d], 6), d))[:RRF_TOPK]
        return [
            (d, lm_rank[d], bm_rank.get(d, 0), _fround(fused[d], 6))
            for d in top
        ]

    def test_rrf_matches_python_recompute(self, spark, sf_dir):
        expect = self._python_rrf(sf_dir)
        got = [
            (r["doc_id"], r["lm_rank"], r["bm25_rank"], r["rrf"])
            for r in registry.QUERIES["q_rrf_fusion"](spark, sf_dir).collect()
        ]
        assert got == expect

    def test_rrf_score_consistent_with_emitted_ranks(self, spark, sf_dir):
        for r in registry.QUERIES["q_rrf_fusion"](spark, sf_dir).collect():
            recomputed = 1.0 / (60.0 + r["lm_rank"]) + (
                1.0 / (60.0 + r["bm25_rank"]) if r["bm25_rank"] else 0.0
            )
            assert r["rrf"] == _fround(recomputed, 6)
