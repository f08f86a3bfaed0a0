"""Semantic golden tests for the corpus-reporting/mixing operators.

Oracle parity (tests/test_oracle_parity.py) proves Spark == DuckDB; these
assert the *semantics* both engines must share are the intended ones —
an identical-but-wrong formula would pass parity.
"""

from __future__ import annotations

import math

from real_time_iot_data_engineering_pipeline_spark import registry

registry.load_all()


class TestTfidfTopterms:
    def test_rank_bounds_and_per_doc_cardinality(self, spark, sf_dir):
        rows = registry.QUERIES["q_tfidf_topterms"](spark, sf_dir).collect()
        assert rows
        by_doc: dict[int, list] = {}
        for r in rows:
            assert 1 <= r.term_rank <= 3
            assert r.tf >= 1
            by_doc.setdefault(r.doc_id, []).append(r)
        for doc_rows in by_doc.values():
            ranks = sorted(r.term_rank for r in doc_rows)
            assert ranks == list(range(1, len(ranks) + 1))  # dense, no dup ranks
            # score is non-increasing with rank
            ordered = sorted(doc_rows, key=lambda r: r.term_rank)
            for a, b in zip(ordered, ordered[1:]):
                assert a.score >= b.score - 1e-9

    def test_matches_hand_computed_tfidf(self, spark, sf_dir):
        """Recompute tf * ln(N/df) in pure Python for one document and
        check the engine's winner matches."""
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
        n_docs = len(docs)
        df_counts: dict[str, int] = {}
        toks_by_doc = {}
        for d in docs:
            toks = [t.lower() for t in d.text.strip().split()]
            toks_by_doc[d.doc_id] = toks
            for t in set(toks):
                df_counts[t] = df_counts.get(t, 0) + 1
        target = docs[0].doc_id
        toks = toks_by_doc[target]
        scores = {
            t: toks.count(t) * math.log(n_docs / df_counts[t]) for t in set(toks)
        }
        expect_top = sorted(scores, key=lambda t: (-round(scores[t], 6), t))[0]
        got = {
            r.term_rank: r.token
            for r in registry.QUERIES["q_tfidf_topterms"](spark, sf_dir)
            .where(f"doc_id = {target}")
            .collect()
        }
        assert got[1] == expect_top


class TestMixtureWeights:
    def test_rates_realize_target_mixture_by_downsampling_only(self, spark, sf_dir):
        rows = registry.QUERIES["q_mixture_weights"](spark, sf_dir).collect()
        assert rows
        rates = {r.source: r.sample_rate for r in rows}
        # downsampling only: every rate in (0, 1], and the binding source is 1.0
        assert all(0 < v <= 1.0 for v in rates.values())
        assert math.isclose(max(rates.values()), 1.0, abs_tol=1e-9)
        for r in rows:
            assert 0 <= r.sampled_tokens <= r.n_tokens
            # shares are shares
            assert 0 < r.token_share <= 1 and 0 < r.target_share <= 1
        # post-sampling mixture approaches the target ordering: a source with
        # a higher target share must not end up with fewer sampled tokens per
        # unit of target weight than one with a lower target share by more
        # than rounding slack.
        scaled = sorted(
            (r.target_share, r.sampled_tokens) for r in rows
        )
        ratios = [s / t for t, s in scaled if t > 0]
        assert max(ratios) / min(ratios) < 1.2  # near-proportional allocation


class TestBpePairs:
    def test_matches_python_recompute_and_plan(self, spark, sf_dir):
        import re
        from collections import Counter

        import pyarrow.parquet as pq

        from real_time_iot_data_engineering_pipeline_spark import registry
        from real_time_iot_data_engineering_pipeline_spark.queries.report import (
            BPE_K,
        )

        texts = pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["text"]
        ).column("text").to_pylist()
        counts: Counter = Counter()
        for t in texts:
            for w in re.split(r"\s+", t.strip().lower()):
                for i in range(len(w) - 1):
                    counts[w[i : i + 2]] += 1
        expect = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:BPE_K]
        df = registry.QUERIES["q_bpe_pairs"](spark, sf_dir)
        rows = [(r["pair"], r["n"]) for r in df.collect()]
        assert rows == expect
        # top-k must compile to TakeOrderedAndProject, not a global sort
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan


class TestHeapsLaw:
    def test_matches_python_recompute_and_is_monotone(self, spark, sf_dir):
        import re

        import pyarrow.parquet as pq

        from real_time_iot_data_engineering_pipeline_spark import registry

        docs = pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ).to_pydict()
        pairs = sorted(zip(docs["doc_id"], docs["text"]))
        lo, hi, n = pairs[0][0], pairs[-1][0], len(pairs)
        rows = {
            r["decile"]: r
            for r in registry.QUERIES["q_heaps_law"](spark, sf_dir).collect()
        }
        assert len(rows) == 10
        prev_vocab = prev_toks = 0
        for k in range(1, 11):
            cutoff = lo + (hi - lo + 1) * k // 10
            seen = set()
            n_toks = 0
            for d, t in pairs:
                if d >= cutoff:
                    continue
                ws = re.split(r"\s+", t.strip().lower())
                n_toks += len(ws)
                seen.update(ws)
            r = rows[k]
            assert r["n_tokens"] == n_toks
            assert r["vocab_size"] == len(seen)
            assert r["vocab_size"] >= prev_vocab
            assert r["n_tokens"] >= prev_toks
            prev_vocab, prev_toks = r["vocab_size"], r["n_tokens"]


class TestSourceDivergence:
    def test_matches_python_recompute(self, spark, sf_dir):
        """Full-vocabulary Python JS recompute (no closed-form shortcut)
        must equal the engine's covered-terms + closed-form-remainder
        decomposition; JS must lie in [0, ln 2]."""
        import math
        import re
        from collections import Counter, defaultdict

        import pyarrow.parquet as pq
        import pytest

        from real_time_iot_data_engineering_pipeline_spark import registry

        docs = pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["source", "text"]
        ).to_pydict()
        per_src: dict = defaultdict(Counter)
        corpus: Counter = Counter()
        for s, t in zip(docs["source"], docs["text"]):
            ws = re.split(r"\s+", t.strip().lower())
            per_src[s].update(ws)
            corpus.update(ws)
        T = sum(corpus.values())
        rows = {
            r["source"]: r
            for r in registry.QUERIES["q_source_divergence"](
                spark, sf_dir
            ).collect()
        }
        assert set(rows) == set(per_src)
        for s, cnt in per_src.items():
            n = sum(cnt.values())
            js = 0.0
            for tok, cc in corpus.items():
                p = cnt.get(tok, 0) / n
                q = cc / T
                m = (p + q) / 2
                if p > 0:
                    js += 0.5 * p * math.log(p / m)
                js += 0.5 * q * math.log(q / m)
            r = rows[s]
            assert r["n_tokens"] == n
            assert r["vocab_size"] == len(cnt)
            assert r["js_divergence"] == pytest.approx(js, abs=2e-6)
            assert 0.0 <= r["js_divergence"] <= math.log(2.0) + 1e-9


class TestSourceOverlap:
    def test_matches_python_recompute(self, spark, sf_dir):
        import re
        from collections import defaultdict

        import pytest

        import pyarrow.parquet as pq

        from real_time_iot_data_engineering_pipeline_spark import registry

        docs = pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["source", "text"]
        ).to_pydict()
        vocab = defaultdict(set)
        for s, t in zip(docs["source"], docs["text"]):
            vocab[s].update(re.split(r"\s+", t.strip().lower()))
        srcs = sorted(vocab)
        rows = {
            (r["source_a"], r["source_b"]): r
            for r in registry.QUERIES["q_source_overlap"](
                spark, sf_dir
            ).collect()
        }
        n_pairs = sum(
            1
            for i, a in enumerate(srcs)
            for b in srcs[i + 1 :]
            if vocab[a] & vocab[b]
        )
        assert len(rows) == n_pairs
        for i, a in enumerate(srcs):
            for b in srcs[i + 1 :]:
                common = vocab[a] & vocab[b]
                if not common:
                    continue
                r = rows[(a, b)]
                assert r["vocab_a"] == len(vocab[a])
                assert r["vocab_b"] == len(vocab[b])
                assert r["n_common"] == len(common)
                assert r["jaccard"] == pytest.approx(
                    len(common) / len(vocab[a] | vocab[b]), abs=2e-6
                )


class TestSkewReport:
    def test_matches_pandas_recompute(self, spark, sf_dir):
        import os

        import pandas as pd

        from real_time_iot_data_engineering_pipeline_spark.queries.report import (
            SKEW_TOP_K,
        )

        ev = pd.read_parquet(os.path.join(sf_dir, "events.parquet"))
        counts = ev[ev["user_id"].notna()]["user_id"].value_counts()
        total, n_keys = int(counts.sum()), len(counts)
        expect = sorted(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )[:SKEW_TOP_K]
        rows = registry.QUERIES["q_skew_report"](spark, sf_dir).collect()
        assert [(r.key, r.cnt) for r in rows] == [
            (k, int(c)) for k, c in expect
        ]
        for r in rows:
            assert r.n_keys == n_keys and r.total_rows == total
            assert abs(r.share - _fround4(r.cnt / total, 6)) < 1e-12
            assert abs(r.skew_x - _fround4(r.cnt * n_keys / total, 6)) < 1e-12
            # worst_skew_x is the max over ALL keys, so >= every listed skew
            assert r.worst_skew_x >= r.skew_x - 1e-12
        assert rows[0].worst_skew_x == rows[0].skew_x  # row 1 IS the max


def _fround4(x: float, n: int) -> float:
    s = 10.0**n
    return math.floor(x * s * (1.0 + 1e-12) + 0.5) / s


class TestJoinCardinality:
    def test_estimate_equals_executed_join(self, spark, sf_dir):
        """The histogram identity: sum-of-count-products must equal the
        row count of the actually-executed join, and the hot key must be
        the true per-key maximum."""
        import os

        import pandas as pd

        from real_time_iot_data_engineering_pipeline_spark.queries.report import (
            _JOINS,
        )

        rows = {
            r.join_name: r
            for r in registry.QUERIES["q_join_cardinality"](spark, sf_dir).collect()
        }
        assert set(rows) == {j[0] for j in _JOINS}
        for name, lt, lk, rt, rk in _JOINS:
            left = pd.read_parquet(os.path.join(sf_dir, f"{lt}.parquet"))
            right = pd.read_parquet(os.path.join(sf_dir, f"{rt}.parquet"))
            merged = left[[lk]].merge(
                right[[rk]], left_on=lk, right_on=rk, how="inner"
            )
            r = rows[name]
            assert r.est_rows == len(merged)
            assert r.left_rows == len(left) and r.right_rows == len(right)
            prod = (
                left[lk].value_counts().to_frame("ca")
                .join(right[rk].value_counts().to_frame("cb"), how="inner")
            )
            assert r.hot_key_rows == int((prod["ca"] * prod["cb"]).max())


class TestMixtureSample:
    def test_realized_rates_track_prescription(self, spark, sf_dir):
        """Every source's realized keep-rate must track its prescribed
        sample_rate (25 docs/source -> the md5 draw can deviate by a few
        draws, never systematically), the most over-represented source
        keeps everything, and kept token mass is consistent."""
        weights = {
            r.source: r.sample_rate
            for r in registry.QUERIES["q_mixture_weights"](
                spark, sf_dir
            ).collect()
        }
        rows = registry.QUERIES["q_mixture_sample"](spark, sf_dir).collect()
        assert {r.source for r in rows} == set(weights)
        for r in rows:
            rate = weights[r.source]
            assert 0 <= r.n_kept <= r.n_docs
            # binomial-ish deviation bound for n=25 deterministic draws
            assert abs(r.realized_rate - rate) <= 0.25
            if rate == 1.0:
                assert r.n_kept == r.n_docs
            if r.n_kept == 0:
                assert r.kept_tokens == 0


class TestVocabCoverage:
    def test_matches_python_recompute(self, spark, sf_dir):
        import os
        import re
        from collections import Counter

        import pandas as pd

        from real_time_iot_data_engineering_pipeline_spark.queries.report import (
            COVERAGE_KS,
        )

        docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
        freq: Counter = Counter()
        for text in docs["text"]:
            freq.update(t.lower() for t in re.split(r"\s+", text.strip()))
        total = sum(freq.values())
        ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
        rows = registry.QUERIES["q_vocab_coverage"](spark, sf_dir).collect()
        assert [r.k for r in rows] == sorted(COVERAGE_KS)
        prev = -1
        for r in rows:
            exp = sum(n for _, n in ranked[: r.k])
            assert r.covered_tokens == exp
            assert r.total_tokens == total and r.vocab_size == len(freq)
            assert r.covered_tokens >= prev  # monotone in k
            prev = r.covered_tokens


class TestDatasetManifest:
    def test_signature_matches_and_detects_change(self, spark, sf_dir):
        import hashlib
        import os

        import pandas as pd

        docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
        sig: dict = {}
        for _, d in docs.iterrows():
            h = hashlib.md5(f"{d.doc_id}:{d.text}".encode()).hexdigest()
            x, s, chars, n = sig.get(d.source, (0, 0, 0, 0))
            sig[d.source] = (
                x ^ int(h[:15], 16),
                s + int(h[:8], 16),
                chars + d.n_chars,
                n + 1,
            )
        rows = registry.QUERIES["q_dataset_manifest"](spark, sf_dir).collect()
        assert {r.source for r in rows} == set(sig)
        for r in rows:
            x, s, chars, n = sig[r.source]
            assert (r.content_sig, r.content_sum, r.n_chars, r.n_docs) == (
                x,
                s,
                chars,
                n,
            )
        # change detection: flipping one doc's text changes its source's sig
        d0 = docs.iloc[0]
        h_old = hashlib.md5(f"{d0.doc_id}:{d0.text}".encode()).hexdigest()
        h_new = hashlib.md5(f"{d0.doc_id}:{d0.text}X".encode()).hexdigest()
        x, s, _, _ = sig[d0.source]
        assert (x ^ int(h_old[:15], 16)) ^ int(h_new[:15], 16) != x
