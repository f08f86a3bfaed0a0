"""Property-based tests (hypothesis) for the cross-engine glue the whole
CORRECTNESS gate leans on — run with small example counts since each
example round-trips through Spark."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from real_time_iot_data_engineering_pipeline_spark.functions.rounding import (
    fround,
    fround_sql,
)


class TestFroundParity:
    """fround is the hash-glue: every derived float crosses engines through
    it.  Spark's fround(column) and DuckDB's fround_sql must agree bit-for-
    bit on arbitrary doubles — including the avg-of-cents half-boundary
    values that break plain round()."""

    @settings(max_examples=5, deadline=None)
    @given(
        st.lists(
            st.one_of(
                st.floats(
                    min_value=-1e6,
                    max_value=1e6,
                    allow_nan=False,
                    allow_infinity=False,
                ),
                # adversarial: exact cents / half-boundary shapes
                st.integers(min_value=-10**8, max_value=10**8).map(
                    lambda n: n / 2000.0
                ),
            ),
            min_size=1,
            max_size=80,
        )
    )
    def test_spark_and_duckdb_fround_agree(self, spark, xs):
        sdf = spark.createDataFrame([(x,) for x in xs], "x double").select(
            fround(F.col("x"), 4).alias("r")
        )
        got = [r.r for r in sdf.collect()]
        con = duckdb.connect()
        expected = [
            con.execute(f"SELECT {fround_sql('CAST(? AS DOUBLE)')}", [x]).fetchone()[0]
            for x in xs
        ]
        con.close()
        assert got == expected


class TestDedupFirstWins:
    """q_dedup_window semantics vs an independent pure-Python model:
    first record per (user, 5-second bucket), ties broken by event_id."""

    @settings(max_examples=5, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(0, 4),  # user_id
                st.integers(0, 40),  # seconds offset
                st.floats(0, 100, allow_nan=False),
            ),
            min_size=1,
            max_size=30,
        )
    )
    def test_matches_python_model(self, spark, rows):
        import datetime as dt

        base = dt.datetime(2024, 1, 15, 10, 0, 0)
        data = [
            (i, u, base + dt.timedelta(seconds=s), v)
            for i, (u, s, v) in enumerate(rows)
        ]
        # python model
        best: dict[tuple[int, int], tuple] = {}
        for i, u, ts, v in data:
            bucket = int(ts.timestamp()) // 5
            key = (u, bucket)
            if key not in best or (ts, i) < (best[key][2], best[key][0]):
                best[key] = (i, u, ts, v)
        expected = sorted(t[0] for t in best.values())

        from pyspark.sql import Window

        df = spark.createDataFrame(
            data, "event_id long, user_id long, ts timestamp, value double"
        )
        bucket = F.window("ts", "5 seconds").getField("start")
        w = Window.partitionBy("user_id", "bucket").orderBy("ts", "event_id")
        got = sorted(
            r.event_id
            for r in df.select("event_id", "user_id", "ts", bucket.alias("bucket"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .collect()
        )
        assert got == expected


class TestSinkOrderInsensitivity:
    def test_final_table_depends_on_epochs_not_call_order(self, spark, tmp_path):
        """Last-write-wins must be decided by epoch, not by which upsert
        call happened to run last (out-of-order replays after restart)."""
        from real_time_iot_data_engineering_pipeline_spark.sinks import (
            KeyedParquetSink,
        )

        b1 = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k int, v double")
        b2 = spark.createDataFrame([(2, 99.0), (3, 30.0)], "k int, v double")

        in_order = KeyedParquetSink(spark, str(tmp_path / "a"), ["k"])
        in_order.upsert(b1, 1)
        in_order.upsert(b2, 2)

        reversed_calls = KeyedParquetSink(spark, str(tmp_path / "b"), ["k"])
        reversed_calls.upsert(b2, 2)
        reversed_calls.upsert(b1, 1)

        assert sorted(in_order.read().collect()) == sorted(
            reversed_calls.read().collect()
        ) == [(1, 10.0), (2, 99.0), (3, 30.0)]


class TestPrepProperties:
    def test_split_proportions_and_exhaustiveness(self, spark, sf_dir):
        """The md5 split must cover every doc exactly once and land near
        80/10/10 (law-of-large-numbers tolerance at fixture size)."""
        from real_time_iot_data_engineering_pipeline_spark import registry

        registry.load_all()
        df = registry.QUERIES["q_train_test_split"](spark, sf_dir)
        total = df.count()
        by = {r.split: r.n for r in df.groupBy("split").count().withColumnRenamed("count", "n").collect()}
        assert sum(by.values()) == total
        assert set(by) == {"train", "validation", "test"}
        assert 0.70 <= by["train"] / total <= 0.90
        assert 0.05 <= by["validation"] / total <= 0.15
        assert 0.05 <= by["test"] / total <= 0.15

    def test_split_is_deterministic_across_runs(self, spark, sf_dir):
        from real_time_iot_data_engineering_pipeline_spark import registry

        registry.load_all()
        a = {(r.doc_id, r.split) for r in registry.QUERIES["q_train_test_split"](spark, sf_dir).collect()}
        b = {(r.doc_id, r.split) for r in registry.QUERIES["q_train_test_split"](spark, sf_dir).collect()}
        assert a == b

    def test_redaction_is_idempotent(self, spark, sf_dir):
        """Redacting already-redacted text changes nothing — placeholders
        must not match any PII pattern."""
        from pyspark.sql import functions as F

        from real_time_iot_data_engineering_pipeline_spark import registry
        from real_time_iot_data_engineering_pipeline_spark.queries.prep import (
            EMAIL_RE,
            PHONE_RE,
            URL_RE,
        )

        registry.load_all()
        once = registry.QUERIES["q_pii_redact"](spark, sf_dir).select(
            "doc_id", F.col("redacted").alias("text")
        )
        twice = once.select(
            "doc_id",
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(F.col("text"), URL_RE, "[URL]"),
                    EMAIL_RE,
                    "[EMAIL]",
                ),
                PHONE_RE,
                "[PHONE]",
            ).alias("text2"),
        )
        diff = once.join(twice, "doc_id").filter(F.col("text") != F.col("text2"))
        assert diff.count() == 0

    def test_centroid_membership_covers_corpus(self, spark, sf_dir):
        """Every vector is assigned exactly once: per-cluster member counts
        sum to the corpus size on every dimension row."""
        from pyspark.sql import functions as F

        from real_time_iot_data_engineering_pipeline_spark import registry

        registry.load_all()
        res = registry.QUERIES["q_embed_centroids"](spark, sf_dir)
        n_corpus = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
        per_dim = res.groupBy("dim").agg(F.sum("n_members").alias("s")).collect()
        assert all(r.s == n_corpus for r in per_dim)

    def test_stratified_sample_is_nested_and_salted(self, spark, sf_dir):
        """Raising a keep rate must produce a SUPERSET (nested samples), and
        the sample hash must be independent of the split hash (salt)."""
        from pyspark.sql import functions as F

        from real_time_iot_data_engineering_pipeline_spark import registry
        from real_time_iot_data_engineering_pipeline_spark.queries import prep

        registry.load_all()
        sample = registry.QUERIES["q_sample_stratified"](spark, sf_dir)
        rows = sample.collect()
        assert all(r.bucket < r.keep_pct for r in rows)
        # nested: the docs kept at rate r are exactly those with bucket < r,
        # so any higher rate keeps a superset by construction
        kept_25 = {r.doc_id for r in rows if r.bucket < 25}
        kept_50 = {r.doc_id for r in rows if r.bucket < 50}
        assert kept_25 <= kept_50
        # salted: sample bucket differs from the split bucket for most docs
        split = registry.QUERIES["q_train_test_split"](spark, sf_dir).select(
            "doc_id", F.col("bucket").alias("split_bucket")
        )
        joined = sample.join(split, "doc_id")
        n = joined.count()
        same = joined.filter(F.col("bucket") == F.col("split_bucket")).count()
        assert same < n * 0.2  # ~1% expected collisions, allow slack


class TestAsofJoinProperty:
    """The bucketed two-phase as-of join vs pandas merge_asof (backward,
    allow_exact_matches) on random keyed time series — random data walks
    the carry-in chain across arbitrary empty-bucket gaps, which the
    fixture oracle only samples."""

    @settings(max_examples=5, deadline=None)
    @given(
        events=st.lists(
            st.tuples(
                st.sampled_from(["a", "b"]),
                st.integers(min_value=0, max_value=20000),  # ~5.5h span
            ),
            min_size=1,
            max_size=60,
        ),
        calibs=st.lists(
            st.tuples(
                st.sampled_from(["a", "b"]),
                st.integers(min_value=0, max_value=20000),
                st.integers(min_value=0, max_value=100),
            ),
            min_size=0,
            max_size=20,
        ),
    )
    def test_matches_pandas_merge_asof(self, spark, events, calibs):
        import datetime as dt

        import pandas as pd

        from real_time_iot_data_engineering_pipeline_spark.queries.temporal import (
            asof_join,
        )

        base = dt.datetime(2024, 1, 1)

        def ts(s):
            return base + dt.timedelta(seconds=s)

        ev_rows = [
            (i, ts(s), k, float(i)) for i, (k, s) in enumerate(events)
        ]
        # unique (key, ts) on the calibration side (the operator's and the
        # fixture derivation's precondition) — keep max value like _calibrations
        cal = {}
        for k, s, v in calibs:
            cal[(k, s)] = max(cal.get((k, s), -1.0), float(v))
        cal_rows = [(k, ts(s), v) for (k, s), v in sorted(cal.items())]

        ev_df = spark.createDataFrame(
            ev_rows,
            "event_id long, ts timestamp_ntz, event_type string, value double",
        )
        cal_df = spark.createDataFrame(
            cal_rows or [],
            "event_type string, calib_ts timestamp_ntz, calib_value double",
        )
        got = {
            r["event_id"]: (r["calib_ts"], r["calib_value"])
            for r in asof_join(ev_df, cal_df).collect()
        }

        left = pd.DataFrame(
            ev_rows, columns=["event_id", "ts", "event_type", "value"]
        ).sort_values("ts", kind="stable")
        right = pd.DataFrame(
            cal_rows, columns=["event_type", "calib_ts", "calib_value"]
        ).sort_values("calib_ts", kind="stable")
        if right.empty:
            expected = {i: (None, None) for i, _, _, _ in ev_rows}
        else:
            merged = pd.merge_asof(
                left,
                right,
                left_on="ts",
                right_on="calib_ts",
                by="event_type",
                direction="backward",
                allow_exact_matches=True,
            )
            expected = {
                int(r.event_id): (
                    None if pd.isna(r.calib_ts) else r.calib_ts.to_pydatetime(),
                    None if pd.isna(r.calib_value) else float(r.calib_value),
                )
                for r in merged.itertuples()
            }
        assert got == expected


class TestRangeJoinProperty:
    """The bucketed interval join vs a brute-force python model on random
    intervals — random widths (seconds to many hours) exercise explode
    widths and bucket-boundary edges the fixed fixture derivation (whole
    hours, >=1h) never hits."""

    @settings(max_examples=5, deadline=None)
    @given(
        events=st.lists(
            st.tuples(
                st.sampled_from(["a", "b"]),
                st.integers(min_value=0, max_value=30000),
            ),
            min_size=1,
            max_size=50,
        ),
        intervals=st.lists(
            st.tuples(
                st.sampled_from(["a", "b"]),
                st.integers(min_value=0, max_value=30000),  # start second
                st.integers(min_value=1, max_value=30000),  # width seconds
            ),
            min_size=1,
            max_size=12,
        ),
    )
    def test_matches_brute_force(self, spark, events, intervals):
        import datetime as dt

        from real_time_iot_data_engineering_pipeline_spark.queries.temporal import (
            range_join,
        )

        base = dt.datetime(2024, 1, 1)

        def ts(s):
            return base + dt.timedelta(seconds=s)

        ev_rows = [(i, ts(s), k, float(i)) for i, (k, s) in enumerate(events)]
        iv_rows = [
            (j, k, ts(s), ts(s + w))
            for j, (k, s, w) in enumerate(intervals)
        ]
        ev_df = spark.createDataFrame(
            ev_rows,
            "event_id long, ts timestamp_ntz, event_type string, value double",
        )
        iv_df = spark.createDataFrame(
            iv_rows,
            "interval_id long, event_type string, "
            "start_ts timestamp_ntz, end_ts timestamp_ntz",
        )
        got = {
            r["interval_id"]: (r["n_events"], r["avg_value"])
            for r in range_join(ev_df, iv_df).collect()
        }

        from real_time_iot_data_engineering_pipeline_spark.functions.rounding import (
            fround,
        )
        from pyspark.sql import functions as F

        expected = {}
        for j, k, s, e in iv_rows:
            vals = [v for (_, t, ek, v) in ev_rows if ek == k and s <= t < e]
            if vals:
                # same fround quantization as the operator
                mean = sum(vals) / len(vals)
                import math
                q = math.floor(mean * 1e4 * (1 + 1e-12) + 0.5) / 1e4
                expected[j] = (len(vals), q)
            else:
                expected[j] = (0, None)
        assert got == expected


class TestScd2Model:
    """q_scd2_intervals vs a direct Python fold over the same ordering —
    the islands logic is easy to get subtly wrong at run boundaries, so
    the window implementation is checked against the obvious sequential
    model on the real fixture."""

    def test_matches_sequential_fold(self, spark, sf_dir):
        from collections import defaultdict

        from real_time_iot_data_engineering_pipeline_spark import registry

        registry.load_all()
        from real_time_iot_data_engineering_pipeline_spark.sources import (
            load_table,
        )

        ev = (
            load_table(spark, sf_dir, "events")
            .filter(F.col("ts").isNotNull())
            .select("user_id", "event_type", "ts", "event_id")
            .collect()
        )
        by_user = defaultdict(list)
        for r in ev:
            by_user[r["user_id"]].append(r)
        expected = {}
        for uid, rows in by_user.items():
            rows.sort(key=lambda r: (r["ts"], r["event_id"]))
            runs = []
            for r in rows:
                if not runs or runs[-1]["type"] != r["event_type"]:
                    runs.append(
                        {"type": r["event_type"], "from": r["ts"], "n": 0}
                    )
                runs[-1]["n"] += 1
            for i, run in enumerate(runs):
                nxt = runs[i + 1]["from"] if i + 1 < len(runs) else None
                expected[(uid, run["from"])] = (
                    run["type"],
                    nxt,
                    run["n"],
                    nxt is None,
                )

        got = registry.QUERIES["q_scd2_intervals"](spark, sf_dir).collect()
        assert len(got) == len(expected)
        for r in got:
            exp = expected[(r["user_id"], r["valid_from"])]
            assert (
                r["event_type"],
                r["valid_to"],
                r["n_events"],
                r["is_current"],
            ) == exp


class TestMadModel:
    """q_mad_outliers vs numpy medians (quantized the same way)."""

    def test_matches_numpy(self, spark, sf_dir):
        import numpy as np

        from real_time_iot_data_engineering_pipeline_spark import registry

        registry.load_all()
        from real_time_iot_data_engineering_pipeline_spark.sources import (
            load_table,
        )

        ev = (
            load_table(spark, sf_dir, "events")
            .filter(F.col("value").isNotNull())
            .select("event_type", "value")
            .collect()
        )
        vals = {}
        for r in ev:
            vals.setdefault(r["event_type"], []).append(r["value"])

        def q4(x):
            import math

            return math.floor(x * 1e4 * (1 + 1e-12) + 0.5) / 1e4

        got = {
            r["event_type"]: r
            for r in registry.QUERIES["q_mad_outliers"](spark, sf_dir).collect()
        }
        assert set(got) == set(vals)
        for et, xs in vals.items():
            a = np.asarray(xs, dtype=float)
            med = q4(float(np.median(a)))
            mad = q4(float(np.median(np.abs(a - med))))
            n_out = int((np.abs(a - med) > 3 * mad).sum())
            r = got[et]
            assert r["med"] == pytest.approx(med, abs=1e-9)
            assert r["mad"] == pytest.approx(mad, abs=1e-9)
            assert (r["n"], r["n_outliers"]) == (len(xs), n_out)


class TestMisraGriesProperty:
    """The streaming heavy-hitter fold must honor the Misra-Gries
    guarantee on ARBITRARY streams split at ARBITRARY batch boundaries:
    estimates never exceed true counts, undercount by at most
    processed/capacity, every key above the bound survives, and the fold
    is batching-invariant (same final summary regardless of where the
    stream was cut)."""

    @settings(max_examples=25, deadline=None)
    @given(
        keys=st.lists(st.integers(min_value=0, max_value=12), min_size=1, max_size=120),
        cut=st.integers(min_value=0, max_value=120),
        capacity=st.integers(min_value=2, max_value=8),
    )
    def test_mg_bound_and_batching_invariance(self, keys, cut, capacity):
        from collections import Counter

        import pandas as pd

        from real_time_iot_data_engineering_pipeline_spark.streaming.stateful import (
            _misra_gries,
        )
        from .test_stateful import _FakeState

        fn = _misra_gries(capacity)

        def batch(ks, start):
            return pd.DataFrame(
                {
                    "key": ks,
                    "ts": pd.to_datetime("2024-01-15")
                    + pd.to_timedelta(range(start, start + len(ks)), unit="s"),
                    "event_id": range(start, start + len(ks)),
                }
            )

        def run(chunks):
            state = _FakeState()
            for i, ks in enumerate(chunks):
                if not ks:
                    continue
                out = list(
                    fn((0,), iter([batch(ks, sum(map(len, chunks[:i])))]), state)
                )
                state = _FakeState(value=state.updated)
            k, c, processed = state.get
            return dict(zip(k, c)), processed

        cut = min(cut, len(keys))
        est_split, n_split = run([keys[:cut], keys[cut:]])
        est_whole, n_whole = run([keys])
        assert est_split == est_whole and n_split == n_whole == len(keys)
        truth = Counter(keys)
        bound = len(keys) / capacity
        for key, true_n in truth.items():
            if key in est_whole:
                assert 0 < est_whole[key] <= true_n
                assert true_n - est_whole[key] <= bound
            else:
                assert true_n <= bound


class TestWelfordZGateProperty:
    """The z-gate's Welford fold must be batching-invariant and its
    retained moments must match numpy on the non-anomalous subsequence."""

    @settings(max_examples=25, deadline=None)
    @given(
        values=st.lists(
            st.floats(min_value=-100, max_value=100, allow_nan=False),
            min_size=1,
            max_size=60,
        ),
        cut=st.integers(min_value=0, max_value=60),
    )
    def test_batching_invariance_and_moment_fidelity(self, values, cut):
        import numpy as np
        import pandas as pd

        from real_time_iot_data_engineering_pipeline_spark.streaming.stateful import (
            _zscore,
        )
        from .test_stateful import _FakeState

        fn = _zscore(3.0, 5)

        def batch(vs, start):
            return pd.DataFrame(
                {
                    "value": vs,
                    "ts": pd.to_datetime("2024-01-15")
                    + pd.to_timedelta(range(start, start + len(vs)), unit="s"),
                    "event_id": range(start, start + len(vs)),
                }
            )

        def run(chunks):
            state, flags = _FakeState(), []
            for i, vs in enumerate(chunks):
                if not vs:
                    continue
                (out,) = list(
                    fn((0,), iter([batch(vs, sum(map(len, chunks[:i])))]), state)
                )
                flags += list(out["is_anomaly"])
                state = _FakeState(value=state.updated)
            return state.get, flags

        cut = min(cut, len(values))
        (m_split, f_split) = run([values[:cut], values[cut:]])
        (m_whole, f_whole) = run([values])
        assert f_split == f_whole
        assert m_split[0] == m_whole[0]
        assert m_split[1] == pytest.approx(m_whole[1], rel=1e-9, abs=1e-9)
        # retained moments == numpy over the values that actually entered
        kept = [v for v, a in zip(values, f_whole) if not a]
        n, mean, m2 = m_whole
        assert n == len(kept)
        if kept:
            assert mean == pytest.approx(float(np.mean(kept)), rel=1e-9, abs=1e-9)
            assert m2 == pytest.approx(
                float(np.sum((np.asarray(kept) - np.mean(kept)) ** 2)),
                rel=1e-6,
                abs=1e-6,
            )
