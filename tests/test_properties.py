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
