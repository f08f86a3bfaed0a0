"""Sketch-vs-exact quality contracts: the production-scale approximate
aggregates (KLL-style approx_percentile, HyperLogLog++ distinct counts)
must track the oracle-checked exact forms within their documented error —
the same exact-baseline/approx-twin pattern as the LSH recall tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_iot_data_engineering_pipeline_spark import registry
from real_time_iot_data_engineering_pipeline_spark.sources import load_table

registry.load_all()


def test_approx_percentile_tracks_exact(spark, sf_dir):
    """A quantile sketch guarantees RANK error, not value error (in a heavy
    tail a tiny rank slip moves the value a lot) — so the contract checked
    here is the real one: each approx quantile must lie between the EXACT
    quantiles at p +/- delta."""
    delta = 0.02
    ev = load_table(spark, sf_dir, "events")
    lo_hi = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            *[
                F.expr(f"percentile(value, {max(p - delta, 0.0)})").alias(
                    f"lo{int(p * 100)}"
                )
                for p in (0.5, 0.9, 0.99)
            ],
            *[
                F.expr(f"percentile(value, {min(p + delta, 1.0)})").alias(
                    f"hi{int(p * 100)}"
                )
                for p in (0.5, 0.9, 0.99)
            ],
        )
        .collect()
    }
    approx = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            *[
                F.expr(f"approx_percentile(value, {p}, 1000)").alias(
                    f"a{int(p * 100)}"
                )
                for p in (0.5, 0.9, 0.99)
            ]
        )
        .collect()
    }
    assert set(lo_hi) == set(approx)
    for et in lo_hi:
        for p in (50, 90, 99):
            a = approx[et][f"a{p}"]
            lo, hi = lo_hi[et][f"lo{p}"], lo_hi[et][f"hi{p}"]
            assert lo - 1e-9 <= a <= hi + 1e-9, (et, p, lo, a, hi)


def test_hll_tracks_exact_distinct(spark, sf_dir):
    exact = {
        r.event_type: r.n_users
        for r in registry.QUERIES["q_distinct_users"](spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    approx = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.02).alias("n"))
        .collect()
    }
    assert set(exact) == set(approx)
    for et, n in exact.items():
        assert abs(approx[et] - n) <= max(0.1 * n, 2), (et, n, approx[et])
