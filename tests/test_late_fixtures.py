"""Late-data fixture generator vs the real streaming pipeline: the
simulator encodes the watermark semantics pinned in tests/test_streaming.py;
the generated stream (reference lateness taxonomy, generator.py:258-292)
must produce EXACTLY the simulated windows when run through Spark."""

from __future__ import annotations

import pytest

from real_time_iot_data_engineering_pipeline_spark.streaming.late_fixtures import (
    LATE_CLASSES,
    late_events,
    lateness_seconds,
    simulate_windowed_counts,
    write_late_files,
)
from real_time_iot_data_engineering_pipeline_spark.streaming.pipeline import (
    run_pipeline,
)


def test_lateness_rates_match_reference():
    """generator.py:10-17 — 5% late 1-5 min, 3% 5-15 min, 2% 15-60 min."""
    n = 10_000
    lates = [lateness_seconds(i) for i in range(n)]
    frac = lambda lo, hi: sum(lo <= s < hi for s in lates) / n
    assert frac(60, 300) == pytest.approx(0.05, abs=0.001)
    assert frac(300, 900) == pytest.approx(0.03, abs=0.001)
    assert frac(900, 3600) == pytest.approx(0.02, abs=0.001)
    assert frac(0, 1) == pytest.approx(0.90, abs=0.001)


def test_generated_stream_matches_simulated_watermark_semantics(spark, tmp_path):
    src = str(tmp_path / "src")
    batches = write_late_files(src, n_events=200, n_files=8)
    expected = simulate_windowed_counts(batches)

    sink = run_pipeline(
        spark, src, str(tmp_path / "sink"), str(tmp_path / "ckpt")
    )
    got = {
        str(r.window_start): (r.sum_value, r["count"])
        for r in sink.read().collect()
    }
    assert got == expected
    # sanity: the fixture actually exercised the drop path — some late
    # events were discarded (simulated count < total generated)
    total_kept = sum(c for _, c in expected.values())
    assert total_kept < 200
    assert any(s >= 60 for s in (lateness_seconds(i) for i in range(200)))
