"""CI guard over the committed 10x scaling artifact (round-6 verdict ask
#5): SCALE.md's "no super-linear query" claim is asserted against data, not
prose.  scripts/bench_scale.py produces bench_snapshots/SCALE_RATIOS.json
(paired sf0.1 / 10x single-shot legs) and maintains SCALE_BANDS.json
(first-seen frozen per-query max ratio).  A plan rewrite that turns a
linear query super-linear shows up here as a band violation the next time
the scale run is refreshed — instead of silently re-baselining.
"""

from __future__ import annotations

import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SNAPDIR = os.path.join(REPO, "bench_snapshots")

# Ratio checks only bind when the 10x leg is slow enough to measure: a
# 0.2 s -> 0.9 s move is timer/host jitter, not a scaling signature.
ABS_FLOOR_SEC = 1.0


@pytest.fixture(scope="module")
def ratios() -> dict:
    path = os.path.join(SNAPDIR, "SCALE_RATIOS.json")
    assert os.path.exists(path), (
        "bench_snapshots/SCALE_RATIOS.json missing — run "
        "`python scripts/bench_scale.py rNN` (the per-round scale artifact)"
    )
    with open(path) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def bands() -> dict:
    with open(os.path.join(SNAPDIR, "SCALE_BANDS.json")) as f:
        return json.load(f)


def test_every_measured_query_has_a_band(ratios, bands):
    missing = sorted(set(ratios["queries"]) - set(bands))
    assert not missing, f"queries measured without a frozen band: {missing}"


def test_artifact_covers_current_registry(ratios):
    """The committed scale run must cover (nearly) the whole current
    registry — a stale artifact from many additions ago proves nothing.
    10% headroom lets mid-round additions land before the round-end
    refresh."""
    import sys

    sys.path.insert(0, REPO)
    from real_time_iot_data_engineering_pipeline_spark import registry

    registry.load_all()
    covered = len(set(ratios["queries"]) & set(registry.QUERIES))
    assert covered >= 0.9 * len(registry.QUERIES), (
        f"scale artifact covers {covered}/{len(registry.QUERIES)} registered "
        "queries — refresh with `python scripts/bench_scale.py rNN`"
    )


def test_no_query_exceeds_its_scale_band(ratios, bands):
    """The load-bearing assertion: every query's 10x ratio stays inside
    its frozen band (first measurement x1.75 headroom, floor 4.0).  The
    calibration job is a point sample of a drifting host, so the check is
    two-sided: a violation requires BOTH the raw ratio and the
    drift-normalized ratio to exceed the band — a real scaling regression
    exceeds it under either reading of host drift, while drift
    mis-correction flips only one of them.  Suite-position noise gets a
    third reading: bench_scale re-measures banded violators in isolation
    and records the probe ALONGSIDE the suite values (never replacing
    them), and the query passes if either measurement is in band — a real
    super-linear plan fails both.  The absolute floor keeps sub-second
    jitter out."""
    violations = []
    for name, r in ratios["queries"].items():
        band = bands.get(name)
        if band is None or r["t10"] < ABS_FLOOR_SEC:
            continue
        measured = min(
            r["ratio"],
            r.get("ratio_norm", r["ratio"]),
            r.get("probe_ratio", float("inf")),
        )
        if measured > band:
            violations.append(
                f"{name}: 10x ratio {measured} (best reading) > band {band}"
            )
    assert not violations, "super-linear scaling detected:\n" + "\n".join(
        sorted(violations)
    )


def test_whole_suite_ratio_is_subquadratic(ratios):
    """10x data must cost far less than 10x time suite-wide (r6 measured
    3.31x on a quiet host; the bar leaves room for suite growth but
    catches a quadratic regression instantly).  Same two-sided drift
    rule: the BETTER of the raw / normalized readings must pass."""
    measured = min(
        ratios["total_ratio"],
        ratios.get("total_ratio_norm", ratios["total_ratio"]),
    )
    assert measured <= 6.0, (
        f"whole-suite 10x ratio {measured} (best reading) — scaling regression"
    )
