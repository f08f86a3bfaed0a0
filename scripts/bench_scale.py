#!/usr/bin/env python
"""Per-round 10x scaling artifact (round-6 verdict ask #5): runs the full
suite at sf0.1 AND at the 10x derived fixture back-to-back, and turns the
"no super-linear query" claim from SCALE.md prose into committed CI inputs.

Outputs (all under bench_snapshots/):
- BENCH_SF0.1_SCALE_RUN.json — the sf0.1 leg (single-shot, same session
  protocol as the 10x leg so host conditions pair up and cancel in ratios)
- BENCH_10X_DETAIL.json      — the 10x leg
- SCALE_RATIOS.json          — {query: {"t1": s, "t10": s, "ratio": r}},
  plus run metadata (round tag, calib_sec of both legs)
- SCALE_BANDS.json           — per-query max allowed 10x ratio, FIRST-SEEN
  FROZEN like BASELINES.json: a new query's band is set from its first
  measured ratio with headroom (max(4.0, 1.75 * ratio)); existing bands
  never change, so a plan rewrite that turns a linear query super-linear
  trips tests/test_scale_guard.py instead of silently re-baselining.

The 10x fixture is derived from sf0.1 by make_scale_fixture.py (disjoint
keys, disjoint replica vocabularies, rotated embeddings — constant dup
density, see that script's docstring) and is built here if missing.

Usage: python scripts/bench_scale.py [round-tag] [--refit=q_a,q_b]

--refit (r13): EXPLICIT band rebaseline for the named queries only —
band = max(floor, headroom * this run's worst reading), recorded with the
previous band and both legs' calibration probes in SCALE_BANDS_META.json
so a refit is auditable from git (why: r12's host scanned ~2x slower than
the band-fit era, tripping three bands on UNCHANGED code — the guard was
measuring host epochs, not plans; VERDICT r12 #1).  Refits never happen
implicitly: without the flag, existing bands are immutable as before.
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SNAPDIR = os.path.join(REPO, "bench_snapshots")
FIXTURE = os.environ.get("SPARK_GRAFT_SCALE_DIR", os.path.join(REPO, ".scale", "sf1"))
SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

BAND_FLOOR = 4.0  # minimum band: sub-second queries jitter below this
BAND_HEADROOM = 1.75  # first-seen band = max(floor, headroom * measured)


def _run_leg(sf_dir: str, detail_path: str) -> dict:
    # min-of-2 legs, same as bench.py's default protocol: a single-shot
    # refresh attempt measured 2x+ swings on sub-second queries (e.g.
    # q_join_inner ratio 1.9 -> 7.0 between runs with identical code),
    # which is leg noise, not scaling — min-of-k is the established fix.
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_BENCH_REPS=os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"),
        SPARK_GRAFT_DETAIL=detail_path,
    )
    subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        check=True,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    with open(detail_path) as f:
        return json.load(f)


_PROBE_CODE = """
import json, sys, time
sys.path.insert(0, {repo!r})
from real_time_iot_data_engineering_pipeline_spark.session import build_session
from real_time_iot_data_engineering_pipeline_spark import registry
registry.load_all()
spark = build_session(app_name="scale-probe", shuffle_partitions=32)
names = json.loads(sys.argv[1])

def leg(name, sf_dir):
    t0 = time.perf_counter()
    registry.QUERIES[name](spark, sf_dir).write.format("noop").mode(
        "overwrite").save()
    return time.perf_counter() - t0

out = {{}}
for name in names:
    # MEDIAN of PAIRED ratios over warmed legs, not min of each leg
    # independently: a ratio whose min-of-k denominator (t1, sub-second
    # and noisy) is taken separately from its numerator is biased UPWARD
    # by exactly the jitter the probe exists to strip (observed: a
    # lucky-fast t1 leg pushed a scan-bound query past its band while
    # separate-session min-of-5 legs sat comfortably inside) — while
    # min-over-pairs is biased DOWNWARD (it hunts for a slow
    # denominator, e.g. the cold-codegen first run).  So: one untimed
    # warmup per leg, then 3 adjacent (t1, t10) pairs — adjacency
    # cancels host drift inside each ratio — and the median pair is the
    # reading.
    leg(name, {sf01!r}); leg(name, {fixture!r})  # warm codegen both scales
    pairs = [(leg(name, {sf01!r}), leg(name, {fixture!r})) for _ in range(3)]
    pairs.sort(key=lambda p: p[1] / p[0] if p[0] > 0 else 1e18)
    t1, t10 = pairs[len(pairs) // 2]
    out[name] = {{"t1": round(t1, 3), "t10": round(t10, 3)}}
spark.stop()
print("PROBE_JSON:" + json.dumps(out))
"""


def _probe(names: list[str]) -> dict:
    """Isolated min-of-3 re-measurement of each query at both scales in a
    fresh session (see the confirmation-probe note in main)."""
    code = _PROBE_CODE.format(repo=REPO, sf01=SF01, fixture=FIXTURE)
    res = subprocess.run(
        [sys.executable, "-c", code, json.dumps(names)],
        capture_output=True,
        text=True,
        check=True,
    )
    for line in res.stdout.splitlines():
        if line.startswith("PROBE_JSON:"):
            return json.loads(line[len("PROBE_JSON:"):])
    raise RuntimeError("probe subprocess produced no PROBE_JSON line")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    tag = args[0] if args else "head"
    refit: set[str] = set()
    for a in sys.argv[1:]:
        if a.startswith("--refit="):
            refit = {
                n.strip() for n in a.split("=", 1)[1].split(",") if n.strip()
            }
    os.makedirs(SNAPDIR, exist_ok=True)
    if not os.path.isdir(FIXTURE):
        print(f"[bench_scale] building 10x fixture at {FIXTURE}", file=sys.stderr)
        subprocess.run(
            [
                sys.executable,
                os.path.join(REPO, "scripts", "make_scale_fixture.py"),
                "10",
                SF01,
                FIXTURE,
            ],
            check=True,
        )

    print("[bench_scale] sf0.1 leg", file=sys.stderr)
    leg1 = _run_leg(SF01, os.path.join(SNAPDIR, "BENCH_SF0.1_SCALE_RUN.json"))
    print("[bench_scale] 10x leg", file=sys.stderr)
    leg10 = _run_leg(FIXTURE, os.path.join(SNAPDIR, "BENCH_10X_DETAIL.json"))

    # Host-drift normalization: the legs run back-to-back, but minutes
    # apart — the fixed calibration job measures how much the host itself
    # sped up/slowed down between them (r07 initial run: calib 0.161 ->
    # 0.42 s, a 2.6x slowdown DURING the 10x leg that would otherwise be
    # billed to every query's scaling ratio).  ratio_norm divides that
    # out; bands and the guard use ratio_norm.
    c1, c10 = leg1.get("calib_sec"), leg10.get("calib_sec")
    drift = (c10 / c1) if (c1 and c10) else 1.0
    ratios: dict[str, dict] = {}
    for name, t1 in leg1["queries"].items():
        t10 = leg10["queries"].get(name)
        if t10 is None:
            continue
        raw = t10 / t1 if t1 > 0 else float("inf")
        ratios[name] = {
            "t1": t1,
            "t10": t10,
            "ratio": round(raw, 2),
            "ratio_norm": round(raw / drift, 2) if math.isfinite(raw) else raw,
        }
    report = {
        "round": tag,
        "n_queries": len(ratios),
        "total_t1": leg1["value"],
        "total_t10": leg10["value"],
        "total_ratio": round(leg10["value"] / leg1["value"], 2),
        "total_ratio_norm": round(
            leg10["value"] / leg1["value"] / drift, 2
        ),
        "calib_t1": c1,
        "calib_t10": c10,
        "calib_drift": round(drift, 3),
        # scan-bound host speed of each leg (bench.py's fixed raw-scan
        # probe) — NOT a cross-leg drift divisor (the 10x leg scans a 10x
        # file, so the probe scales with data there), but the host-epoch
        # record that makes a band refit adjudicable: an unchanged query
        # tripping its band while calib_scan_t1 sits 2x above the value in
        # SCALE_BANDS_META.json at fit time is host drift, not a plan.
        "calib_scan_t1": leg1.get("calib_scan_sec"),
        "calib_scan_t10": leg10.get("calib_scan_sec"),
        "queries": ratios,
    }
    bands_path = os.path.join(SNAPDIR, "SCALE_BANDS.json")
    bands: dict[str, float] = {}
    if os.path.exists(bands_path):
        with open(bands_path) as f:
            bands = json.load(f)

    # Confirmation probes: suite-embedded timings on a shared host jitter
    # per-query by 1.5-2x (r08: three DIFFERENT marginal violators across
    # two otherwise-identical runs, while isolated re-measurement of each
    # reproduced its banded ratio exactly).  Any BANDED query whose best
    # suite reading exceeds its band is re-measured in ISOLATION (fresh
    # session, min-of-3 legs per scale, legs adjacent so host drift
    # cancels) before the ledger freezes.  The suite reading STAYS the
    # ledger value; the probe is recorded alongside it (probe_*) and the
    # guard (tests/test_scale_guard.py) passes a banded query if EITHER
    # reading is inside the band.  A genuinely super-linear plan fails the
    # isolated probe just as hard, so the guard keeps its teeth — this
    # only strips suite-position noise, without letting the probe erase
    # the independent suite measurement.
    violators = [
        n
        for n, r in ratios.items()
        if n in bands and min(r["ratio"], r["ratio_norm"]) > bands[n]
    ]
    if violators:
        print(
            f"[bench_scale] probing {len(violators)} suite-reading "
            f"violators in isolation: {violators}",
            file=sys.stderr,
        )
        probed = _probe(violators)
        for n, p in probed.items():
            raw = p["t10"] / p["t1"] if p["t1"] > 0 else float("inf")
            ratios[n] = {
                **ratios[n],
                "probed": True,
                "probe_t1": p["t1"],
                "probe_t10": p["t10"],
                # adjacent legs: drift ~ 1, no normalization needed
                "probe_ratio": round(raw, 2),
            }

    with open(os.path.join(SNAPDIR, "SCALE_RATIOS.json"), "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
        f.write("\n")
    # Band = headroom x the PESSIMISTIC (larger) of the raw and
    # drift-normalized readings: the calibration job is a point sample of
    # a drifting host, so neither reading alone is trustworthy — the max
    # makes first-seen bands generous enough to never false-positive on
    # drift mis-correction, while the guard's min()-side check (see
    # tests/test_scale_guard.py) still catches real regressions.
    meta_path = os.path.join(SNAPDIR, "SCALE_BANDS_META.json")
    meta: dict[str, dict] = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    added = 0
    for name, r in ratios.items():
        is_new = name not in bands
        if (is_new or name in refit) and math.isfinite(r["ratio_norm"]):
            worst_reading = max(r["ratio"], r["ratio_norm"])
            new_band = max(BAND_FLOOR, round(BAND_HEADROOM * worst_reading, 1))
            entry = {
                "band": new_band,
                "fit_round": tag,
                "fit_ratio": worst_reading,
                "calib_t1": c1,
                "calib_scan_t1": report["calib_scan_t1"],
            }
            if not is_new:  # explicit refit: keep the audit trail
                entry["refit_from"] = bands[name]
                print(
                    f"[bench_scale] REFIT band {name}: {bands[name]} -> "
                    f"{new_band} (ratio {worst_reading}, calib_scan_t1 "
                    f"{report['calib_scan_t1']})",
                    file=sys.stderr,
                )
            bands[name] = new_band
            meta[name] = entry
            added += 1
    with open(bands_path, "w") as f:
        json.dump(bands, f, indent=1, sort_keys=True)
        f.write("\n")
    with open(meta_path, "w") as f:
        json.dump(meta, f, indent=1, sort_keys=True)
        f.write("\n")

    print(
        json.dumps(
            {
                "metric": "scale_10x_ratio",
                "value": report["total_ratio"],
                "t1": report["total_t1"],
                "t10": report["total_t10"],
                "n_queries": report["n_queries"],
                "new_bands": added,
                "round": tag,
            },
            separators=(",", ":"),
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
