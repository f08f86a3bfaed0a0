#!/usr/bin/env python
"""Benchmark harness: runs EVERY registered query (headline set first, then
the rest of the suite) at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line: {"metric": ...,
"value": total_sec, "unit": "sec", "queries": {headline: sec}, "sf": ...,
"n_queries": N, "detail": "BENCH_DETAIL.json"}.  The printed line carries
the headline-per-family queries only so it fits the driver's 2000-byte
stdout capture; the FULL per-query dict (every registered query) is written
to BENCH_DETAIL.json alongside this script.  The total covers the full
suite and therefore grows when operators are added; use the per-query
timings in BENCH_DETAIL.json for round-over-round regression comparison.

Each query is forced end-to-end with a noop-format write (full computation,
no driver collect, no sink I/O skew).  Includes a warmup query so JVM/codegen
startup isn't billed to the first measurement.

Each query is timed $SPARK_GRAFT_BENCH_REPS times (default 2) and the
MINIMUM is reported: repeated whole-suite runs on this host vary by up to
~2x under external load (identical code measured 71 s / 107 s / 155 s /
85 s back-to-back), and min-of-k is the standard way to estimate the
noise-free cost of a deterministic computation.  The policy is applied
uniformly, stated here, and overridable (REPS=1 reproduces the
single-shot protocol of BENCH_r01/r02).

Round-12 de-noising (VERDICT r11 #2): the r≤11 protocol ran the suite in
ONE alphabetical pass with back-to-back reps, so a roving host-load band
inflated a contiguous alphabetical stretch of queries (12 over-bar rows in
the driver's r11 artifact vs 1 in the committed min-of-3 — nine of twelve
in the q_se..q_sk stretch).  Now the reps are INTERLEAVED ACROSS THE
SUITE: rep k is a full pass over every query in a seeded-random order
(seed = $SPARK_GRAFT_BENCH_SEED(default 12) + k, deterministic per rep,
different between reps), and each query's reported time is the min across
passes.  A load band lasting minutes now hits a DIFFERENT random subset
of queries in each pass, so the per-query min is band-free whenever any
single pass dodged the band — instead of requiring the band to miss the
same alphabetical stretch twice in a row.  A per-PASS calibration probe
(same fixed JVM job as the session calib) is recorded in calib_per_pass
so a loaded pass is identifiable from the artifact alone.

Machine adjudication: the detail file now carries over_bar — every query
whose min-across-passes exceeds 2x its first-seen baseline
(bench_snapshots/BASELINES.json), with its ratio — so the round protocol
is "re-run the flagged rows only" instead of hand-diffing 300 timings:
  SPARK_GRAFT_BENCH_ONLY=q_a,q_b SPARK_GRAFT_BENCH_REPS=5 python bench.py
restricts the run to the named queries (full protocol, own detail file).
"""

from __future__ import annotations

import hashlib
import json
import os
import random
import sys
import re
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from real_time_iot_data_engineering_pipeline_spark import registry
from real_time_iot_data_engineering_pipeline_spark.session import build_session

# Headline set: the flagship + one representative per operator family.
HEADLINE = [
    "q_tumbling_agg",
    "q_hourly_agg",
    "q_validate_reasons",
    "q_route_dlq",
    "q_dedup_window",
    "q_upsert_last_write_wins",
    "q_join_broadcast",
    "q_join_anti",
    "q_rolling_7d",
    "q_zscore_flag",
    "q_topk_per_group",
    "q_sudden_change",
    "q_incremental_scan",
    "q_quality_ratios",
    "q_validate_iot",
    "q_doc_dedup_minhash",
    "q_embed_knn_lsh",
    "q_text_stats",
    "q_multimodal_features",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0
    spark = build_session(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    registry.load_all()
    names = [n for n in HEADLINE if n in registry.QUERIES]
    names += [n for n in sorted(registry.QUERIES) if n not in names]
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").strip()
    if only:
        wanted = {n.strip() for n in only.split(",") if n.strip()}
        unknown = wanted - set(registry.QUERIES)
        if unknown:
            raise SystemExit(f"SPARK_GRAFT_BENCH_ONLY unknown: {sorted(unknown)}")
        names = [n for n in names if n in wanted]

    # Warmup: JVM + codegen + parquet footer reads.
    registry.QUERIES["q_tumbling_agg"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    # Host-speed calibration: identical code measured 162.7 s vs 259.3 s
    # for the whole suite on the same machine on the same day (round 6/7),
    # with per-query ratios uniformly shifted (~1.57x median, p10 1.26 /
    # p90 1.93 — multiplicative host noise, not any query's plan).  A
    # fixed pure-JVM reference job timed in the same session turns that
    # into a measurable: compare `calib_sec` across runs to normalize
    # totals before reading a round-over-round delta as a regression.
    def calib_probe() -> float:
        t0 = time.perf_counter()
        spark.range(0, 200_000_000, 1, 32).selectExpr(
            "sum(id * 3 + 1) AS s"
        ).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # Second probe: SCAN-bound host speed.  The pure-JVM compute probe
    # above misses a host-drift mode observed at r12: single-thread
    # parquet-scan cost rose ~2x across rounds while 32-way compute rose
    # ~20%, which inflates every short scan-dominated query uniformly
    # (the whole sub-second over-bar class).  A fixed raw scan of the
    # benched fixture's events table turns that into a recorded
    # measurable: normalize a short query's ratio by calib_scan drift
    # before reading it as a regression.
    def calib_scan_probe() -> float:
        t0 = time.perf_counter()
        spark.read.parquet(os.path.join(sf_dir, "events.parquet")).write.format(
            "noop"
        ).mode("overwrite").save()
        return time.perf_counter() - t0

    calib = round(min(calib_probe() for _ in range(3)), 3)
    calib_scan = round(min(calib_scan_probe() for _ in range(3)), 3)

    # Interleaved seeded-random passes (see module docstring): rep k = one
    # full pass over the suite in order shuffle(seed + k); per-query min
    # across passes.  calib_per_pass pins each pass's host speed.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))
    seed = int(os.environ.get("SPARK_GRAFT_BENCH_SEED", "12"))
    timings: dict[str, float] = {n: float("inf") for n in names}
    calib_per_pass: list[float] = []
    # TIMED-LOOP-START  (hashed into timed_loop_sha below: any edit to the
    # timing methodology is detectable from the artifact alone — VERDICT
    # r12 #8, after PERF r12 mis-reported bench_harness_changed=false)
    for k in range(reps):
        order = list(names)
        random.Random(seed + k).shuffle(order)
        calib_per_pass.append(round(calib_probe(), 3))
        for name in order:
            print(f"[bench] pass {k} {name}", file=sys.stderr, flush=True)
            t0 = time.perf_counter()
            registry.QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            timings[name] = min(timings[name], time.perf_counter() - t0)
    # TIMED-LOOP-END
    timings = {n: round(t, 3) for n, t in timings.items()}
    with open(os.path.abspath(__file__)) as f:
        src = f.read()
    loop_src = src.split("# TIMED-LOOP-START")[1].split("# TIMED-LOOP-END")[0]
    timed_loop_sha = hashlib.sha256(loop_src.encode()).hexdigest()[:12]

    # Machine adjudication vs first-seen baselines: ratio > 2.0 is the
    # contract bar; the over_bar dict IS the round's re-run worklist.
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    over_bar: dict[str, float] = {}
    ratios: dict[str, float] = {}
    if sf == 0.1:
        try:
            with open(
                os.path.join(repo_dir, "bench_snapshots", "BASELINES.json")
            ) as f:
                baselines = json.load(f)
        except OSError:
            baselines = {}
        for n, t in timings.items():
            base = baselines.get(n, {}).get("seconds")
            if base:
                ratios[n] = round(t / base, 2)
                if ratios[n] > 2.0:
                    over_bar[n] = ratios[n]

    total = round(sum(timings.values()), 3)
    summary = {
        "metric": "engine_queries_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_queries": len(timings),
        "calib_sec": calib,
        "calib_scan_sec": calib_scan,
        "calib_per_pass": calib_per_pass,
        "bench_seed": seed,
        "reps": reps,
        "timed_loop_sha": timed_loop_sha,
        "baseline_ratios": ratios,
        "over_bar": over_bar,
    }
    # The driver records only the last ~2000 bytes of stdout; the full
    # 117-query dict (~3.5 KB) overflowed that window in round 3
    # (BENCH_r03.json shipped with parsed:null).  Full per-query detail goes
    # to BENCH_DETAIL.json (committed, judge-readable); stdout gets ONE
    # compact line with the totals plus the headline-per-family timings,
    # sized to survive the capture.
    # BENCH_DETAIL.json is the committed, round-over-round-comparable
    # artifact and must stay at the driver's sf (0.1); an iteration run at
    # another sf writes a sibling file instead of silently replacing it
    # (round-5 ADVICE: the committed detail once shipped as an sf0.01 run).
    default_name = (
        "BENCH_DETAIL.json" if sf == 0.1 else f"BENCH_DETAIL_sf{sf}.json"
    )
    if only:  # a flagged-rows re-run must never replace the full-suite artifact
        default_name = "BENCH_DETAIL_only.json"
    detail_path = os.environ.get(
        "SPARK_GRAFT_DETAIL",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), default_name),
    )
    with open(detail_path, "w") as f:
        json.dump(summary, f, separators=(",", ":"))
        f.write("\n")
    # Per-ROUND snapshot (round-9 verdict ask #1): BENCH_DETAIL.json is
    # overwritten every run, which destroyed the r08 per-query numbers when
    # r09 ran.  Snapshot each driver-sf run under bench_snapshots/ keyed by
    # the round being built (latest committed BENCH_r*.json + 1), so
    # round-over-round per-query diffs stay reproducible from git alone.
    if sf == 0.1 and not only:
        repo = os.path.dirname(os.path.abspath(__file__))
        rounds = [
            int(m.group(1))
            for p in os.listdir(repo)
            if (m := re.match(r"BENCH_r(\d+)\.json$", p))
        ]
        building = (max(rounds) if rounds else 0) + 1
        snap = os.path.join(
            repo, "bench_snapshots", f"BENCH_DETAIL_r{building:02d}.json"
        )
        with open(snap, "w") as f:
            json.dump(summary, f, separators=(",", ":"))
            f.write("\n")
    compact = dict(summary)
    compact["queries"] = {n: timings[n] for n in names[: len(HEADLINE)]}
    compact.pop("baseline_ratios", None)  # 300 entries — detail-file only
    compact["detail"] = os.path.basename(detail_path)
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1800:  # hard guard: never ship an unparseable artifact again
        compact["queries"] = {}
        compact["over_bar"] = {}
        line = json.dumps(compact, separators=(",", ":"))
    print(line, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
