"""Round-13 core-scaling artifact (VERDICT r12 #4): the driver's 8-vs-32
core scaling leg runs at sf0.1, where every headline query is
fixed-overhead-bound and reads ratio ~1 — parallelism is unmeasurable
from PERF.  This script measures the SAME 19 headline queries on the 10x
derived fixture (scripts/make_scale_fixture.py output) at 8 and 32 cores,
PAIRED per query: for each query the 32-core and 8-core probes run
back-to-back in adjacent subprocess sessions (alternating which leg goes
first per round) so host drift cancels inside each ratio, min across
rounds.  Writes bench_snapshots/CORE_SCALING_10X.json.

Usage: python scripts/core_scaling.py [rounds=2]
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.environ.get(
    "SPARK_GRAFT_SCALE_DIR", os.path.join(REPO, ".scale", "sf1")
)
SNAP = os.path.join(REPO, "bench_snapshots", "CORE_SCALING_10X.json")

sys.path.insert(0, REPO)
from bench import HEADLINE  # noqa: E402

_PROBE = """
import json, sys, time
sys.path.insert(0, {repo!r})
from real_time_iot_data_engineering_pipeline_spark.session import build_session
from real_time_iot_data_engineering_pipeline_spark import registry
registry.load_all()
spark = build_session(app_name="core-scaling")
spark.sparkContext.setLogLevel("ERROR")
names = json.loads(sys.argv[1])
registry.QUERIES["q_tumbling_agg"](spark, {fixture!r}).write.format(
    "noop").mode("overwrite").save()
out = {{}}
for n in names:
    best = None
    for _ in range(2):
        spark.sparkContext.setJobDescription("core-scaling:" + n)
        t0 = time.perf_counter()
        registry.QUERIES[n](spark, {fixture!r}).write.format("noop").mode(
            "overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    out[n] = round(best, 3)
spark.stop()
print("PROBE_JSON:" + json.dumps(out))
"""


def leg(cpus: int, names: list[str]) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    code = _PROBE.format(repo=REPO, fixture=FIXTURE)
    res = subprocess.run(
        [sys.executable, "-c", code, json.dumps(names)],
        capture_output=True,
        text=True,
        check=True,
        env=env,
    )
    for line in res.stdout.splitlines():
        if line.startswith("PROBE_JSON:"):
            return json.loads(line[len("PROBE_JSON:"):])
    raise RuntimeError("no PROBE_JSON from leg")


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    if not os.path.isdir(FIXTURE):
        raise SystemExit(f"10x fixture missing at {FIXTURE} — run "
                         "scripts/make_scale_fixture.py 10 first")
    t32 = {n: float("inf") for n in HEADLINE}
    t8 = {n: float("inf") for n in HEADLINE}
    for r in range(rounds):
        order = [(32, t32), (8, t8)]
        if r % 2:  # alternate which leg goes first so drift cancels
            order.reverse()
        for cpus, acc in order:
            got = leg(cpus, HEADLINE)
            print(f"[core_scaling] round {r} cpus={cpus}: {got}",
                  file=sys.stderr, flush=True)
            for n, t in got.items():
                acc[n] = min(acc[n], t)
    report = {
        "fixture": FIXTURE,
        "cpus_high": 32,
        "cpus_low": 8,
        "rounds": rounds,
        "queries": {
            n: {
                "t32": t32[n],
                "t8": t8[n],
                # speedup of 4x cores; 4.0 = perfect, 1.0 = serial
                "core_speedup": round(t8[n] / t32[n], 2)
                if t32[n] > 0
                else None,
            }
            for n in HEADLINE
        },
    }
    with open(SNAP, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps({
        "metric": "core_scaling_10x",
        "n_queries": len(HEADLINE),
        "median_speedup": sorted(
            v["core_speedup"] for v in report["queries"].values()
        )[len(HEADLINE) // 2],
    }))


if __name__ == "__main__":
    main()
