"""Optimization probe: for each named query, dump
`.explain("formatted")` to plans/$SPARK_GRAFT_PLAN_ROUND/<q>_<tag>.txt
(default r13) and report min-of-k
noop-sink wall clock (guide §1.1/§1.4).  Jobs are labelled so the UI/event
log attributes time per query.

Usage: python scripts/opt_probe.py TAG SF_DIR q_a q_b ...
  TAG      'before' / 'after' (plan file suffix), or 'time' to skip plans
  reps     $SPARK_GRAFT_TIME_REPS (default 3)
Prints one JSON line {"queries": {name: sec}, "plans": [...]}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from real_time_iot_data_engineering_pipeline_spark import registry
from real_time_iot_data_engineering_pipeline_spark.session import build_session

tag, sf_dir, names = sys.argv[1], sys.argv[2], sys.argv[3:]
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
plan_dir = os.path.join(
    repo, "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r13")
)
os.makedirs(plan_dir, exist_ok=True)

registry.load_all()
spark = build_session(app_name=f"opt-probe-{tag}")
spark.sparkContext.setLogLevel("ERROR")
registry.QUERIES["q_tumbling_agg"](spark, sf_dir).write.format("noop").mode(
    "overwrite"
).save()  # warm the JVM/codegen

reps = int(os.environ.get("SPARK_GRAFT_TIME_REPS", "3"))
out, plans = {}, []
for n in names:
    if tag != "time":
        import contextlib
        import io

        df = registry.QUERIES[n](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        p = os.path.join(plan_dir, f"{n}_{tag}.txt")
        with open(p, "w") as f:
            f.write(buf.getvalue())
        plans.append(os.path.relpath(p, repo))
    best = None
    for _ in range(reps):
        spark.sparkContext.setJobDescription(f"{tag}:{n}")
        t0 = time.perf_counter()
        registry.QUERIES[n](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    out[n] = round(best, 3)
    print(f"[probe] {n}: {out[n]}", file=sys.stderr, flush=True)
print(json.dumps({"sf_dir": sf_dir, "tag": tag, "queries": out,
                  "plans": plans}), flush=True)
spark.stop()
