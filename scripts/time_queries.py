"""Min-of-k wall-clock for a subset of queries at a given fixture dir
(k = $SPARK_GRAFT_TIME_REPS, default 2; the isolated-probe protocol for
bench-bar violators uses 3).
Usage: python scripts/time_queries.py SF_DIR q_a q_b ...  -> JSON line."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from real_time_iot_data_engineering_pipeline_spark import registry
from real_time_iot_data_engineering_pipeline_spark.session import build_session

sf_dir, names = sys.argv[1], sys.argv[2:]
registry.load_all()
spark = build_session(app_name="time-queries")
registry.QUERIES["q_tumbling_agg"](spark, sf_dir).write.format("noop").mode(
    "overwrite"
).save()  # warm the session
reps = int(os.environ.get("SPARK_GRAFT_TIME_REPS", "2"))
out = {}
for n in names:
    best = None
    for _ in range(reps):
        t0 = time.monotonic()
        registry.QUERIES[n](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    out[n] = round(best, 3)
print(json.dumps({"sf_dir": sf_dir, "queries": out}), flush=True)
spark.stop()
