"""Interleaved in-process A/B: time a query with localCheckpoint active
(variant 'ckpt' = working-tree code) vs no-op'd (variant 'none' ~= the
pre-checkpoint code when checkpoints are the only diff), alternating reps
inside ONE Spark session so host-load bands hit both variants equally.

Usage: python scripts/ab_probe.py SF_DIR REPS q_name [q_name ...]
Prints one JSON line {name: {"ckpt": [..], "none": [..]}}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import DataFrame

from real_time_iot_data_engineering_pipeline_spark import registry
from real_time_iot_data_engineering_pipeline_spark.session import build_session

sf_dir, reps, names = sys.argv[1], int(sys.argv[2]), sys.argv[3:]
registry.load_all()
spark = build_session(app_name="ab-probe")
spark.sparkContext.setLogLevel("ERROR")
registry.QUERIES["q_tumbling_agg"](spark, sf_dir).write.format("noop").mode(
    "overwrite"
).save()

_real_ckpt = DataFrame.localCheckpoint


def _noop_ckpt(self, eager=True):
    return self


out = {}
for n in names:
    out[n] = {"ckpt": [], "none": []}
    for r in range(reps):
        for variant in ("ckpt", "none"):
            DataFrame.localCheckpoint = (
                _real_ckpt if variant == "ckpt" else _noop_ckpt
            )
            spark.sparkContext.setJobDescription(f"ab:{n}:{variant}:{r}")
            t0 = time.perf_counter()
            registry.QUERIES[n](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            out[n][variant].append(round(time.perf_counter() - t0, 3))
            print(
                f"[ab] {n} {variant} r{r}: {out[n][variant][-1]}",
                file=sys.stderr,
                flush=True,
            )
    DataFrame.localCheckpoint = _real_ckpt
print(json.dumps(out), flush=True)
spark.stop()
