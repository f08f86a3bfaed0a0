"""Interleaved in-process A/B for the fixpoint job-fusion question: time a
query with lazy per-round checkpoints (variant 'fused': localCheckpoint
FORCED to eager=False, so the round's convergence count is the
materializing action — one job per round) vs eager ones (variant 'eager':
forced eager=True, materialization and count as separate jobs).
Alternating reps inside ONE Spark session so host-load bands hit both
variants equally (same protocol as ab_probe.py).

NOTE: the r12 fusion experiment was REVERTED — the working tree passes
eager=True explicitly (components.py) — so BOTH variants monkeypatch: the
probe stays a valid A/B of the fusion idea regardless of what the tree
code passes (measured r12: job count does not drop under AQE; kept for
re-probing on future Spark versions or a real cluster).

Usage: python scripts/ab_eager.py SF_DIR REPS q_name [q_name ...]
Prints one JSON line {name: {"fused": [..], "eager": [..]}}.
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
spark = build_session(app_name="ab-eager")
spark.sparkContext.setLogLevel("ERROR")
registry.QUERIES["q_tumbling_agg"](spark, sf_dir).write.format("noop").mode(
    "overwrite"
).save()

_real_ckpt = DataFrame.localCheckpoint


def _force_eager(self, eager=True):
    return _real_ckpt(self, eager=True)


def _force_lazy(self, eager=True):
    return _real_ckpt(self, eager=False)


out = {}
try:
    for n in names:
        out[n] = {"fused": [], "eager": []}
        for r in range(reps):
            for variant in ("fused", "eager"):
                DataFrame.localCheckpoint = (
                    _force_lazy if variant == "fused" else _force_eager
                )
                spark.sparkContext.setJobDescription(
                    f"ab-eager:{n}:{variant}:{r}"
                )
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
finally:
    DataFrame.localCheckpoint = _real_ckpt
print(json.dumps(out), flush=True)
spark.stop()
