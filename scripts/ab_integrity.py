"""One-off interleaved A/B for q_integrity_audit's `grouped` table:
persist(MEMORY_AND_DISK) (current) vs eager localCheckpoint vs neither,
alternating inside ONE session so load bands hit all variants equally.

Usage: python scripts/ab_integrity.py SF_DIR REPS
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import DataFrame

from real_time_iot_data_engineering_pipeline_spark import registry
from real_time_iot_data_engineering_pipeline_spark.session import build_session

sf_dir, reps = sys.argv[1], int(sys.argv[2])
registry.load_all()
spark = build_session(app_name="ab-integrity")
spark.sparkContext.setLogLevel("ERROR")
registry.QUERIES["q_tumbling_agg"](spark, sf_dir).write.format("noop").mode(
    "overwrite"
).save()

real_persist = DataFrame.persist
real_ckpt = DataFrame.localCheckpoint

out = {"persist": [], "ckpt": [], "none": []}
for r in range(reps):
    for variant in ("persist", "ckpt", "none"):
        if variant == "persist":
            DataFrame.persist = real_persist
        elif variant == "ckpt":
            DataFrame.persist = lambda self, *_a, **_k: real_ckpt(
                self, eager=True
            )
        else:
            DataFrame.persist = lambda self, *_a, **_k: self
        spark.sparkContext.setJobDescription(f"ab-integrity:{variant}:{r}")
        t0 = time.perf_counter()
        registry.QUERIES["q_integrity_audit"](spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
        out[variant].append(round(time.perf_counter() - t0, 3))
        print(f"[ab] {variant} r{r}: {out[variant][-1]}", file=sys.stderr)
DataFrame.persist = real_persist
print(json.dumps(out), flush=True)
spark.stop()
