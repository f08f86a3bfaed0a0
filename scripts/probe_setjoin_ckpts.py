"""Round-13 one-off (VERDICT r12 #2): q_jaccard_setjoin regressed +51% in
every r12 artifact after two eager checkpoints (`sets`, `pref`) were added;
A/B each checkpoint independently by no-op'ing localCheckpoint PER CALL
INDEX (the query calls it in a fixed order: 0=toks, 1=sets, 2=pref),
interleaving variants inside one session so load bands hit all equally.

Usage: python scripts/probe_setjoin_ckpts.py SF_DIR REPS
Prints one JSON line {variant: [secs...]}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import DataFrame  # noqa: E402

from real_time_iot_data_engineering_pipeline_spark import registry  # noqa: E402
from real_time_iot_data_engineering_pipeline_spark.session import (  # noqa: E402
    build_session,
)

VARIANTS = {
    "toks+sets+pref": {0, 1, 2},  # current code
    "toks+sets": {0, 1},
    "toks+pref": {0, 2},
    "toks": {0},  # pre-r12 form
}

_real_ckpt = DataFrame.localCheckpoint
_active: set = set()
_call_no = [0]


def _selective_ckpt(self, eager=True):
    i = _call_no[0]
    _call_no[0] += 1
    if i in _active:
        return _real_ckpt(self, eager=eager)
    return self


def main() -> None:
    sf_dir, reps = sys.argv[1], int(sys.argv[2])
    registry.load_all()
    spark = build_session(app_name="probe-setjoin-ckpts")
    spark.sparkContext.setLogLevel("ERROR")
    q = registry.QUERIES["q_jaccard_setjoin"]
    q(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    out = {v: [] for v in VARIANTS}
    DataFrame.localCheckpoint = _selective_ckpt
    try:
        for r in range(reps):
            for name, active in VARIANTS.items():
                _active.clear()
                _active.update(active)
                _call_no[0] = 0
                spark.sparkContext.setJobDescription(f"setjoin:{name}:{r}")
                t0 = time.perf_counter()
                q(spark, sf_dir).write.format("noop").mode("overwrite").save()
                out[name].append(round(time.perf_counter() - t0, 3))
                print(
                    f"[probe] {name} r{r}: {out[name][-1]}",
                    file=sys.stderr,
                    flush=True,
                )
    finally:
        DataFrame.localCheckpoint = _real_ckpt
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
