"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)     -> flagship query on /root/testdata/sf0.001
queries()        -> {name: (spark, sf_dir) -> DataFrame} per SURVEY.md §2
oracle_sql()     -> {name: ANSI SQL} DuckDB oracles for the same queries
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from real_time_iot_data_engineering_pipeline_spark import registry  # noqa: E402

registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's signature computation — 5-minute
    tumbling-window keyed aggregate (streaming_job.py:278-353) over the
    sf0.001 events fixture."""
    return registry.QUERIES["q_tumbling_agg"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLES)
