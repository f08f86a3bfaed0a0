"""functions/prefix.py property tests: the two-phase bucketed prefix
operators must be BIT-IDENTICAL to their single-partition-window forms —
ranks as integers, running sums up to float-regrouping ULPs — on data with
ties, skew, negatives, and tiny bucket counts that force rows across many
buckets (buckets=4 on 60 rows exercises bucket boundaries hard)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from real_time_iot_data_engineering_pipeline_spark.functions.prefix import (
    bucketed_row_number,
    bucketed_running_sum,
    ntile_from_rank,
)


def _fixture(spark):
    # values with heavy ties (including the min and max), negatives, and a
    # skewed cluster at 7.5 — every edge the bucket arithmetic must survive
    rows = []
    vals = [-3.0, -3.0, 0.0, 0.25, 7.5, 7.5, 7.5, 7.5, 7.5, 12.0]
    for i in range(60):
        rows.append((i, vals[i % len(vals)], float(i % 7)))
    return spark.createDataFrame(rows, "id long, v double, x double")


@pytest.mark.parametrize("descending", [False, True])
@pytest.mark.parametrize("buckets", [1, 4, 1024])
def test_bucketed_row_number_matches_global_window(spark, descending, buckets):
    df = _fixture(spark)
    got = bucketed_row_number(
        df, "v", ["id"], descending=descending, buckets=buckets
    )
    order = [F.col("v").desc() if descending else F.col("v").asc(), F.col("id")]
    want = df.withColumn(
        "rk", F.row_number().over(Window.orderBy(*order)).cast("long")
    )
    gp = {r["id"]: r["rk"] for r in got.collect()}
    wp = {r["id"]: r["rk"] for r in want.collect()}
    assert gp == wp


@pytest.mark.parametrize("descending", [False, True])
def test_bucketed_running_sum_matches_global_window(spark, descending):
    df = _fixture(spark)
    got = bucketed_running_sum(
        df, "v", "x", ["id"], descending=descending, out_col="rs", buckets=4
    )
    order = [F.col("v").desc() if descending else F.col("v").asc(), F.col("id")]
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    want = df.withColumn("rs", F.sum("x").over(w))
    gp = {r["id"]: r["rs"] for r in got.collect()}
    wp = {r["id"]: r["rs"] for r in want.collect()}
    assert gp.keys() == wp.keys()
    for k in gp:
        # regrouped float addition: equal up to accumulated ULPs
        assert gp[k] == pytest.approx(wp[k], rel=1e-12, abs=1e-9), k


def test_constant_value_collapses_to_one_bucket(spark):
    df = spark.createDataFrame(
        [(i, 5.0) for i in range(20)], "id long, v double"
    )
    got = bucketed_row_number(df, "v", ["id"], buckets=64)
    ranks = sorted(r["rk"] for r in got.collect())
    assert ranks == list(range(1, 21))


@pytest.mark.parametrize("n,tiles", [(7, 10), (10, 10), (23, 10), (100, 7), (1, 4)])
def test_ntile_from_rank_matches_spark_ntile(spark, n, tiles):
    df = spark.createDataFrame([(i,) for i in range(1, n + 1)], "rk long")
    got = df.select(
        "rk", ntile_from_rank(F.col("rk"), F.lit(n).cast("long"), tiles).alias("t")
    )
    want = spark.createDataFrame(
        [(i,) for i in range(1, n + 1)], "rk long"
    ).withColumn("t", F.ntile(tiles).over(Window.orderBy("rk")).cast("long"))
    gp = {r["rk"]: r["t"] for r in got.collect()}
    wp = {r["rk"]: r["t"] for r in want.collect()}
    assert gp == wp


def test_bucketed_plan_has_no_single_partition_window_over_data(spark):
    """The data-sized window must be bucket-partitioned; only the <=B-row
    offsets window may be unpartitioned."""
    import re

    df = _fixture(spark)
    plan = (
        bucketed_row_number(df, "v", ["id"], buckets=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    specs = [
        m.group(1)
        for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan)
    ]
    assert specs
    data_sized = [s for s in specs if "v#" in s]  # ordered by the value col
    for s in data_sized:
        assert "bkt" in s, s
