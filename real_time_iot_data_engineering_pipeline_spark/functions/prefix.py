"""Two-phase bucketed prefix operators: exact global ranks and running
sums without a single-partition window.

Spark compiles an unpartitioned ``Window.orderBy(...)`` to a
SinglePartition exchange — every row funnels through ONE task, the
classic WindowExec straggler that breaks first at scale.  For total-order
statistics over *pre-reduced* entity tables (per-user totals, per-customer
revenue, per-part revenue) the row counts are |entities|, which at 100 TB
is still billions — too big for one task, but perfectly shaped for a
two-phase prefix plan:

1. map each row arithmetically into one of B ORDER-PRESERVING value-range
   buckets (pure monotone arithmetic on (value - min)·B/(max - min) — no
   sampling, no sort, deterministic across engines and partitionings);
2. run the window PARTITIONED by bucket (each task holds ~|rows|/B);
3. aggregate per-bucket counts/sums — a ≤B-row table — and prefix-sum
   THAT with the only unpartitioned window, bounded by construction;
4. broadcast the offsets back and add.

Ranks are integer arithmetic, so the two-phase result is bit-identical to
the single-window result.  Running *float* sums regroup the additions
(bucket-local then offset), which can differ from strict sequential
summation by ULPs — callers quantize derived comparisons (e.g. fround at
9 dp) exactly as they already must for cross-engine parity.

Skewed value distributions concentrate rows into few buckets; the bound
degrades toward the single-task shape only if nearly ALL mass shares one
value — in which case no exact total-order plan does better.  B is a
constant (default 1024) chosen so the offsets table always broadcasts.

Below the adaptive scale switch (sources/tables.is_large_input, same
crossover as q_rank_per_group's bucketed rank) the restructuring overhead
— two extra broadcast joins and the bucket bookkeeping — costs more than
the single sort it avoids (measured ~2-3x at sf0.1), so callers pass
``bucketed=is_large_input(sf_dir, table)`` and small inputs take the
plain unpartitioned window.  Both paths are bit-identical for ranks and
ULP-identical for running sums (tests/test_prefix.py pins equivalence;
the driver-facing queries pin BOTH paths against the DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 1024


def _with_bucket(
    df: DataFrame, value_col: str, *, descending: bool, buckets: int
) -> DataFrame:
    """Add an order-preserving ``bkt`` column: monotone non-decreasing in
    the requested sort direction of ``value_col``.  Ties in value always
    share a bucket, so any within-bucket tiebreak ordering is global."""
    stats = df.agg(
        F.min(value_col).alias("_mn"), F.max(value_col).alias("_mx")
    )
    v = F.col(value_col).cast("double")
    mn = F.col("_mn").cast("double")
    mx = F.col("_mx").cast("double")
    # distance from the FIRST value in sort order; floor of a monotone map
    # is monotone, and IEEE *, / by a positive constant round monotonically
    dist = (mx - v) if descending else (v - mn)
    span = mx - mn
    raw = F.floor(dist * F.lit(float(buckets)) / span).cast("long")
    bkt = F.when(span == 0.0, F.lit(0).cast("long")).otherwise(
        F.least(F.lit(buckets - 1).cast("long"), F.greatest(F.lit(0).cast("long"), raw))
    )
    return df.join(F.broadcast(stats)).withColumn("bkt", bkt).drop("_mn", "_mx")


def bucketed_row_number(
    df: DataFrame,
    value_col: str,
    tiebreak_cols: list[str],
    *,
    descending: bool = False,
    rank_col: str = "rk",
    buckets: int = DEFAULT_BUCKETS,
    bucketed: bool = True,
) -> DataFrame:
    """Exact global ``row_number()`` over (value_col [DESC], *tiebreak_cols)
    as a bucket-partitioned window plus integer offsets — bit-identical to
    the unpartitioned form, with no single-task sort of the data.

    ``bucketed=False`` emits the plain unpartitioned window instead: the
    right plan below the adaptive scale switch, where one task sorts the
    whole (pre-reduced) input faster than the two-phase bookkeeping."""
    order = [
        F.col(value_col).desc() if descending else F.col(value_col).asc()
    ] + [F.col(c).asc() for c in tiebreak_cols]
    if not bucketed:
        return df.withColumn(
            rank_col, F.row_number().over(Window.orderBy(*order)).cast("long")
        )
    bucketed_df = _with_bucket(df, value_col, descending=descending, buckets=buckets)
    w_local = Window.partitionBy("bkt").orderBy(*order)
    w_off = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        bucketed_df.groupBy("bkt")
        .agg(F.count("*").cast("long").alias("_bn"))
        .withColumn(
            "_off",
            F.coalesce(F.sum("_bn").over(w_off), F.lit(0)).cast("long"),
        )
        .select("bkt", "_off")
    )
    return (
        bucketed_df.withColumn("_lr", F.row_number().over(w_local).cast("long"))
        .join(F.broadcast(offsets), "bkt")
        .withColumn(rank_col, F.col("_lr") + F.col("_off"))
        .drop("bkt", "_lr", "_off")
    )


def bucketed_running_sum(
    df: DataFrame,
    value_col: str,
    sum_col: str,
    tiebreak_cols: list[str],
    *,
    descending: bool = False,
    out_col: str = "running_sum",
    buckets: int = DEFAULT_BUCKETS,
    bucketed: bool = True,
) -> DataFrame:
    """Exact-order global running sum of ``sum_col`` over
    (value_col [DESC], *tiebreak_cols).  Regroups float additions
    (bucket-local + bucket offsets): derived comparisons must be quantized
    (fround) on both engines, as cross-engine parity already requires.

    ``bucketed=False`` emits the plain unpartitioned cumulative window —
    the right plan below the adaptive scale switch (and strictly
    sequential addition, so no regrouping at all)."""
    order = [
        F.col(value_col).desc() if descending else F.col(value_col).asc()
    ] + [F.col(c).asc() for c in tiebreak_cols]
    if not bucketed:
        w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
        return df.withColumn(out_col, F.sum(sum_col).over(w))
    bucketed_df = _with_bucket(df, value_col, descending=descending, buckets=buckets)
    w_local = Window.partitionBy("bkt").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_off = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        bucketed_df.groupBy("bkt")
        .agg(F.sum(sum_col).alias("_bs"))
        .withColumn("_off", F.coalesce(F.sum("_bs").over(w_off), F.lit(0.0)))
        .select("bkt", "_off")
    )
    return (
        bucketed_df.withColumn("_ls", F.sum(sum_col).over(w_local))
        .join(F.broadcast(offsets), "bkt")
        .withColumn(out_col, F.col("_ls") + F.col("_off"))
        .drop("bkt", "_ls", "_off")
    )


def ntile_from_rank(rank: Column, n: Column, tiles: int) -> Column:
    """SQL ``ntile(tiles)`` computed arithmetically from a global rank:
    with n rows, the first n % tiles tiles hold ceil(n/tiles) rows and the
    rest floor(n/tiles) — identical to Spark's and DuckDB's ntile."""
    q = F.floor(n / tiles).cast("long")
    r = (n % tiles).cast("long")
    big = r * (q + 1)  # rows covered by the (q+1)-sized leading tiles
    return (
        F.when(rank <= big, F.ceil(rank / (q + 1)))
        .otherwise(r + F.ceil((rank - big) / q))
        .cast("long")
    )


def grouped_bucketed_row_number(
    df: DataFrame,
    part_cols: list[str],
    value_col: str,
    tiebreak_cols: list[str],
    *,
    descending: bool = False,
    rank_col: str = "rk",
    buckets: int = DEFAULT_BUCKETS,
    bucketed: bool = True,
) -> DataFrame:
    """Per-group exact ``row_number()`` over (value_col [DESC],
    *tiebreak_cols) WITHIN each part_cols group — the partitioned twin of
    bucketed_row_number, for low-cardinality grouping keys (language,
    source) where Window.partitionBy(part_cols) alone would sort each
    group in ONE task however large the group grows.

    Bucket boundaries come from per-group min/max (broadcast); local
    ranks run per (group, bucket) and per-group bucket offsets restore
    the exact global-within-group rank.  ``bucketed=False`` emits the
    plain partitioned window — right below the adaptive scale switch."""
    order = [
        F.col(value_col).desc() if descending else F.col(value_col).asc()
    ] + [F.col(c).asc() for c in tiebreak_cols]
    if not bucketed:
        w = Window.partitionBy(*part_cols).orderBy(*order)
        return df.withColumn(rank_col, F.row_number().over(w).cast("long"))
    stats = df.groupBy(*part_cols).agg(
        F.min(value_col).alias("_mn"), F.max(value_col).alias("_mx")
    )
    v = F.col(value_col).cast("double")
    mn = F.col("_mn").cast("double")
    mx = F.col("_mx").cast("double")
    dist = (mx - v) if descending else (v - mn)
    span = mx - mn
    raw = F.floor(dist * F.lit(float(buckets)) / span).cast("long")
    bkt = F.when(span == 0.0, F.lit(0).cast("long")).otherwise(
        F.least(
            F.lit(buckets - 1).cast("long"),
            F.greatest(F.lit(0).cast("long"), raw),
        )
    )
    bucketed_df = (
        df.join(F.broadcast(stats), part_cols)
        .withColumn("bkt", bkt)
        .drop("_mn", "_mx")
    )
    w_local = Window.partitionBy(*part_cols, "bkt").orderBy(*order)
    w_off = (
        Window.partitionBy(*part_cols)
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        bucketed_df.groupBy(*part_cols, "bkt")
        .agg(F.count("*").cast("long").alias("_bn"))
        .withColumn(
            "_off", F.coalesce(F.sum("_bn").over(w_off), F.lit(0)).cast("long")
        )
        .select(*part_cols, "bkt", "_off")
    )
    return (
        bucketed_df.withColumn("_lr", F.row_number().over(w_local).cast("long"))
        .join(F.broadcast(offsets), [*part_cols, "bkt"])
        .withColumn(rank_col, F.col("_lr") + F.col("_off"))
        .drop("bkt", "_lr", "_off")
    )
