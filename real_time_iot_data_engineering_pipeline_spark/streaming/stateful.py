"""Custom stateful streaming operator: per-sensor sudden-change detection.

The bounded twin (queries/analytics.py::q_sudden_change) uses lag() over a
window; a stream can't look back — it must REMEMBER the previous reading per
sensor.  Built-in streaming operators don't express "compare to previous
element", so this is the designated escape hatch: applyInPandasWithState
(SURVEY §2.9) — Arrow-batched pandas per key group, explicit GroupState
holding (last_ts, last_value), watermark-driven state timeout.

Reference semantics: 'sudden temp change > 20°C between consecutive
readings' (Learning Guide.txt:1058 §3); threshold parameterized because the
events fixture's value range differs (queries/analytics.py uses 10).

Scale: state is one (ts, value) pair per sensor — bounded by key
cardinality, evicted by the event-time timeout; each micro-batch shuffles
only by user_id (the same partitioning the aggregation already needs).
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("delta", T.DoubleType()),
        T.StructField("is_sudden_change", T.BooleanType()),
    ]
)

STATE_SCHEMA = "last_ts timestamp, last_value double"

SUDDEN_THRESHOLD = 20.0  # Learning Guide.txt:1058 §3


def arm_idle_timeout(state: GroupState, batch_max_ts, ttl_ms: int) -> None:
    """Arm the idle-eviction deadline at TTL past the LATER of the current
    watermark and this batch's own max event time.  In the FIRST micro-batch
    the watermark is still 0 (it lags one batch), so a watermark-only
    deadline is epoch-1970 + TTL — ancient the moment real event times
    arrive, silently evicting every key armed in batch 0 that then idles
    for one batch (surfaced by the near-dup bucket store's cross-batch
    test; regression-pinned in tests/test_stateful.py)."""
    batch_ms = 0
    if batch_max_ts is not None and not pd.isna(batch_max_ts):
        batch_ms = int(pd.Timestamp(batch_max_ts).value // 1_000_000)
    state.setTimeoutTimestamp(
        max(state.getCurrentWatermarkMs(), batch_ms) + ttl_ms
    )


def _detect(threshold: float):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            # watermark passed the idle deadline: evict, emit nothing —
            # without this branch every idle key re-arms its own timeout
            # forever and state never shrinks
            state.remove()
            return
        last_ts, last_value = state.get if state.exists else (None, None)
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        out = {k: [] for k in ("event_id", "ts", "value", "delta", "is_sudden_change")}
        for _, r in rows.iterrows():
            delta = None if last_value is None else float(r["value"]) - last_value
            out["event_id"].append(int(r["event_id"]))
            out["ts"].append(r["ts"])
            out["value"].append(float(r["value"]))
            out["delta"].append(delta)
            out["is_sudden_change"].append(
                delta is not None and abs(delta) > threshold
            )
            last_ts, last_value = r["ts"], float(r["value"])
        state.update((last_ts, last_value))
        # state lives while the sensor keeps reporting; idle sensors expire
        # one watermark-delay after their last event (the reference's
        # in-process tracker expired after 1 minute too)
        arm_idle_timeout(state, rows["ts"].max(), 60_000)
        yield pd.DataFrame({"user_id": [user_id] * len(out["event_id"]), **out})

    return fn


def sudden_change_stream(
    events: DataFrame,
    threshold: float = SUDDEN_THRESHOLD,
    watermark_delay: str = "1 minute",
) -> DataFrame:
    """events (already parsed) -> per-sensor stateful sudden-change flags.
    Input must carry user_id, event_id, ts (timestamp), value."""
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _detect(threshold),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Online CUSUM changepoint detection (per-sensor, state across batches)
# ---------------------------------------------------------------------------

CUSUM_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("s_pos", T.DoubleType()),
        T.StructField("s_neg", T.DoubleType()),
        T.StructField("alarm", T.BooleanType()),
    ]
)

CUSUM_STATE_SCHEMA = "s_pos double, s_neg double"


def _cusum(mu0: float, slack: float, h: float):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            # watermark passed the idle deadline: evict, emit nothing —
            # without this branch every idle key re-arms its own timeout
            # forever and state never shrinks
            state.remove()
            return
        s_pos, s_neg = state.get if state.exists else (0.0, 0.0)
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        out = {k: [] for k in ("event_id", "ts", "value", "s_pos", "s_neg", "alarm")}
        for _, r in rows.iterrows():
            x = float(r["value"])
            s_pos = max(0.0, s_pos + (x - mu0 - slack))
            s_neg = max(0.0, s_neg + (mu0 - x - slack))
            alarm = s_pos > h or s_neg > h
            out["event_id"].append(int(r["event_id"]))
            out["ts"].append(r["ts"])
            out["value"].append(x)
            out["s_pos"].append(s_pos)
            out["s_neg"].append(s_neg)
            out["alarm"].append(alarm)
            if alarm:  # standard CUSUM restart after signalling
                s_pos, s_neg = 0.0, 0.0
        state.update((s_pos, s_neg))
        arm_idle_timeout(state, rows["ts"].max(), 60_000)
        yield pd.DataFrame({"user_id": [user_id] * len(out["event_id"]), **out})

    return fn


def cusum_stream(
    events: DataFrame,
    mu0: float,
    slack: float = 2.0,
    h: float = 30.0,
    watermark_delay: str = "1 minute",
) -> DataFrame:
    """Online CUSUM (Page 1954) per sensor as a stateful streaming
    operator: the batch twin (queries/temporal.py::q_cusum) scans the
    whole series for its max excursion; a stream instead carries the
    running one-sided sums s+ = max(0, s+ + (x - mu0 - slack)) and
    s- = max(0, s- + (mu0 - x - slack)) across micro-batches in
    GroupState, emits an alarm the moment either exceeds h, and restarts
    (the textbook control-chart protocol).  The level shift that a batch
    job would only report tomorrow raises an alert within one
    micro-batch of the drift crossing h.

    Scale: state is two doubles per sensor — bounded by key cardinality,
    watermark-evicted after idle — and each batch shuffles once by the
    same user key the rest of the topology already uses; inside a key
    group the pandas fold is O(batch rows)."""
    with_wm = events.withWatermark("ts", watermark_delay)
    return with_wm.groupBy("user_id").applyInPandasWithState(
        _cusum(mu0, slack, h),
        outputStructType=CUSUM_OUTPUT_SCHEMA,
        stateStructType=CUSUM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Online z-score anomaly gate (per-sensor Welford moments across batches)
# ---------------------------------------------------------------------------

ZSCORE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("n_seen", T.LongType()),
        T.StructField("z", T.DoubleType()),
        T.StructField("is_anomaly", T.BooleanType()),
    ]
)

ZSCORE_STATE_SCHEMA = "n bigint, mean double, m2 double"

ZSCORE_THRESHOLD = 3.0
ZSCORE_MIN_OBS = 5


def _zscore(threshold: float, min_obs: int):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            # watermark passed the idle deadline: evict, emit nothing —
            # without this branch every idle key re-arms its own timeout
            # forever and state never shrinks
            state.remove()
            return
        n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        out = {k: [] for k in ("event_id", "ts", "value", "n_seen", "z", "is_anomaly")}
        for _, r in rows.iterrows():
            x = float(r["value"])
            # score against the distribution BEFORE this reading — an
            # anomaly must not dilute the baseline it is judged by
            z = None
            anomaly = False
            if n >= min_obs:
                if m2 > 0.0:
                    z = (x - mean) / (m2 / (n - 1)) ** 0.5
                    anomaly = abs(z) > threshold
                else:
                    # constant baseline (stuck sensor): ANY deviation is an
                    # alarm — an unbounded spike must not slip through with
                    # a null z and then poison the moments
                    anomaly = x != mean
            out["event_id"].append(int(r["event_id"]))
            out["ts"].append(r["ts"])
            out["value"].append(x)
            out["n_seen"].append(n)
            out["z"].append(z)
            out["is_anomaly"].append(anomaly)
            # Welford update; anomalous readings are EXCLUDED so a burst
            # of outliers can't drag the baseline toward itself
            if not anomaly:
                n += 1
                delta = x - mean
                mean += delta / n
                m2 += delta * (x - mean)
        state.update((n, mean, m2))
        arm_idle_timeout(state, rows["ts"].max(), 60_000)
        yield pd.DataFrame({"user_id": [user_id] * len(out["event_id"]), **out})

    return fn


def zscore_stream(
    events: DataFrame,
    threshold: float = ZSCORE_THRESHOLD,
    min_obs: int = ZSCORE_MIN_OBS,
    watermark_delay: str = "1 minute",
) -> DataFrame:
    """Online z-score gate per sensor: the batch twin
    (queries/analytics.py::q_zscore_flag) scores each reading against the
    WHOLE series' mean/std; a stream can't see the future, so this
    operator carries running Welford moments (n, mean, M2) in GroupState
    and scores each reading against everything seen so far.  Readings are
    scored BEFORE they update the moments, warmup (n < min_obs) emits a
    null z, and flagged anomalies are excluded from the update so outlier
    bursts cannot shift the baseline they are judged against (the
    standard control-chart guard).

    Scale: state is (bigint, double, double) per sensor — bounded by key
    cardinality, watermark-evicted after idle; each micro-batch shuffles
    once on the same user key the rest of the topology uses, and the
    in-group fold is O(batch rows)."""
    with_wm = events.withWatermark("ts", watermark_delay)
    return with_wm.groupBy("user_id").applyInPandasWithState(
        _zscore(threshold, min_obs),
        outputStructType=ZSCORE_OUTPUT_SCHEMA,
        stateStructType=ZSCORE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming heavy hitters (Misra-Gries summaries per hash bucket)
# ---------------------------------------------------------------------------

HH_BUCKETS = 8  # parallelism of the summary state; keys hash-partition
HH_CAPACITY = 8  # counters per bucket: error <= bucket_processed / capacity

HH_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType()),
        T.StructField("key", T.LongType()),
        T.StructField("est_count", T.LongType()),
        T.StructField("processed", T.LongType()),
    ]
)

HH_STATE_SCHEMA = "keys array<bigint>, counts array<bigint>, processed bigint"


def _misra_gries(capacity: int):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (bucket,) = key
        if state.hasTimedOut:
            # watermark passed the idle deadline: evict, emit nothing —
            # without this branch every idle key re-arms its own timeout
            # forever and state never shrinks
            state.remove()
            return
        if state.exists:
            keys, counts, processed = state.get
            summary = dict(zip(list(keys), list(counts)))
        else:
            summary, processed = {}, 0
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        for k in rows["key"]:
            k = int(k)
            processed += 1
            if k in summary:
                summary[k] += 1
            elif len(summary) < capacity:
                summary[k] = 1
            else:  # decrement-all: the Misra-Gries eviction step
                summary = {
                    kk: c - 1 for kk, c in summary.items() if c - 1 > 0
                }
        ks = sorted(summary)
        state.update((ks, [summary[k] for k in ks], processed))
        arm_idle_timeout(state, rows["ts"].max(), 3_600_000)
        yield pd.DataFrame(
            {
                "bucket": [bucket] * len(ks),
                "key": ks,
                "est_count": [summary[k] for k in ks],
                "processed": [processed] * len(ks),
            }
        )

    return fn


def heavy_hitters_stream(
    events: DataFrame,
    key_col: str = "user_id",
    buckets: int = HH_BUCKETS,
    capacity: int = HH_CAPACITY,
    watermark_delay: str = "1 minute",
) -> DataFrame:
    """Streaming frequent-key detection with bounded memory: the batch twin
    (queries/behavior.py::q_heavy_hitters) counts exactly; a stream over an
    unbounded key domain cannot.  Keys hash-partition into `buckets`
    deterministic groups, and each group's GroupState carries a Misra-Gries
    summary of `capacity` counters folded across micro-batches.  Because a
    key always lands in the same bucket, bucket summaries are DISJOINT and
    the global answer is their plain union (the classic mergeable-summaries
    property), with the per-bucket deterministic guarantee
    true_count - est_count <= bucket_processed / capacity and every key
    above that bound guaranteed present — golden-tested across batch
    boundaries in tests/test_stateful.py.

    Scale: state is <= capacity (key, count) pairs per bucket — constant
    memory regardless of stream length or key cardinality; each micro-batch
    shuffles once on the bucket id, and `buckets` sets the shuffle
    parallelism of the summary stage independently of key skew (a hot key
    cannot overload a bucket beyond its row share, since the fold is
    O(rows))."""
    keyed = (
        events.withWatermark("ts", watermark_delay)
        .filter(F.col(key_col).isNotNull())
        .select(
        F.col("ts"),
        F.col("event_id"),
        F.col(key_col).cast("long").alias("key"),
            (F.pmod(F.hash(F.col(key_col)), F.lit(buckets))).alias("bucket"),
        )
    )
    return keyed.groupBy("bucket").applyInPandasWithState(
        _misra_gries(capacity),
        outputStructType=HH_OUTPUT_SCHEMA,
        stateStructType=HH_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming uniform sample (bottom-k by hash, the mergeable reservoir)
# ---------------------------------------------------------------------------

SAMPLE_BUCKETS = 4
SAMPLE_CAPACITY = 100  # per-bucket k; matches queries/summaries.py SAMPLE_K

SAMPLE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("sample_hash", T.StringType()),
        T.StructField("processed", T.LongType()),
    ]
)

SAMPLE_STATE_SCHEMA = "hashes array<string>, ids array<bigint>, processed bigint"


def _bottom_k(capacity: int):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (bucket,) = key
        if state.hasTimedOut:
            # watermark passed the idle deadline: evict, emit nothing —
            # without this branch every idle key re-arms its own timeout
            # forever and state never shrinks
            state.remove()
            return
        if state.exists:
            hashes, ids, processed = state.get
            kept = list(zip(list(hashes), list(ids)))
        else:
            kept, processed = [], 0
        batch_max_ts = None
        for pdf in pdfs:
            processed += len(pdf)
            kept.extend(zip(pdf["sample_hash"], (int(i) for i in pdf["event_id"])))
            # merge step of the mergeable summary: keep the k smallest tags
            kept = sorted(kept)[:capacity]
            if len(pdf):
                m = pdf["ts"].max()
                batch_max_ts = m if batch_max_ts is None else max(batch_max_ts, m)
        state.update(
            ([h for h, _ in kept], [i for _, i in kept], processed)
        )
        arm_idle_timeout(state, batch_max_ts, 3_600_000)
        yield pd.DataFrame(
            {
                "bucket": [bucket] * len(kept),
                "event_id": [i for _, i in kept],
                "sample_hash": [h for h, _ in kept],
                "processed": [processed] * len(kept),
            }
        )

    return fn


def sample_stream(
    events: DataFrame,
    buckets: int = SAMPLE_BUCKETS,
    capacity: int = SAMPLE_CAPACITY,
    watermark_delay: str = "1 minute",
) -> DataFrame:
    """Streaming uniform sample with bounded memory: the batch twin
    (queries/summaries.py::q_bottomk_sample) takes the k rows with the
    smallest MD5(event_id); a stream folds the same bottom-k summary
    across micro-batches in GroupState.  Because the hash tag is a pure
    function of the row, the sample is DETERMINISTIC and identical to the
    batch answer over the same prefix — bottom-k sets merge exactly like
    reservoir states but without RNG, so the final global sample is the
    k smallest tags across the per-bucket summaries (cross-path-tested
    against q_bottomk_sample in tests/test_stateful.py).

    The MD5 tag and bucket id are computed JVM-side (codegen) before the
    stateful fold; the pandas fold only merges sorted (hash, id) lists —
    state is <= capacity pairs per bucket, constant in stream length.

    Scale: one shuffle per micro-batch on the bucket id; `buckets` sets
    the summary stage's parallelism, and the per-bucket k keeps the
    global bottom-k derivable because buckets PARTITION the rows (every
    global top tag is necessarily inside its own bucket's top k)."""
    tagged = (
        events.withWatermark("ts", watermark_delay)
        .filter(F.col("event_id").isNotNull())
        .select(
            F.col("ts"),
            F.col("event_id").cast("long").alias("event_id"),
            F.md5(F.col("event_id").cast("string").cast("binary")).alias(
                "sample_hash"
            ),
            F.pmod(F.hash("event_id"), F.lit(buckets)).alias("bucket"),
        )
    )
    return tagged.groupBy("bucket").applyInPandasWithState(
        _bottom_k(capacity),
        outputStructType=SAMPLE_OUTPUT_SCHEMA,
        stateStructType=SAMPLE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming quantile summary (fixed-bin histogram, the mergeable sketch)
# ---------------------------------------------------------------------------

Q_BINS = 256
Q_LO, Q_HI = 0.0, 100.0  # admission range the VALID stream is filtered to
Q_QUANTILES = (0.5, 0.9, 0.99)

QUANTILE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("p50", T.DoubleType()),
        T.StructField("p90", T.DoubleType()),
        T.StructField("p99", T.DoubleType()),
        T.StructField("err_bound", T.DoubleType()),
        T.StructField("processed", T.LongType()),
    ]
)

QUANTILE_STATE_SCHEMA = "counts array<bigint>, processed bigint"


def histogram_quantile(
    counts: list[int], q: float, lo: float, width: float
) -> float:
    """Deterministic quantile readout of a fixed-bin histogram: the value at
    continuous rank ceil(q*n), linearly interpolated inside its bin under a
    uniform-within-bin assumption.  Error vs the exact order statistic is
    <= one bin width by construction.  Shared by the stream fold and the
    cross-path test's reference implementation so both compute the SAME
    number, bit-for-bit."""
    n = sum(counts)
    rank = max(1, math.ceil(q * n))
    cum = 0
    for b, c in enumerate(counts):
        if c and cum + c >= rank:
            return lo + width * (b + (rank - cum) / c)
        cum += c
    return lo + width * len(counts)


def _hist_fold(bins: int, lo: float, hi: float, quantiles: tuple[float, ...]):
    width = (hi - lo) / bins

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (event_type,) = key
        if state.hasTimedOut:
            # watermark passed the idle deadline: evict, emit nothing —
            # without this branch every idle key re-arms its own timeout
            # forever and state never shrinks
            state.remove()
            return
        if state.exists:
            counts, processed = state.get
            counts = list(counts)
        else:
            counts, processed = [0] * bins, 0
        batch_max_ts = None
        for pdf in pdfs:
            processed += len(pdf)
            # merge step of the mergeable summary: element-wise add of the
            # micro-batch's bincount (bin index precomputed JVM-side)
            bc = np.bincount(pdf["bin"].to_numpy(), minlength=bins)
            counts = [c + int(b) for c, b in zip(counts, bc)]
            if len(pdf):
                m = pdf["ts"].max()
                batch_max_ts = m if batch_max_ts is None else max(batch_max_ts, m)
        state.update((counts, processed))
        arm_idle_timeout(state, batch_max_ts, 3_600_000)
        if processed == 0:
            return
        ests = [histogram_quantile(counts, q, lo, width) for q in quantiles]
        yield pd.DataFrame(
            {
                "event_type": [event_type],
                "p50": [ests[0]],
                "p90": [ests[1]],
                "p99": [ests[2]],
                "err_bound": [width],
                "processed": [processed],
            }
        )

    return fn


def quantile_stream(
    events: DataFrame,
    bins: int = Q_BINS,
    lo: float = Q_LO,
    hi: float = Q_HI,
    watermark_delay: str = "1 minute",
) -> DataFrame:
    """Streaming per-event-type value-distribution summary with bounded
    memory: the batch twin (queries/sketches.py::q_quantile_summary)
    computes exact p50/p90/p99 with a value->count map whose state is
    O(distinct values); a stream over unbounded input cannot.  This folds a
    FIXED-BIN histogram (`bins` counters spanning [lo, hi], the range the
    validation rules admit into the VALID stream) across micro-batches in
    GroupState and reads p50/p90/p99 off the cumulative histogram with
    within-bin interpolation — deterministic, mergeable (histograms add
    element-wise), and with readout error <= one bin width, the bound
    emitted alongside every row as `err_bound` and pinned against the exact
    batch quantile in tests/test_stateful.py.

    The bin index is computed JVM-side (codegen) before the stateful fold;
    the pandas fold is one np.bincount add per micro-batch — state is
    exactly `bins` counters per event type, constant in stream length and
    value cardinality.

    Scale: one shuffle per micro-batch on event_type (bounded domain); at
    high key skew the same histogram could hash-sub-bucket like
    heavy_hitters_stream since histograms merge exactly — not needed while
    the per-key fold is O(batch rows)."""
    width = (hi - lo) / bins
    binned = (
        events.withWatermark("ts", watermark_delay)
        .filter(F.col("value").isNotNull() & F.col("event_type").isNotNull())
        .select(
            F.col("ts"),
            F.col("event_type"),
            F.least(
                F.lit(bins - 1),
                F.greatest(
                    F.lit(0),
                    F.floor((F.col("value") - F.lit(lo)) / F.lit(width)).cast(
                        "int"
                    ),
                ),
            ).alias("bin"),
        )
    )
    return binned.groupBy("event_type").applyInPandasWithState(
        _hist_fold(bins, lo, hi, Q_QUANTILES),
        outputStructType=QUANTILE_OUTPUT_SCHEMA,
        stateStructType=QUANTILE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming distinct count (K-minimum-values, the mergeable cardinality sketch)
# ---------------------------------------------------------------------------

KMV_K = 256  # relative error ~ 1/sqrt(k-2) ~ 6%

KMV_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("est_distinct", T.DoubleType()),
        T.StructField("n_held", T.IntegerType()),
        T.StructField("is_exact", T.BooleanType()),
        T.StructField("processed", T.LongType()),
    ]
)

KMV_STATE_SCHEMA = "hashes array<string>, processed bigint"

_MD5_SPACE = float(16**32)


def kmv_estimate(hashes: list[str], k: int) -> tuple[float, bool]:
    """Deterministic KMV readout: with fewer than k distinct hashes the set
    IS the distinct population (exact); at capacity the k-th smallest
    normalized hash h_k estimates cardinality as (k-1)/h_k.  Fixed-width
    lowercase hex sorts lexicographically in numeric order, so the state
    array needs no numeric decode until readout.  Shared by the stream
    fold and the cross-path test's reference implementation."""
    if len(hashes) < k:
        return float(len(hashes)), True
    return (k - 1) / (int(hashes[k - 1], 16) / _MD5_SPACE), False


def _kmv(k: int):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (event_type,) = key
        if state.hasTimedOut:
            # watermark passed the idle deadline: evict, emit nothing —
            # without this branch every idle key re-arms its own timeout
            # forever and state never shrinks
            state.remove()
            return
        if state.exists:
            hashes, processed = state.get
            held = set(hashes)
        else:
            held, processed = set(), 0
        batch_max_ts = None
        for pdf in pdfs:
            processed += len(pdf)
            # merge step of the mergeable summary: union of distinct
            # hash sets, truncated back to the k smallest
            held.update(pdf["kmv_hash"])
            held = set(sorted(held)[:k])
            if len(pdf):
                m = pdf["ts"].max()
                batch_max_ts = m if batch_max_ts is None else max(batch_max_ts, m)
        final = sorted(held)
        state.update((final, processed))
        arm_idle_timeout(state, batch_max_ts, 3_600_000)
        if processed == 0:
            return
        est, exact = kmv_estimate(final, k)
        yield pd.DataFrame(
            {
                "event_type": [event_type],
                "est_distinct": [est],
                "n_held": [len(final)],
                "is_exact": [exact],
                "processed": [processed],
            }
        )

    return fn


def distinct_stream(
    events: DataFrame,
    key_col: str = "user_id",
    k: int = KMV_K,
    watermark_delay: str = "1 minute",
) -> DataFrame:
    """Streaming per-event-type distinct-key count with bounded memory: the
    batch twin (queries/sketches.py::q_distinct_users) counts exactly with
    a distinct aggregation whose state is O(distinct keys); a stream over
    an unbounded key domain cannot.  This folds a K-MINIMUM-VALUES sketch
    across micro-batches in GroupState: the k smallest MD5 tags of the
    distinct keys seen, from which cardinality reads off as (k-1)/h_k.
    Below k distinct keys the readout is EXACT (is_exact=true — the sketch
    still holds every distinct tag); above, the estimator's relative error
    is ~1/sqrt(k-2).  Because the tag is a pure function of the key, the
    sketch is DETERMINISTIC — re-runs, engines, and batch/stream paths
    agree bit-for-bit (cross-path-tested against a python recompute in
    tests/test_stateful.py) — and KMV sets merge exactly (union, re-truncate),
    the same mergeable-summary property the sampler and histogram use.

    The MD5 tag is computed JVM-side (codegen) before the stateful fold;
    the pandas fold only unions sorted hash sets — state is <= k tags per
    event type, constant in stream length and key cardinality.

    Scale: one shuffle per micro-batch on event_type (bounded domain); a
    skewed type could hash-sub-bucket like heavy_hitters_stream since the
    global KMV is the truncated union of sub-bucket KMVs computed over a
    PARTITION of the keys."""
    tagged = (
        events.withWatermark("ts", watermark_delay)
        .filter(F.col(key_col).isNotNull() & F.col("event_type").isNotNull())
        .select(
            F.col("ts"),
            F.col("event_type"),
            F.md5(F.col(key_col).cast("string").cast("binary")).alias(
                "kmv_hash"
            ),
        )
    )
    return tagged.groupBy("event_type").applyInPandasWithState(
        _kmv(k),
        outputStructType=KMV_OUTPUT_SCHEMA,
        stateStructType=KMV_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming per-source frequency cap (admission control)
# ---------------------------------------------------------------------------

CAP_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("fetched_at", T.TimestampType()),
        T.StructField("cap_seq", T.LongType()),
        T.StructField("admitted", T.BooleanType()),
    ]
)

CAP_STATE_SCHEMA = "n_seen bigint"


def _cap(k: int):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (source,) = key
        (n_seen,) = state.get if state.exists else (0,)
        rows = pd.concat(list(pdfs)).sort_values(["fetched_at", "doc_id"])
        seqs = list(range(n_seen + 1, n_seen + 1 + len(rows)))
        state.update((n_seen + len(rows),))
        yield pd.DataFrame(
            {
                "source": [source] * len(rows),
                "doc_id": rows["doc_id"].astype("int64").values,
                "fetched_at": rows["fetched_at"].values,
                "cap_seq": pd.Series(seqs, dtype="int64").values,
                "admitted": [s <= k for s in seqs],
            }
        )

    return fn


def source_cap_stream(docs: DataFrame, k: int) -> DataFrame:
    """Streaming ADMISSION-control twin of batch q_source_cap: admit the
    first `k` documents per source, remembering the per-source count
    across micro-batches.  The semantic difference from the batch
    operator is deliberate and documented: batch capping sees the whole
    corpus and keeps the K BEST (longest) documents; an unbounded ingest
    cannot rank the future, so the streaming contract is first-K
    admission with a deterministic in-batch order ((fetched_at, doc_id)),
    the shape crawl frontiers actually enforce.  Batch re-capping on the
    landed corpus (q_source_cap) remains the quality-ranked authority.

    Scale: state is ONE bigint per source (bounded by |sources|, the
    dimension table's cardinality); each micro-batch shuffles by source
    once.  No timeout: a cap counter must not silently reset while the
    stream runs — production bounds state by keying on
    (source, capping-window) instead, e.g. date_trunc('day', fetched_at),
    which makes eviction a watermark concern again.

    Input must carry doc_id, source, fetched_at (timestamp)."""
    return (
        docs.select("doc_id", "source", "fetched_at")
        .groupBy("source")
        .applyInPandasWithState(
            _cap(k),
            outputStructType=CAP_OUTPUT_SCHEMA,
            stateStructType=CAP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
