"""Stream-stream interval join: attribute click events to the view events
that preceded them within an attribution window, with watermark-bounded
state on both sides.

Beyond-reference streaming capability (the reference has a single stream;
SURVEY §2.8 lists no stream-stream joins): the moment a second stream
exists — impressions vs conversions, reading vs calibration — the
attribution join is the first operator a user writes.  Spark supports it
natively IF both sides carry watermarks and the join condition bounds
event time on both sides; this module packages the correct construction,
because getting the time-bound direction wrong silently produces
unbounded state.

Batch twin: queries/behavior.py::q_click_attribution — identical join
expressed over the batch table, oracle-checked against DuckDB; the tests
in tests/test_stream_join.py check the streaming-only semantics on top
(state eviction via watermark, append emission for inner joins, NULL
emission for the outer side only after the watermark passes).

Scale posture: the join key (user) is high-cardinality, so state shards
across executors by key; the interval condition lets Spark derive a state
watermark for BOTH sides — view state is held attribution_window past the
click watermark, click state only to the click watermark — giving bounded
state regardless of stream length.  An unbounded (no time condition)
stream-stream join would accumulate forever; this module's API makes the
window mandatory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ATTRIBUTION_WINDOW = "10 minutes"
STREAM_JOIN_WATERMARK = "1 minute"


def split_by_type(parsed: DataFrame, event_type: str) -> DataFrame:
    """One typed sub-stream of the parsed event stream (the same
    physical source consumed twice — Spark plans two scans with
    independent watermarks, the standard self-join-on-stream shape)."""
    return parsed.filter(F.col("event_type") == event_type)


def attribute_clicks(
    views: DataFrame,
    clicks: DataFrame,
    attribution_window: str = ATTRIBUTION_WINDOW,
    watermark: str = STREAM_JOIN_WATERMARK,
    join_type: str = "inner",
) -> DataFrame:
    """Join each click to every view by the same user within
    [view_ts, view_ts + attribution_window] — inclusive on both ends,
    mirroring the batch twin's BETWEEN.

    join_type='inner' emits matched pairs as soon as both sides arrive;
    'leftOuter' (views side preserved) additionally emits
    (view, NULL click) once the click-side watermark passes the end of the
    view's attribution window — the "view that never converted" record.
    Both sides MUST be watermarked for state eviction; this function
    applies the watermark itself so callers cannot construct the
    unbounded variant."""
    v = (
        views.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("v_user_id"),
            F.col("ts").alias("view_ts"),
            F.col("event_id").alias("view_id"),
        )
    )
    c = (
        clicks.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
            F.col("value").alias("click_value"),
        )
    )
    cond = (
        (v.v_user_id == c.c_user_id)
        & (c.click_ts >= v.view_ts)
        & (c.click_ts <= F.expr(f"view_ts + INTERVAL {attribution_window}"))
    )
    return (
        v.join(c, cond, join_type)
        .select(
            F.col("v_user_id").alias("user_id"),
            "view_id",
            "view_ts",
            "click_id",
            "click_ts",
            "click_value",
        )
    )
