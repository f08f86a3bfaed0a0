"""Golden tests for the stream-stream interval join
(streaming/stream_join.py): semantics the batch oracle cannot see —
append-mode match emission, state-bounded join, and outer-side NULL
emission only after the watermark passes the attribution window.

The join itself (which pairs match) is certified by the oracle-checked
batch twin q_click_attribution, which runs the SAME operator code.
"""

from __future__ import annotations

import json
import os

import pytest

from real_time_iot_data_engineering_pipeline_spark.streaming.pipeline import (
    parse_event_stream,
    read_event_file_stream,
)
from real_time_iot_data_engineering_pipeline_spark.streaming.stream_join import (
    attribute_clicks,
    split_by_type,
)

_MEM_SEQ = [0]


def _write_file(src: str, n: int, rows: list[dict]) -> None:
    path = os.path.join(src, f"f{n}.json")
    with open(path, "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows))
    # Files are picked up in mtime order — space them deterministically
    # instead of sleeping.
    os.utime(path, (1_700_000_000 + n, 1_700_000_000 + n))


def _event(eid, ts, user, etype, value=1.0):
    return dict(
        event_id=eid, ts=ts, user_id=user, event_type=etype,
        value=value, props="{}",
    )


def _run_join(spark, tmp_path, join_type: str):
    src = str(tmp_path / "src")
    os.makedirs(src)
    # Batch 1: the interesting users.  view 1 matches click 2 (5 min);
    # click 3 is 20 min after the view (outside the 10-min window);
    # view 4 (user 2) never converts.
    _write_file(src, 1, [
        _event(1, "2024-01-19 10:00:00", 1, "view"),
        _event(2, "2024-01-19 10:05:00", 1, "click", 42.0),
        _event(3, "2024-01-19 10:20:00", 1, "click"),
        _event(4, "2024-01-19 10:00:00", 2, "view"),
    ])
    # Batches 2-3: watermark advancers on BOTH sides (distinct users so
    # they add no matches: u8/u18 only view, u9/u19 only click).
    _write_file(src, 2, [
        _event(5, "2024-01-19 11:00:00", 8, "view"),
        _event(6, "2024-01-19 11:00:00", 9, "click"),
    ])
    _write_file(src, 3, [
        _event(7, "2024-01-19 12:00:00", 18, "view"),
        _event(8, "2024-01-19 12:00:00", 19, "click"),
    ])

    parsed = parse_event_stream(read_event_file_stream(spark, src))
    joined = attribute_clicks(
        split_by_type(parsed, "view"),
        split_by_type(parsed, "click"),
        join_type=join_type,
    )
    _MEM_SEQ[0] += 1
    table = f"stream_join_result_{_MEM_SEQ[0]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        if q.isActive:
            q.stop()
    return {
        (r["view_id"], r["click_id"]): r
        for r in spark.sql(f"SELECT * FROM {table}").collect()
    }


class TestStreamStreamJoin:
    def test_inner_emits_exactly_the_in_window_pair(self, spark, tmp_path):
        rows = _run_join(spark, tmp_path, "inner")
        assert (1, 2) in rows, "in-window view->click pair not emitted"
        r = rows[(1, 2)]
        assert r["user_id"] == 1 and r["click_value"] == 42.0
        # click 3 (out of window) must pair with nothing
        assert not any(cid == 3 for (_, cid) in rows)
        # no cross-user pairs, no unmatched emissions in inner mode
        assert all(cid is not None for (_, cid) in rows)
        assert (1, 2) == next(iter(k for k in rows if k[0] == 1))
        assert len(rows) == 1

    def test_left_outer_emits_null_for_unconverted_view_after_watermark(
        self, spark, tmp_path
    ):
        rows = _run_join(spark, tmp_path, "leftOuter")
        # the matched pair still appears exactly once
        assert (1, 2) in rows
        # view 4 (user 2) never converted; its attribution window [10:00,
        # 10:10] is far behind the final watermark (~11:59), so the NULL
        # row MUST have been emitted
        assert (4, None) in rows, "unconverted view not emitted with NULL click"
        r = rows[(4, None)]
        assert r["user_id"] == 2
        assert r["click_ts"] is None and r["click_value"] is None
        # view 1 matched, so it must NOT also appear as a NULL row
        assert (1, None) not in rows
        # late-window views (11:00/12:00) may or may not have flushed by
        # the final batch (outer emission lags the watermark by design);
        # both behaviors are legal — assert nothing about them.


class TestStateBoundedness:
    def test_join_requires_no_unbounded_state(self, spark, tmp_path):
        """The physical plan must carry watermarks on both join inputs —
        the construction that lets Spark evict state.  (attribute_clicks
        applies them internally; this pins the contract.)"""
        src = str(tmp_path / "src")
        os.makedirs(src)
        _write_file(src, 1, [_event(1, "2024-01-19 10:00:00", 1, "view")])
        parsed = parse_event_stream(read_event_file_stream(spark, src))
        joined = attribute_clicks(
            split_by_type(parsed, "view"), split_by_type(parsed, "click")
        )
        logical = joined._jdf.queryExecution().logical().toString()
        assert logical.count("EventTimeWatermark") == 2
