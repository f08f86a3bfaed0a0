"""Golden tests for the applyInPandasWithState sudden-change operator:
state must carry the last reading ACROSS micro-batches per sensor."""

from __future__ import annotations

from real_time_iot_data_engineering_pipeline_spark.streaming.pipeline import (
    parse_event_stream,
    read_event_file_stream,
)
from real_time_iot_data_engineering_pipeline_spark.streaming.stateful import (
    sudden_change_stream,
)

from .test_streaming import ev, write_file


def test_state_carries_last_value_across_batches(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    # batch 0: u1 baseline 10.0 then spike to 35.0 (delta +25 > 20)
    write_file(
        str(src),
        "f1.json",
        [
            ev(1, "2024-01-15 10:00:00", user_id=1, value=10.0),
            ev(2, "2024-01-15 10:00:10", user_id=1, value=35.0),
            ev(3, "2024-01-15 10:00:05", user_id=2, value=5.0),
        ],
        seq=0,
    )
    # batch 1: u1 back to 12.0 (delta -23 -> sudden) — state remembered
    # 35.0 from batch 0; u2 gentle drift (no flag)
    write_file(
        str(src),
        "f2.json",
        [
            ev(4, "2024-01-15 10:00:20", user_id=1, value=12.0),
            ev(5, "2024-01-15 10:00:15", user_id=2, value=8.0),
        ],
        seq=1,
    )
    out = sudden_change_stream(
        parse_event_stream(read_event_file_stream(spark, str(src)))
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sudden_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        r.event_id: (r.delta, r.is_sudden_change)
        for r in spark.sql("SELECT * FROM sudden_out").collect()
    }
    assert rows[1] == (None, False)  # first reading: nothing to compare
    assert rows[2] == (25.0, True)  # in-batch spike
    assert rows[3] == (None, False)
    assert rows[4] == (-23.0, True)  # cross-batch: state remembered 35.0
    assert rows[5] == (3.0, False)
