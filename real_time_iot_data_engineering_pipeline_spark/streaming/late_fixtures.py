"""Late-data fixture generator — the reference's lateness taxonomy as a
deterministic micro-batch fixture (data_generator/generator.py:258-292,
rates at :10-17: 10% of events arrive late — 5% by 1-5 min, 3% by 5-15 min,
2% by 15-60 min; the reference never wires it into generate_record, SURVEY
§4.4-7 — here it drives the watermark tests for real).

No RNG: lateness class and magnitude derive from the event index (i % 100
buckets at the reference's exact rates), so every run, engine, and assertion
sees identical data.  Events are emitted in ARRIVAL order across n_files
micro-batch files (mtime-ordered, one file per trigger with
maxFilesPerTrigger=1); a late event's embedded event-time is its arrival
slot minus its lateness.
"""

from __future__ import annotations

import datetime as dt
import json
import os

ARRIVAL_STEP_SECONDS = 10  # reference cadence: one reading / 10 s

# (bucket upper bound over i%100, min_late_s, max_late_s) — generator.py:258-292
LATE_CLASSES = (
    (5, 60, 300),  # 5%: 1-5 min
    (8, 300, 900),  # 3%: 5-15 min
    (10, 900, 3600),  # 2%: 15-60 min
)


def lateness_seconds(i: int) -> int:
    """Deterministic lateness for event index i (0 = on time)."""
    b = i % 100
    for upper, lo, hi in LATE_CLASSES:
        if b < upper:
            # spread deterministically across [lo, hi) by index
            return lo + (i * 37) % (hi - lo)
    return 0


def late_events(
    n_events: int,
    base: dt.datetime,
    user_id: int = 1,
) -> list[dict]:
    """Events in arrival order; event i arrives at base + i*10s with
    event-time = arrival - lateness(i)."""
    out = []
    for i in range(n_events):
        arrival = base + dt.timedelta(seconds=i * ARRIVAL_STEP_SECONDS)
        event_ts = arrival - dt.timedelta(seconds=lateness_seconds(i))
        out.append(
            {
                "event_id": i,
                "ts": event_ts.strftime("%Y-%m-%d %H:%M:%S"),
                "user_id": user_id,
                "event_type": "reading",
                "value": float(i % 7),
                "props": "{}",
            }
        )
    return out


def write_late_files(
    out_dir: str,
    n_events: int = 200,
    n_files: int = 8,
    base: dt.datetime = dt.datetime(2024, 1, 15, 10, 0, 0),
    base_mtime: int = 1_700_000_000,
) -> list[list[dict]]:
    """Split the arrival stream into n_files mtime-ordered JSON-lines files
    (one micro-batch each under maxFilesPerTrigger=1).  Returns the batches
    so tests can replay the same data through a simulator."""
    os.makedirs(out_dir, exist_ok=True)
    events = late_events(n_events, base)
    per = (n_events + n_files - 1) // n_files
    batches = [events[i : i + per] for i in range(0, n_events, per)]
    for seq, batch in enumerate(batches):
        path = os.path.join(out_dir, f"batch-{seq:03d}.json")
        with open(path, "w") as f:
            for e in batch:
                f.write(json.dumps(e) + "\n")
        os.utime(path, (base_mtime + seq * 60, base_mtime + seq * 60))
    return batches


def simulate_windowed_counts(
    batches: list[list[dict]],
    window_seconds: int = 300,
    delay_seconds: int = 60,
) -> dict[str, tuple[float, int]]:
    """Reference model of Spark's streaming aggregation semantics, as
    pinned empirically by tests/test_streaming.py:

    - the watermark after batch N is max event-time of batches 0..N minus
      the delay;
    - LATE-EVENT filtering in batch N uses the watermark as of the END of
      batch N-2 (the late-events/eviction watermark split lags one batch —
      SPARK-24634);
    - a row is dropped iff its window END <= that filtering watermark.

    Returns {window_start_iso: (sum_value, count)} for surviving rows."""
    windows: dict[str, tuple[float, int]] = {}
    max_ts: dt.datetime | None = None
    wm_history: list[dt.datetime | None] = []  # wm after each batch
    for n, batch in enumerate(batches):
        filter_wm = wm_history[n - 2] if n >= 2 else None
        for e in batch:
            ts = dt.datetime.strptime(e["ts"], "%Y-%m-%d %H:%M:%S")
            epoch = int(ts.timestamp())
            wstart = dt.datetime.fromtimestamp(epoch - epoch % window_seconds)
            wend = wstart + dt.timedelta(seconds=window_seconds)
            if filter_wm is not None and wend <= filter_wm:
                continue  # late beyond watermark: dropped
            key = wstart.strftime("%Y-%m-%d %H:%M:%S")
            s, c = windows.get(key, (0.0, 0))
            windows[key] = (s + e["value"], c + 1)
            max_ts = ts if max_ts is None or ts > max_ts else max_ts
        for e in batch:  # watermark advances on ALL input rows of the batch
            ts = dt.datetime.strptime(e["ts"], "%Y-%m-%d %H:%M:%S")
            max_ts = ts if max_ts is None or ts > max_ts else max_ts
        wm_history.append(
            None if max_ts is None else max_ts - dt.timedelta(seconds=delay_seconds)
        )
    return windows
