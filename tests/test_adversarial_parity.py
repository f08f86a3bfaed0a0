"""Adversarial PARITY: run registered queries AND their registered DuckDB
oracles on a hostile synthetic events table — timestamps tied to the
microsecond on every boundary the driver fixture's uniform stream never
hits deliberately — and require the two engines to still agree.

This is a different axis from tests/test_adversarial_corpora.py (which
checks operators against closed-form expectations): here the oracle IS
the expectation, and the test hunts for engine-semantics divergence at
edges — as-of inclusivity at exact ties, hour-bucket carry-in, 5-second
dedup bucket edges, interval-join endpoint inclusivity, window-boundary
assignment — exactly the places where two SQL engines quietly disagree.

The hostile table (20 rows, every one on a boundary):
- calibration sources (event_id % 97 == 0): one at 10:00:00 sharp, TWO
  at the same instant 11:00:00 (the (type, ts) dedup must collapse them
  identically), one at 10:30:00.000001 for microsecond adjacency.
- as-of probes 1 microsecond before / exactly at / 1 microsecond after
  each calibration, plus a probe 13 hours later (carry-in must walk
  empty hour buckets) and a key with no calibrations at all.
- 5-second dedup bucket: same-tie duplicates, a .999999 edge, and the
  exact 5.000000 s boundary.
- an interval source (event_id % 211 == 0) with probes exactly at the
  interval's start, exactly at its end, and 1 microsecond past it.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from real_time_iot_data_engineering_pipeline_spark import registry
from .oracle_utils import compare

registry.load_all()

US = "us"


def _ts(s: str):
    import datetime as dt

    return dt.datetime.fromisoformat(s)


_ROWS = [
    # (event_id, ts, user_id, event_type, value)
    # --- calibration sources (id % 97 == 0) ---
    (97, "2024-03-01 10:00:00", 1, "click", 10.0),
    (194, "2024-03-01 11:00:00", 1, "click", 20.0),
    (291, "2024-03-01 11:00:00", 1, "click", 15.0),  # duplicate calib ts
    (388, "2024-03-01 10:30:00.000001", 2, "tap", 7.0),
    # --- as-of probes (type click) ---
    (1, "2024-03-01 09:59:59.999999", 1, "click", 1.0),  # before any calib
    (2, "2024-03-01 10:00:00", 1, "click", 2.0),  # exact tie
    (3, "2024-03-01 10:59:59.999999", 1, "click", 3.0),  # 1us before next
    (4, "2024-03-01 11:00:00", 1, "click", 4.0),  # tie w/ deduped pair
    (6, "2024-03-01 23:59:59", 1, "click", 6.0),  # 13h carry across buckets
    # --- microsecond adjacency (type tap) ---
    (7, "2024-03-01 10:30:00", 2, "tap", 7.5),  # 1us BEFORE its calib
    (8, "2024-03-01 10:30:00.000001", 2, "tap", 8.0),  # exact tie
    # --- keyless type: no calibration ever ---
    (9, "2024-03-01 12:00:00", 3, "swipe", 9.0),
    # --- 5-second dedup bucket edges (user 100) ---
    (11, "2024-03-01 12:00:00", 100, "click", 11.0),
    (12, "2024-03-01 12:00:00", 100, "click", 12.0),  # same-instant dup
    (13, "2024-03-01 12:00:04.999999", 100, "click", 13.0),  # inside bucket
    (14, "2024-03-01 12:00:05", 100, "click", 14.0),  # exact next bucket
    # --- interval source (id % 211 == 0; 211 % 7 = 1 -> +2 hours) ---
    (211, "2024-03-02 00:00:00", 4, "click", 21.0),
    (15, "2024-03-02 02:00:00", 4, "click", 15.5),  # exactly at interval end
    (16, "2024-03-02 02:00:00.000001", 4, "click", 16.0),  # 1us past end
    (17, "2024-03-01 23:59:59.999999", 4, "click", 17.0),  # 1us before start
]

# Every registered events-reading query that needs only the events table —
# each must agree with its own oracle on the hostile rows.
_PARITY_QUERIES = (
    "q_asof_join",
    "q_range_join",
    "q_dedup_window",
    "q_tumbling_agg",
    "q_hourly_agg",
    "q_daily_agg",
    "q_time_features",
    "q_sessionize",
    "q_rollup_hypertable",
    # round-10 widening: every further events-only query that is a total
    # function of arbitrary rows joins the hostile table.
    "q_active_users",
    "q_audience_setops",
    "q_behavior_signatures",
    "q_bottomk_sample",
    "q_case_status",
    "q_cast",
    "q_city_avg_compare",
    "q_click_attribution",
    "q_conversion_latency",
    "q_dedup_exact",
    "q_distinct_users",
    "q_event_pairs",
    "q_ewma_daily",
    "q_first_touch",
    "q_funnel",
    "q_gap_fill",
    "q_hash_partition",
    "q_hour_profile",
    "q_incremental_scan",
    "q_k_anonymity",
    "q_lag_features",
    "q_location_agg",
    "q_mad_outliers",
    "q_markov_transitions",
    "q_missing_days",
    "q_null_policy",
    "q_pivot_daily",
    "q_profile_events",
    "q_project_rename",
    "q_rank_per_group",
    "q_rate_limit",
    "q_retention",
    "q_session_agg",
    "q_sliding_agg",
    "q_sort_limit",
    "q_source_scan",
    "q_sudden_change",
    "q_sync_watermark",
    "q_to_timestamp",
    "q_topk_per_group",
    "q_ttl_dedup",
    "q_upsert_last_write_wins",
    "q_value_deciles",
    "q_welford_stats",
    "q_winsorize",
    "q_zscore_flag",
)


@pytest.fixture(scope="module")
def hostile_sf(tmp_path_factory) -> str:
    path = tmp_path_factory.mktemp("hostile_events")
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in _ROWS], type=pa.int64()),
            "ts": pa.array([_ts(r[1]) for r in _ROWS], type=pa.timestamp(US)),
            "user_id": pa.array([r[2] for r in _ROWS], type=pa.int64()),
            "event_type": pa.array([r[3] for r in _ROWS], type=pa.string()),
            "value": pa.array([r[4] for r in _ROWS], type=pa.float64()),
            "props": pa.array(['{"k":1}'] * len(_ROWS), type=pa.string()),
        }
    )
    pq.write_table(table, f"{path}/events.parquet")
    return str(path)


@pytest.fixture(scope="module")
def hostile_duck(hostile_sf):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{hostile_sf}/events.parquet'"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", _PARITY_QUERIES)
def test_hostile_events_parity(spark, hostile_sf, hostile_duck, name):
    sdf = registry.QUERIES[name](spark, hostile_sf).toPandas()
    ddf = hostile_duck.execute(registry.ORACLES[name]).fetchdf()
    problems = compare(sdf, ddf)
    assert not problems, f"{name}: " + " | ".join(problems)


def test_hostile_asof_semantics(spark, hostile_sf):
    """Beyond parity, the as-of answers themselves: exact tie matches
    (inclusive), 1 microsecond earlier does not, duplicate calibration
    timestamps collapse to the max value, carry-in walks empty buckets,
    and keys without calibrations keep NULLs."""
    rows = {
        r.event_id: r
        for r in registry.QUERIES["q_asof_join"](spark, hostile_sf).collect()
    }
    assert rows[1].calib_value is None  # before any calibration
    assert rows[2].calib_value == 10.0  # inclusive tie
    assert rows[3].calib_value == 10.0
    assert rows[4].calib_value == 20.0  # deduped (11:00, max(20, 15))
    assert rows[6].calib_value == 20.0  # carried across 12 empty buckets
    assert rows[7].calib_value is None  # 1us before the tap calibration
    assert rows[8].calib_value == 7.0  # microsecond-exact tie
    assert rows[9].calib_value is None  # type with no calibrations
