"""Hostile-GATE parity: malformed payloads and non-finite readings against
the validation tier — the fourth hostile suite (events boundaries, docs,
embeddings are the other three).

A 100 TB ingest WILL deliver rows like these: NaN and ±Inf sensor values,
near-overflow doubles, NULL timestamps/keys, unparseable and wrongly-typed
JSON payloads.  Two contracts are pinned:

1. ORACLE TOTALITY — the gate queries' DuckDB oracles are total functions
   of arbitrary input, matching Spark's graceful-degradation semantics
   (from_json/get_json_object return NULL on malformed JSON and on
   non-integral $.k; a strict json_extract_string would ERROR the oracle
   instead).  Parity on these rows proves the oracles model the engine,
   not a better-behaved cousin of it.

2. QUARANTINE — every hostile row is flagged by q_validate_reasons with a
   non-empty reason string, and is therefore routed to the DLQ before any
   aggregate sees it.  The aggregation tier's NaN/Inf behavior is
   explicitly OUT of contract: aggregates run on validated data by
   design (the reference's topology), and this test proves the gate makes
   that precondition real.
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from real_time_iot_data_engineering_pipeline_spark import registry
from .oracle_utils import compare

registry.load_all()

_T = dt.datetime.fromisoformat

_ROWS = [
    # (event_id, ts, user_id, event_type, value, props)
    (1, _T("2024-01-19 10:00:00"), 1, "click", 10.0, '{"k":1}'),  # clean
    (2, _T("2024-01-19 10:01:00"), 1, "click", float("nan"), '{"k":1}'),
    (3, _T("2024-01-19 10:02:00"), 1, "click", float("inf"), '{"k":1}'),
    (4, _T("2024-01-19 10:03:00"), 1, "click", float("-inf"), '{"k":1}'),
    (5, None, 1, "click", 5.0, '{"k":1}'),  # null ts
    (6, _T("2024-01-19 10:05:00"), 1, "click", None, '{"k":1}'),  # null value
    (7, _T("2024-01-19 10:06:00"), None, "click", 7.0, '{"k":1}'),  # null user
    (8, _T("2024-01-19 10:07:00"), 2, None, 8.0, '{"k":1}'),  # null type
    (9, _T("2024-01-19 10:08:00"), 2, "tap", 9.0, None),  # null props
    (10, _T("2024-01-19 10:09:00"), 2, "tap", 1e308, '{"k":1}'),  # near-max
    (11, _T("2024-01-19 10:10:00"), 2, "tap", -1e308, "not json"),
    (12, _T("2024-01-19 10:11:00"), 3, "tap", 200.0, '{"k": "str"}'),
    (13, _T("2024-01-19 10:12:00"), 3, "tap", 14.0, '{"k": "5"}'),  # quoted
    (14, _T("2024-01-19 10:13:00"), 3, "tap", 15.0, '{"k": 1.5}'),  # float k
    (15, _T("2024-01-19 10:14:00"), 3, "tap", 16.0, '{"k": 99999999999}'),
    (16, _T("2024-01-19 10:15:00"), 3, "tap", 17.0, "{}"),  # k missing
]

# Gate-tier queries (validation / routing / payload decode): total
# functions of arbitrary rows in BOTH engines.
_PARITY_QUERIES = (
    "q_filter_notnull",
    "q_filter_range",
    "q_filter_regex",
    "q_filter_freshness",
    "q_filter_completeness",
    "q_filter_typecheck",
    "q_filter_schema",
    "q_validate_reasons",
    "q_route_valid",
    "q_route_dlq",
    # q_validate_iot is excluded: its synthetic WIRE DERIVATION (mapping
    # `value` onto temperature/battery/etc readings — fixture plumbing,
    # not gate logic) casts doubles to ints and is not defined on ±Inf;
    # its actual validation rules are the same rule family checked via
    # q_validate_reasons above.
    "q_quality_counts",
    "q_quality_ratios",
    "q_outlier_flag",
    "q_json_decode",
    "q_json_roundtrip",
    # round-10 widening: the events-only analytic/behavior tier must also
    # agree with its oracles under NaN / +-Inf / near-overflow values and
    # NULL keys (the aggregation tier normally sits BEHIND the quarantine
    # gate, but parity on raw hostile rows proves the oracles model the
    # engine's numerics, not a better-behaved cousin).
    "q_active_users",
    "q_audience_setops",
    "q_behavior_signatures",
    "q_bottomk_sample",
    "q_case_status",
    "q_click_attribution",
    "q_conversion_latency",
    "q_dedup_exact",
    "q_dedup_window",
    "q_distinct_users",
    "q_event_pairs",
    "q_first_touch",
    "q_funnel",
    "q_hash_partition",
    "q_incremental_scan",
    "q_markov_transitions",
    "q_missing_days",
    "q_project_rename",
    "q_rank_per_group",
    "q_rate_limit",
    "q_retention",
    "q_sessionize",
    "q_sort_limit",
    "q_source_scan",
    "q_sync_watermark",
    "q_time_features",
    "q_to_timestamp",
    "q_topk_per_group",
    "q_ttl_dedup",
    "q_upsert_last_write_wins",
    # round-11 widening: every remaining events-only query that is a
    # total function of arbitrary rows INCLUDING non-finite values joins
    # the raw table (the serving/sketch/statistical families were in
    # neither hostile events suite until now).
    "q_autocorr",
    "q_burstiness",
    "q_chi_square",
    "q_cms_heavy_hitters",
    "q_cross_corr",
    "q_ctr_wilson",
    "q_decayed_counts",
    "q_heavy_hitters",
    "q_hll_distinct",
    "q_kaplan_meier",
    "q_kmv_setops",
    "q_ks_test",
    "q_misra_gries",
    "q_pruning_audit",
    "q_quality_alerts",
    "q_reading_gaps",
    "q_runs_test",
    "q_scd2_intervals",
    "q_seasonal_decompose",
    "q_serve_analytics",
    "q_serve_analytics_hourly",
    "q_serve_health",
    "q_serve_latest",
    "q_serve_request_audit",
    "q_serve_sensor_detail",
    "q_serve_sensors_page",
    "q_skew_report",
    "q_snapshot_diff",
    "q_trend_slope",
    "q_volume_anomaly",
    "q_cdc_apply",
)

# The NaN/±Inf/±1e308 rows sit OUTSIDE two documented numeric contracts:
# fround is defined on small-range finite doubles (Spark floor(double)->
# LONG saturates at 9.2e18 and zeroes NaN while DuckDB floor stays
# DOUBLE), and DuckDB's single-pass variance accumulator hard-errors at
# ±1e308 deviations where Spark's central-moment fold returns NaN/Inf.
# In the product topology these queries consume gate-passed rows only
# (test_gate_quarantines_every_hostile_row pins that every non-finite row
# is DLQ-routed first), so instead of excluding them the suite runs them
# on the CLAMPED twin of the fixture — identical hostile topology (NULL
# ts/user/type/value/props, malformed JSON, every payload edge) with the
# non-finite magnitudes clamped to extreme-but-in-contract finite values.
# A staleness guard below re-runs each on the RAW table so one that
# starts passing there must be consciously promoted to _PARITY_QUERIES.
_CLAMPED_VALUES = {2: 9.0e8, 3: 8.5e8, 4: -8.5e8, 10: 9.2e8, 11: -9.2e8}
_CLAMPED_PARITY_QUERIES = (
    "q_cube_summary",
    "q_cusum",
    "q_cusum_alarm",
    "q_dod_change",
    "q_gap_interp",
    "q_grouping_sets",
    "q_ivm_merge",
    "q_join_salted",
    "q_mann_whitney",
    "q_mart_daily_sql",
    "q_mart_hourly_sql",
    "q_mart_location_sql",
    "q_psi",
    "q_quantile_summary",
    "q_rolling_7d",
    "q_rolling_corr",
    "q_rolling_median",
    "q_salted_agg",
    "q_validate_iot",
    "q_welch_ttest",
)


@pytest.fixture(scope="module")
def hostile_gate_sf(tmp_path_factory) -> str:
    path = tmp_path_factory.mktemp("hostile_gate")
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in _ROWS], type=pa.int64()),
                "ts": pa.array([r[1] for r in _ROWS], type=pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in _ROWS], type=pa.int64()),
                "event_type": pa.array(
                    [r[3] for r in _ROWS], type=pa.string()
                ),
                "value": pa.array([r[4] for r in _ROWS], type=pa.float64()),
                "props": pa.array([r[5] for r in _ROWS], type=pa.string()),
            }
        ),
        f"{path}/events.parquet",
    )
    return str(path)


@pytest.fixture(scope="module")
def hostile_gate_duck(hostile_gate_sf):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{hostile_gate_sf}/events.parquet'"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", _PARITY_QUERIES)
def test_hostile_gate_parity(spark, hostile_gate_sf, hostile_gate_duck, name):
    sdf = registry.QUERIES[name](spark, hostile_gate_sf).toPandas()
    ddf = hostile_gate_duck.execute(registry.ORACLES[name]).fetchdf()
    problems = compare(sdf, ddf)
    assert not problems, f"{name}: " + " | ".join(problems)


@pytest.fixture(scope="module")
def clamped_gate_sf(tmp_path_factory) -> str:
    path = tmp_path_factory.mktemp("hostile_gate_clamped")
    rows = [
        (r[0], r[1], r[2], r[3], _CLAMPED_VALUES.get(r[0], r[4]), r[5])
        for r in _ROWS
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], type=pa.int64()),
                "event_type": pa.array([r[3] for r in rows], type=pa.string()),
                "value": pa.array([r[4] for r in rows], type=pa.float64()),
                "props": pa.array([r[5] for r in rows], type=pa.string()),
            }
        ),
        f"{path}/events.parquet",
    )
    return str(path)


@pytest.fixture(scope="module")
def clamped_gate_duck(clamped_gate_sf):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{clamped_gate_sf}/events.parquet'"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", _CLAMPED_PARITY_QUERIES)
def test_clamped_gate_parity(spark, clamped_gate_sf, clamped_gate_duck, name):
    sdf = registry.QUERIES[name](spark, clamped_gate_sf).toPandas()
    ddf = clamped_gate_duck.execute(registry.ORACLES[name]).fetchdf()
    problems = compare(sdf, ddf)
    assert not problems, f"{name}: " + " | ".join(problems)


def test_clamped_queries_still_diverge_on_raw_rows(
    spark, hostile_gate_sf, hostile_gate_duck
):
    """Honesty guard (same contract as test_hostile_embeddings): a query
    on the clamped list that starts agreeing with its oracle on the RAW
    non-finite rows must be consciously promoted to _PARITY_QUERIES."""
    stale = []
    for name in _CLAMPED_PARITY_QUERIES:
        try:
            sdf = registry.QUERIES[name](spark, hostile_gate_sf).toPandas()
            ddf = hostile_gate_duck.execute(registry.ORACLES[name]).fetchdf()
            problems = compare(sdf, ddf)
        except Exception:
            problems = ["raised"]
        if not problems:
            stale.append(name)
    assert not stale, f"clamped-list queries now PASS raw hostile parity: {stale}"


def test_gate_quarantines_every_hostile_row(spark, hostile_gate_sf):
    """The precondition the aggregation tier relies on: every non-clean
    hostile row carries a non-empty failure reason (NaN/±Inf/overflow fail
    the range rule — IEEE comparisons with NaN are false in both engines —
    and null/malformed fields fail their own rules), so the router sends
    it to the DLQ before any window aggregate sees it."""
    rows = {
        r.event_id: r
        for r in registry.QUERIES["q_validate_reasons"](
            spark, hostile_gate_sf
        ).collect()
    }
    # The gate's payload rule is TOLERANT (k castable to DOUBLE), matching
    # the reference's validation_consumer: quoted digits (13), float k (14)
    # and big-but-double k (15) are valid payloads; only 'str', malformed,
    # NULL and missing k are bad_type.  The STRICT int decode is
    # q_json_decode/q_filter_schema territory (see the edge matrix below).
    clean = {1, 13, 14, 15}
    for eid, r in rows.items():
        if eid in clean:
            assert r.failure_reasons == "", (eid, r.failure_reasons)
        else:
            assert r.failure_reasons != "", f"hostile row {eid} passed the gate"


def test_json_decode_edge_matrix(spark, hostile_gate_sf):
    """from_json("k INT") strictness, row by row: integral in-range json
    numbers decode; quoted digits, floats, overflow, wrong types, missing
    keys, malformed and NULL payloads all decode to NULL (never error)."""
    rows = {
        r.event_id: r.k_value
        for r in registry.QUERIES["q_json_decode"](
            spark, hostile_gate_sf
        ).collect()
    }
    assert rows[1] == 1
    for eid in (9, 11, 12, 13, 14, 15, 16):
        assert rows[eid] is None, (eid, rows[eid])
