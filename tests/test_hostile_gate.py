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
