"""Read-path serving layer: the reference's REST API surface as
parameterized DataFrame queries.

The reference ships a 17-line placeholder (api/main.py:1-17) plus a full
spec (Learning Guide.txt:1084, Topic 7): GET /sensors (latest reading per
sensor, optional location/status filters, limit, 1-minute cache TTL),
GET /analytics/{sensor_id} (start/end date, hourly|daily granularity,
avg/max/min, start<=end and <=90-day range validation, 5-minute cache TTL),
GET /health (latest data timestamp, recent failures).  The reference serves
these from PostgreSQL read replicas; here each endpoint is a parameterized
DataFrame query over the engine's own tables, so the serving tier rides the
same Catalyst scan path (partition pruning on the date filter, predicate
pushdown on sensor_id) instead of a second storage system.

Scale design:
- latest-per-sensor is a struct-max argmax — one shuffle with map-side
  partial aggregation on the high-cardinality sensor key, never a window
  over the full history.  location/status filters apply to the one-row-per-
  sensor result; `limit` becomes TakeOrderedAndProject.
- analytics filters (sensor_id equality + closed date range) sit directly
  on the scan, so a date-partitioned production layout prunes to <=91
  partitions and the pushed sensor filter skips row groups.
- health is a single conditional-aggregation pass (no second scan for the
  failure counts).
- Result sets are API-sized by construction (<=n_sensors rows, <=91*24
  buckets, 1 health row), so the driver-side collect in ServingLayer is
  bounded no matter the corpus size.

Error mapping follows the spec: InvalidQueryError <-> 400,
SensorNotFoundError <-> 404.  Status vocabulary reuses the engine's mart
taxonomy (Working / Recalibration_needed / Faulty, queries/marts.py CASE —
Learning Guide §2-L2 sensor_status) rather than inventing a second one.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from datetime import date, timedelta
from typing import Any, Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.rounding import fround
from .sources import load_table

MAX_RANGE_DAYS = 90  # Learning Guide.txt:1084 "Validate date ranges (max 90 days)"
SENSORS_TTL_SEC = 60.0  # GET /sensors "Cache: 1 minute TTL"
ANALYTICS_TTL_SEC = 300.0  # GET /analytics "Cache: 5 minutes TTL"
FRESH_WITHIN_SEC = 300  # monitoring spec: alert if data older than 5 minutes

GRANULARITIES = ("hourly", "daily")
STATUSES = ("Working", "Recalibration_needed", "Faulty")


class InvalidQueryError(ValueError):
    """400-analog: malformed parameters (bad range, granularity, limit)."""


class SensorNotFoundError(LookupError):
    """404-analog: sensor_id has no readings in the requested source."""


def _status_col(value: Column) -> Column:
    """Learning Guide §2-L2 sensor_status thresholds (same CASE as the
    marts layer, queries/marts.py:46-48)."""
    return (
        F.when(value > 90, "Faulty")
        .when(value > 75, "Recalibration_needed")
        .otherwise("Working")
    )


def sensors_latest_frame(
    events: DataFrame,
    location: str | None = None,
    status: str | None = None,
    limit: int | None = None,
) -> DataFrame:
    """GET /sensors: one row per sensor with its latest reading.

    Argmax via struct-max — max(struct(ts, event_id, payload...)) compares
    lexicographically, so the winner is the latest ts with event_id as the
    total tiebreak; the payload fields ride along without affecting order.
    This partial-aggregates map-side (each task emits one candidate per
    sensor) and shuffles one row per (task, sensor) — scale-safe where a
    row_number window over the full history would sort everything.
    """
    if status is not None and status not in STATUSES:
        raise InvalidQueryError(f"status must be one of {STATUSES}: {status!r}")
    if limit is not None and limit <= 0:
        raise InvalidQueryError(f"limit must be positive: {limit}")
    latest = (
        events.groupBy("user_id")
        .agg(F.max(F.struct("ts", "event_id", "value", "event_type")).alias("m"))
        .select(
            "user_id",
            F.col("m.ts").alias("last_ts"),
            F.col("m.event_id").alias("last_event_id"),
            F.col("m.value").alias("last_value"),
            F.col("m.event_type").alias("location"),
        )
        .withColumn("sensor_status", _status_col(F.col("last_value")))
    )
    if location is not None:
        latest = latest.filter(F.col("location") == location)
    if status is not None:
        latest = latest.filter(F.col("sensor_status") == status)
    if limit is not None:
        # Deterministic pagination: stable key order -> TakeOrderedAndProject.
        latest = latest.orderBy("user_id").limit(limit)
    return latest


def sensor_analytics_frame(
    events: DataFrame,
    sensor_id: int,
    start_date: str,
    end_date: str,
    granularity: str = "daily",
) -> DataFrame:
    """GET /analytics/{sensor_id}: avg/max/min time series for one sensor.

    Dates are inclusive ISO days; the spec's guards (start<=end, <=90 days,
    hourly|daily) raise InvalidQueryError before any Spark work.  Both
    predicates (sensor equality, closed ts range) land on the scan for
    pushdown/pruning; the aggregate is one partial+final pass over the
    pruned slice.
    """
    if granularity not in GRANULARITIES:
        raise InvalidQueryError(
            f"granularity must be one of {GRANULARITIES}: {granularity!r}"
        )
    try:
        start, end = date.fromisoformat(start_date), date.fromisoformat(end_date)
    except ValueError as e:
        raise InvalidQueryError(f"dates must be YYYY-MM-DD: {e}") from e
    if start > end:
        raise InvalidQueryError(f"start_date {start} is after end_date {end}")
    if (end - start).days > MAX_RANGE_DAYS:
        raise InvalidQueryError(
            f"range {start}..{end} exceeds {MAX_RANGE_DAYS} days"
        )
    lo = F.lit(start.isoformat() + " 00:00:00").cast("timestamp_ntz")
    hi = F.lit((end + timedelta(days=1)).isoformat() + " 00:00:00").cast(
        "timestamp_ntz"
    )
    unit = "hour" if granularity == "hourly" else "day"
    return (
        events.filter(
            (F.col("user_id") == F.lit(sensor_id))
            & (F.col("ts") >= lo)
            & (F.col("ts") < hi)
        )
        .groupBy(F.date_trunc(unit, "ts").alias("bucket"))
        .agg(
            F.count("*").cast("bigint").alias("n_readings"),
            fround(F.avg("value")).alias("avg_value"),
            F.max("value").alias("max_value"),
            F.min("value").alias("min_value"),
        )
    )


def sensor_detail_frame(events: DataFrame, sensor_id: int) -> DataFrame:
    """GET /sensors/{sensor_id}: one sensor's latest reading plus lifetime
    stats — the detail view the spec's list endpoint links to (the spec's
    404 what-if: "What if sensor_id doesn't exist?" — an empty frame here
    is what ServingLayer.sensor maps to SensorNotFoundError).

    The sensor-equality predicate sits directly on the scan (pushdown /
    row-group skip); the rest is one aggregate over the pruned slice, so
    the detail read never touches other sensors' data.
    """
    one = events.filter(F.col("user_id") == F.lit(int(sensor_id)))
    return (
        one.groupBy("user_id")
        .agg(
            F.max(F.struct("ts", "event_id", "value", "event_type")).alias("m"),
            F.min("ts").alias("first_ts"),
            F.count("*").cast("bigint").alias("n_readings"),
            fround(F.avg("value")).alias("avg_value"),
            F.max("value").alias("max_value"),
            F.min("value").alias("min_value"),
        )
        .select(
            "user_id",
            F.col("m.ts").alias("last_ts"),
            F.col("m.event_id").alias("last_event_id"),
            F.col("m.value").alias("last_value"),
            F.col("m.event_type").alias("location"),
            _status_col(F.col("m.value")).alias("sensor_status"),
            "first_ts",
            "n_readings",
            "avg_value",
            "max_value",
            "min_value",
        )
    )


def classify_requests_frame(events: DataFrame, requests: DataFrame) -> DataFrame:
    """Batch twin of the API's request-validation / error mapping
    (Learning Guide.txt:1084 §3-4: 400 invalid parameters, 404 sensor not
    found, else 200): given a frame of candidate /analytics requests
    (request_id, sensor_id, start_date, end_date, granularity), return
    each request's HTTP status, the machine-readable reason, and the row
    count a 200 would serve.

    Same rules as sensor_analytics_frame's guards, expressed as column
    predicates so a replay/audit log of requests can be validated in bulk:
    parseable ISO dates (try_cast), start <= end, range <= MAX_RANGE_DAYS,
    granularity in GRANULARITIES; then 404 when the sensor has no readings
    inside the closed range.

    Scale: the request table is API-log-sized next to the fact table, so
    it broadcasts; the events scan joins it on sensor equality + ts range
    and partial-aggregates per request before the (tiny) final shuffle —
    one pass over events no matter how many requests ride along.
    """
    req = requests.select(
        "request_id",
        "sensor_id",
        F.col("start_date").try_cast("date").alias("start_d"),
        F.col("end_date").try_cast("date").alias("end_d"),
        "granularity",
    )
    reason = (
        F.when(
            F.col("start_d").isNull() | F.col("end_d").isNull(),
            "bad_date_format",
        )
        .when(F.col("start_d") > F.col("end_d"), "start_after_end")
        .when(
            F.datediff(F.col("end_d"), F.col("start_d")) > MAX_RANGE_DAYS,
            "range_over_90_days",
        )
        .when(~F.col("granularity").isin(*GRANULARITIES), "bad_granularity")
    )
    checked = req.withColumn("reason", reason)
    valid = checked.filter(F.col("reason").isNull()).select(
        "request_id",
        "sensor_id",
        F.col("start_d").cast("timestamp_ntz").alias("lo"),
        F.date_add(F.col("end_d"), 1).cast("timestamp_ntz").alias("hi"),
    )
    counts = (
        events.join(
            F.broadcast(valid),
            (F.col("user_id") == F.col("sensor_id"))
            & (F.col("ts") >= F.col("lo"))
            & (F.col("ts") < F.col("hi")),
            "inner",
        )
        .groupBy("request_id")
        .agg(F.count("*").cast("bigint").alias("n_rows"))
    )
    return (
        checked.join(counts, "request_id", "left")
        .select(
            "request_id",
            "sensor_id",
            "granularity",
            F.when(F.col("reason").isNotNull(), 400)
            .when(F.col("n_rows").isNull(), 404)
            .otherwise(200)
            .cast("int")
            .alias("status_code"),
            F.coalesce(
                "reason",
                F.when(F.col("n_rows").isNull(), "sensor_not_found"),
            ).alias("error_reason"),
            F.coalesce("n_rows", F.lit(0)).cast("bigint").alias("n_rows"),
        )
    )


def dashboard_latest_frame(aggs: DataFrame) -> DataFrame:
    """The reference dashboard's read path (docs/topic3_usage_guide.md:
    187-189): the continuously-upserted window-aggregate table, reduced to
    each sensor's LATEST window.  Same struct-max argmax as the /sensors
    listing, but over the streaming sink's (user_id, window_start) keyed
    state instead of raw events — the table the API actually serves in the
    reference architecture (Kafka -> Spark -> Mongo -> Postgres -> API).

    Input schema is streaming/pipeline.windowed_aggregate's output; the
    argmax rides (window_start, window_end) so sliding windows tie-break
    deterministically."""
    return (
        aggs.groupBy("user_id")
        .agg(
            F.max(
                F.struct(
                    "window_start",
                    "window_end",
                    "avg_value",
                    "max_value",
                    "min_value",
                    "count",
                    "event_type",
                )
            ).alias("m")
        )
        .select(
            "user_id",
            F.col("m.window_start").alias("window_start"),
            F.col("m.window_end").alias("window_end"),
            F.col("m.avg_value").alias("avg_value"),
            F.col("m.max_value").alias("max_value"),
            F.col("m.min_value").alias("min_value"),
            F.col("m.count").alias("n_readings"),
            F.col("m.event_type").alias("location"),
            _status_col(F.col("m.avg_value")).alias("sensor_status"),
        )
    )


def health_frame(events: DataFrame, now: str) -> DataFrame:
    """GET /health: latest data timestamp, freshness vs `now`, last-24h
    volume and failure count, and an ok/stale verdict (monitoring spec:
    data older than 5 minutes alerts).

    `now` is an explicit 'YYYY-MM-DD HH:MM:SS' wall-clock parameter, never
    the machine clock — the reference compares against wall-clock inside
    the query (a replay-hostile bug, SURVEY §4.4-3); an injected `now` keeps
    replays and the oracle deterministic.  One conditional-aggregation scan;
    freshness is an exact whole-microsecond integer (both engines count
    microsecond boundaries identically on micro-precision data).
    """
    now_ts = F.lit(now).cast("timestamp_ntz")
    day_ago = F.expr(f"TIMESTAMP_NTZ '{now}' - INTERVAL 24 HOURS")
    recent = (F.col("ts") >= day_ago) & (F.col("ts") < now_ts)
    return (
        events.agg(
            F.max("ts").alias("latest_ts"),
            F.count(F.when(recent, 1)).cast("bigint").alias("n_recent_24h"),
            F.count(F.when(recent & (F.col("value") > 90), 1))
            .cast("bigint")
            .alias("n_faulty_24h"),
        )
        .withColumn(
            "freshness_sec",
            (
                F.expr(
                    f"timestampdiff(MICROSECOND, latest_ts, TIMESTAMP_NTZ '{now}')"
                )
                / F.lit(1_000_000)
            )
            .cast("bigint"),
        )
        .withColumn(
            "status",
            F.when(F.col("freshness_sec") <= FRESH_WITHIN_SEC, "ok").otherwise(
                "stale"
            ),
        )
    )


@dataclass
class _TTLCache:
    """Deterministic TTL cache with an injectable clock (no wall-clock in
    tests).  Keyed on the full parameter tuple, exactly like the spec's
    per-query-string HTTP cache."""

    ttl: float
    clock: Callable[[], float]
    _store: dict[tuple, tuple[float, Any]] = field(default_factory=dict)
    hits: int = 0
    misses: int = 0

    def get_or_compute(self, key: tuple, compute: Callable[[], Any]) -> Any:
        now = self.clock()
        hit = self._store.get(key)
        if hit is not None and now - hit[0] < self.ttl:
            self.hits += 1
            return hit[1]
        self.misses += 1
        value = compute()
        self._store[key] = (now, value)
        return value


class ServingLayer:
    """The three endpoints bound to a SparkSession + fixture dir, with the
    spec's cache TTLs (sensors 60 s, analytics 300 s).  Collected results
    are API-sized by construction (see module docstring), so caching rows
    driver-side mirrors the reference's PostgreSQL-result cache."""

    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str,
        clock: Callable[[], float] = time.monotonic,
        aggregates: Callable[[], DataFrame] | None = None,
    ) -> None:
        self._spark = spark
        self._sf_dir = sf_dir
        self._aggregates = aggregates
        self._sensors_cache = _TTLCache(SENSORS_TTL_SEC, clock)
        self._analytics_cache = _TTLCache(ANALYTICS_TTL_SEC, clock)

    def _events(self) -> DataFrame:
        return load_table(self._spark, self._sf_dir, "events")

    def sensors(
        self,
        location: str | None = None,
        status: str | None = None,
        limit: int | None = None,
    ) -> list[dict]:
        key = ("sensors", location, status, limit)
        return self._sensors_cache.get_or_compute(
            key,
            lambda: [
                r.asDict()
                for r in sensors_latest_frame(
                    self._events(), location, status, limit
                )
                .orderBy("user_id")
                .collect()
            ],
        )

    def sensor(self, sensor_id: int) -> dict:
        """GET /sensors/{sensor_id}: detail view; 404-analog when the id
        has no readings (spec what-if: "What if sensor_id doesn't exist?
        -> Return 404 with clear message")."""
        key = ("sensor", sensor_id)

        def compute() -> dict:
            rows = sensor_detail_frame(self._events(), sensor_id).collect()
            if not rows:
                raise SensorNotFoundError(f"sensor {sensor_id} has no readings")
            return rows[0].asDict()

        return self._sensors_cache.get_or_compute(key, compute)

    def analytics(
        self,
        sensor_id: int,
        start_date: str,
        end_date: str,
        granularity: str = "daily",
    ) -> list[dict]:
        key = ("analytics", sensor_id, start_date, end_date, granularity)

        def compute() -> list[dict]:
            rows = (
                sensor_analytics_frame(
                    self._events(), sensor_id, start_date, end_date, granularity
                )
                .orderBy("bucket")
                .collect()
            )
            if not rows:
                raise SensorNotFoundError(
                    f"sensor {sensor_id} has no readings in "
                    f"{start_date}..{end_date}"
                )
            return [r.asDict() for r in rows]

        return self._analytics_cache.get_or_compute(key, compute)

    def dashboard(self) -> list[dict]:
        """Dashboard read over the LIVE streaming sink: latest window per
        sensor from the continuously-upserted aggregate table (requires the
        `aggregates` source, e.g. `run_topology(...).aggregates.read`).
        Cached on the /sensors TTL — mid-stream readers see at-most-60s-old
        state, exactly the spec's freshness contract."""
        if self._aggregates is None:
            raise InvalidQueryError(
                "no aggregates source wired; pass aggregates= to ServingLayer"
            )
        return self._sensors_cache.get_or_compute(
            ("dashboard",),
            lambda: [
                r.asDict()
                for r in dashboard_latest_frame(self._aggregates())
                .orderBy("user_id")
                .collect()
            ],
        )

    def health(self, now: str) -> dict:
        [row] = health_frame(self._events(), now).collect()
        return row.asDict()

    @property
    def cache_stats(self) -> dict:
        return {
            "sensors": (self._sensors_cache.hits, self._sensors_cache.misses),
            "analytics": (
                self._analytics_cache.hits,
                self._analytics_cache.misses,
            ),
        }
