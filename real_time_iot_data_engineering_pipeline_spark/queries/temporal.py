"""Temporal join / rollup family: as-of join, interval (range) join, and a
hypertable-style multi-granularity rollup.

The brief's custom-operator list names exactly these (as-of join, range
join, hypertable rollup) as operators Spark lacks as single calls but a
time-series user of the reference pipeline needs on day one: attach the
most recent calibration to each reading, count readings inside maintenance
windows, and serve hour/day/total aggregates from one pass.

All three are expressed as compositions of built-in DataFrame ops (option
(a) of the brief's custom-operator ladder) — no UDFs, no mapInPandas — so
Catalyst/Tungsten keep whole-stage codegen end-to-end.

Fixture derivations (everything comes from `events`, TESTDATA.md):
- calibrations = rows where event_id % 97 == 0 (irregular, data-driven
  timestamps — an equi-join cannot express the match), deduped per
  (event_type, ts) by max(value) so both engines pick the same row;
- maintenance intervals = rows where event_id % 211 == 0, each spanning
  [ts, ts + (1 + event_id % 7) hours) — variable multi-hour widths so the
  bucketed join genuinely explodes intervals across buckets.

Scale design (SCALE.md "Temporal" section):
- as-of join: the textbook plan (window over key ORDER BY ts) dies on
  low-cardinality keys — 5 event types would mean 5 straggler partitions
  at 100 TB.  Instead: bucket time (hour), run the ordered window inside
  (key, bucket) — cardinality keys x hours, parallelism grows with the
  time range — and close the per-bucket boundary with a carry-in computed
  on the keys x buckets summary table (metadata-scale, the only
  low-cardinality window, explicitly bounded).
- range join: never an inequality-only join (BroadcastNestedLoop / O(n*m)).
  Intervals explode to the hour-buckets they cover, events equi-join on
  (key, bucket) with the precise range predicate as a residual; an event's
  bucket is unique so no post-join dedup is needed.
- rollup: Spark's Expand produces all grouping sets in ONE scan with
  map-side partial aggregation (shuffle = levels x group cardinality, not
  levels x data) — the continuous-aggregate answer to running N jobs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import fround, fround_sql
from ..registry import register
from ..sources import load_table

# Sampling moduli for the fixture-derived dimension tables (arbitrary primes
# so calibration/interval timestamps are irregular w.r.t. wall-clock).
_CALIB_MOD = 97
_INTERVAL_MOD = 211

# As-of bucket granularity.  Finer buckets = more (key, bucket) partitions =
# more parallelism; the carry-in summary stays keys x buckets (metadata
# scale).  Hour gives 5 x ~720 = 3,600 partitions on the 30-day fixture and
# scales linearly with the covered time range on a cluster.
_ASOF_BUCKET = "hour"

_CALIB_STRUCT = "struct<calib_ts:timestamp_ntz,calib_value:double>"


def _events_ntz(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def _calibrations(ev: DataFrame) -> DataFrame:
    """Irregular per-type calibration table sampled from the stream; deduped
    per (event_type, ts) so the as-of match is unique on both engines."""
    return (
        ev.filter((F.col("event_id") % _CALIB_MOD == 0) & F.col("ts").isNotNull())
        .groupBy("event_type", F.col("ts").alias("calib_ts"))
        .agg(F.max("value").alias("calib_value"))
    )


def asof_join(
    events: DataFrame,
    calib: DataFrame,
    key: str = "event_type",
    ts: str = "ts",
) -> DataFrame:
    """Bucketed two-phase as-of join: attach the most recent calibration row
    at-or-before each event's timestamp (inclusive, like DuckDB ASOF and
    pandas merge_asof).  Events with no prior calibration keep NULLs; NULL
    event timestamps never match.

    Phase 1 (parallel): union calibrations into the event stream, window
    inside (key, hour-bucket) ordered by (ts, calib-first) and carry the
    last calibration struct forward — partitions are keys x hours, never
    keys alone.
    Phase 2 (metadata-scale): each bucket's carry-in (the last calibration
    strictly before the bucket) comes from a window over the per-(key,
    bucket) summary — keys x buckets rows, broadcast back onto the events.

    Preconditions: `calib` unique per (key, ts) — dedupe first (as
    _calibrations does) or the match is engine-nondeterministic.  The
    carry broadcast assumes keys x buckets stays dimension-sized (true
    for device-type keys); for million-sensor keys drop the broadcast
    hint and let the carry join shuffle on (key, bucket) — same plan
    shape, and the carry window then partitions by a high-card key too.
    """
    bucket = F.date_trunc(_ASOF_BUCKET, F.col(ts)).alias("_bucket")

    dated = events.filter(F.col(ts).isNotNull())
    cal = calib.withColumn("_bucket", F.date_trunc(_ASOF_BUCKET, "calib_ts"))

    # Per-(key, bucket) last calibration: max over struct orders by calib_ts
    # first, and (key, _bucket, calib_ts) is unique after the dedup above.
    last_in_bucket = cal.groupBy(key, "_bucket").agg(
        F.max(F.struct("calib_ts", "calib_value")).alias("_cs")
    )
    # Bucket spine = every (key, bucket) that holds an event or calibration;
    # the carry-in for a bucket is the latest calibration in any EARLIER
    # bucket.  This is the one low-cardinality window in the operator and it
    # runs over keys x buckets summary rows only.
    spine = (
        dated.select(key, bucket)
        .unionByName(cal.select(key, "_bucket"))
        .distinct()
    )
    w_carry = (
        Window.partitionBy(key)
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = spine.join(last_in_bucket, [key, "_bucket"], "left").select(
        key,
        "_bucket",
        F.last("_cs", ignorenulls=True).over(w_carry).alias("_carry"),
    )

    # Tagged union: calibrations sort before events at equal timestamps so
    # the running last() makes the match inclusive (ts >= calib_ts).
    ev_tagged = dated.select(
        "event_id",
        F.col(ts),
        F.col(key),
        "value",
        bucket,
        F.lit(0).alias("_is_calib"),
        F.lit(None).cast(_CALIB_STRUCT).alias("_cs"),
    )
    cal_tagged = cal.select(
        F.lit(None).cast("bigint").alias("event_id"),
        F.col("calib_ts").alias(ts),
        F.col(key),
        F.lit(None).cast("double").alias("value"),
        F.col("_bucket"),
        F.lit(1).alias("_is_calib"),
        F.struct("calib_ts", "calib_value").alias("_cs"),
    )
    w_asof = (
        Window.partitionBy(key, "_bucket")
        .orderBy(F.col(ts).asc(), F.col("_is_calib").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = (
        ev_tagged.unionByName(cal_tagged)
        .withColumn("_cs", F.last("_cs", ignorenulls=True).over(w_asof))
        .filter(F.col("_is_calib") == 0)
    )
    matched = (
        within.join(F.broadcast(carry), [key, "_bucket"], "left")
        .withColumn("_cs", F.coalesce("_cs", "_carry"))
        .select(
            "event_id",
            ts,
            key,
            "value",
            F.col("_cs.calib_ts").alias("calib_ts"),
            F.col("_cs.calib_value").alias("calib_value"),
        )
    )
    # NULL-timestamp events can never match but must survive (left-join
    # semantics, mirroring ASOF LEFT JOIN).
    null_ts = events.filter(F.col(ts).isNull()).select(
        "event_id",
        ts,
        key,
        "value",
        F.lit(None).cast("timestamp_ntz").alias("calib_ts"),
        F.lit(None).cast("double").alias("calib_value"),
    )
    return matched.unionByName(null_ts)


@register(
    "q_asof_join",
    oracle="""
    WITH calib AS (
        SELECT event_type,
               CAST(ts AS TIMESTAMP) AS calib_ts,
               max(value) AS calib_value
        FROM events
        WHERE event_id % 97 = 0 AND ts IS NOT NULL
        GROUP BY event_type, CAST(ts AS TIMESTAMP)
    )
    SELECT e.event_id,
           CAST(e.ts AS TIMESTAMP) AS ts,
           e.event_type,
           e.value,
           c.calib_ts,
           c.calib_value
    FROM events e ASOF LEFT JOIN calib c
      ON e.event_type = c.event_type AND CAST(e.ts AS TIMESTAMP) >= c.calib_ts
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-recent-calibration attach: every reading joined to the latest
    calibration row at-or-before its event time for the same device type —
    the canonical time-series enrichment an equi-join cannot express.
    Oracle uses DuckDB's native ASOF LEFT JOIN; the Spark plan is the
    bucketed two-phase composition in asof_join() above."""
    ev = _events_ntz(spark, sf_dir)
    return asof_join(ev, _calibrations(ev))


@register(
    "q_range_join",
    oracle=f"""
    WITH iv AS (
        SELECT event_id AS interval_id,
               event_type,
               CAST(ts AS TIMESTAMP) AS start_ts,
               CAST(ts AS TIMESTAMP)
                   + INTERVAL 1 HOUR * (1 + event_id % 7) AS end_ts
        FROM events
        WHERE event_id % 211 = 0 AND ts IS NOT NULL
    )
    SELECT iv.interval_id,
           iv.event_type,
           iv.start_ts,
           iv.end_ts,
           CAST(count(e.event_id) AS BIGINT) AS n_events,
           {fround_sql("avg(e.value)")} AS avg_value
    FROM iv LEFT JOIN events e
      ON e.event_type = iv.event_type
     AND CAST(e.ts AS TIMESTAMP) >= iv.start_ts
     AND CAST(e.ts AS TIMESTAMP) < iv.end_ts
    GROUP BY iv.interval_id, iv.event_type, iv.start_ts, iv.end_ts
    """,
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join: per maintenance window, the count and mean of
    same-type readings whose timestamp falls inside [start, end).

    Plan shape: intervals explode to the hour-buckets they cover
    (sequence + explode), events carry their own hour-bucket, and the join
    is a BROADCAST equi-join on (event_type, bucket) with the precise range
    check as a residual predicate — never an inequality-only
    BroadcastNestedLoop.  An event's bucket is unique, so each event meets
    each interval at most once and no dedup is needed.  Empty intervals are
    restored by a final broadcast left join (n_events = 0, avg NULL on both
    engines)."""
    ev = _events_ntz(spark, sf_dir)
    iv = ev.filter(
        (F.col("event_id") % _INTERVAL_MOD == 0) & F.col("ts").isNotNull()
    ).select(
        F.col("event_id").alias("interval_id"),
        "event_type",
        F.col("ts").alias("start_ts"),
        F.expr("timestampadd(HOUR, CAST(1 + event_id % 7 AS INT), ts)").alias(
            "end_ts"
        ),
    )
    return range_join(ev, iv)


def range_join(
    events: DataFrame,
    intervals: DataFrame,
    key: str = "event_type",
    ts: str = "ts",
) -> DataFrame:
    """Bucketed interval join: per interval, the count and mean value of
    same-key events with start_ts <= event ts < end_ts.

    `intervals` must carry (interval_id, key, start_ts, end_ts) with
    end_ts > start_ts.  Intervals explode to the hour-buckets they cover;
    events equi-join on (key, bucket) broadcast-side with the precise
    range predicate as a residual — the explode factor is bounded by
    interval width / bucket width, and an event's unique bucket means no
    post-join dedup.  Intervals with no events survive with n_events = 0
    and NULL avg (the broadcast left join-back)."""
    iv_exp = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.date_trunc("hour", "start_ts"),
                F.date_trunc(
                    "hour", F.expr("timestampadd(MICROSECOND, -1, end_ts)")
                ),
                F.expr("INTERVAL 1 HOUR"),
            )
        ),
    )
    ev_b = events.filter(F.col(ts).isNotNull()).select(
        "event_id",
        F.col(key),
        F.col(ts),
        "value",
        F.date_trunc("hour", ts).alias("_bucket"),
    )
    hits = ev_b.join(
        F.broadcast(iv_exp),
        on=[
            ev_b[key] == iv_exp[key],
            ev_b["_bucket"] == iv_exp["_bucket"],
            ev_b[ts] >= iv_exp.start_ts,
            ev_b[ts] < iv_exp.end_ts,
        ],
        how="inner",
    ).groupBy("interval_id").agg(
        F.count("event_id").cast("long").alias("n_events"),
        fround(F.avg("value"), 4).alias("avg_value"),
    )
    return (
        intervals.join(F.broadcast(hits), "interval_id", "left")
        .select(
            "interval_id",
            key,
            "start_ts",
            "end_ts",
            F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
            "avg_value",
        )
    )


_GAP_HOURS = 24


@register(
    "q_reading_gaps",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id,
               CAST(ts AS TIMESTAMP) AS ts,
               lead(CAST(ts AS TIMESTAMP)) OVER (
                   PARTITION BY user_id
                   ORDER BY CAST(ts AS TIMESTAMP), event_id
               ) AS next_ts
        FROM events
        WHERE ts IS NOT NULL
    )
    SELECT user_id,
           ts AS gap_start,
           next_ts AS gap_end,
           CAST(floor(epoch(next_ts)) - floor(epoch(ts)) AS BIGINT)
               AS gap_seconds
    FROM ordered
    WHERE next_ts - ts > INTERVAL {_GAP_HOURS} HOUR
    """,
)
def q_reading_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sensor-outage detection: consecutive readings from the same sensor
    more than 24 hours apart — the gap/island operator every IoT fleet
    monitor needs (the reference's freshness check only sees the LAST
    reading; this finds every historical outage).

    Scale: one window over the HIGH-cardinality sensor key ordered by
    (ts, event_id) — partitions shard across executors; lead(1) needs no
    frame buffer.  The gap predicate compares raw microsecond timestamps
    (timestampadd), and the reported duration truncates both endpoints to
    whole seconds first (the repo's cross-engine duration convention —
    Spark's timestampdiff counts complete units, DuckDB's epoch floors)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        ev.select("user_id", "ts", "event_id")
        .withColumn("next_ts", F.lead("ts").over(w))
        .filter(
            F.col("next_ts") > F.expr(f"timestampadd(HOUR, {_GAP_HOURS}, ts)")
        )
        .select(
            "user_id",
            F.col("ts").alias("gap_start"),
            F.col("next_ts").alias("gap_end"),
            F.expr(
                "timestampdiff(SECOND, date_trunc('second', ts),"
                " date_trunc('second', next_ts))"
            )
            .cast("long")
            .alias("gap_seconds"),
        )
    )


@register(
    "q_rollup_hypertable",
    oracle=f"""
    SELECT event_type,
           date_trunc('day', CAST(ts AS TIMESTAMP)) AS event_date,
           CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS event_hour,
           CAST(GROUPING(event_type, event_date, event_hour) AS BIGINT) AS gid,
           CAST(count(*) AS BIGINT) AS n,
           {fround_sql("avg(value)")} AS avg_value,
           {fround_sql("sum(value)")} AS sum_value
    FROM events
    GROUP BY ROLLUP(event_type, event_date, event_hour)
    """,
)
def q_rollup_hypertable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: the type -> day -> hour
    hierarchy (plus the grand total) materialized in ONE pass via ROLLUP —
    Spark's Expand emits all four grouping sets before a partial aggregate,
    so the scan happens once and the shuffle carries levels x groups rows,
    not levels x data.  gid (grouping_id) disambiguates aggregate levels
    from genuine NULL group values; both engines use the same bit order."""
    ev = _events_ntz(spark, sf_dir)
    base = ev.select(
        "event_type",
        F.date_trunc("day", "ts").alias("event_date"),
        F.hour("ts").cast("long").alias("event_hour"),
        "value",
    )
    return base.rollup("event_type", "event_date", "event_hour").agg(
        F.grouping_id().cast("long").alias("gid"),
        F.count("*").cast("long").alias("n"),
        fround(F.avg("value"), 4).alias("avg_value"),
        fround(F.sum("value"), 4).alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# Gap fill (sensor-dropout imputation) and cube summary
# ---------------------------------------------------------------------------

# Simulated dropout: the fixture has no NULL readings, so both engines mask
# the same deterministic subset (event_id % 13) before filling — the fill
# path is then oracle-CHECKED on real missing values, not vacuously green.
_DROPOUT_MOD = 13


@register(
    "q_gap_fill",
    oracle=f"""
    WITH masked AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
               CASE WHEN event_id % {_DROPOUT_MOD} = 0 THEN NULL
                    ELSE value END AS reading
        FROM events
        WHERE ts IS NOT NULL
    )
    SELECT event_id, user_id, ts,
           (reading IS NULL) AS was_missing,
           {fround_sql("last_value(reading IGNORE NULLS) OVER ("
                       "PARTITION BY user_id ORDER BY ts, event_id "
                       "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")}
               AS value_filled
    FROM masked
    """,
)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill sensor dropout: each missing reading takes the sensor's
    most recent prior value (LOCF — last observation carried forward), the
    standard imputation before rate/derivative features.  The reference's
    null policy (SURVEY §2.2 q_null_policy) can only drop or constant-fill;
    this repairs from the sensor's own history.

    Scale: one running window over the HIGH-cardinality sensor key ordered
    by (ts, event_id) — partitions shard across executors, and
    last(ignorenulls) keeps O(1) frame state (it folds the running frame,
    never buffers it).  Readings with no prior observation stay NULL on
    both engines (no default is invented)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    masked = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_id") % _DROPOUT_MOD == 0, F.lit(None))
        .otherwise(F.col("value"))
        .alias("reading"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return masked.select(
        "event_id",
        "user_id",
        "ts",
        F.col("reading").isNull().alias("was_missing"),
        fround(F.last("reading", ignorenulls=True).over(w), 4).alias("value_filled"),
    )


@register(
    "q_cube_summary",
    oracle=f"""
    SELECT event_type,
           date_trunc('day', CAST(ts AS TIMESTAMP)) AS event_date,
           CAST(GROUPING(event_type, event_date) AS BIGINT) AS gid,
           CAST(count(*) AS BIGINT) AS n,
           {fround_sql("avg(value)")} AS avg_value,
           {fround_sql("sum(value)")} AS sum_value
    FROM events
    GROUP BY CUBE(event_type, event_date)
    """,
)
def q_cube_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-tabulated summary over CUBE(event_type, event_date): per-cell,
    per-type, per-day, and grand-total aggregates from ONE scan — the
    grouping-sets companion to q_rollup_hypertable's hierarchy (ROLLUP
    walks prefixes; CUBE materializes all 2^k subsets, which is what a
    dashboard slicing independently by type and day serves from).

    Scale: same Expand machinery as ROLLUP — the scan happens once,
    partial aggregation collapses map-side, and the shuffle carries
    4 x group-cardinality rows, not 4 x data.  gid disambiguates
    aggregate levels from genuine NULL group values."""
    ev = _events_ntz(spark, sf_dir)
    base = ev.select(
        "event_type",
        F.date_trunc("day", "ts").alias("event_date"),
        "value",
    )
    return base.cube("event_type", "event_date").agg(
        F.grouping_id().cast("long").alias("gid"),
        F.count("*").cast("long").alias("n"),
        fround(F.avg("value"), 4).alias("avg_value"),
        fround(F.sum("value"), 4).alias("sum_value"),
    )


@register(
    "q_scd2_intervals",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type, event_id,
               CAST(ts AS TIMESTAMP) AS ts,
               CASE WHEN event_type IS DISTINCT FROM lag(event_type) OVER w
                    THEN 1 ELSE 0 END AS chg
        FROM events
        WHERE ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    ),
    runs AS (
        SELECT user_id, event_type, ts,
               sum(chg) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING
               ) AS run_id
        FROM ordered
    ),
    intervals AS (
        SELECT user_id, run_id,
               min(event_type) AS event_type,
               min(ts) AS valid_from,
               CAST(count(*) AS BIGINT) AS n_events
        FROM runs
        GROUP BY user_id, run_id
    )
    SELECT user_id, event_type, valid_from,
           lead(valid_from) OVER (
               PARTITION BY user_id ORDER BY run_id
           ) AS valid_to,
           n_events,
           (lead(valid_from) OVER (PARTITION BY user_id ORDER BY run_id)
            IS NULL) AS is_current
    FROM intervals
    """,
)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 derivation: compress each user's
    event stream into contiguous runs of the same event_type, emitting
    [valid_from, valid_to) validity intervals with the open current run
    flagged — the standard islands/CDC-snapshot operator for turning an
    append-only log into a dimension table.

    Scale: the classic gaps-and-islands plan — change flags via lag(1),
    run ids via a running sum, both windows over the HIGH-cardinality
    user key with the SAME (user_id) partitioning, so the whole derivation
    rides ONE shuffle; the interval close (lead over run_id) then operates
    on the already-collapsed runs table, which is orders of magnitude
    smaller than the input.  No self-join, no per-user collect.

    Determinism: BOTH windows (the lag flags and the run-id prefix sum)
    order by the same total order (ts, event_id — event_id is unique), so
    run boundaries are row-exact on both engines; min(event_type) inside
    a run is constant by construction and min(ts)/count collapse
    identically."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select("user_id", "event_type", "ts", "event_id")
    )
    w_ord = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    flagged = ev.withColumn(
        "chg",
        F.when(
            ~F.col("event_type").eqNullSafe(F.lag("event_type").over(w_ord)), 1
        ).otherwise(0),
    )
    runs = flagged.withColumn(
        "run_id",
        F.sum("chg").over(
            Window.partitionBy("user_id")
            .orderBy(F.col("ts").asc(), F.col("event_id").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    intervals = runs.groupBy("user_id", "run_id").agg(
        F.min("event_type").alias("event_type"),
        F.min("ts").alias("valid_from"),
        F.count("*").cast("long").alias("n_events"),
    )
    w_run = Window.partitionBy("user_id").orderBy("run_id")
    return intervals.select(
        "user_id",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(w_run).alias("valid_to"),
        "n_events",
        F.lead("valid_from").over(w_run).isNull().alias("is_current"),
    )


@register(
    "q_grouping_sets",
    oracle=f"""
    SELECT event_type,
           date_trunc('day', CAST(ts AS TIMESTAMP)) AS event_date,
           CAST(GROUPING(event_type, event_date) AS BIGINT) AS gid,
           CAST(count(*) AS BIGINT) AS n,
           {fround_sql("avg(value)")} AS avg_value
    FROM events
    GROUP BY GROUPING SETS ((event_type, event_date), (event_type), (event_date))
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the third grouping-family member beside
    ROLLUP (q_rollup_hypertable) and CUBE (q_cube_summary): exactly the
    (type, day), (type), (day) marginals, WITHOUT the grand total a CUBE
    would force — the shape a dashboard with two independent filters but
    no 'all data' view serves.

    Scale: identical Expand machinery — one scan, each row replicated
    once per grouping set, partial aggregation collapses map-side, the
    shuffle carries 3 x group-cardinality rows.  grouping_id (gid)
    disambiguates a genuine NULL group value from an aggregate level.
    Expressed through Spark SQL (GROUPING SETS has no DataFrame-API
    equivalent), same as the marts family."""
    ev = _events_ntz(spark, sf_dir)
    ev.select(
        "event_type", F.date_trunc("day", "ts").alias("event_date"), "value"
    ).createOrReplaceTempView("_gs_events")
    return spark.sql(
        """
        SELECT event_type, event_date,
               CAST(grouping_id(event_type, event_date) AS BIGINT) AS gid,
               CAST(count(*) AS BIGINT) AS n,
               (floor((avg(value)) * 1e4 * (1 + 1e-12) + 0.5) / 1e4) AS avg_value
        FROM _gs_events
        GROUP BY GROUPING SETS ((event_type, event_date), (event_type), (event_date))
        """
    )


@register(
    "q_missing_days",
    oracle="""
    WITH bounds AS (
        SELECT date_trunc('day', min(CAST(ts AS TIMESTAMP))) AS d0,
               date_trunc('day', max(CAST(ts AS TIMESTAMP))) AS d1
        FROM events WHERE ts IS NOT NULL
    ),
    calendar AS (
        SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
        FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    observed AS (
        SELECT DISTINCT event_type,
               date_trunc('day', CAST(ts AS TIMESTAMP)) AS day
        FROM events WHERE ts IS NOT NULL
    )
    SELECT t.event_type, c.day
    FROM types t CROSS JOIN calendar c
    WHERE NOT EXISTS (
        SELECT 1 FROM observed o
        WHERE o.event_type = t.event_type AND o.day = c.day
    )
    ORDER BY t.event_type, c.day
    """,
)
def q_missing_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coverage-gap detection via a GENERATED calendar dimension: for
    every event type, which days inside the stream's global [min, max]
    range have no events at all — the completeness check behind "is this
    sensor family silently down" that q_reading_gaps (per-sensor
    consecutive-gap) cannot answer, because a day with zero rows leaves
    nothing to lag over.

    Scale: the calendar is sequence()-generated from a broadcast 1-row
    min/max aggregate — dimension tables you don't have are CHEAPER to
    generate than to store; |days| x |types| candidate rows (metadata-
    scale) anti-join the distinct observed pairs, and the distinct
    collapses map-side before its shuffle.  The fact is scanned twice
    (bounds + observed), both times reduced before moving."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    bounds = ev.agg(
        F.date_trunc("day", F.min("ts")).alias("d0"),
        F.date_trunc("day", F.max("ts")).alias("d1"),
    )
    calendar = bounds.select(
        F.explode(
            F.sequence(F.col("d0"), F.col("d1"), F.expr("INTERVAL 1 DAY"))
        ).alias("day")
    )
    types = ev.select("event_type").distinct()
    observed = ev.select(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).distinct()
    return (
        types.crossJoin(F.broadcast(calendar))
        .join(observed, ["event_type", "day"], "left_anti")
        .orderBy("event_type", "day")
    )


@register(
    "q_sessionize",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_id, event_type,
               CAST(ts AS TIMESTAMP) AS ts,
               CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                         OR CAST(ts AS TIMESTAMP)
                            > lag(CAST(ts AS TIMESTAMP)) OVER w
                              + INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WHERE ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    ),
    tagged AS (
        SELECT user_id, event_id, event_type, ts,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING
               ) AS session_seq
        FROM ordered
    )
    SELECT user_id,
           CAST(session_seq AS BIGINT) AS session_seq,
           min(ts) AS session_start,
           max(ts) AS session_end,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
    FROM tagged
    GROUP BY user_id, session_seq
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level sessionization: assign every event to a per-user session
    id (a new session starts after a >30-minute silence), then collapse
    to per-session bounds and composition — the gaps-and-islands twin of
    q_session_agg, which uses Spark's session_window AGGREGATE and so can
    never hand back row-level session membership (needed for funnels and
    per-session sequences).

    Scale: same one-shuffle discipline as q_scd2_intervals — the gap
    flag (lag), the session counter (running sum) and the collapse all
    share the user_id hash partitioning, with both windows ordered by
    the total (ts, event_id) key so session boundaries are row-exact on
    both engines.  The 30-minute gap compares raw timestamps — no
    rounding, no epoch arithmetic to diverge."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select("user_id", "event_id", "event_type", "ts")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    prev_ts = F.lag("ts").over(w)
    flagged = ev.withColumn(
        "new_session",
        F.when(
            prev_ts.isNull()
            | (F.col("ts") > prev_ts + F.expr("INTERVAL 30 MINUTES")),
            1,
        ).otherwise(0),
    )
    tagged = flagged.withColumn(
        "session_seq",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long"),
    )
    return tagged.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").cast("long").alias("n_events"),
        F.count_distinct("event_type").cast("long").alias("n_types"),
    )


# ---------------------------------------------------------------------------
# EWMA smoothing over the daily series
# ---------------------------------------------------------------------------

# s_t = ALPHA*x_t + (1-ALPHA)*s_{t-1}, s_0 = x_0, in closed form
#   s_t = BETA^t * (x_0 + ALPHA * sum_{i=1..t} x_i / BETA^i)
# so one ordered cumulative-sum window computes every prefix.  String
# constants so both engines parse identical doubles; BETA^-t stays < 5e4
# over the fixture's 30-day series, far from overflow/precision loss.
EWMA_ALPHA = "0.3"
EWMA_BETA = "0.7"


@register(
    "q_ewma_daily",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               avg(value) AS daily_avg
        FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
        GROUP BY event_type, day
    ),
    idx AS (
        SELECT event_type, day, daily_avg,
               CAST(row_number() OVER (
                   PARTITION BY event_type ORDER BY day
               ) AS INT) - 1 AS t
        FROM daily
    ),
    c AS (
        SELECT event_type, day, daily_avg, t,
               first_value(daily_avg) OVER w AS x0,
               sum(CASE WHEN t = 0 THEN 0.0
                        ELSE daily_avg / power({EWMA_BETA}, t) END)
                   OVER (w ROWS UNBOUNDED PRECEDING) AS cum
        FROM idx
        WINDOW w AS (PARTITION BY event_type ORDER BY t)
    )
    SELECT event_type, day,
           {fround_sql("daily_avg")} AS daily_avg,
           {fround_sql(f"power({EWMA_BETA}, t) * (x0 + {EWMA_ALPHA} * cum)")}
               AS ewma
    FROM c
    ORDER BY event_type, day
    """,
)
def q_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average over each event type's daily
    mean series (alpha={EWMA_ALPHA}): the smoothing baseline that feeds
    trend dashboards and drift alerts.  The recursion
    s_t = a*x_t + (1-a)*s_(t-1) is rewritten in closed form as
    beta^t * (x_0 + a * cumsum(x_i / beta^i)), so ONE ordered
    cumulative-sum window produces the whole smoothed series — no
    sequential UDF, no self-join per lag, no quadratic prefix fold.

    Scale: the daily pre-aggregation partial-aggregates the raw stream
    down to |types| x |days| rows before any window; the window then
    partitions by event type over that tiny series.  Both engines
    accumulate the cumulative sum in the same day order, so float
    summation order is identical by construction (fround guards the
    boundary anyway).  The beta^-t term bounds the usable window length
    (~700 days in double precision at beta=0.7); production series
    longer than that re-anchor the recursion per year-partition, which
    changes constants, not the plan."""
    daily = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.avg("value").alias("daily_avg"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    idx = daily.withColumn(
        "t", (F.row_number().over(w) - 1).cast("int")
    )
    beta = F.expr(f"CAST({EWMA_BETA} AS DOUBLE)")
    alpha = F.expr(f"CAST({EWMA_ALPHA} AS DOUBLE)")
    wt = Window.partitionBy("event_type").orderBy("t")
    c = idx.select(
        "event_type",
        "day",
        "daily_avg",
        "t",
        F.first("daily_avg").over(wt).alias("x0"),
        F.sum(
            F.when(F.col("t") == 0, F.lit(0.0)).otherwise(
                F.col("daily_avg") / F.pow(beta, F.col("t"))
            )
        )
        .over(wt.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
    )
    return c.select(
        "event_type",
        "day",
        fround(F.col("daily_avg"), 4).alias("daily_avg"),
        fround(
            F.pow(beta, F.col("t")) * (F.col("x0") + alpha * F.col("cum")), 4
        ).alias("ewma"),
    ).orderBy("event_type", "day")


# ---------------------------------------------------------------------------
# Trend slope (per-group OLS) and lag-1 autocorrelation
# ---------------------------------------------------------------------------

# Slope threshold (value units per day) separating flat from trending;
# calibrated so the stationary fixture produces 'flat' for most types and
# the verdict logic is still exercised by sampling noise on the smallest
# series — the CLASSIFICATION is oracle-checked either way because both
# engines compute it from identical inputs.
TREND_EPS = "0.05"


@register(
    "q_trend_slope",
    oracle=f"""
    WITH daily AS (
        SELECT event_type,
               date_diff('day', TIMESTAMP '2024-01-01',
                         date_trunc('day', ts)) AS x,
               avg(value) AS y
        FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
        GROUP BY event_type, x
    ),
    s AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_days,
               regr_slope(y, x) AS slope,
               regr_intercept(y, x) AS intercept,
               regr_r2(y, x) AS r2
        FROM daily GROUP BY event_type
    )
    SELECT event_type, n_days,
           {fround_sql("slope", 6)} AS slope,
           {fround_sql("intercept", 4)} AS intercept,
           {fround_sql("r2", 6)} AS r2,
           CASE WHEN {fround_sql("slope", 6)} > {TREND_EPS} THEN 'up'
                WHEN {fround_sql("slope", 6)} < -{TREND_EPS} THEN 'down'
                ELSE 'flat' END AS trend
    FROM s
    ORDER BY event_type
    """,
)
def q_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type OLS trend over the daily mean series: slope,
    intercept, and R^2 via the regression aggregates, classified
    up/flat/down at +-{TREND_EPS} value-units/day — the trend readout a
    monitoring dashboard fits per metric per day.

    Scale: the daily series partial-aggregates the stream to |types| x
    |days| rows; the regression is ONE aggregate over that tiny table
    (both engines implement regr_* as single-pass moment sums — no
    second scan, no window).  Day index is anchored at a fixed epoch so
    x is identical in both engines regardless of session timezone."""
    daily = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.datediff(
                F.date_trunc("day", "ts"), F.lit("2024-01-01").cast("timestamp")
            ).alias("x"),
        )
        .agg(F.avg("value").alias("y"))
    )
    s = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days"),
        F.regr_slope("y", "x").alias("slope_raw"),
        F.regr_intercept("y", "x").alias("intercept_raw"),
        F.regr_r2("y", "x").alias("r2_raw"),
    )
    slope6 = fround(F.col("slope_raw"), 6)
    eps = F.expr(f"CAST({TREND_EPS} AS DOUBLE)")
    return s.select(
        "event_type",
        "n_days",
        slope6.alias("slope"),
        fround(F.col("intercept_raw"), 4).alias("intercept"),
        fround(F.col("r2_raw"), 6).alias("r2"),
        F.when(slope6 > eps, F.lit("up"))
        .when(slope6 < -eps, F.lit("down"))
        .otherwise(F.lit("flat"))
        .alias("trend"),
    ).orderBy("event_type")


@register(
    "q_autocorr",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day, avg(value) AS y
        FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
        GROUP BY event_type, day
    ),
    lagged AS (
        SELECT event_type, y,
               lag(y) OVER (PARTITION BY event_type ORDER BY day) AS y_prev
        FROM daily
    )
    SELECT event_type,
           CAST(count(y_prev) AS BIGINT) AS n_pairs,
           {fround_sql("corr(y, y_prev)", 6)} AS acf1
    FROM lagged WHERE y_prev IS NOT NULL
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of each event type's daily mean series —
    the persistence diagnostic that says whether yesterday predicts
    today (near zero on this stationary fixture, near one on a trending
    metric); with q_trend_slope and q_ewma_daily it completes the
    per-metric time-series profile.

    Scale: one partial-aggregating reduction to the daily series, one
    per-type window for the lag (partitions are |days|-sized), and a
    Pearson corr aggregate — both engines implement corr as the same
    single-pass co-moment sums over identical (y, y_prev) pairs."""
    daily = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.avg("value").alias("y"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type", "y", F.lag("y").over(w).alias("y_prev")
    ).filter(F.col("y_prev").isNotNull())
    return (
        lagged.groupBy("event_type")
        .agg(
            F.count("y_prev").cast("long").alias("n_pairs"),
            fround(F.corr("y", "y_prev"), 6).alias("acf1"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# CUSUM changepoint detection over the daily series
# ---------------------------------------------------------------------------

# Excursion threshold in value units: max |cusum| above this flags a level
# change.  The stationary fixture's natural excursions sit well below it;
# the PLANTED mid-month 1.5x shift on 'error' (same plant as q_psi, applied
# identically in both engines) drives that type far above.
CUSUM_H = "120.0"
_CUSUM_SPLIT = "2024-01-16"


@register(
    "q_cusum",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               avg(CASE WHEN event_type = 'error'
                             AND date_trunc('day', ts)
                                 >= TIMESTAMP '{_CUSUM_SPLIT}'
                        THEN value * 1.5 ELSE value END) AS y
        FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
        GROUP BY event_type, day
    ),
    m AS (SELECT event_type, avg(y) AS mu FROM daily GROUP BY event_type),
    c AS (
        SELECT d.event_type, d.day,
               sum(d.y - m.mu) OVER (
                   PARTITION BY d.event_type ORDER BY d.day
               ) AS cusum
        FROM daily d JOIN m USING (event_type)
    ),
    peak AS (
        SELECT event_type,
               max(struct_pack(
                   a := {fround_sql("abs(cusum)", 6)},
                   neg_day := 0 - epoch(day),
                   day := day
               )) AS pk
        FROM c GROUP BY event_type
    )
    SELECT event_type,
           pk.a AS max_excursion,
           CAST(pk.day AS TIMESTAMP) AS changepoint_day,
           pk.a > {CUSUM_H} AS changed
    FROM peak
    ORDER BY event_type
    """,
)
def q_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection per event type: cumulative sum of
    deviations from the series mean over the daily sequence; the maximum
    absolute excursion IS the classic changepoint statistic and its argmax
    day the estimated change date (Page 1954).  The planted mid-month
    shift on 'error' (identical plant to q_psi) drives that type over the
    {CUSUM_H}-unit threshold while the stationary types stay under, so
    both verdicts are oracle-exercised.

    Scale: daily pre-aggregation first (the stream reduces to |types| x
    |days| rows before anything ordered happens), one broadcast-sized
    mean join-back, one per-type cumulative window over the tiny series,
    then an argmax via a single max-over-struct partial aggregate — the
    same no-sort idiom as q_first_touch, with earliest-day tiebreak
    (negated epoch in the struct) so both engines elect the same day on
    equal excursions."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    day = F.date_trunc("day", "ts")
    shifted = F.when(
        (F.col("event_type") == "error")
        & (day >= F.lit(_CUSUM_SPLIT).cast("timestamp")),
        F.col("value") * 1.5,
    ).otherwise(F.col("value"))
    daily = ev.groupBy("event_type", day.alias("day")).agg(
        F.avg(shifted).alias("y")
    )
    m = daily.groupBy("event_type").agg(F.avg("y").alias("mu"))
    w = Window.partitionBy("event_type").orderBy("day")
    c = daily.join(m, "event_type").select(
        "event_type",
        "day",
        F.sum(F.col("y") - F.col("mu")).over(w).alias("cusum"),
    )
    pk = c.groupBy("event_type").agg(
        F.max(
            F.struct(
                fround(F.abs(F.col("cusum")), 6).alias("a"),
                (F.lit(0) - F.unix_timestamp("day")).alias("neg_day"),
                F.col("day").alias("day"),
            )
        ).alias("pk")
    )
    return pk.select(
        "event_type",
        F.col("pk.a").alias("max_excursion"),
        F.col("pk.day").alias("changepoint_day"),
        (F.col("pk.a") > F.expr(f"CAST({CUSUM_H} AS DOUBLE)")).alias(
            "changed"
        ),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Hour-of-day seasonal profile with residual outlier rates
# ---------------------------------------------------------------------------

RESID_Z = "3.0"


@register(
    "q_hour_profile",
    oracle=f"""
    WITH e AS (
        SELECT event_type, CAST(extract(hour FROM ts) AS INT) AS hr, value
        FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ),
    prof AS (
        SELECT event_type, hr,
               CAST(count(*) AS BIGINT) AS n,
               avg(value) AS mu,
               stddev_samp(value) AS sigma
        FROM e GROUP BY event_type, hr
    ),
    r AS (
        SELECT p.event_type, p.hr, p.n, p.mu, p.sigma,
               CAST(count(*) FILTER (
                   abs(e.value - p.mu) / p.sigma > {RESID_Z}
               ) AS BIGINT) AS n_outliers
        FROM e JOIN prof p USING (event_type, hr)
        GROUP BY p.event_type, p.hr, p.n, p.mu, p.sigma
    )
    SELECT event_type, hr, n,
           {fround_sql("mu")} AS hour_mean,
           {fround_sql("sigma")} AS hour_std,
           n_outliers,
           {fround_sql("CAST(n_outliers AS DOUBLE) / n", 6)} AS outlier_rate
    FROM r
    ORDER BY event_type, hr
    """,
)
def q_hour_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal profile per event type (the diurnal baseline
    a fleet monitor subtracts before alerting): per (type, hour) cell the
    count, mean, and standard deviation, plus how many readings deviate
    more than {RESID_Z} sigma from their OWN cell's baseline — the
    seasonality-aware complement of the global q_zscore_flag (a value
    normal at 3 am can be anomalous at noon and vice versa).

    Scale: the profile is a partial-aggregating groupBy to |types| x 24
    cells; the residual pass re-joins the stream to that broadcast-sized
    profile on (type, hour) — the stream itself never shuffles (AQE
    broadcasts 120 rows), and the outlier count partial-aggregates back
    to the same 120 cells.  Same join-back-not-window shape as
    q_city_avg_compare, pinned by the plan test."""
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .select(
            "event_type", F.hour("ts").cast("int").alias("hr"), "value"
        )
    )
    prof = e.groupBy("event_type", "hr").agg(
        F.count("*").cast("long").alias("n"),
        F.avg("value").alias("mu"),
        F.stddev_samp("value").alias("sigma"),
    )
    z = F.expr(f"CAST({RESID_Z} AS DOUBLE)")
    r = (
        e.join(F.broadcast(prof), ["event_type", "hr"])
        .groupBy("event_type", "hr", "n", "mu", "sigma")
        .agg(
            F.count(
                F.when(
                    F.abs(F.col("value") - F.col("mu")) / F.col("sigma") > z,
                    1,
                )
            )
            .cast("long")
            .alias("n_outliers")
        )
    )
    return r.select(
        "event_type",
        "hr",
        "n",
        fround(F.col("mu"), 4).alias("hour_mean"),
        fround(F.col("sigma"), 4).alias("hour_std"),
        "n_outliers",
        fround(F.col("n_outliers").cast("double") / F.col("n"), 6).alias(
            "outlier_rate"
        ),
    ).orderBy("event_type", "hr")


@register(
    "q_gap_interp",
    oracle=f"""
    WITH masked AS (
        SELECT event_id, user_id, ts,
               CASE WHEN event_id % {{dropout}} = 0 THEN NULL
                    ELSE value END AS reading
        FROM events WHERE ts IS NOT NULL
    ),
    ctx AS (
        SELECT event_id, user_id, ts, reading,
               last_value(reading IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS prev_v,
               last_value(CASE WHEN reading IS NOT NULL THEN ts END
                          IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS prev_ts,
               first_value(reading IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
               ) AS next_v,
               first_value(CASE WHEN reading IS NOT NULL THEN ts END
                           IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
               ) AS next_ts
        FROM masked
    )
    SELECT event_id, user_id, ts,
           reading IS NULL AS was_missing,
           {fround_sql(
        "CASE WHEN reading IS NOT NULL THEN reading "
        "WHEN prev_v IS NULL THEN next_v "
        "WHEN next_v IS NULL THEN prev_v "
        "WHEN next_ts = prev_ts THEN prev_v "
        "ELSE prev_v + (next_v - prev_v) "
        "* date_diff('microsecond', prev_ts, ts) "
        "/ CAST(date_diff('microsecond', prev_ts, next_ts) AS DOUBLE) END"
    )} AS value_interp
    FROM ctx
    ORDER BY user_id, ts, event_id
    """.replace("{dropout}", "7"),
)
def q_gap_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of sensor dropout: each masked reading is
    reconstructed from its nearest surviving neighbors on BOTH sides,
    weighted by time distance — the upgrade over q_gap_fill's LOCF when
    the quantity drifts between observations (LOCF biases toward the
    past; interpolation is unbiased for locally-linear signals).  Edge
    rows with only one side fall back to that side's value.

    Scale: TWO running windows over the same (user, time) ordering —
    one forward, one backward — each O(1) state per row (ignore-nulls
    folds, no frame buffering), sharing ONE shuffle of the stream by
    the high-cardinality user key; the interpolation itself is a pure
    row expression.  Time deltas use calendar-microsecond
    differences (timestampdiff/date_diff), which are exact at the
    fixture's timestamp precision — second-granularity differencing
    would diverge between engines (boundary-crossing vs full-second
    counting) — and session-timezone-invariant on TIMESTAMP_NTZ."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    masked = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_id") % 7 == 0, F.lit(None))
        .otherwise(F.col("value"))
        .alias("reading"),
    )
    back = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_ts = F.when(F.col("reading").isNotNull(), F.col("ts"))
    ctx = masked.select(
        "event_id",
        "user_id",
        "ts",
        "reading",
        F.last("reading", ignorenulls=True).over(back).alias("prev_v"),
        F.last(obs_ts, ignorenulls=True).over(back).alias("prev_ts"),
        F.first("reading", ignorenulls=True).over(fwd).alias("next_v"),
        F.first(obs_ts, ignorenulls=True).over(fwd).alias("next_ts"),
    )
    num = F.expr("timestampdiff(MICROSECOND, prev_ts, ts)").cast("double")
    den = F.expr("timestampdiff(MICROSECOND, prev_ts, next_ts)").cast("double")
    interp = (
        F.when(F.col("reading").isNotNull(), F.col("reading"))
        .when(F.col("prev_v").isNull(), F.col("next_v"))
        .when(F.col("next_v").isNull(), F.col("prev_v"))
        .when(F.col("next_ts") == F.col("prev_ts"), F.col("prev_v"))
        .otherwise(
            F.col("prev_v")
            + (F.col("next_v") - F.col("prev_v")) * num / den
        )
    )
    return ctx.select(
        "event_id",
        "user_id",
        "ts",
        F.col("reading").isNull().alias("was_missing"),
        fround(interp, 4).alias("value_interp"),
    ).orderBy("user_id", "ts", "event_id")


# ---------------------------------------------------------------------------
# Rolling correlation between two metric series
# ---------------------------------------------------------------------------

ROLL_DAYS = 7


@register(
    "q_rolling_corr",
    oracle=f"""
    WITH daily AS (
        SELECT date_trunc('day', ts) AS day,
               avg(value) FILTER (event_type = 'purchase') AS x,
               avg(value) FILTER (event_type = 'click') AS y
        FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
        GROUP BY day
    ),
    r AS (
        SELECT day, x, y,
               count(*) OVER w AS n,
               sum(x) OVER w AS sx, sum(y) OVER w AS sy,
               sum(x * y) OVER w AS sxy,
               sum(x * x) OVER w AS sxx, sum(y * y) OVER w AS syy
        FROM daily
        WINDOW w AS (ORDER BY day ROWS BETWEEN {ROLL_DAYS - 1} PRECEDING
                     AND CURRENT ROW)
    )
    SELECT day, CAST(n AS BIGINT) AS n_days,
           {fround_sql("x")} AS purchase_avg,
           {fround_sql("y")} AS click_avg,
           CASE WHEN n < 2 THEN NULL ELSE
               {fround_sql(
                   "(n * sxy - sx * sy) / "
                   "(sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))"
               )} END AS roll_corr
    FROM r
    ORDER BY day
    """,
)
def q_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{ROLL_DAYS}-day rolling Pearson correlation between the purchase
    and click daily mean series — the co-movement monitor that catches a
    decoupling of two metrics that individually look healthy (each
    passes its own trend/EWMA checks while their relationship breaks).

    Scale: the two series come from ONE conditional-aggregate pass
    (pivot-style FILTER, no join of two aggregations); the rolling
    moments are five sums over a bounded {ROLL_DAYS}-row frame of the
    tiny daily table, and the correlation is closed-form arithmetic over
    them — no per-window re-aggregation, no self-join of the series
    against itself.  Bounded-frame window sums accumulate in frame order
    on both engines; fround guards the final ratio."""
    daily = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.avg(
                F.when(F.col("event_type") == "purchase", F.col("value"))
            ).alias("x"),
            F.avg(
                F.when(F.col("event_type") == "click", F.col("value"))
            ).alias("y"),
        )
    )
    w = Window.orderBy("day").rowsBetween(-(ROLL_DAYS - 1), 0)
    r = daily.select(
        "day",
        "x",
        "y",
        F.count("*").over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).alias("syy"),
    )
    corr = fround(
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        / (
            F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
            * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
        ),
        4,
    )
    return r.select(
        "day",
        F.col("n").cast("long").alias("n_days"),
        fround(F.col("x"), 4).alias("purchase_avg"),
        fround(F.col("y"), 4).alias("click_avg"),
        F.when(F.col("n") < 2, F.lit(None).cast("double"))
        .otherwise(corr)
        .alias("roll_corr"),
    ).orderBy("day")


@register(
    "q_open_orders",
    oracle=f"""
    WITH iv AS (
        SELECT o.o_orderkey, o.o_orderdate AS s,
               s2.e + INTERVAL 1 DAY AS e
        FROM orders o
        JOIN (
            SELECT l_orderkey, max(l_shipdate) AS e
            FROM lineitem GROUP BY l_orderkey
        ) s2 ON s2.l_orderkey = o.o_orderkey
    ),
    deltas AS (
        SELECT s AS day, 1 AS d FROM iv
        UNION ALL
        SELECT e AS day, -1 FROM iv
    ),
    daily AS (
        SELECT day,
               CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_opened,
               CAST(sum(CASE WHEN d < 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_closed,
               sum(d) AS net
        FROM deltas GROUP BY day
    )
    SELECT day, n_opened, n_closed,
           CAST(sum(net) OVER (ORDER BY day) AS BIGINT) AS open_count
    FROM daily
    ORDER BY day
    """,
)
def q_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concurrent open orders over time: each order is an interval from
    its order date to its last shipment (inclusive), and the operator
    reports, for every day on which anything changes, how many orders
    opened, closed, and remain open — the backlog/WIP curve an
    operations dashboard tracks.

    Scale: the textbook event-izing of interval counting — each interval
    becomes a +1 at its start and a -1 past its end, the deltas
    partial-aggregate to one row per distinct change day, and a single
    running sum over that tiny day table yields the concurrency curve.
    The naive alternative (calendar x intervals range join) is
    O(days * orders); this is O(orders) plus a |days|-row prefix sum
    (range-partitioned scan-then-propagate at true scale).  Orders with
    no lineitems have no close bound and are excluded by the inner join
    on both engines."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderdate").alias("s")
    )
    ends = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("e0"))
        .select(
            F.col("l_orderkey").alias("o_orderkey"),
            F.expr("e0 + INTERVAL 1 DAY").alias("e"),
        )
    )
    iv = orders.join(ends, "o_orderkey")
    # one explode instead of a self-union: the union form scans both
    # tables twice (each branch recomputes the interval join); exploding
    # array(struct(s,+1), struct(e,-1)) emits both deltas from a single
    # pass (plan-asserted: exactly one scan per table)
    deltas = iv.select(
        F.explode(
            F.array(
                F.struct(F.col("s").alias("day"), F.lit(1).alias("d")),
                F.struct(F.col("e").alias("day"), F.lit(-1).alias("d")),
            )
        ).alias("x")
    ).select("x.day", "x.d")
    daily = deltas.groupBy("day").agg(
        F.sum(F.when(F.col("d") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_opened"),
        F.sum(F.when(F.col("d") < 0, 1).otherwise(0))
        .cast("long")
        .alias("n_closed"),
        F.sum("d").alias("net"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "day",
        "n_opened",
        "n_closed",
        F.sum("net").over(w).cast("long").alias("open_count"),
    ).orderBy("day")


@register(
    "q_seasonal_decompose",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day, avg(value) AS y
        FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
        GROUP BY event_type, day
    ),
    tr AS (
        SELECT event_type, day, y,
               CASE WHEN count(*) OVER w = 7
                    THEN avg(y) OVER w END AS trend,
               CAST(date_part('dow', day) AS INT) AS wd
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    seas0 AS (
        SELECT event_type, wd, avg(y - trend) AS s0
        FROM tr WHERE trend IS NOT NULL
        GROUP BY event_type, wd
    ),
    seas AS (
        SELECT event_type, wd,
               s0 - avg(s0) OVER (PARTITION BY event_type) AS seasonal
        FROM seas0
    )
    SELECT t.event_type, t.day,
           {fround_sql("t.y")} AS daily_avg,
           {fround_sql("t.trend")} AS trend,
           {fround_sql("s.seasonal")} AS seasonal,
           {fround_sql("t.y - t.trend - s.seasonal")} AS residual
    FROM tr t JOIN seas s
      ON s.event_type = t.event_type AND s.wd = t.wd
    ORDER BY t.event_type, t.day
    """,
)
def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition of each event type's daily series
    (classical decomposition, the pre-STL textbook form): trend = centered
    7-day moving average (NULL at the 3-row edges where the window is
    partial), weekly seasonal = per-weekday mean of the detrended series
    re-centered to sum to zero, residual = observed - trend - seasonal —
    the decomposition whose residual stream feeds anomaly flags that
    neither the raw z-score (blind to weekly rhythm) nor the hour profile
    (within-day only) can express.

    Scale: the stream reduces to |types| x |days| rows before any window;
    the centered MA is one bounded-frame window per type, the seasonal
    index a partial-aggregating groupBy to |types| x 7 cells (re-centered
    by a window over those 7 rows), and the final attach a broadcast-sized
    join.  Day-of-week is date_part('dow') / dayofweek-1, identical
    0=Sunday numbering on both engines."""
    daily = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.avg("value").alias("y"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    tr = daily.select(
        "event_type",
        "day",
        "y",
        F.when(F.count("*").over(w) == 7, F.avg("y").over(w)).alias("trend"),
        (F.dayofweek("day") - 1).cast("int").alias("wd"),
    )
    seas0 = (
        tr.filter(F.col("trend").isNotNull())
        .groupBy("event_type", "wd")
        .agg(F.avg(F.col("y") - F.col("trend")).alias("s0"))
    )
    seas = seas0.select(
        "event_type",
        "wd",
        (
            F.col("s0")
            - F.avg("s0").over(Window.partitionBy("event_type"))
        ).alias("seasonal"),
    )
    return (
        tr.join(F.broadcast(seas), ["event_type", "wd"])
        .select(
            "event_type",
            "day",
            fround(F.col("y"), 4).alias("daily_avg"),
            fround(F.col("trend"), 4).alias("trend"),
            fround(F.col("seasonal"), 4).alias("seasonal"),
            fround(
                F.col("y") - F.col("trend") - F.col("seasonal"), 4
            ).alias("residual"),
        )
        .orderBy("event_type", "day")
    )


# Two-sided 5% critical value for the runs-test normal approximation.
_RUNS_CRIT = "1.96"


@register(
    "q_runs_test",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day, avg(value) AS y
        FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
        GROUP BY event_type, day
    ),
    m AS (SELECT event_type, avg(y) AS mu FROM daily GROUP BY event_type),
    signs AS (
        SELECT d.event_type, d.day,
               CASE WHEN d.y >= m.mu THEN 1 ELSE 0 END AS pos
        FROM daily d JOIN m USING (event_type)
    ),
    flagged AS (
        SELECT event_type, pos,
               CASE WHEN lag(pos) OVER (
                        PARTITION BY event_type ORDER BY day
                    ) IS DISTINCT FROM pos THEN 1 ELSE 0 END AS new_run
        FROM signs
    ),
    agg AS (
        SELECT event_type,
               CAST(sum(new_run) AS BIGINT) AS n_runs,
               CAST(sum(pos) AS DOUBLE) AS n1,
               CAST(sum(1 - pos) AS DOUBLE) AS n2
        FROM flagged GROUP BY event_type
    )
    SELECT event_type, n_runs,
           CAST(n1 AS BIGINT) AS n_above, CAST(n2 AS BIGINT) AS n_below,
           {fround_sql("2.0 * n1 * n2 / (n1 + n2) + 1.0", 4)} AS expected_runs,
           {fround_sql(
               "(n_runs - (2.0 * n1 * n2 / (n1 + n2) + 1.0)) / "
               "sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2) / "
               "((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0)))",
               4,
           )} AS z_stat,
           abs({fround_sql(
               "(n_runs - (2.0 * n1 * n2 / (n1 + n2) + 1.0)) / "
               "sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2) / "
               "((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0)))",
               6,
           )}) <= {_RUNS_CRIT} AS random_ok
    FROM agg
    ORDER BY event_type
    """,
)
def q_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on each event type's daily series: the
    sequence of above/below-mean signs is counted into runs and compared
    to the randomness expectation 2*n1*n2/n + 1 via the normal
    approximation — too FEW runs means the residual process is sticky
    (trend/regime structure the mean missed), too MANY means alternation
    (overdifferencing/oscillation); |z| <= {_RUNS_CRIT} passes.  The
    independence companion to q_autocorr's linear-correlation view.

    Scale: daily pre-aggregation first, the mean join-back is
    broadcast-sized, run boundaries are ONE lag window per type over the
    tiny series (IS DISTINCT FROM handles the first row identically in
    both engines), and the statistic is arithmetic over |types| rows of
    counts — integers until the final closed form, so only the z value
    needs the fround guard."""
    daily = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.avg("value").alias("y"))
    )
    m = daily.groupBy("event_type").agg(F.avg("y").alias("mu"))
    signs = daily.join(F.broadcast(m), "event_type").select(
        "event_type",
        "day",
        F.when(F.col("y") >= F.col("mu"), 1).otherwise(0).alias("pos"),
    )
    w = Window.partitionBy("event_type").orderBy("day")
    flagged = signs.select(
        "event_type",
        "pos",
        F.when(
            ~F.lag("pos").over(w).eqNullSafe(F.col("pos")), 1
        )
        .otherwise(0)
        .alias("new_run"),
    )
    agg = flagged.groupBy("event_type").agg(
        F.sum("new_run").cast("long").alias("n_runs"),
        F.sum("pos").cast("double").alias("n1"),
        F.sum(1 - F.col("pos")).cast("double").alias("n2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    mu_r = 2.0 * n1 * n2 / (n1 + n2) + 1.0
    sig_r = F.sqrt(
        2.0
        * n1
        * n2
        * (2.0 * n1 * n2 - n1 - n2)
        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0))
    )
    z = (F.col("n_runs") - mu_r) / sig_r
    return agg.select(
        "event_type",
        "n_runs",
        n1.cast("long").alias("n_above"),
        n2.cast("long").alias("n_below"),
        fround(mu_r, 4).alias("expected_runs"),
        fround(z, 4).alias("z_stat"),
        (
            F.abs(fround(z, 6)) <= F.expr(f"CAST({_RUNS_CRIT} AS DOUBLE)")
        ).alias("random_ok"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Daily ingest-volume anomaly (data-quality monitoring)
# ---------------------------------------------------------------------------

VOL_Z_MAX = 2.0


@register(
    "q_volume_anomaly",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               CAST(count(*) AS DOUBLE) AS n
        FROM events WHERE ts IS NOT NULL
        GROUP BY event_type, date_trunc('day', ts)
    ),
    stats AS (
        SELECT event_type, avg(n) AS mu, stddev_samp(n) AS sd
        FROM daily GROUP BY event_type
    )
    SELECT d.event_type, d.day,
           CAST(d.n AS BIGINT) AS n_events,
           {fround_sql("(d.n - s.mu) / s.sd")} AS z,
           abs({fround_sql("(d.n - s.mu) / s.sd", 6)}) > {VOL_Z_MAX}
               AS is_anomaly
    FROM daily d JOIN stats s USING (event_type)
    ORDER BY d.event_type, d.day
    """,
)
def q_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-volume anomaly monitor: per event type, each observed day's
    row count z-scored against that type's own daily mean/stddev, flagged
    when |z| > {VOL_Z_MAX} — the pipeline-health check that catches a
    producer outage or a duplicate-replay flood even when every
    individual record validates (per-record checks can't see volume).

    Scale: the daily count partial-aggregates map-side down to
    (types x days) rows before any exchange; the per-type moments reduce
    that tiny table again, and the join back is a broadcast.  Raw events
    cross the wire exactly zero times."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count("*").cast("double").alias("n"))
    stats = daily.groupBy("event_type").agg(
        F.avg("n").alias("mu"), F.stddev_samp("n").alias("sd")
    )
    z = (F.col("n") - F.col("mu")) / F.col("sd")
    return (
        daily.join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            "day",
            F.col("n").cast("long").alias("n_events"),
            fround(z).alias("z"),
            (F.abs(fround(z, 6)) > VOL_Z_MAX).alias("is_anomaly"),
        )
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# Lagged cross-correlation between two event streams
# ---------------------------------------------------------------------------

XCORR_MAX_LAG = 7


@register(
    "q_cross_corr",
    oracle=f"""
    WITH daily AS (
        SELECT date_trunc('day', ts) AS day,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS DOUBLE) AS vc,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS DOUBLE) AS cc
        FROM events
        WHERE ts IS NOT NULL AND event_type IN ('view', 'click')
        GROUP BY date_trunc('day', ts)
    ),
    lags AS (
        SELECT unnest(generate_series(-{XCORR_MAX_LAG}, {XCORR_MAX_LAG}))
            AS lag
    )
    SELECT l.lag,
           CAST(count(*) AS BIGINT) AS n_days,
           {fround_sql("corr(a.vc, b.cc)")} AS xcorr
    FROM lags l
    JOIN daily a ON TRUE
    JOIN daily b ON b.day = a.day + l.lag * INTERVAL 1 DAY
    GROUP BY l.lag
    ORDER BY l.lag
    """,
)
def q_cross_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead/lag discovery between two event streams: Pearson correlation
    of daily view counts against daily click counts shifted by every lag
    in [-{XCORR_MAX_LAG}, {XCORR_MAX_LAG}] days — the cross-correlogram
    that surfaces "clicks follow views by k days" without fitting a
    model.

    Scale: events reduce to (day, view-count, click-count) map-side
    before any exchange — the correlation runs over a calendar-bounded
    series, so the lag x day join is constant-size however big the event
    table gets; the 15-row lag spine rides a broadcast."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("event_type").isin("view", "click")
    )
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum((F.col("event_type") == "view").cast("long"))
        .cast("double")
        .alias("vc"),
        F.sum((F.col("event_type") == "click").cast("long"))
        .cast("double")
        .alias("cc"),
    )
    lags = spark.range(1).select(
        F.explode(
            F.sequence(F.lit(-XCORR_MAX_LAG), F.lit(XCORR_MAX_LAG))
        ).alias("lag")
    )
    a = daily.alias("a")
    b = daily.select(
        F.col("day").alias("b_day"), F.col("cc").alias("b_cc")
    ).alias("b")
    joined = (
        a.crossJoin(F.broadcast(lags))
        .withColumn(
            "shifted", F.expr("timestampadd(DAY, lag, day)")
        )
        .join(b, F.col("b_day") == F.col("shifted"))
    )
    return (
        joined.groupBy("lag")
        .agg(
            F.count("*").cast("long").alias("n_days"),
            fround(F.corr("vc", "b_cc")).alias("xcorr"),
        )
        .orderBy("lag")
    )


# ---------------------------------------------------------------------------
# Holt's linear-trend exponential smoothing over daily revenue
# ---------------------------------------------------------------------------

HOLT_ALPHA = "0.5"  # level gain (literal: both engines must see same bits)
HOLT_BETA = "0.3"  # trend gain
HOLT_1MB = "0.7"  # 1 - beta, spelled as its own literal


@register(
    "q_holt_linear",
    oracle=f"""
    WITH RECURSIVE daily AS (
        SELECT date_trunc('day', o_orderdate) AS day,
               {fround_sql("sum(o_totalprice)", 2)} AS y
        FROM orders GROUP BY date_trunc('day', o_orderdate)
    ),
    idx AS (
        SELECT day, y, row_number() OVER (ORDER BY day) AS rn FROM daily
    ),
    holt AS (
        SELECT i1.rn, i1.day, i1.y,
               i1.y AS lvl,
               (SELECT y FROM idx WHERE rn = 2) - i1.y AS tr,
               CAST(NULL AS DOUBLE) AS fitted
        FROM idx i1 WHERE i1.rn = 1
        UNION ALL
        SELECT i.rn, i.day, i.y,
               {HOLT_ALPHA} * i.y + {HOLT_ALPHA} * (h.lvl + h.tr),
               {HOLT_BETA} * (({HOLT_ALPHA} * i.y
                   + {HOLT_ALPHA} * (h.lvl + h.tr)) - h.lvl)
                   + {HOLT_1MB} * h.tr,
               h.lvl + h.tr
        FROM idx i JOIN holt h ON i.rn = h.rn + 1
    )
    SELECT day, y AS actual,
           {fround_sql("fitted")} AS fitted,
           {fround_sql("y - fitted")} AS residual
    FROM holt WHERE rn >= 2
    ORDER BY day
    """,
)
def q_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend exponential smoothing (Holt 1957) over daily
    order revenue: level/trend recursion l_t = a*y_t + (1-a)*(l+b),
    b_t = B*(l_t - l) + (1-B)*b with one-step-ahead fitted values and
    residuals — the classic trend-following forecaster, which no window
    function expresses (each step depends on the previous SMOOTHED state,
    so the fold is genuinely sequential; the DuckDB oracle needs a
    recursive CTE).

    Scale: the heavy part — reducing the order table to one row per day —
    is a distributed partial-aggregating groupBy; the recursion then runs
    over a CALENDAR-bounded series (~2.5k rows for 7 years, constant in
    data volume) inside one applyInPandas group, the same bounded-domain
    argument as q_theil_sen.  Daily revenue is quantized (fround 2)
    BEFORE the recursion on both engines; the fold then performs
    bit-identical float64 arithmetic (same literals, same operation
    order), so even the compounding state stays engine-exact."""
    import pandas as pd

    a = float(HOLT_ALPHA)
    b = float(HOLT_BETA)
    omb = float(HOLT_1MB)

    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(fround(F.sum("o_totalprice"), 2).alias("y"))
    )

    def _holt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        y = pdf["y"].to_numpy()
        out_day, out_actual, out_fit = [], [], []
        lvl = y[0]
        tr = y[1] - y[0]
        for t in range(1, len(y)):
            fitted = lvl + tr
            new_lvl = a * y[t] + a * (lvl + tr)
            tr = b * (new_lvl - lvl) + omb * tr
            lvl = new_lvl
            out_day.append(pdf["day"].iloc[t])
            out_actual.append(y[t])
            out_fit.append(fitted)
        out = pd.DataFrame(
            {"day": out_day, "actual": out_actual, "fitted_raw": out_fit}
        )
        return out

    folded = daily.groupBy(F.lit(1).alias("_g")).applyInPandas(
        _holt, "day timestamp_ntz, actual double, fitted_raw double"
    )
    return folded.select(
        "day",
        "actual",
        fround(F.col("fitted_raw")).alias("fitted"),
        fround(F.col("actual") - F.col("fitted_raw")).alias("residual"),
    ).orderBy("day")

