"""Validation-rule operators mapped onto the events fixture.

The reference validates IoT readings record-by-record in plain Python
(data_quality/validation_consumer.py:130-444) and routes valid/invalid
records to separate topics (validation_consumer.py:513-587).  Here every
rule is a native Column expression evaluated in one projection (see
functions/validation.py), and the valid/DLQ split is two filters over one
plan — at scale Spark computes the validation pass once per branch with
zero shuffles.

Rule mapping onto events (FIXTURES.md role mapping): value <-> temperature
(analog range 0..100), event_type <-> device/format field, ts <-> event
time, props.k <-> numeric payload needing tolerant coercion.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import fround, fround_sql
from ..functions.validation import (
    failure_reasons,
    is_null_or_null_string,
    numeric_coercible,
)
from ..registry import register
from ..sources import load_table

NOW = "2024-01-20 00:00:00"
MAX_AGE_DAYS = 14
EVENT_TYPE_PATTERN = "^[a-z_]+$"

# Fixture-scaled constants (value 0..100, 14-day freshness, event_type
# grammar): the events fixture's value range and cadence differ from the
# reference's IoT readings, so these queries keep the rule SHAPES with
# adapted thresholds; queries/iot.py::q_validate_iot runs the library's
# verbatim reference constants (VALUE_RANGES, SENSOR_ID_PATTERN, 5-minute
# freshness) against reference-shaped wire data.


def _rules(ev: DataFrame) -> list[tuple[str, Column]]:
    k = F.get_json_object("props", "$.k")
    return [
        ("missing:user_id", F.col("user_id").isNull()),
        ("missing:value", F.col("value").isNull()),
        ("missing:event_type", is_null_or_null_string(F.col("event_type"))),
        ("bad_type:props.k", ~numeric_coercible(k)),
        (
            "bad_format:event_type",
            F.col("event_type").isNotNull()
            & ~F.regexp_like(F.trim("event_type"), F.lit(EVENT_TYPE_PATTERN)),
        ),
        (
            "out_of_range:value",
            F.col("value").isNotNull() & ~F.col("value").between(0, 100),
        ),
        (
            "stale_or_future:ts",
            F.col("ts").isNull()
            | ~(
                (F.col("ts") <= F.lit(NOW).cast("timestamp_ntz"))
                & (
                    F.col("ts")
                    >= F.expr(f"TIMESTAMP_NTZ '{NOW}' - INTERVAL {MAX_AGE_DAYS} DAYS")
                )
            ),
        ),
    ]


_ORACLE_RULES_SQL = f"""
    [CASE WHEN user_id IS NULL THEN 'missing:user_id' END,
     CASE WHEN value IS NULL THEN 'missing:value' END,
     CASE WHEN event_type IS NULL
            OR lower(trim(event_type)) IN ('null','none','n/a','')
          THEN 'missing:event_type' END,
     CASE WHEN TRY_CAST(CASE WHEN props IS NOT NULL AND json_valid(props) THEN json_extract_string(props, '$.k') END AS DOUBLE) IS NULL
          THEN 'bad_type:props.k' END,
     CASE WHEN event_type IS NOT NULL
            AND NOT regexp_matches(trim(event_type), '{EVENT_TYPE_PATTERN}')
          THEN 'bad_format:event_type' END,
     CASE WHEN value IS NOT NULL AND NOT (value BETWEEN 0 AND 100)
          THEN 'out_of_range:value' END,
     CASE WHEN ts IS NULL
            OR NOT (CAST(ts AS TIMESTAMP) <= TIMESTAMP '{NOW}'
                    AND CAST(ts AS TIMESTAMP) >= TIMESTAMP '{NOW}' - INTERVAL {MAX_AGE_DAYS} DAYS)
          THEN 'stale_or_future:ts' END]
"""

_ORACLE_REASONS = (
    # coalesce: DuckDB's array_to_string returns NULL for an empty list,
    # Spark's array_join returns '' — '' is the contract.
    f"coalesce(array_to_string(list_filter({_ORACLE_RULES_SQL}, x -> x IS NOT NULL), ';'), '')"
)
_ORACLE_NFAIL = f"len(list_filter({_ORACLE_RULES_SQL}, x -> x IS NOT NULL))"


def _with_validation(ev: DataFrame) -> DataFrame:
    reasons = failure_reasons(_rules(ev))
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        "ts",
        F.array_join(reasons, ";").alias("failure_reasons"),
        F.size(reasons).alias("n_failures"),
        (F.size(reasons) == 0).alias("is_valid"),
    )


@register(
    "q_validate_reasons",
    oracle=f"""
    SELECT event_id, user_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts,
           {_ORACLE_REASONS} AS failure_reasons,
           {_ORACLE_NFAIL} AS n_failures,
           ({_ORACLE_NFAIL} = 0) AS is_valid
    FROM events
    """,
)
def q_validate_reasons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All rules in one projection; reasons joined ';' in rule order
    (validation_consumer.py:97-124,412-444)."""
    return _with_validation(load_table(spark, sf_dir, "events"))


@register(
    "q_route_valid",
    oracle=f"""
    SELECT event_id, user_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts,
           'valid' AS data_quality_flag
    FROM events
    WHERE {_ORACLE_NFAIL} = 0
    """,
)
def q_route_valid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Valid branch of the topic router (validation_consumer.py:513-556)."""
    v = _with_validation(load_table(spark, sf_dir, "events"))
    return v.filter("is_valid").select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        "ts",
        F.lit("valid").alias("data_quality_flag"),
    )


@register(
    "q_route_dlq",
    oracle=f"""
    SELECT event_id, user_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts,
           {_ORACLE_REASONS} AS validation_failures,
           'invalid' AS data_quality_flag
    FROM events
    WHERE {_ORACLE_NFAIL} > 0
    """,
)
def q_route_dlq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DLQ branch with attached failure list (validation_consumer.py:557-563)."""
    v = _with_validation(load_table(spark, sf_dir, "events"))
    return v.filter(~F.col("is_valid")).select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        "ts",
        F.col("failure_reasons").alias("validation_failures"),
        F.lit("invalid").alias("data_quality_flag"),
    )


@register(
    "q_filter_range",
    oracle="""
    SELECT event_id, user_id, value
    FROM events
    WHERE value BETWEEN 0 AND 100
    """,
)
def q_filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range predicate (validation_consumer.py:207-245)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("value").between(0, 100)).select(
        "event_id", "user_id", "value"
    )


@register(
    "q_filter_typecheck",
    oracle="""
    SELECT event_id,
           TRY_CAST(CASE WHEN props IS NOT NULL AND json_valid(props) THEN json_extract_string(props, '$.k') END AS DOUBLE) AS k_num
    FROM events
    WHERE TRY_CAST(CASE WHEN props IS NOT NULL AND json_valid(props) THEN json_extract_string(props, '$.k') END AS DOUBLE) IS NOT NULL
    """,
)
def q_filter_typecheck(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerant type predicate — numeric or numeric-string accepted
    (validation_consumer.py:159-204)."""
    ev = load_table(spark, sf_dir, "events")
    k_num = F.get_json_object("props", "$.k").try_cast("double")
    return ev.select("event_id", k_num.alias("k_num")).filter(
        F.col("k_num").isNotNull()
    )


@register(
    "q_filter_regex",
    oracle=f"""
    SELECT event_id, trim(event_type) AS event_type_norm
    FROM events
    WHERE regexp_matches(trim(event_type), '{EVENT_TYPE_PATTERN}')
    """,
)
def q_filter_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Format predicate + normalize-then-validate (validation_consumer.py:
    248-281 — the reference trims before matching and forwards the trimmed
    value, SURVEY.md §3.2)."""
    ev = load_table(spark, sf_dir, "events")
    norm = F.trim("event_type")
    return ev.select("event_id", norm.alias("event_type_norm")).filter(
        F.regexp_like("event_type_norm", F.lit(EVENT_TYPE_PATTERN))
    )


@register(
    "q_filter_freshness",
    oracle=f"""
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id
    FROM events
    WHERE CAST(ts AS TIMESTAMP) <= TIMESTAMP '{NOW}'
      AND CAST(ts AS TIMESTAMP) >= TIMESTAMP '{NOW}' - INTERVAL 1 DAY
    """,
)
def q_filter_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness predicate vs a pinned 'now' (validation_consumer.py:284-321;
    the reference's naive wall-clock compare is a bug we fix — SURVEY §4.4-3)."""
    ev = load_table(spark, sf_dir, "events")
    now = F.lit(NOW).cast("timestamp_ntz")
    return ev.filter(
        (F.col("ts") <= now) & (F.col("ts") >= F.expr(f"TIMESTAMP_NTZ '{NOW}' - INTERVAL 1 DAY"))
    ).select("event_id", "ts", "user_id")


@register(
    "q_filter_completeness",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE user_id IS NOT NULL AND value IS NOT NULL
      AND event_type IS NOT NULL
      AND lower(trim(event_type)) NOT IN ('null','none','n/a','')
    """,
)
def q_filter_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Critical-field completeness incl. null-like strings
    (validation_consumer.py:324-350)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(
        F.col("user_id").isNotNull()
        & F.col("value").isNotNull()
        & F.col("event_type").isNotNull()
        & ~F.lower(F.trim("event_type")).isin("null", "none", "n/a", "")
    ).select("event_id", "user_id", "event_type", "value")


@register(
    "q_filter_schema",
    oracle="""
    SELECT event_id, props
    FROM events
    -- matches Spark's from_json("k INT"): $.k must be an INTEGRAL json
    -- NUMBER within int32 range (quoted digits / floats / overflow are
    -- corrupt, exactly like JacksonParser's strict INT decode)
    WHERE props IS NOT NULL AND json_valid(props)
      AND json_type(props, '$.k') IN ('UBIGINT', 'BIGINT')
      AND TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) IS NOT NULL
    """,
)
def q_filter_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-schema predicate: payload parses and carries the required field
    (validation_consumer.py:130-156; from_json null => corrupt)."""
    ev = load_table(spark, sf_dir, "events")
    parsed = F.from_json("props", "k INT")
    return ev.filter(
        F.col("props").isNotNull() & parsed.isNotNull() & parsed.getField("k").isNotNull()
    ).select("event_id", "props")


@register(
    "q_quality_counts",
    oracle="""
    SELECT event_type,
           count(*) AS n_total,
           count(*) FILTER (WHERE value BETWEEN 0 AND 100) AS n_valid,
           count(*) FILTER (WHERE value IS NULL OR NOT (value BETWEEN 0 AND 100)) AS n_invalid
    FROM events
    GROUP BY event_type
    """,
)
def q_quality_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Valid/invalid counters by group (validation_consumer.py:84-90,549-573)."""
    ev = load_table(spark, sf_dir, "events")
    ok = F.col("value").between(0, 100)
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(ok, 1)).alias("n_valid"),
        F.count(F.when(F.col("value").isNull() | ~ok, 1)).alias("n_invalid"),
    )


@register(
    "q_quality_ratios",
    oracle="""
    SELECT event_type,
           (floor((avg(CASE WHEN value BETWEEN 0 AND 100 THEN 1.0 ELSE 0.0 END)) * 1e4 * (1 + 1e-12) + 0.5) / 1e4)
             AS validity_ratio,
           (floor((avg(CASE WHEN value IS NOT NULL THEN 1.0 ELSE 0.0 END)) * 1e4 * (1 + 1e-12) + 0.5) / 1e4)
             AS completeness_ratio
    FROM events
    GROUP BY event_type
    """,
)
def q_quality_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-threshold ratio metrics (Learning Guide.txt:1058 §5-6)."""
    ev = load_table(spark, sf_dir, "events")
    ok = F.col("value").between(0, 100)
    return ev.groupBy("event_type").agg(
        fround(F.avg(F.when(ok, 1.0).otherwise(0.0)), 4).alias("validity_ratio"),
        fround(
            F.avg(F.when(F.col("value").isNotNull(), 1.0).otherwise(0.0)), 4
        ).alias("completeness_ratio"),
    )


@register(
    "q_null_policy",
    oracle="""
    WITH masked AS (
        SELECT event_id, user_id,
               CASE WHEN value > 50 THEN NULL ELSE value END AS value
        FROM events
    ), m AS (
        SELECT (floor((avg(value)) * 1e4 * (1 + 1e-12) + 0.5) / 1e4) AS fill FROM masked
    )
    SELECT event_id, user_id,
           coalesce(masked.value, m.fill) AS value_filled,
           (masked.value IS NULL) AS was_imputed
    FROM masked CROSS JOIN m
    """,
)
def q_null_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling policy: fill missing with the column mean
    (Learning Guide.txt:1045 §2 — signal_strength mean-fill).  The mean is a
    1-row aggregate broadcast back — no driver round-trip, scales to any
    input size."""
    ev = load_table(spark, sf_dir, "events")
    masked = ev.select(
        "event_id",
        "user_id",
        F.when(F.col("value") > 50, None).otherwise(F.col("value")).alias("value"),
    )
    mean_df = masked.agg(fround(F.avg("value"), 4).alias("fill"))
    return masked.crossJoin(F.broadcast(mean_df)).select(
        "event_id",
        "user_id",
        F.coalesce("value", "fill").alias("value_filled"),
        F.col("value").isNull().alias("was_imputed"),
    )


@register(
    "q_outlier_flag",
    oracle="""
    SELECT event_id, user_id, value,
           NOT (value BETWEEN 2 AND 18) AS is_outlier
    FROM events
    """,
)
def q_outlier_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag (don't drop) out-of-band values (Learning Guide.txt:1045 §2)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        "value",
        (~F.col("value").between(2, 18)).alias("is_outlier"),
    )


# Quality-alert thresholds (Learning Guide.txt:1058 §5-6: alert if >10% of
# messages land in the DLQ, any quality metric drops below 95%, or data
# freshness exceeds 5 minutes).
DLQ_SHARE_MAX = 0.10
QUALITY_MIN = 0.95
FRESHNESS_MAX_MINUTES = 5.0


def alert_flags(metrics: DataFrame) -> DataFrame:
    """Attach the reference's alert verdicts to a metrics frame with columns
    (dlq_share, validity_ratio, freshness_min).  Factored out of
    q_quality_alerts so the threshold EDGES are golden-testable on synthetic
    rows (tests/test_golden.py) — the fixture data never sits exactly on a
    boundary.  Thresholds are strict comparisons: exactly 10% DLQ / 95%
    quality / 5 min freshness does NOT alert."""
    return metrics.select(
        "*",
        (F.col("dlq_share") > DLQ_SHARE_MAX).alias("alert_dlq"),
        (F.col("validity_ratio") < QUALITY_MIN).alias("alert_quality"),
        (F.col("freshness_min") > FRESHNESS_MAX_MINUTES).alias("alert_freshness"),
    ).withColumn(
        "any_alert",
        F.col("alert_dlq") | F.col("alert_quality") | F.col("alert_freshness"),
    )


@register(
    "q_quality_alerts",
    oracle=f"""
    WITH m AS (
        SELECT event_type,
               {fround_sql(f"avg(CASE WHEN {_ORACLE_NFAIL} > 0 THEN 1.0 ELSE 0.0 END)")} AS dlq_share,
               {fround_sql("avg(CASE WHEN value BETWEEN 0 AND 100 THEN 1.0 ELSE 0.0 END)")} AS validity_ratio,
               {fround_sql(f"(date_diff('second', max(CAST(ts AS TIMESTAMP)), TIMESTAMP '{NOW}') / 60.0)")} AS freshness_min
        FROM events
        GROUP BY event_type
    )
    SELECT event_type, dlq_share, validity_ratio, freshness_min,
           dlq_share > 0.10 AS alert_dlq,
           validity_ratio < 0.95 AS alert_quality,
           freshness_min > 5.0 AS alert_freshness,
           (dlq_share > 0.10 OR validity_ratio < 0.95 OR freshness_min > 5.0)
               AS any_alert
    FROM m
    """,
)
def q_quality_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alert verdicts over the quality metrics (Learning Guide.txt:1058
    §5-6): DLQ share of the validation router, range-validity ratio, and
    per-group freshness vs the pinned 'now' (same pinned clock as
    q_filter_freshness — SURVEY §4.4-3).

    Scale: one pass over the validated frame, partial-aggregated per group;
    the flags are a projection over the #groups-row aggregate."""
    v = _with_validation(load_table(spark, sf_dir, "events"))
    agg = v.groupBy("event_type").agg(
        fround(F.avg(F.when(F.col("is_valid"), 0.0).otherwise(1.0)), 4).alias(
            "dlq_share"
        ),
        fround(
            F.avg(F.when(F.col("value").between(0, 100), 1.0).otherwise(0.0)), 4
        ).alias("validity_ratio"),
        F.max("ts").alias("_max_ts"),
    )
    metrics = agg.select(
        "event_type",
        "dlq_share",
        "validity_ratio",
        fround(
            F.expr(f"timestampdiff(SECOND, _max_ts, TIMESTAMP_NTZ '{NOW}')").cast(
                "double"
            )
            / F.lit(60.0),
            4,
        ).alias("freshness_min"),
    )
    return alert_flags(metrics)
