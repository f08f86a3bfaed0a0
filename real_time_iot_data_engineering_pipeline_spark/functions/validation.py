"""Validation rules as native Column expressions.

The reference validates record-by-record in a plain-Python Kafka consumer
(data_quality/validation_consumer.py:130-444): schema -> types ->
completeness -> format -> ranges -> freshness -> duplicates, collecting every
failing rule's message into a list; any failure routes the record to the DLQ
with `validation_failures` attached (validation_consumer.py:513-587).

Here each rule is a (message, fails_condition) pair evaluated as one vector
projection — all rules for a row are computed in a single pass inside
whole-stage codegen, no Python in the hot path.  At 100 TB this is the only
viable shape: validation is embarrassingly parallel and must not shuffle.

Tolerant-coercion fidelity (SURVEY.md §7.4-5): the reference accepts numeric
strings ("12.3") for numeric fields and treats "null"/"none"/"n/a"/"" as
missing (validation_consumer.py:182-191,230-234,347).  We reproduce that with
try_cast (null-on-failure regardless of session ANSI mode) and the
NULL_STRINGS check.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# validation_consumer.py:232,347 (case-insensitive null-like strings)
NULL_STRINGS = ("null", "none", "n/a", "")

# validation_consumer.py:68-74
VALUE_RANGES: dict[str, tuple[float, float]] = {
    "temperature": (-50.0, 50.0),
    "humidity": (0.0, 100.0),
    "energy_consumption": (0.0, 10.0),
    "signal_strength": (-150.0, 0.0),
    "battery_level": (0.0, 100.0),
}

# validation_consumer.py:263
SENSOR_ID_PATTERN = r"^SENSOR_[A-Z]{3}_\d{3}$"

Rule = tuple[str, Column]  # (failure message, condition that FAILS the rule)


def is_null_or_null_string(c: Column) -> Column:
    """Missing-ness test: SQL NULL or a null-like string (case-insensitive,
    trimmed) — validation_consumer.py:324-350."""
    return c.isNull() | F.lower(F.trim(c.cast("string"))).isin(*NULL_STRINGS)


def numeric_coercible(c: Column) -> Column:
    """True when the value is a number or a numeric string — the reference's
    tolerant type check (validation_consumer.py:182-191)."""
    return c.cast("string").try_cast("double").isNotNull()


def in_range(c: Column, field: str) -> Column:
    """Range check after tolerant coercion (validation_consumer.py:207-245).
    Null / null-string values skip the range check (the completeness rule
    owns missing-ness)."""
    lo, hi = VALUE_RANGES[field]
    coerced = c.cast("string").try_cast("double")
    return coerced.isNull() | coerced.between(lo, hi)


def matches_sensor_id(c: Column) -> Column:
    """Format check on the trimmed id (validation_consumer.py:262-267).
    The reference trims before matching (and forwards the trimmed value)."""
    return F.regexp_like(F.trim(c), F.lit(SENSOR_ID_PATTERN))


def is_fresh(ts: Column, now: Column, max_age_seconds: int = 300) -> Column:
    """Not in the future and not older than max_age (validation_consumer.py:
    284-321; reference default 5 minutes).  `now` is an explicit column so
    tests pin it to a literal (the reference's wall-clock read is a
    reproducibility bug we do not copy — SURVEY.md §4.4-3)."""
    age = F.unix_timestamp(now) - F.unix_timestamp(ts)
    return (ts <= now) & (age <= max_age_seconds)


def failure_reasons(rules: list[Rule]) -> Column:
    """Collect every failing rule's message into array<string>, preserving
    rule order (validation_consumer.py:97-124,412-444).  A null condition
    (from null inputs) counts as not-failed, matching the reference where
    missing-ness is reported only by its dedicated rule.

    Validity is `size(failure_reasons(...)) == 0` computed on the ALREADY
    materialized reasons column (validation_consumer.py:420-436) — callers
    derive it that way rather than re-evaluating the rule set."""
    msgs = [F.when(cond, F.lit(msg)) for msg, cond in rules]
    return F.filter(F.array(*msgs), lambda x: x.isNotNull())
