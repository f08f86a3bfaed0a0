"""Parquet table loaders for the driver fixtures (TESTDATA.md).

The `events` table plays the reference's IoT reading stream
(FIXTURES.md role mapping: user_id <-> sensor_id, ts <-> event time,
value <-> temperature, event_type <-> device_type, props <-> payload JSON).

events.ts is stored as parquet TIMESTAMP(NANOS), which Spark cannot map to a
Catalyst type; we read it as raw nanos (spark.sql.legacy.parquet.nanosAsLong)
and rebuild a TIMESTAMP_NTZ by adding microseconds to the NTZ epoch.  Using
NTZ everywhere makes results bit-identical to DuckDB's naive timestamps
regardless of either engine's session timezone — a correctness requirement
for the oracle comparison (SURVEY.md §7.4-1).

Scale note: loaders return the raw scan (no repartition, no cache) so
Catalyst can push filters/column pruning into the parquet reader; callers
express projections declaratively and the scan only reads what the plan
needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# timestampadd(MICROSECOND, epoch_micros, NTZ epoch) is timezone-independent:
# no instant<->wall conversion ever happens, unlike timestamp_micros() which
# produces a TIMESTAMP (instant) that would shift with the session timezone.
_NS_TO_NTZ = "timestampadd(MICROSECOND, ts div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table; normalizes events.ts to TIMESTAMP_NTZ.

    SIDE EFFECT: loading `events` sets spark.sql.legacy.parquet.nanosAsLong
    on the CALLER's session (required by the driver contract — the verify
    driver's session doesn't set it, and Spark offers no per-read knob for
    TIMESTAMP(NANOS) columns).  The flag persists for later parquet reads in
    that session; it only affects files with nanosecond timestamps."""
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        # Runtime-settable; required to read TIMESTAMP(NANOS) columns even
        # when the caller's session (e.g. the verify driver's) didn't set it.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        return df.withColumn("ts", F.expr(_NS_TO_NTZ))
    return spark.read.parquet(path)
