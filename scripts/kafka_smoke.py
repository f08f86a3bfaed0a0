"""Live-broker Kafka smoke: the executable path for sources/kafka.py the
day an environment provides a broker (this container ships neither a
broker nor the spark-sql-kafka connector jar, so the streaming tests
drive the identical downstream plan through the file-source seam).

Round-trips the option wiring end-to-end:

  1. batch-WRITE fixture events through to_kafka_sink_frame +
     kafka_sink_options to the raw topic (idempotent producer, acks=all,
     keyed by user_id — producer.py:196-217,227-243 semantics);
  2. readStream them back with kafka_source_options
     (startingOffsets=earliest so the smoke sees its own writes;
     failOnDataLoss as the reference sets it, and maxOffsetsPerTrigger
     as the CORRECTED spelling of the reference's intent — the
     reference writes the broker-prefixed `kafka.maxOffsetsPerTrigger`
     (streaming_job.py:205-230), which the Spark Kafka source silently
     drops; kafka_source_options uses the unprefixed reader option that
     actually rate-limits the trigger);
  3. run the real parse stage (streaming/pipeline.py::parse_event_stream)
     over the decoded values and assert every produced row arrives.

Usage (any host with a broker):

    spark-submit --packages \
        org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version> \
        scripts/kafka_smoke.py [bootstrap_servers] [topic]

Exits 0 on success, 2 with a SKIP message when no broker answers (so CI
can gate on the exit code), 1 on a real failure.
"""

from __future__ import annotations

import socket
import sys
import time
import uuid

REPO = __file__.rsplit("/scripts/", 1)[0]
sys.path.insert(0, REPO)

N_EVENTS = 20
TIMEOUT_S = 60


def broker_reachable(bootstrap: str) -> bool:
    host, _, port = bootstrap.partition(":")
    try:
        with socket.create_connection((host, int(port or 9092)), timeout=2):
            return True
    except OSError:
        return False


def main() -> int:
    bootstrap = sys.argv[1] if len(sys.argv) > 1 else "localhost:9092"
    topic = sys.argv[2] if len(sys.argv) > 2 else f"smoke_{uuid.uuid4().hex[:8]}"
    if not broker_reachable(bootstrap):
        print(f"SKIP: no Kafka broker at {bootstrap}")
        return 2

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from real_time_iot_data_engineering_pipeline_spark.sources.kafka import (
        kafka_sink_options,
        kafka_source_options,
        to_kafka_sink_frame,
    )
    from real_time_iot_data_engineering_pipeline_spark.streaming.pipeline import (
        EVENT_WIRE_SCHEMA,
        parse_event_stream,
    )

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("kafka-smoke")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    try:
        events = spark.range(N_EVENTS).select(
            F.col("id").alias("event_id"),
            F.date_format(
                F.timestamp_seconds(F.lit(1_705_660_000) + F.col("id")),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("ts"),
            (F.col("id") % 5).alias("user_id"),
            F.lit("click").alias("event_type"),
            F.col("id").cast("double").alias("value"),
            F.lit('{"k":1}').alias("props"),
        )
        # 1. produce (batch write exercises the same sink options the
        # streaming writeStream would pass)
        writer = to_kafka_sink_frame(events, key_col="user_id").write.format(
            "kafka"
        )
        for k, v in kafka_sink_options(topic, bootstrap).items():
            writer = writer.option(k, v)
        writer.save()

        # 2. consume from the beginning with the reference's reader options
        reader = spark.readStream.format("kafka")
        for k, v in kafka_source_options(
            topic, bootstrap, starting_offsets="earliest"
        ).items():
            reader = reader.option(k, v)
        raw = reader.load()
        decoded = raw.select(
            F.from_json(F.col("value").cast("string"), EVENT_WIRE_SCHEMA).alias(
                "r"
            ),
            F.col("key").cast("string").alias("k"),
        ).select("k", "r.*")
        parsed = parse_event_stream(decoded.drop("k")).join(
            decoded.select("k", "event_id"), "event_id"
        )

        out = f"/tmp/kafka_smoke_{uuid.uuid4().hex[:8]}"
        q = (
            parsed.writeStream.format("memory")
            .queryName("smoke")
            .option("checkpointLocation", f"{out}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        deadline = time.time() + TIMEOUT_S
        while q.isActive and time.time() < deadline:
            time.sleep(1)
        q.awaitTermination(5)

        got = spark.sql(
            "SELECT count(*) AS n, count(DISTINCT k) AS keys FROM smoke"
        ).first()
        assert got["n"] == N_EVENTS, f"round-trip lost rows: {got['n']}/{N_EVENTS}"
        assert got["keys"] == 5, f"key projection broken: {got['keys']} keys"
        print(f"OK: {got['n']} events round-tripped over {bootstrap}/{topic}")
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
