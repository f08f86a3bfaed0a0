"""Kafka topic provisioning: the reference's init_topics flow, broker-free.

The reference provisions its four pipeline topics from a JSON config
(kafka/topics_config.json:1-46) via an idempotent admin script
(kafka/init_topics.py:1-378): load + validate config, wait for the broker
with bounded retries, batch-create topics where already-exists counts as
success, and exit 0/1/2/3 for ok / config error / connect error / create
error.  This module reproduces that surface with the admin client and the
clock INJECTED, so the whole flow is unit-testable without a broker and a
real deployment can hand in `kafka.KafkaAdminClient` (or confluent's) in a
thin adapter.

Why this matters at scale: topic partition counts bound Structured
Streaming's source parallelism (one Spark task per topic-partition per
micro-batch), so the partition spec here IS the ingest-stage sizing knob —
raw_iot_data's 3 partitions cap ingestion at 3 concurrent tasks and would
be raised to O(executors) on a real cluster, while the DLQ topics stay at 1
because their volume is the <5% reject stream (topics_config.json:24-44).
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable, Iterable, Mapping
from dataclasses import dataclass, field

# Exit codes (init_topics.py:23-27).
EXIT_OK = 0
EXIT_CONFIG_ERROR = 1
EXIT_CONNECT_ERROR = 2
EXIT_CREATE_ERROR = 3

# Broker-wait policy (init_topics.py:66-68: MAX_RETRIES=30, RETRY_INTERVAL=2).
MAX_RETRIES = 30
RETRY_INTERVAL_SEC = 2.0

SEVEN_DAYS_MS = "604800000"


class TopicConfigError(ValueError):
    """Config shape/content violation (exit-code-1 class)."""


class TopicExistsError(Exception):
    """Raised by an admin client when the topic already exists; provisioning
    treats it as success (init_topics.py:237-238 'already exists, skipping')."""


@dataclass(frozen=True)
class TopicSpec:
    """One topic from the config (name + sizing + broker config strings)."""

    name: str
    partitions: int = 1  # init_topics.py:210 default
    replication_factor: int = 1  # init_topics.py:211 default
    config: Mapping[str, str] = field(default_factory=dict)
    description: str = ""

    def __post_init__(self) -> None:
        if not self.name or not isinstance(self.name, str):
            raise TopicConfigError(f"topic name must be a non-empty string: {self.name!r}")
        if self.partitions < 1:
            raise TopicConfigError(f"{self.name}: partitions must be >= 1")
        if self.replication_factor < 1:
            raise TopicConfigError(f"{self.name}: replication_factor must be >= 1")


# The pipeline's four topics with the reference's exact sizing and retention
# (kafka/topics_config.json:1-46): 3-partition hot paths, 1-partition DLQs,
# 7-day delete retention everywhere.
PIPELINE_TOPICS: tuple[TopicSpec, ...] = (
    TopicSpec(
        "raw_iot_data",
        partitions=3,
        config={"retention.ms": SEVEN_DAYS_MS, "cleanup.policy": "delete"},
        description="Raw IoT sensor data from data generator (before validation)",
    ),
    TopicSpec(
        "validated_iot_data",
        partitions=3,
        config={"retention.ms": SEVEN_DAYS_MS, "cleanup.policy": "delete"},
        description="Validated and cleaned IoT sensor data (after quality checks)",
    ),
    TopicSpec(
        "dlq_iot_data",
        partitions=1,
        config={"retention.ms": SEVEN_DAYS_MS, "cleanup.policy": "delete"},
        description="Dead-letter queue for invalid IoT sensor data (failed validation)",
    ),
    TopicSpec(
        "dlq_raw_iot_data",
        partitions=1,
        config={"retention.ms": SEVEN_DAYS_MS, "cleanup.policy": "delete"},
        description=(
            "Dead-letter queue for raw IoT data that failed to send to "
            "raw_iot_data topic (7 days retention)"
        ),
    ),
)


def parse_topics_config(config: object) -> list[TopicSpec]:
    """Validate and parse the reference's config shape
    (init_topics.py:71-103: require a 'topics' list; per-topic defaults and
    stringified broker config per :205-217)."""
    if not isinstance(config, dict) or "topics" not in config:
        raise TopicConfigError("configuration must contain 'topics' key")
    topics = config["topics"]
    if not isinstance(topics, list):
        raise TopicConfigError("'topics' must be a list")
    specs = []
    for t in topics:
        if not isinstance(t, dict) or "name" not in t:
            raise TopicConfigError(f"each topic needs a 'name': {t!r}")
        specs.append(
            TopicSpec(
                name=t["name"],
                partitions=int(t.get("partitions", 1)),
                replication_factor=int(t.get("replication_factor", 1)),
                config={k: str(v) for k, v in t.get("config", {}).items()},
                description=str(t.get("description", "")),
            )
        )
    return specs


def load_topics_config(path: str) -> list[TopicSpec]:
    """Load + validate a topics_config.json (init_topics.py:71-103)."""
    if not os.path.exists(path):
        raise FileNotFoundError(f"Configuration file not found: {path}")
    with open(path, encoding="utf-8") as f:
        return parse_topics_config(json.load(f))


def topics_config_json(specs: Iterable[TopicSpec] = PIPELINE_TOPICS) -> str:
    """Render specs back to the reference's config shape (round-trips
    through parse_topics_config)."""
    return json.dumps(
        {
            "topics": [
                {
                    "name": s.name,
                    "partitions": s.partitions,
                    "replication_factor": s.replication_factor,
                    "config": dict(s.config),
                    "description": s.description,
                }
                for s in specs
            ]
        },
        indent=2,
    )


def wait_for_broker(
    probe: Callable[[], None],
    max_retries: int = MAX_RETRIES,
    retry_interval: float = RETRY_INTERVAL_SEC,
    sleep: Callable[[float], None] = time.sleep,
) -> bool:
    """Bounded readiness wait (init_topics.py:105-168): call `probe` until
    it stops raising, at most max_retries times, retry_interval apart.
    Returns readiness instead of raising — the caller maps False to
    EXIT_CONNECT_ERROR."""
    for attempt in range(max_retries):
        try:
            probe()
            return True
        except Exception:
            if attempt < max_retries - 1:
                sleep(retry_interval)
    return False


def provision_topics(
    admin: object, specs: Iterable[TopicSpec]
) -> tuple[list[str], list[str], list[str]]:
    """Create every topic; already-exists is success (init_topics.py:230-245).

    `admin` is any object with `create_topic(spec: TopicSpec) -> None`
    raising TopicExistsError for duplicates — a deployment adapts the real
    KafkaAdminClient to this in two lines.  Returns (created, existed,
    failed) name lists; failures don't abort the batch (one bad topic must
    not block the DLQs)."""
    created: list[str] = []
    existed: list[str] = []
    failed: list[str] = []
    for spec in specs:
        try:
            admin.create_topic(spec)
            created.append(spec.name)
        except TopicExistsError:
            existed.append(spec.name)
        except Exception:
            failed.append(spec.name)
    return created, existed, failed


def init_topics(
    admin: object,
    config_path: str | None = None,
    probe: Callable[[], None] | None = None,
    sleep: Callable[[float], None] = time.sleep,
    max_retries: int = MAX_RETRIES,
) -> int:
    """The full init_topics flow (init_topics.py:270-378) with the exit-code
    contract: 1 config error, 2 broker unavailable, 3 create failures, 0 ok.
    config_path=None uses the built-in PIPELINE_TOPICS."""
    try:
        specs = load_topics_config(config_path) if config_path else list(PIPELINE_TOPICS)
    except (FileNotFoundError, TopicConfigError, json.JSONDecodeError):
        return EXIT_CONFIG_ERROR
    if probe is not None and not wait_for_broker(
        probe, max_retries=max_retries, sleep=sleep
    ):
        return EXIT_CONNECT_ERROR
    _created, _existed, failed = provision_topics(admin, specs)
    return EXIT_CREATE_ERROR if failed else EXIT_OK
