"""Topic-provisioning tests (reference kafka/init_topics.py:1-378 +
kafka/topics_config.json:1-46): config parity with the reference's four
topics, validation errors, idempotent create, bounded broker wait, and the
exit-code contract — all against an injected fake admin client."""

from __future__ import annotations

import json
import os

import pytest

from real_time_iot_data_engineering_pipeline_spark.sources.topics import (
    EXIT_CONFIG_ERROR,
    EXIT_CONNECT_ERROR,
    EXIT_CREATE_ERROR,
    EXIT_OK,
    PIPELINE_TOPICS,
    TopicConfigError,
    TopicExistsError,
    TopicSpec,
    init_topics,
    parse_topics_config,
    provision_topics,
    topics_config_json,
    wait_for_broker,
)

REF_CONFIG = "/root/reference/kafka/topics_config.json"


class FakeAdmin:
    def __init__(self, existing=(), broken=()):
        self.existing = set(existing)
        self.broken = set(broken)
        self.created: list[TopicSpec] = []

    def create_topic(self, spec: TopicSpec) -> None:
        if spec.name in self.broken:
            raise RuntimeError("broker said no")
        if spec.name in self.existing:
            raise TopicExistsError(spec.name)
        self.existing.add(spec.name)
        self.created.append(spec)


class TestConfigParity:
    @pytest.mark.skipif(not os.path.exists(REF_CONFIG), reason="reference absent")
    def test_pipeline_topics_match_reference_config(self):
        """Line-for-line parity with the reference's shipped config: same
        topics, partitions, replication, retention, cleanup policy."""
        ref = parse_topics_config(json.load(open(REF_CONFIG)))
        assert list(PIPELINE_TOPICS) == ref

    def test_roundtrip_through_reference_shape(self):
        rendered = json.loads(topics_config_json())
        assert parse_topics_config(rendered) == list(PIPELINE_TOPICS)

    def test_expected_sizing(self):
        by_name = {s.name: s for s in PIPELINE_TOPICS}
        assert by_name["raw_iot_data"].partitions == 3
        assert by_name["validated_iot_data"].partitions == 3
        assert by_name["dlq_iot_data"].partitions == 1
        assert by_name["dlq_raw_iot_data"].partitions == 1
        for s in PIPELINE_TOPICS:
            assert s.config["retention.ms"] == "604800000"  # 7 days
            assert s.config["cleanup.policy"] == "delete"
            assert s.replication_factor == 1


class TestValidation:
    def test_missing_topics_key(self):
        with pytest.raises(TopicConfigError, match="'topics' key"):
            parse_topics_config({"nope": []})

    def test_topics_not_a_list(self):
        with pytest.raises(TopicConfigError, match="must be a list"):
            parse_topics_config({"topics": {"name": "x"}})

    def test_topic_without_name(self):
        with pytest.raises(TopicConfigError, match="'name'"):
            parse_topics_config({"topics": [{"partitions": 2}]})

    def test_bad_partition_count(self):
        with pytest.raises(TopicConfigError, match="partitions"):
            TopicSpec("t", partitions=0)

    def test_defaults_applied(self):
        [spec] = parse_topics_config({"topics": [{"name": "t"}]})
        assert (spec.partitions, spec.replication_factor) == (1, 1)

    def test_config_values_stringified(self):
        [spec] = parse_topics_config(
            {"topics": [{"name": "t", "config": {"retention.ms": 604800000}}]}
        )
        assert spec.config["retention.ms"] == "604800000"


class TestProvisioning:
    def test_creates_all_four(self):
        admin = FakeAdmin()
        created, existed, failed = provision_topics(admin, PIPELINE_TOPICS)
        assert created == [s.name for s in PIPELINE_TOPICS]
        assert existed == [] and failed == []
        assert admin.created[0].config["retention.ms"] == "604800000"

    def test_already_exists_is_success_and_idempotent(self):
        admin = FakeAdmin(existing={"raw_iot_data"})
        created, existed, failed = provision_topics(admin, PIPELINE_TOPICS)
        assert existed == ["raw_iot_data"] and failed == []
        # Second run: everything exists, nothing fails.
        created2, existed2, failed2 = provision_topics(admin, PIPELINE_TOPICS)
        assert created2 == [] and failed2 == []
        assert existed2 == [s.name for s in PIPELINE_TOPICS]

    def test_one_failure_does_not_abort_batch(self):
        admin = FakeAdmin(broken={"validated_iot_data"})
        created, existed, failed = provision_topics(admin, PIPELINE_TOPICS)
        assert failed == ["validated_iot_data"]
        assert "dlq_raw_iot_data" in created  # later topics still attempted


class TestWaitAndExitCodes:
    def test_wait_retries_until_ready(self):
        calls, naps = [], []
        def probe():
            calls.append(1)
            if len(calls) < 4:
                raise ConnectionError("not yet")
        assert wait_for_broker(probe, max_retries=10, retry_interval=2.0, sleep=naps.append)
        assert len(calls) == 4 and naps == [2.0, 2.0, 2.0]

    def test_wait_gives_up_after_max_retries(self):
        def probe():
            raise ConnectionError("never")
        naps = []
        assert not wait_for_broker(probe, max_retries=5, sleep=naps.append)
        assert len(naps) == 4  # no sleep after the final attempt

    def test_exit_ok(self, tmp_path):
        cfg = tmp_path / "topics.json"
        cfg.write_text(topics_config_json())
        assert init_topics(FakeAdmin(), str(cfg)) == EXIT_OK

    def test_exit_config_error(self, tmp_path):
        assert init_topics(FakeAdmin(), str(tmp_path / "absent.json")) == EXIT_CONFIG_ERROR
        bad = tmp_path / "bad.json"
        bad.write_text('{"topics": "nope"}')
        assert init_topics(FakeAdmin(), str(bad)) == EXIT_CONFIG_ERROR

    def test_exit_connect_error(self):
        def probe():
            raise ConnectionError("down")
        rc = init_topics(FakeAdmin(), probe=probe, sleep=lambda _s: None, max_retries=3)
        assert rc == EXIT_CONNECT_ERROR

    def test_exit_create_error(self):
        rc = init_topics(FakeAdmin(broken={"dlq_iot_data"}))
        assert rc == EXIT_CREATE_ERROR

    def test_builtin_config_used_when_no_path(self):
        admin = FakeAdmin()
        assert init_topics(admin) == EXIT_OK
        assert {s.name for s in admin.created} == {s.name for s in PIPELINE_TOPICS}
