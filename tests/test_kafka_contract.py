"""S5/S6 Kafka contracts pinned WITHOUT a broker.

The sandbox has no Kafka broker or connector jar, so the live publish
path can't execute; what CAN be pinned offline — and what a real user
wiring Kafka hits first — is (a) the exact option dict the sink
receives (reliability posture parity with the reference producer,
``dags/producer/kafka_streaming_service.py:180-188``) and (b) the
topic-admin no-op/create decision logic
(``kafka_streaming_service.py:94-109``), driven here through an
injected stub with confluent-kafka's admin shape.
"""

import pytest

from api_kakfa_spark_airflow_s3_athena_spark.sources.kafka import (
    PRODUCER_OPTIONS,
    ensure_topic,
    kafka_sink_options,
)


def test_sink_options_match_reference_producer_posture():
    # reference build_producer conf: acks=all, enable.idempotence=True,
    # compression.type=gzip, linger.ms=20, batch.size=64_000 — carried
    # verbatim as the Spark sink's kafka.* options
    opts = kafka_sink_options("broker:9092", "names_topic")
    assert opts == {
        "kafka.bootstrap.servers": "broker:9092",
        "topic": "names_topic",
        "kafka.acks": "all",
        "kafka.enable.idempotence": "true",
        "kafka.compression.type": "gzip",
        "kafka.linger.ms": "20",
        "kafka.batch.size": "64000",
    }
    # every reliability option routed under the kafka. prefix — an
    # unprefixed producer option would be silently ignored by the sink
    assert all(k.startswith("kafka.") for k in PRODUCER_OPTIONS)


def test_sink_options_streaming_adds_checkpoint_only():
    batch = kafka_sink_options("b:9092", "t")
    stream = kafka_sink_options("b:9092", "t", checkpoint="/ckpt")
    assert stream.pop("checkpointLocation") == "/ckpt"
    assert stream == batch


class _Future:
    def __init__(self, exc=None):
        self._exc = exc

    def result(self):
        if self._exc:
            raise self._exc


class _Metadata:
    def __init__(self, topics):
        self.topics = {t: object() for t in topics}


class _StubAdmin:
    """confluent-kafka AdminClient shape: list_topics/create_topics."""

    def __init__(self, existing=(), create_exc=None):
        self._existing = list(existing)
        self._create_exc = create_exc
        self.created = []

    def list_topics(self, timeout=None):
        return _Metadata(self._existing)

    def create_topics(self, new_topics):
        self.created.extend(new_topics)
        return {t.topic: _Future(self._create_exc) for t in new_topics}


def test_ensure_topic_creates_when_missing():
    admin = _StubAdmin(existing=["other_topic"])
    assert ensure_topic("b:9092", "names_topic", 3, 2, admin_client=admin) is True
    (spec,) = admin.created
    assert (spec.topic, spec.num_partitions, spec.replication_factor) == (
        "names_topic",
        3,
        2,
    )


def test_ensure_topic_noops_when_present():
    admin = _StubAdmin(existing=["names_topic"])
    assert ensure_topic("b:9092", "names_topic", admin_client=admin) is False
    assert admin.created == []


def test_ensure_topic_propagates_create_failure():
    admin = _StubAdmin(create_exc=RuntimeError("NOT_ENOUGH_REPLICAS"))
    with pytest.raises(RuntimeError, match="NOT_ENOUGH_REPLICAS"):
        ensure_topic("b:9092", "names_topic", admin_client=admin)


def test_ensure_topic_without_lib_or_stub_returns_none():
    # container has no confluent-kafka: the default path must degrade
    # to the documented None (caller decides whether that's fatal)
    assert ensure_topic("b:9092", "names_topic") is None
