"""Kafka connectors beyond the streaming source (S5/S6 parity).

The reference publishes with a driver-side confluent-kafka producer
(``dags/producer/kafka_streaming_service.py:178-208``); our engine's
primary publish path is Spark's Kafka *sink* — distributed, no driver
loop — with the producer-reliability options carried over as
``kafka.*`` configs. The confluent-kafka admin/producer helpers are
kept (behind an import-try; the lib isn't in this container) for
fixtures and parity demos.

Offline testability: option assembly and topic-admin logic are
factored so a broker is never required to pin the contracts —
``kafka_sink_options`` is a pure function asserted verbatim in
tests/test_kafka_contract.py, and :func:`ensure_topic` accepts an
injected admin client (tests drive it with a stub; production omits
the argument and gets confluent-kafka).
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import DataFrame

from ..functions.transforms import to_kafka_value

__all__ = [
    "PRODUCER_OPTIONS",
    "kafka_sink_options",
    "write_batch_to_kafka",
    "write_stream_to_kafka",
    "ensure_topic",
]

# Reliability posture of the reference producer
# (kafka_streaming_service.py:180-188), as Spark sink options.
PRODUCER_OPTIONS = {
    "kafka.acks": "all",
    "kafka.enable.idempotence": "true",
    "kafka.compression.type": "gzip",
    "kafka.linger.ms": "20",
    "kafka.batch.size": "64000",
}


def kafka_sink_options(
    brokers: str, topic: str, checkpoint: Optional[str] = None
) -> Dict[str, str]:
    """The COMPLETE option dict a Kafka sink receives — connection,
    routing, reliability, and (streaming only) checkpoint. One source
    of truth for both writer paths, so the contract test pinning this
    dict against the reference producer's posture covers them both."""
    opts = {"kafka.bootstrap.servers": brokers, "topic": topic, **PRODUCER_OPTIONS}
    if checkpoint is not None:
        opts["checkpointLocation"] = checkpoint
    return opts


def write_batch_to_kafka(df: DataFrame, brokers: str, topic: str) -> None:
    """Serialize every row to JSON and publish (S5 parity, distributed).

    Requires the Kafka connector jar; unavailable offline — the JSON
    serialization half (:func:`to_kafka_value`) and the exact option
    dict are tested standalone (tests/test_kafka_contract.py).
    """
    to_kafka_value(df).write.format("kafka").options(
        **kafka_sink_options(brokers, topic)
    ).save()


def write_stream_to_kafka(df: DataFrame, brokers: str, topic: str, checkpoint: str):
    return (
        to_kafka_value(df)
        .writeStream.format("kafka")
        .options(**kafka_sink_options(brokers, topic, checkpoint))
        .start()
    )


def ensure_topic(
    bootstrap: str,
    topic: str,
    num_partitions: int = 1,
    replication_factor: int = 1,
    admin_client=None,
) -> Optional[bool]:
    """Idempotent topic creation (S6 parity,
    ``kafka_streaming_service.py:94-109``). Returns True if created,
    False if it already existed, None if confluent-kafka is absent.

    ``admin_client`` injects the admin implementation (anything with
    confluent-kafka's ``list_topics``/``create_topics`` shape); by
    default the real AdminClient is built, matching the reference's
    ``KafkaAdminClient(bootstrap_servers=...)``.
    """
    if admin_client is None:
        try:
            from confluent_kafka.admin import AdminClient  # type: ignore
        except ModuleNotFoundError:
            return None
        admin_client = AdminClient({"bootstrap.servers": bootstrap})
    if topic in admin_client.list_topics(timeout=5).topics:
        return False
    futures = admin_client.create_topics(
        [_new_topic(topic, num_partitions, replication_factor)]
    )
    for fut in futures.values():
        fut.result()
    return True


def _new_topic(topic: str, num_partitions: int, replication_factor: int):
    """confluent-kafka NewTopic when available, else a plain spec
    carrying the same fields — the admin stub in tests receives
    exactly what the real client would."""
    try:
        from confluent_kafka.admin import NewTopic  # type: ignore

        return NewTopic(
            topic, num_partitions=num_partitions, replication_factor=replication_factor
        )
    except ModuleNotFoundError:

        class _TopicSpec:
            def __init__(self, t, n, r):
                self.topic, self.num_partitions, self.replication_factor = t, n, r

        return _TopicSpec(topic, num_partitions, replication_factor)
