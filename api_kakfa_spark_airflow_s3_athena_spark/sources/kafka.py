"""Kafka connectors beyond the streaming source (S5/S6 parity).

The reference publishes with a driver-side confluent-kafka producer
(``dags/producer/kafka_streaming_service.py:178-208``); our engine's
primary publish path is Spark's Kafka *sink* — distributed, no driver
loop — with the producer-reliability options carried over as
``kafka.*`` configs. The confluent-kafka admin/producer helpers are
kept (behind an import-try; the lib isn't in this container) for
fixtures and parity demos.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame

from ..functions.transforms import to_kafka_value

__all__ = ["write_batch_to_kafka", "write_stream_to_kafka", "ensure_topic"]

# Reliability posture of the reference producer
# (kafka_streaming_service.py:180-188), as Spark sink options.
PRODUCER_OPTIONS = {
    "kafka.acks": "all",
    "kafka.enable.idempotence": "true",
    "kafka.compression.type": "gzip",
    "kafka.linger.ms": "20",
    "kafka.batch.size": "64000",
}


def write_batch_to_kafka(df: DataFrame, brokers: str, topic: str) -> None:
    """Serialize every row to JSON and publish (S5 parity, distributed).

    Requires the Kafka connector jar; unavailable offline — the JSON
    serialization half (:func:`to_kafka_value`) is tested standalone.
    """
    writer = to_kafka_value(df).write.format("kafka").option(
        "kafka.bootstrap.servers", brokers
    ).option("topic", topic)
    for k, v in PRODUCER_OPTIONS.items():
        writer = writer.option(k, v)
    writer.save()


def write_stream_to_kafka(df: DataFrame, brokers: str, topic: str, checkpoint: str):
    writer = to_kafka_value(df).writeStream.format("kafka").option(
        "kafka.bootstrap.servers", brokers
    ).option("topic", topic).option("checkpointLocation", checkpoint)
    for k, v in PRODUCER_OPTIONS.items():
        writer = writer.option(k, v)
    return writer.start()


def ensure_topic(
    bootstrap: str, topic: str, num_partitions: int = 1, replication_factor: int = 1
) -> Optional[bool]:
    """Idempotent topic creation (S6 parity,
    ``kafka_streaming_service.py:94-109``). Returns True if created,
    False if it already existed, None if confluent-kafka is absent.
    """
    try:
        from confluent_kafka.admin import AdminClient, NewTopic  # type: ignore
    except ModuleNotFoundError:
        return None
    admin = AdminClient({"bootstrap.servers": bootstrap})
    if topic in admin.list_topics(timeout=5).topics:
        return False
    futures = admin.create_topics(
        [NewTopic(topic, num_partitions=num_partitions, replication_factor=replication_factor)]
    )
    for fut in futures.values():
        fut.result()
    return True
