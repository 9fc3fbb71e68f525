"""Structured Streaming: Kafka/file sources, checkpointed sinks,
bounded replays, windowed aggregation, compaction."""
