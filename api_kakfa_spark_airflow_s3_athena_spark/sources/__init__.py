"""Sources and sinks: parquet/JSON table catalog, Kafka wrappers."""
