"""Streaming twins of the producer pipeline: rate-source synthetic
record generation (P9 as an unbounded stream) and streaming dedup
within a watermark."""

from pyspark.sql import functions as F

from api_kakfa_spark_airflow_s3_athena_spark.functions.transforms import (
    parse_kafka_value,
    to_kafka_value,
)
from api_kakfa_spark_airflow_s3_athena_spark.sources.tables import load_table


def test_rate_source_synthetic_stream_roundtrip(spark):
    """The reference pipeline with zero external dependencies: a rate
    source paces generation (like the producer's sleep loop), each tick
    becomes a deterministic synthetic user, serialized to the Kafka
    wire shape and parsed back by the streaming transform."""
    from api_kakfa_spark_airflow_s3_athena_spark.functions import transforms as TR

    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 50)
        .option("numPartitions", 2)
        .load()
    )
    # same deterministic pools as synthetic_users, keyed by the tick id
    users = TR.synthetic_users(spark, 1, seed=7).limit(0)  # schema template
    gen = rate.withColumnRenamed("value", "row_id")

    def pick(pool, salt):
        idx = F.pmod(F.xxhash64("row_id", F.lit(7), F.lit(salt)), F.lit(len(pool)))
        return F.element_at(F.array(*[F.lit(v) for v in pool]), (idx + 1).cast("int"))

    records = gen.select(
        TR.full_name(F.lit("Mx"), pick(("Ava", "Noah"), 1), pick(("Liu", "Patel"), 2)).alias("name"),
        pick(("male", "female"), 3).alias("gender"),
        F.format_string("%d, Main St", F.pmod("row_id", F.lit(999))).alias("address"),
        pick(("London", "Sydney"), 4).alias("city"),
        pick(("UK", "AU"), 5).alias("nation"),
        F.col("row_id").cast("string").alias("zip"),
        F.lit(51.5).alias("latitude"),
        F.lit(-0.1).alias("longitude"),
        F.format_string("u%d@example.com", "row_id").alias("email"),
    )
    wire = to_kafka_value(records)
    parsed = parse_kafka_value(wire)
    assert sorted(parsed.columns) == sorted(users.columns)

    q = (
        parsed.writeStream.outputMode("append")
        .format("memory")
        .queryName("rate_gen")
        .start()
    )
    try:
        q.processAllAvailable()
        # let at least one batch of generated rows land
        import time

        deadline = time.time() + 20
        while time.time() < deadline and spark.table("rate_gen").count() == 0:
            time.sleep(0.5)
            q.processAllAvailable()
        out = spark.table("rate_gen")
        n = out.count()
        assert n > 0, "rate source produced no rows"
        row = out.limit(1).collect()[0]
        assert row.email.startswith("u") and "@example.com" in row.email
        assert row.gender in ("male", "female")
    finally:
        q.stop()


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark: exact-once per event_id inside
    the watermark horizon, bounded state."""
    events = load_table(spark, "/root/testdata/sf0.001", "events").limit(200)
    # duplicate every event (simulating at-least-once upstream delivery)
    dup = events.union(events)
    src = str(tmp_path / "src")
    dup.write.parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(["event_id"])
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_dedup")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("stream_dedup")
    assert out.count() == events.count()  # every duplicate dropped
    assert out.select("event_id").distinct().count() == out.count()
