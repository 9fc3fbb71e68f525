"""Pipeline observability: df.observe() metrics on batch and streaming
plans — production jobs assert data-quality counters without a second
scan."""

from pyspark.sql import Observation
from pyspark.sql import functions as F

from api_kakfa_spark_airflow_s3_athena_spark.functions.transforms import parse_kafka_value, to_kafka_value, synthetic_users
from api_kakfa_spark_airflow_s3_athena_spark.sources.tables import load_table


def test_batch_observation_counts_nulls_inline(spark, sf_dir):
    obs = Observation("quality")
    e = load_table(spark, sf_dir, "events")
    observed = e.observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.count(F.when(F.col("value").isNull(), 1)).alias("null_values"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    n = observed.filter(F.col("event_type") == "click").count()
    metrics = obs.get
    assert metrics["rows"] == e.count()  # observed BEFORE the filter
    assert metrics["null_values"] == 0
    assert n > 0


def test_streaming_observation_metrics(spark, tmp_path):
    """observe() on a streaming query: per-batch metrics arrive in the
    StreamingQueryProgress without a second pass over the data."""
    users = synthetic_users(spark, 40, seed=4)
    src = str(tmp_path / "src")
    to_kafka_value(users).write.parquet(src)

    stream = spark.readStream.schema("value string").parquet(src)
    parsed = parse_kafka_value(stream.select(F.col("value").cast("binary").alias("value")))
    observed = parsed.observe(
        "ingest_quality",
        F.count(F.lit(1)).alias("rows"),
        F.count(F.when(F.col("name").isNull(), 1)).alias("null_names"),
    )
    q = (
        observed.writeStream.outputMode("append")
        .format("memory")
        .queryName("obs_sink")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progress = q.lastProgress
    metrics = progress["observedMetrics"]["ingest_quality"]
    assert metrics["rows"] == 40
    assert metrics["null_names"] == 0
