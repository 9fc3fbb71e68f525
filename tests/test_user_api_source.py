"""The `user_api` Python DataSource: batch + streaming reads of the
reference's user feed, flattened by the same transform as the Kafka
path."""

from pyspark.sql import functions as F

from api_kakfa_spark_airflow_s3_athena_spark.functions.transforms import flatten_user_payload
from api_kakfa_spark_airflow_s3_athena_spark.sources.user_api import (
    _record,
    fetch_record_with_retry,
    register,
)


def test_batch_read_and_flatten(spark):
    register(spark)
    raw = spark.read.format("user_api").option("rows", 60).option("seed", 9).load()
    assert raw.count() == 60
    assert raw.schema["location"].dataType.typeName() == "struct"

    flat = flatten_user_payload(raw)
    rows = flat.collect()
    assert len(rows) == 60
    for r in rows[:5]:
        assert ". " in r.name            # "{title}. {first} {last}"
        assert r.zip.isdigit()           # md5 pseudonym as decimal string
        assert -90 <= r.latitude <= 90   # string coords cast cleanly


def test_batch_read_deterministic(spark):
    register(spark)
    a = spark.read.format("user_api").option("rows", 20).option("seed", 3).load().collect()
    b = spark.read.format("user_api").option("rows", 20).option("seed", 3).load().collect()
    assert sorted(map(str, a)) == sorted(map(str, b))


def test_streaming_read_with_checkpoint_replay(spark, tmp_path):
    register(spark)
    ckpt = str(tmp_path / "ckpt")

    def run_two_batches(name):
        stream = (
            spark.readStream.format("user_api")
            .option("rowsPerBatch", 7)
            .option("seed", 5)
            .load()
        )
        q = (
            flatten_user_payload(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .start()
        )
        # let a couple of micro-batches through, then stop
        import time

        deadline = time.time() + 30
        while time.time() < deadline and spark.table(name).count() < 14:
            time.sleep(0.5)
        q.stop()
        return spark.table(name).collect()

    first = run_two_batches("user_stream_a")
    assert len(first) >= 14
    emails = [r.email for r in first]
    assert len(set(emails) | set()) > 1  # varied records, not constants


# --- S4 retry contract (reference kafka_streaming_service.py:113-130) ---


def test_retry_succeeds_after_transient_failures():
    calls = []

    def flaky(endpoint, timeout_s):
        calls.append(timeout_s)
        if len(calls) < 3:
            raise TimeoutError("transient")
        return {"gender": "male", "name": {"title": "Mr", "first": "Alan", "last": "Turing"},
                "email": "alan@example.com", "login": {"uuid": "u1"}}

    row = fetch_record_with_retry(0, 42, "http://example.com/api", flaky, retries=3, timeout_s=10)
    assert len(calls) == 3  # two failures consumed, third attempt won
    assert all(t == 10 for t in calls)  # timeout propagated to every attempt
    assert row[3] == "alan@example.com"


def test_retry_exhaustion_falls_back_to_synthetic():
    calls = []

    def down(endpoint, timeout_s):
        calls.append(1)
        raise ConnectionError("hard down")

    row = fetch_record_with_retry(7, 42, "http://example.com/api", down, retries=3)
    assert len(calls) == 3  # exactly `retries` attempts, like the reference
    assert row == _record(7, 42)  # deterministic fallback record


def test_no_endpoint_skips_fetcher_entirely():
    def explode(endpoint, timeout_s):
        raise AssertionError("must not be called")

    assert fetch_record_with_retry(3, 9, None, explode) == _record(3, 9)


def test_e2e_failing_endpoint_yields_fallback_rows(spark):
    register(spark)
    base = spark.read.format("user_api").option("rows", 8).option("seed", 11).load()
    with_fetch = (
        spark.read.format("user_api")
        .option("rows", 8)
        .option("seed", 11)
        .option("endpoint", "http://example.com/api")
        .option("fetcher", "api_kakfa_spark_airflow_s3_athena_spark.sources.user_api:demo_failing_fetch")
        .option("retries", 2)
        .load()
    )
    assert sorted(map(str, with_fetch.collect())) == sorted(map(str, base.collect()))


def test_e2e_fetcher_payload_reaches_rows(spark):
    register(spark)
    rows = (
        spark.read.format("user_api")
        .option("rows", 5)
        .option("endpoint", "http://example.com/api")
        .option("fetcher", "api_kakfa_spark_airflow_s3_athena_spark.sources.user_api:demo_static_fetch")
        .load()
        .collect()
    )
    assert len(rows) == 5
    assert all(r.email == "ada.lovelace@example.com" for r in rows)
    assert all(r.location.street.number == 12 for r in rows)
