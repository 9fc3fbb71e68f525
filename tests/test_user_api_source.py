"""The `user_api` Python DataSource: batch + streaming reads of the
reference's user feed, flattened by the same transform as the Kafka
path."""

from pyspark.sql import functions as F

from api_kakfa_spark_airflow_s3_athena_spark.functions.transforms import flatten_user_payload
from api_kakfa_spark_airflow_s3_athena_spark.sources.user_api import register


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
