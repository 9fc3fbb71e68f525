"""Streaming MERGE/upsert emulation: last-write-wins per key across
micro-batches and restarts."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from api_kakfa_spark_airflow_s3_athena_spark.schemas import EVENTS
from api_kakfa_spark_airflow_s3_athena_spark.streaming.upsert import upsert_sink


def _rows(spark, rows):
    return spark.createDataFrame(rows, schema="user_id long, state string, ver long")


def test_upsert_across_batches_and_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt")
    ckpt = str(tmp_path / "ckpt")

    _rows(
        spark,
        [(1, "new", 1), (2, "new", 1), (1, "active", 2)],  # user 1 updated in-batch
    ).write.mode("overwrite").parquet(src)

    def run():
        stream = spark.readStream.schema("user_id long, state string, ver long").parquet(src)
        q = upsert_sink(stream, tgt, ckpt, ["user_id"], "ver", available_now=True)
        q.awaitTermination()

    run()
    got = {r.user_id: (r.state, r.ver) for r in spark.read.parquet(tgt).collect()}
    assert got == {1: ("active", 2), 2: ("new", 1)}  # in-batch last-write-wins

    # second batch: update user 2, insert user 3; user 1 untouched
    _rows(spark, [(2, "churned", 2), (3, "new", 1)]).write.mode("append").parquet(src)
    run()
    got = {r.user_id: (r.state, r.ver) for r in spark.read.parquet(tgt).collect()}
    assert got == {1: ("active", 2), 2: ("churned", 2), 3: ("new", 1)}

    # restart with no new data: idempotent
    run()
    assert spark.read.parquet(tgt).count() == 3

    # late batch with a STALE version must not clobber newer state
    _rows(spark, [(1, "stale", 1)]).write.mode("append").parquet(src)
    run()
    got = {r.user_id: (r.state, r.ver) for r in spark.read.parquet(tgt).collect()}
    assert got[1] == ("active", 2), "older version overwrote newer state"
