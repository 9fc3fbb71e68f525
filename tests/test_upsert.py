"""Streaming MERGE/upsert emulation: last-write-wins per key across
micro-batches and restarts."""

from pyspark.sql import Row
from pyspark.sql import functions as F

import os

import pytest

from api_kakfa_spark_airflow_s3_athena_spark.schemas import EVENTS
from api_kakfa_spark_airflow_s3_athena_spark.streaming.upsert import upsert_batch, upsert_sink


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


def _part_rows(spark, rows):
    return spark.createDataFrame(rows, schema="user_id long, state string, ver long, dt string")


def _files_with_mtimes(root):
    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(dirpath, f)
                out[p] = os.path.getmtime(p)
    return out


def test_partitioned_upsert_rewrites_only_touched_partitions(spark, tmp_path):
    tgt = str(tmp_path / "tgt")
    seed = _part_rows(
        spark,
        [(1, "new", 1, "2024-01-01"), (2, "new", 1, "2024-01-02")],
    )
    upsert_batch(spark, seed, tgt, ["user_id"], "ver", partition_cols=["dt"])
    before = _files_with_mtimes(os.path.join(tgt, "dt=2024-01-01"))
    assert before, "partitioned layout expected"

    # batch touches only dt=2024-01-02
    batch = _part_rows(spark, [(2, "active", 2, "2024-01-02"), (3, "new", 1, "2024-01-02")])
    upsert_batch(spark, batch, tgt, ["user_id"], "ver", partition_cols=["dt"])

    after = _files_with_mtimes(os.path.join(tgt, "dt=2024-01-01"))
    assert after == before, "untouched partition's files were rewritten"
    got = {
        r.user_id: (r.state, r.ver, r.dt)
        for r in spark.read.parquet(tgt)
        .withColumn("dt", F.col("dt").cast("string"))  # undo partition type inference
        .collect()
    }
    assert got == {
        1: ("new", 1, "2024-01-01"),
        2: ("active", 2, "2024-01-02"),
        3: ("new", 1, "2024-01-02"),
    }


def test_unreadable_target_raises_instead_of_overwriting(spark, tmp_path):
    # A target that EXISTS but cannot be read (corrupt footer) must
    # abort the batch, not be mistaken for an empty target and
    # silently replaced with batch-only rows.
    tgt = tmp_path / "tgt"
    tgt.mkdir()
    (tgt / "part-00000.parquet").write_bytes(b"this is not parquet")
    batch = _rows(spark, [(1, "new", 1)])
    with pytest.raises(Exception):
        upsert_batch(spark, batch, str(tgt), ["user_id"], "ver")
    assert (tgt / "part-00000.parquet").read_bytes() == b"this is not parquet"
