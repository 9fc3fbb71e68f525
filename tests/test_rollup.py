"""Incremental rollup refresh (operators/rollup.py): correctness of
the two-phase materialization and the untouched-partition guarantee —
the whole point of incremental refresh at 100 TB is that finalized
buckets' files are never read or rewritten."""

import datetime as dt
import os

from pyspark.sql import functions as F

from api_kakfa_spark_airflow_s3_athena_spark.operators.rollup import (
    read_rollup_watermark,
    rollup_refresh,
)


def _agg(df, bucket_col):
    return df.groupBy(bucket_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("value").cast("decimal(12,2)")), 2)
        .cast("double")
        .alias("sum_value"),
    )


def _partition_files(target):
    """{partition_dir_name: {(file_name, mtime_ns), ...}} for data files."""
    out = {}
    for entry in os.listdir(target):
        full = os.path.join(target, entry)
        if not (os.path.isdir(full) and "=" in entry):
            continue
        out[entry] = {
            (f, os.stat(os.path.join(full, f)).st_mtime_ns)
            for f in os.listdir(full)
            if not f.startswith(("_", "."))
        }
    return out


def _rows(day, hour, n, value):
    base = dt.datetime(2024, 3, day, hour, 0, 0)
    return [(base + dt.timedelta(minutes=i), value) for i in range(n)]


def test_incremental_refresh_touches_only_open_buckets(spark, tmp_path):
    src = str(tmp_path / "src")
    target = str(tmp_path / "rollup")
    schema = "ts timestamp, value double"

    # days 1-3; day 3's last event at 12:00
    initial = _rows(1, 10, 3, 1.0) + _rows(2, 10, 4, 2.0) + _rows(3, 12, 2, 3.0)
    spark.createDataFrame(initial, schema).write.mode("append").parquet(src)

    stats = rollup_refresh(
        spark,
        spark.read.parquet(src),
        target,
        ts_col="ts",
        bucket="day",
        agg_fn=_agg,
        allowed_lateness="1 hour",
    )
    assert stats["mode"] == "initial"
    assert stats["buckets_written"] == 3
    before = _partition_files(target)
    assert len(before) == 3

    # new day-4 data plus a LATE day-3 row at 11:30 (inside the 1 h
    # lateness horizon: watermark 12:00 -> scope floor = day 3)
    late = _rows(4, 9, 5, 1.5) + [(dt.datetime(2024, 3, 3, 11, 30), 7.0)]
    spark.createDataFrame(late, schema).write.mode("append").parquet(src)

    stats2 = rollup_refresh(
        spark,
        spark.read.parquet(src),
        target,
        ts_col="ts",
        bucket="day",
        agg_fn=_agg,
        allowed_lateness="1 hour",
    )
    assert stats2["mode"] == "incremental"
    assert stats2["buckets_written"] == 2  # day 3 (late row) + day 4

    after = _partition_files(target)
    assert len(after) == 4
    # closed buckets: identical files, byte-for-byte untouched
    day1 = [k for k in before if "03-01" in k][0]
    day2 = [k for k in before if "03-02" in k][0]
    assert after[day1] == before[day1]
    assert after[day2] == before[day2]
    # reopened bucket rewritten
    day3 = [k for k in before if "03-03" in k][0]
    assert after[day3] != before[day3]

    # materialized result equals the from-scratch rollup, late row included
    got = {
        (r["bucket_ts"].day if hasattr(r["bucket_ts"], "day") else r["bucket_ts"], r["n"], r["sum_value"])
        for r in spark.read.parquet(target).collect()
    }
    full = spark.read.parquet(src)
    want = {
        (r["bucket_ts"].day if hasattr(r["bucket_ts"], "day") else r["bucket_ts"], r["n"], r["sum_value"])
        for r in _agg(
            full.withColumn("bucket_ts", F.date_trunc("day", F.col("ts"))), "bucket_ts"
        ).collect()
    }
    assert got == want
    assert read_rollup_watermark(spark, target) == int(
        dt.datetime(2024, 3, 4, 9, 4, tzinfo=dt.timezone.utc).timestamp() * 1_000_000
    )


def test_refresh_with_no_new_data_is_a_noop(spark, tmp_path):
    src = str(tmp_path / "src")
    target = str(tmp_path / "rollup")
    spark.createDataFrame(_rows(1, 10, 3, 1.0), "ts timestamp, value double").write.mode(
        "append"
    ).parquet(src)
    rollup_refresh(
        spark, spark.read.parquet(src), target, "ts", "day", _agg, "1 hour"
    )
    before = _partition_files(target)
    wm = read_rollup_watermark(spark, target)

    # no append: scope still re-covers the open bucket; a second refresh
    # must not change results or the watermark
    stats = rollup_refresh(
        spark, spark.read.parquet(src), target, "ts", "day", _agg, "1 hour"
    )
    assert stats["watermark_us"] == wm
    got = {
        (r["n"], r["sum_value"]) for r in spark.read.parquet(target).collect()
    }
    assert got == {(3, 3.0)}
    assert set(_partition_files(target)) == set(before)
