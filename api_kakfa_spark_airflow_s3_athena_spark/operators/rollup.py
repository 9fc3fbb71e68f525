"""Incremental time-bucketed rollups (continuous-aggregate refresh).

The reference recomputes every aggregate from scratch per Athena query
(``docs/athena-integrity-check.md`` queries re-scan the table each
run); a 100 TB event stream cannot afford that. This operator
maintains a materialized rollup table partitioned by time bucket and,
on each refresh, recomputes ONLY the buckets that can have changed —
the TimescaleDB/Materialize "continuous aggregate" pattern expressed
as plain Spark batch over parquet:

- The rollup target is partitioned by the bucket column, so a refresh
  replaces whole bucket partitions via dynamic-partition-overwrite
  (``spark.sql.sources.partitionOverwriteMode=dynamic``): untouched
  buckets' files are never read or rewritten.
- Refresh scope is derived from a persisted high watermark (max event
  time seen) minus an ``allowed_lateness`` horizon: buckets at or
  after ``floor_bucket(hw - lateness)`` are rebuilt from the source,
  older buckets are final. Late data inside the horizon is absorbed
  exactly; later than that is out of contract (same contract a
  streaming watermark gives, made explicit for batch refresh).
- The source read is filtered to ``ts >= scope_floor`` BEFORE the
  aggregate, so with a date-partitioned (or min/max-clustered) source
  the refresh scans O(new data + lateness window), not O(table).

State is one tiny JSON (watermark micros) beside the table — readable
by any engine, no driver-side bookkeeping to lose.
"""

from __future__ import annotations

import json
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["rollup_refresh", "read_rollup_watermark"]

_META_NAME = "_rollup_meta.json"


def _fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration()), hpath, jvm


def read_rollup_watermark(spark: SparkSession, target_path: str) -> Optional[int]:
    """Persisted high watermark (epoch micros) of a rollup target, or
    None if the target has never been refreshed."""
    fs, root, jvm = _fs(spark, target_path)
    meta = jvm.org.apache.hadoop.fs.Path(target_path.rstrip("/") + "/" + _META_NAME)
    if not fs.exists(meta):
        return None
    stream = fs.open(meta)
    try:
        raw = bytes(stream.readAllBytes()).decode("utf-8")
    finally:
        stream.close()
    return int(json.loads(raw)["watermark_us"])


def _write_watermark(spark: SparkSession, target_path: str, watermark_us: int) -> None:
    fs, _root, jvm = _fs(spark, target_path)
    meta = jvm.org.apache.hadoop.fs.Path(target_path.rstrip("/") + "/" + _META_NAME)
    out = fs.create(meta, True)
    try:
        out.write(bytearray(json.dumps({"watermark_us": watermark_us}).encode("utf-8")))
    finally:
        out.close()


def rollup_refresh(
    spark: SparkSession,
    source: DataFrame,
    target_path: str,
    ts_col: str,
    bucket: str,
    agg_fn: Callable[[DataFrame, str], DataFrame],
    allowed_lateness: str = "1 day",
) -> dict:
    """Refresh a bucket-partitioned rollup of ``source`` at
    ``target_path``.

    ``bucket`` is a ``date_trunc`` unit (``hour``/``day``/``week``...);
    ``agg_fn(df, bucket_col)`` builds the rollup over a pre-filtered
    slice of the source and MUST group by the provided ``bucket_col``
    (a truncated timestamp column added here, also the partition
    column of the target). ``allowed_lateness`` is an SQL interval
    literal bounding how far behind the watermark data may arrive.

    Returns ``{mode, scope_floor_us, watermark_us, buckets_written}``.
    """
    has_wm = read_rollup_watermark(spark, target_path)
    bucket_col = "bucket_ts"
    src = source.withColumn(bucket_col, F.date_trunc(bucket, F.col(ts_col)))

    if has_wm is None:
        scope = src
        scope_floor_us = None
        mode = "initial"
    else:
        # floor the (watermark - lateness) point to its bucket so every
        # recomputed bucket is recomputed from ALL of its rows
        floor_expr = F.date_trunc(
            bucket,
            F.timestamp_micros(F.lit(has_wm)) - F.expr(f"INTERVAL {allowed_lateness}"),
        )
        scope = src.filter(F.col(bucket_col) >= floor_expr)
        scope_floor_us = has_wm
        mode = "incremental"

    bounds = scope.agg(
        F.max(F.unix_micros(F.col(ts_col))).alias("hw"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    if bounds["n"] == 0:
        return {
            "mode": mode,
            "scope_floor_us": scope_floor_us,
            "watermark_us": has_wm,
            "buckets_written": 0,
        }

    rolled = agg_fn(scope, bucket_col)
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        rolled.write.mode("overwrite").partitionBy(bucket_col).parquet(target_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)

    new_wm = max(int(bounds["hw"]), has_wm or 0)
    _write_watermark(spark, target_path, new_wm)
    n_buckets = rolled.select(bucket_col).distinct().count()
    return {
        "mode": mode,
        "scope_floor_us": scope_floor_us,
        "watermark_us": new_wm,
        "buckets_written": n_buckets,
    }
