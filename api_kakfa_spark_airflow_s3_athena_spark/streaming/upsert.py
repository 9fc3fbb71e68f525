"""MERGE/upsert streaming sink via ``foreachBatch`` (CDC emulation).

Without a transactional table format (Delta/Iceberg jars absent in
this environment), keyed upsert is emulated per micro-batch: union the
current target with the batch and keep, per key, the row with the
greatest ``order_col`` (batch wins order ties) — so out-of-order /
late batches carrying stale versions can never clobber newer state.
The ``foreachBatch`` boundary makes the batch exactly-once
(checkpointed epoch id), so replays are idempotent.

Scale note: rewriting the whole target per batch is O(target) — fine
for dimension-sized tables (the common upsert target). For fact-scale
targets, partition the target by a key prefix/date and rewrite ONLY
the partitions the batch touches (dynamic partition overwrite), or use
a real MERGE-capable format; both documented below in
:func:`upsert_batch`.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["upsert_batch", "upsert_sink"]


def upsert_batch(
    spark: SparkSession,
    batch: DataFrame,
    target_path: str,
    key_cols: Sequence[str],
    order_col: str,
) -> None:
    """Apply one micro-batch as an upsert into a keyed parquet table.

    Within a batch, the row with the greatest ``order_col`` per key
    wins (CDC ordering). (With dynamic partition overwrite —
    ``spark.sql.sources.partitionOverwriteMode=dynamic`` and a
    partitioned target — the same logic rewrites only touched
    partitions.)
    """
    try:
        current = spark.read.parquet(target_path).withColumn("__src", F.lit(0))
        exists = True
    except Exception:
        exists = False
    candidates = batch.withColumn("__src", F.lit(1))
    if exists:
        candidates = current.unionByName(candidates)
    # per key: greatest order_col wins ACROSS target and batch (a late
    # batch carrying an older version must not clobber newer state);
    # on order ties the batch row wins (arrival order)
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(order_col).desc(), F.col("__src").desc()
    )
    merged = (
        candidates.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )
    # rewrite via a temp dir: the source of the union IS the target
    tmp = target_path.rstrip("/") + "__upsert_tmp"
    merged.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(target_path)
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(tmp)
    hpath.getFileSystem(jsc.hadoopConfiguration()).delete(hpath, True)


def upsert_sink(
    df: DataFrame,
    target_path: str,
    checkpoint: str,
    key_cols: Sequence[str],
    order_col: str,
    available_now: bool = False,
):
    """Start a streaming upsert into ``target_path`` keyed on
    ``key_cols`` with ``order_col`` deciding recency."""

    def apply(batch: DataFrame, epoch_id: int) -> None:
        upsert_batch(batch.sparkSession, batch, target_path, key_cols, order_col)

    writer = (
        df.writeStream.outputMode("update")
        .foreachBatch(apply)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
