"""Streaming distinct-count synopsis maintenance: a running per-group
KMV sketch updated per micro-batch (``foreachBatch``), exactly equal
to the batch sketch of everything streamed so far.

The KMV merge property (``operators/sketches.kmv_merge``) is what
makes the streaming arm EXACT rather than approximate-on-top-of-
approximate: the k smallest hashes of ``A ∪ B`` are contained in the
union of the two synopses, so ``merge(synopsis_{e-1}, sketch(batch_e))``
IS ``sketch(batch_0 ∪ … ∪ batch_e)`` — the registered contract pins
bit-exact array equality between the final epoch's stored synopsis and
a one-shot batch sketch of the full streamed slice.

Epoch discipline (the ``streaming/dedup.py`` pattern): epoch ``e``
reads ONLY the strictly-earlier epoch's stored synopsis (``e-1``) and
overwrites its own ``epoch=<e>`` directory, so replays are idempotent
AND reproducible after later epochs land — a re-run of epoch ``e``
sees exactly the inputs it saw the first time. The store keeps every
epoch's synopsis (kilobytes per group per epoch), which doubles as a
distinct-count TIME SERIES: ``kmv_estimate`` over epoch ``e``'s row is
the distinct count of everything ingested through ``e`` — cardinality
growth monitoring for free.

Scale shape per micro-batch: one bounded two-phase sketch pass over
the BATCH only (never the history), one kilobyte-per-group merge join
against the prior synopsis. History is never rescanned; state never
exceeds k hashes per group.
"""

from __future__ import annotations

import posixpath
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sketches import kmv_merge, kmv_sketch

__all__ = [
    "kmv_sketch_batch",
    "kmv_sketch_sink",
    "cms_sketch_batch",
    "cms_sketch_sink",
]


def _epoch_dir(base: str, epoch_id) -> str:
    return posixpath.join(base, f"epoch={epoch_id}")


def kmv_sketch_batch(
    batch: DataFrame,
    epoch_id: int,
    group_cols: Sequence[str],
    value_col: str,
    k: int,
    store_path: str,
) -> None:
    """Fold one micro-batch into the running synopsis: sketch the
    batch, merge with the strictly-earlier epoch's stored synopsis,
    overwrite this epoch's directory."""
    from .upsert import target_exists

    spark = batch.sparkSession
    sk = kmv_sketch(batch, group_cols, F.col(value_col), k=k)
    prev_dir = _epoch_dir(store_path, epoch_id - 1)
    if target_exists(spark, prev_dir):
        merged = kmv_merge(spark.read.parquet(prev_dir), sk, group_cols, k)
    else:
        # first epoch: no prior synopsis
        merged = sk
    merged.write.mode("overwrite").parquet(_epoch_dir(store_path, epoch_id))


def kmv_sketch_sink(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int,
    store_path: str,
    checkpoint: str,
    available_now: bool = False,
    epoch_times: dict | None = None,
):
    """Start the synopsis-maintenance sink over a streaming DataFrame.
    Returns the StreamingQuery. ``epoch_times`` collects per-epoch
    wall seconds (the marginal-cost convention the other sinks
    carry)."""

    def apply(batch: DataFrame, epoch_id: int) -> None:
        import time as _time

        t0 = _time.time()
        kmv_sketch_batch(
            batch, epoch_id, group_cols, value_col, k, store_path
        )
        if epoch_times is not None:
            epoch_times[epoch_id] = _time.time() - t0

    writer = (
        df.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# =====================================================================
# Streaming count-min maintenance (operators/frequency.py CMS)
# =====================================================================
#
# Count-min is a LINEAR sketch — counters(A ⊎ B) = counters(A) +
# counters(B) cell-wise — so the epoch fold is the same exact-merge
# story as KMV above, with addition instead of k-smallest union: the
# final stored counter table is bit-identical to a one-shot batch
# sketch of everything streamed. State is ≤ d·w cells forever; each
# micro-batch pays one bounded-domain groupBy over the BATCH plus a
# ≤ d·w-row merge join. The stored epochs double as a traffic time
# series (cell deltas between epochs = per-epoch frequency mass).


def cms_sketch_batch(
    batch: DataFrame,
    epoch_id: int,
    unit_col: str,
    width: int,
    depth: int,
    store_path: str,
) -> None:
    """Fold one micro-batch into the running counter table: sketch the
    batch, cell-wise add the strictly-earlier epoch's stored counters,
    overwrite this epoch's directory (idempotent replay — the
    streaming/dedup.py epoch discipline)."""
    from ..operators.frequency import cms_merge, count_min_counters
    from .upsert import target_exists

    spark = batch.sparkSession
    sk = count_min_counters(batch, unit_col, width, depth)
    prev_dir = _epoch_dir(store_path, epoch_id - 1)
    if target_exists(spark, prev_dir):
        merged = cms_merge(spark.read.parquet(prev_dir), sk)
    else:
        merged = sk
    merged.write.mode("overwrite").parquet(_epoch_dir(store_path, epoch_id))


def cms_sketch_sink(
    df: DataFrame,
    unit_col: str,
    width: int,
    depth: int,
    store_path: str,
    checkpoint: str,
    available_now: bool = False,
    epoch_times: dict | None = None,
):
    """Start the counter-maintenance sink over a streaming DataFrame.
    Returns the StreamingQuery; ``epoch_times`` collects per-epoch
    wall seconds (the marginal-cost convention)."""

    def apply(batch: DataFrame, epoch_id: int) -> None:
        import time as _time

        t0 = _time.time()
        cms_sketch_batch(batch, epoch_id, unit_col, width, depth, store_path)
        if epoch_times is not None:
            epoch_times[epoch_id] = _time.time() - t0

    writer = (
        df.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
