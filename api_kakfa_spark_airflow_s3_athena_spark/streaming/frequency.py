"""Streaming per-key heavy-hitter maintenance: a running per-key
Misra-Gries summary updated per micro-batch (``foreachBatch``), with
EXACT error accounting.

The MG summary is a mergeable summary (Agarwal, Cormode, Huang,
Phillips, Wei, Yi — PODS 2012): merging two summaries by summing
counters and re-reducing to ``num_counters`` entries per key keeps the
standard guarantee. An exact in-batch histogram is itself an
error-free MG summary, so per epoch the sink folds
``histogram(batch_e)`` into the strictly-earlier epoch's stored
summary and re-reduces — bounded state, one pass over the batch, the
history never rescanned.

What makes the streaming arm VERIFIABLE rather than merely plausible
is the deduction ledger: every reduction step subtracts the
``(num_counters+1)``-th largest count ``t`` from all of a key's
counters, and the sink accumulates ``deduction(key) = Σ t`` exactly,
alongside the exact per-key unit total ``n_units``. The classic MG
bounds then hold with OBSERVED constants, per key:

* ``stored_cnt(unit) <= true_freq(unit)`` (counts only ever shrink
  relative to truth), and
* ``true_freq(unit) <= stored_cnt(unit) + deduction`` (a unit loses
  at most ``t`` per reduction, including the step that drops it) —
  with ``stored_cnt = 0`` for units absent from the summary.

So any unit with ``true_freq > deduction`` is GUARANTEED present in
the final state — and since ``deduction <= n_units/(num_counters+1)``
(each reduction removes ``t`` from at least ``num_counters+1``
counters' worth of mass), every true heavy hitter at the
``freq·num_counters > n_units`` threshold survives. The registered
contract checks containment and both band inequalities row-for-row
against an exact recount.

Epoch discipline (the ``streaming/sketches.py`` pattern): epoch ``e``
reads ONLY epoch ``e-1``'s stored state and overwrites its own
``epoch=<e>`` directories (``summary/`` and ``meta/``), so replays
are idempotent and each epoch's state is a readable point-in-time
snapshot.

Scale shape per micro-batch: one map-side-combined histogram of the
BATCH only (its distinct (key, unit) domain, bounded by batch size),
one ≤ ``num_counters·keys``-row merge join, one per-key window over
the merged summary. State never exceeds ``num_counters`` counters per
key; at 100 TB the stored state is megabytes while the naive exact
histogram it stands in for is the full cross-partition distinct
domain.
"""

from __future__ import annotations

import posixpath
from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["mg_summary_batch", "mg_summary_sink"]


def _dir(base: str, part: str, epoch_id) -> str:
    return posixpath.join(base, part, f"epoch={epoch_id}")


def mg_summary_batch(
    batch: DataFrame,
    epoch_id: int,
    key_cols: Sequence[str],
    unit_col: str,
    num_counters: int,
    store_path: str,
) -> None:
    """Fold one micro-batch into the running per-key MG summary:
    exact in-batch histogram, merge with the strictly-earlier epoch's
    stored summary, MG-reduce per key, track the deduction ledger,
    overwrite this epoch's ``summary``/``meta`` directories. A gap in
    the epoch store (predecessor missing while other epochs exist)
    fails loudly instead of silently restarting the fold — the
    sketches-sink discipline (ADVICE r10)."""
    from .sketches import _prev_epoch_dir

    spark = batch.sparkSession
    gcols = list(key_cols)
    clean = batch.where(F.col(unit_col).isNotNull())
    # Materialize the in-batch histogram once (bounded: the batch's
    # distinct (key, unit) domain). Round-14: ``bc`` feeds the merge,
    # the meta fold AND (via ``ranked``) both reduction outputs — left
    # lazy, the batch scan + histogram shuffle re-ran per consumer
    # (guide §1.2: don't recompute subtrees).
    from ..operators._util import materialize_once

    bc = materialize_once(
        clean.groupBy(*gcols, unit_col)
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    # per-key unit total == sum of the histogram's counts — derived
    # from the materialized histogram, not a second batch scan
    bmeta = bc.groupBy(*gcols).agg(
        F.sum("cnt").cast("long").alias("n_units"),
        F.lit(0).cast("long").alias("deduction"),
    )
    prev_sum = _prev_epoch_dir(
        spark, posixpath.join(store_path, "summary"), epoch_id
    )
    if prev_sum is not None:
        # both stores were written by this fold ⇒ schemas known;
        # declaring them skips two per-epoch footer-inference jobs
        merged = (
            spark.read.schema(bc.schema).parquet(prev_sum)
            .unionByName(bc)
            .groupBy(*gcols, unit_col)
            .agg(F.sum("cnt").cast("long").alias("cnt"))
        )
        meta = (
            spark.read.schema(bmeta.schema)
            .parquet(_dir(store_path, "meta", epoch_id - 1))
            .unionByName(bmeta)
            .groupBy(*gcols)
            .agg(
                F.sum("n_units").cast("long").alias("n_units"),
                F.sum("deduction").cast("long").alias("deduction"),
            )
        )
    else:
        merged, meta = bc, bmeta

    # MG reduction per key: subtract the (k+1)-th largest count from
    # every counter, keep strictly positive — at most k survive (ties
    # at the boundary reduce to zero and drop, which only shrinks the
    # state; the error ledger charges the full t either way).
    # ``ranked`` is materialized once (bounded rows): ``t``, ``reduced``
    # and ``meta_out`` all read it, and lazily each would re-execute
    # the union+histogram+window subtree per consumer.
    w = Window.partitionBy(*gcols).orderBy(F.desc("cnt"), F.col(unit_col))
    ranked = materialize_once(
        merged.withColumn("__rn", F.row_number().over(w))
    )
    t = ranked.where(F.col("__rn") == num_counters + 1).select(
        *gcols, F.col("cnt").alias("__t")
    )
    reduced = (
        ranked.join(F.broadcast(t), gcols, "left")
        .withColumn("cnt", F.col("cnt") - F.coalesce(F.col("__t"), F.lit(0)))
        .where(F.col("cnt") > 0)
        .select(*gcols, unit_col, "cnt")
    )
    meta_out = meta.join(F.broadcast(t), gcols, "left").select(
        *gcols,
        "n_units",
        (F.col("deduction") + F.coalesce(F.col("__t"), F.lit(0))).alias(
            "deduction"
        ),
    )
    reduced.write.mode("overwrite").parquet(_dir(store_path, "summary", epoch_id))
    meta_out.write.mode("overwrite").parquet(_dir(store_path, "meta", epoch_id))


def mg_summary_sink(
    df: DataFrame,
    key_cols: Sequence[str],
    unit_col: str,
    num_counters: int,
    store_path: str,
    checkpoint: str,
    available_now: bool = False,
    epoch_times: dict | None = None,
):
    """Start the heavy-hitter summary-maintenance sink over a
    streaming DataFrame of (key cols…, unit) occurrence rows. Returns
    the StreamingQuery. ``epoch_times`` collects per-epoch wall
    seconds (the marginal-cost convention the other sinks carry)."""

    def apply(batch: DataFrame, epoch_id: int) -> None:
        import time as _time

        t0 = _time.time()
        mg_summary_batch(
            batch, epoch_id, key_cols, unit_col, num_counters, store_path
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
