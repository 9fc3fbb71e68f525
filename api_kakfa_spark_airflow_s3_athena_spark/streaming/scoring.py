"""Streaming quality gate: score each micro-batch of documents through
the PRODUCTION linear classifier, reading the quantized model from a
stored artifact (``foreachBatch``).

This closes the classifier lifecycle loop (train -> quantize ->
deploy): ``operators/scoring.train_linear_classifier`` +
``quantize_weights`` produce the tiny ``(bucket, w_int)`` weight
table, a deploy step persists it as parquet, and this sink scores the
live document stream against it with the exact batch inference path
(``linear_text_classifier`` — same hashed features, same integer sums,
same single division), so streaming scores are BIT-IDENTICAL to batch
scores of the same rows (pinned by the ``streaming_quality_gate``
contract and tests/test_streaming_scoring.py).

Per-epoch artifact handoff (the ``streaming/dedup.py`` pattern): the
model is reloaded from ``model_path`` at each micro-batch, so a
nightly retrain job can atomically overwrite the artifact and the
running stream picks the new model up at the next epoch boundary —
no restart, no code change. A reload per epoch costs one read of a
``n_buckets``-row file (kilobytes), nothing against the batch scan.

Exactly-once: scores land in ``epoch=<id>`` overwrite directories, so
a replayed epoch (the ``foreachBatch`` epoch id is checkpointed)
rewrites its own directory instead of appending duplicates; readers
see the directories as one partitioned table. Scoring is stateless
per document — no cross-epoch reads at all, so unlike the dedup sink
there is no strictly-earlier-epoch discipline to maintain.

Scale shape per micro-batch: explode hashed features (narrow),
broadcast-join the kilobyte weight table (map-side), one skinny
``(id, partial-sum)`` shuffle — the corpus never shuffles and the
model never exceeds driver/executor broadcast scale by construction
(``n_buckets`` rows).
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame

from ..operators.scoring import linear_text_classifier

__all__ = ["quality_gate_batch", "quality_gate_sink"]


def _epoch_dir(base: str, epoch_id: int) -> str:
    return posixpath.join(base, f"epoch={epoch_id}")


def quality_gate_batch(
    batch: DataFrame,
    epoch_id: int,
    model_path: str,
    scores_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
) -> None:
    """Score one micro-batch against the stored quantized model and
    write ``(id, n_feats, score, keep)`` to this epoch's overwrite
    directory."""
    spark = batch.sparkSession
    # per-epoch model RELOAD is the design (nightly retrain pickup);
    # only the footer-inferred schema is metadata-cached, keyed on the
    # artifact's mtime so a rewritten model re-infers (round-14)
    from ..sources.tables import read_parquet_metacached

    weights = read_parquet_metacached(spark, model_path)
    scored = linear_text_classifier(
        batch, weights, text_col=text_col, id_col=id_col, n_buckets=n_buckets
    )
    scored.write.mode("overwrite").parquet(_epoch_dir(scores_path, epoch_id))


def quality_gate_sink(
    df: DataFrame,
    model_path: str,
    scores_path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    available_now: bool = False,
    epoch_times: dict | None = None,
):
    """Start the streaming quality gate over a streaming DataFrame of
    documents. Returns the StreamingQuery.

    ``epoch_times``: optional dict the sink fills with per-epoch wall
    seconds (``{epoch_id: sec}``) — the marginal per-batch scoring
    cost is the steady-state number that matters at 100 TB; the bench
    harness reports it alongside the pipeline total (the same hook
    ``dedup_ingest_sink`` carries)."""

    def apply(batch: DataFrame, epoch_id: int) -> None:
        import time as _time

        t0 = _time.time()
        quality_gate_batch(
            batch,
            epoch_id,
            model_path,
            scores_path,
            text_col=text_col,
            id_col=id_col,
            n_buckets=n_buckets,
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
