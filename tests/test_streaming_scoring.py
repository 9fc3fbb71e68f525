"""Streaming quality gate (streaming/scoring.py): per-epoch scores
must equal the batch inference path exactly, replays must be
idempotent, and the per-epoch model reload must pick up a swapped
artifact at the next epoch boundary (the lifecycle property the
module exists for)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from api_kakfa_spark_airflow_s3_athena_spark.operators.scoring import (
    linear_text_classifier,
)
from api_kakfa_spark_airflow_s3_athena_spark.streaming.scoring import (
    quality_gate_batch,
    quality_gate_sink,
)

N_BUCKETS = 64


def _docs(spark, ids):
    words = ["good", "fine", "spam", "junk", "prose", "noise"]
    return spark.createDataFrame(
        [
            Row(doc_id=i, text=" ".join(words[(i + j) % len(words)] for j in range(5)))
            for i in ids
        ]
    )


def _weights(spark, flip=False):
    sign = -1 if flip else 1
    return spark.createDataFrame(
        [(b, sign * ((b % 7) - 3) * 100) for b in range(N_BUCKETS)],
        "bucket long, w_int long",
    )


def _run_gate(spark, tmp_path, n_files, subdir="run"):
    base = str(tmp_path / subdir)
    src = f"{base}/src"
    for b in range(n_files):
        _docs(spark, range(b * 6, (b + 1) * 6)).coalesce(1).write.mode(
            "append" if b else "overwrite"
        ).parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = quality_gate_sink(
        stream,
        model_path=f"{base}/model",
        scores_path=f"{base}/scores",
        checkpoint=f"{base}/ckpt",
        n_buckets=N_BUCKETS,
        available_now=True,
    )
    q.awaitTermination()
    return base


def test_streaming_scores_equal_batch_and_exactly_once(spark, tmp_path):
    base = str(tmp_path / "run")
    _weights(spark).write.parquet(f"{base}/model")
    _run_gate(spark, tmp_path, n_files=3)
    streamed = spark.read.parquet(f"{base}/scores")
    batch = linear_text_classifier(
        _docs(spark, range(18)), _weights(spark), n_buckets=N_BUCKETS
    )
    got = {
        (r.doc_id, r.n_feats, r.score, r.keep)
        for r in streamed.select("doc_id", "n_feats", "score", "keep").collect()
    }
    want = {
        (r.doc_id, r.n_feats, r.score, r.keep) for r in batch.collect()
    }
    assert got == want and got  # bit-exact, not approximate
    # exactly-once: each doc scored in exactly one epoch; 3 epochs ran
    assert streamed.count() == streamed.select("doc_id").distinct().count()
    assert streamed.select("epoch").distinct().count() == 3


def test_epoch_replay_is_idempotent(spark, tmp_path):
    """Re-running quality_gate_batch for an epoch that already landed
    must overwrite its own directory, not append duplicates."""
    base = str(tmp_path / "re")
    _weights(spark).write.parquet(f"{base}/model")
    docs = _docs(spark, range(6))
    quality_gate_batch(docs, 0, f"{base}/model", f"{base}/scores", n_buckets=N_BUCKETS)
    quality_gate_batch(docs, 0, f"{base}/model", f"{base}/scores", n_buckets=N_BUCKETS)
    out = spark.read.parquet(f"{base}/scores")
    assert out.count() == 6


def test_model_hot_swap_at_epoch_boundary(spark, tmp_path):
    """The per-epoch artifact handoff: overwrite the stored model
    between epochs (a retrain deploy) and the NEXT epoch must score
    with the new weights while already-landed epochs keep theirs —
    no restart, no checkpoint reset."""
    base = str(tmp_path / "swap")
    src = f"{base}/src"
    _weights(spark).write.mode("overwrite").parquet(f"{base}/model")
    _docs(spark, range(6)).coalesce(1).write.mode("overwrite").parquet(src)

    def _drain():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = quality_gate_sink(
            stream,
            model_path=f"{base}/model",
            scores_path=f"{base}/scores",
            checkpoint=f"{base}/ckpt",
            n_buckets=N_BUCKETS,
            available_now=True,
        )
        q.awaitTermination()

    _drain()
    # deploy the retrained (sign-flipped) model, then a new batch lands
    _weights(spark, flip=True).write.mode("overwrite").parquet(f"{base}/model")
    _docs(spark, range(6, 12)).coalesce(1).write.mode("append").parquet(src)
    _drain()

    out = spark.read.parquet(f"{base}/scores")
    old = {(r.doc_id, r.score) for r in out.filter("doc_id < 6").collect()}
    new = {(r.doc_id, r.score) for r in out.filter("doc_id >= 6").collect()}
    want_old = {
        (r.doc_id, r.score)
        for r in linear_text_classifier(
            _docs(spark, range(6)), _weights(spark), n_buckets=N_BUCKETS
        ).collect()
    }
    want_new = {
        (r.doc_id, r.score)
        for r in linear_text_classifier(
            _docs(spark, range(6, 12)), _weights(spark, flip=True), n_buckets=N_BUCKETS
        ).collect()
    }
    assert old == want_old and new == want_new and old and new
