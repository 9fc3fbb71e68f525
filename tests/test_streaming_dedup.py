"""Continuous-ingest dedup (streaming/dedup.py): the per-epoch pair
logs must union to exactly the full-batch dedup of the whole corpus,
and replays must be idempotent."""

import itertools

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from api_kakfa_spark_airflow_s3_athena_spark.operators import dedup as DD
from api_kakfa_spark_airflow_s3_athena_spark.streaming.dedup import (
    dedup_ingest_batch,
    dedup_ingest_sink,
)

PARAMS = dict(threshold=0.5, num_hashes=32, bands=8)


def _corpus_rows():
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]
    rows = []
    for i, perm in enumerate(itertools.permutations(words, 6)):
        if i >= 24:
            break
        rows.append(Row(doc_id=i, text=" ".join(perm * 3)))
    # duplicates spanning the 3 eight-doc micro-batches and within one:
    rows[9] = Row(doc_id=9, text=rows[1].text)     # batch1 dup of batch0
    rows[17] = Row(doc_id=17, text=rows[2].text)   # batch2 dup of batch0
    rows[18] = Row(doc_id=18, text=rows[10].text)  # batch2 dup of batch1
    rows[23] = Row(doc_id=23, text=rows[16].text)  # within-batch2 dup
    return rows


def _run_ingest(spark, tmp_path, rows):
    src = str(tmp_path / "src")
    for b in range(3):
        batch = spark.createDataFrame(rows[b * 8 : (b + 1) * 8])
        batch.coalesce(1).write.mode(
            "append" if b else "overwrite"
        ).parquet(src)
    paths = {
        "index_path": str(tmp_path / "index"),
        "corpus_path": str(tmp_path / "corpus"),
        "pairs_path": str(tmp_path / "pairs"),
    }
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = dedup_ingest_sink(
        stream,
        checkpoint=str(tmp_path / "ckpt"),
        available_now=True,
        **paths,
        **PARAMS,
    )
    q.awaitTermination()
    return paths


def test_streamed_pairs_equal_full_batch_dedup(spark, tmp_path):
    rows = _corpus_rows()
    paths = _run_ingest(spark, tmp_path, rows)
    got = {
        (r.id_a, r.id_b, r.jaccard)
        for r in spark.read.parquet(paths["pairs_path"]).collect()
    }
    want = {
        (r.id_a, r.id_b, r.jaccard)
        for r in DD.minhash_dedup_pairs(
            spark.createDataFrame(rows), **PARAMS
        ).collect()
    }
    assert got == want
    found = {(a, b) for a, b, _ in got}
    # one planted pair of each topology must be present
    assert {(1, 9), (2, 17), (10, 18), (16, 23)} <= found
    # the index now covers the full corpus: one band row set per doc
    idx = spark.read.parquet(paths["index_path"])
    assert idx.select("doc_id").distinct().count() == 24


def test_partial_epoch_crash_recovers(spark, tmp_path):
    """A crash between the per-store writes (e.g. index epoch dir
    landed, corpus epoch dir did not — or only the corpus landed) must
    not crash-loop the retry: each store read probes its own path and
    only strictly-earlier epochs feed the computation."""
    rows = _corpus_rows()
    paths = {
        "index_path": str(tmp_path / "index"),
        "corpus_path": str(tmp_path / "corpus"),
        "pairs_path": str(tmp_path / "pairs"),
    }
    b0 = spark.createDataFrame(rows[:8])
    # simulate a crashed epoch 0 that wrote ONLY the index store
    DD.minhash_band_index(
        b0, "text", "doc_id", PARAMS["num_hashes"], PARAMS["bands"], 3, 1
    ).write.parquet(paths["index_path"] + "/epoch=0")
    # retry of epoch 0 must succeed (no PATH_NOT_FOUND on corpus)...
    dedup_ingest_batch(b0, 0, **paths, **PARAMS)
    # ...and epoch 1 sees a consistent prior state
    b1 = spark.createDataFrame(rows[8:16])
    dedup_ingest_batch(b1, 1, **paths, **PARAMS)
    found = {
        (r.id_a, r.id_b)
        for r in spark.read.parquet(paths["pairs_path"]).collect()
    }
    assert (1, 9) in found  # the batch0->batch1 planted dup


def test_replayed_epoch_is_idempotent(spark, tmp_path):
    """Re-running an epoch (the foreachBatch retry case) rewrites its
    own directories — pair counts must not change."""
    rows = _corpus_rows()
    paths = _run_ingest(spark, tmp_path, rows)
    before = sorted(
        tuple(r) for r in spark.read.parquet(paths["pairs_path"]).collect()
    )
    # replay epoch 1 manually with the same batch content
    batch = spark.createDataFrame(rows[8:16])
    dedup_ingest_batch(batch, 1, paths["index_path"], paths["corpus_path"],
                       paths["pairs_path"], **PARAMS)
    after = sorted(
        tuple(r) for r in spark.read.parquet(paths["pairs_path"]).collect()
    )
    assert after == before
