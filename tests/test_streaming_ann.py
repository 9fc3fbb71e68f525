"""Streaming ANN index maintenance (streaming/ann.py): appended epochs
must be row-identical to the batch delta path under the same frozen
artifacts, replays must be idempotent, the per-epoch artifact reload
must pick up a swapped codebook at the next epoch boundary, the drift
metric must land per epoch, and cell pruning must survive the
epoch-partitioned layout."""

import re

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from api_kakfa_spark_airflow_s3_athena_spark.operators import similarity as SIM
from api_kakfa_spark_airflow_s3_athena_spark.streaming.ann import ann_index_sink

D = 8


def _vecs(spark, ids, shift=0.0):
    rows = [
        Row(
            vec_id=i,
            embedding=[float(((i * 7 + j * 3) % 11) - 5) + shift for j in range(D)],
        )
        for i in ids
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _stage(spark, base, corpus):
    centroids, books, enc = SIM.ivfpq_index(
        corpus, n_centroids=4, m=4, ksub=4, iters=2
    )
    centroids.write.mode("overwrite").parquet(f"{base}/centroids")
    SIM.pq_save_books(spark, books, f"{base}/books")
    enc.write.mode("overwrite").partitionBy("cell").parquet(
        f"{base}/index/epoch=-1"
    )


def _run_stream(spark, base, files, subdir="s", src=None):
    src = src or f"{base}/{subdir}/src"
    for b, ids in enumerate(files):
        _vecs(spark, ids).coalesce(1).write.mode(
            "append" if b else "overwrite"
        ).parquet(src)
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = ann_index_sink(
        stream,
        centroids_path=f"{base}/centroids",
        books_path=f"{base}/books",
        index_path=f"{base}/index",
        metrics_path=f"{base}/metrics",
        checkpoint=f"{base}/{subdir}/ckpt",
        available_now=True,
    )
    q.awaitTermination()


def test_streamed_appends_equal_batch_rebuild_and_exactly_once(spark, tmp_path):
    base = str(tmp_path / "run")
    corpus = _vecs(spark, range(0, 40))
    _stage(spark, base, corpus)
    deltas = [range(40, 52), range(52, 64), range(64, 76)]
    _run_stream(spark, base, deltas)

    stored = spark.read.parquet(f"{base}/index")
    assert stored.count() == 76
    # exactly-once: each id in exactly one epoch; 3 streamed epochs
    assert stored.select("vec_id").distinct().count() == 76
    epochs = {r.epoch for r in stored.select("epoch").distinct().collect()}
    assert epochs == {-1, 0, 1, 2}

    # streamed rows == the batch delta path under the SAME artifacts
    cstored = spark.read.parquet(f"{base}/centroids")
    bstored = SIM.pq_load_books(spark, f"{base}/books")
    want = {
        (r.vec_id, r.cell, tuple(r.codes))
        for r in SIM.ivfpq_index_append(
            _vecs(spark, range(40, 76)), cstored, bstored
        ).collect()
    }
    got = {
        (r.vec_id, r.cell, tuple(r.codes))
        for r in stored.filter("epoch >= 0").collect()
    }
    assert got == want

    # drift metric: one (n_vectors, mse) row per epoch, finite
    met = spark.read.parquet(f"{base}/metrics").collect()
    assert {r.epoch: r.n_vectors for r in met} == {0: 12, 1: 12, 2: 12}
    assert all(r.mse >= 0.0 for r in met)


def test_replay_is_idempotent(spark, tmp_path):
    """Same source, same checkpoint, second start: no new work, no
    duplicate rows (epoch overwrite dirs + checkpointed epoch ids)."""
    base = str(tmp_path / "run")
    _stage(spark, base, _vecs(spark, range(0, 30)))
    _run_stream(spark, base, [range(30, 40), range(40, 50)])
    before = {
        (r.vec_id, r.epoch, r.cell)
        for r in spark.read.parquet(f"{base}/index").collect()
    }
    _run_stream(spark, base, [], src=f"{base}/s/src")  # restart, no new files
    after = {
        (r.vec_id, r.epoch, r.cell)
        for r in spark.read.parquet(f"{base}/index").collect()
    }
    assert after == before


def test_epoch_reload_picks_up_swapped_books(spark, tmp_path):
    """A retrain deploy overwrites the codebook artifact; the NEXT
    epoch encodes with it while stored epochs keep their old codes —
    the hot-swap lifecycle the per-epoch reload exists for."""
    base = str(tmp_path / "run")
    corpus = _vecs(spark, range(0, 40))
    _stage(spark, base, corpus)
    _run_stream(spark, base, [range(40, 50)], subdir="s1")
    books1 = SIM.pq_load_books(spark, f"{base}/books")
    old = {
        (r.vec_id, tuple(r.codes))
        for r in spark.read.parquet(f"{base}/index").filter("epoch = 0").collect()
    }

    # retrain on shifted data -> different codebooks, atomically swapped
    books2_src = _vecs(spark, range(1000, 1100), shift=17.0)
    books2 = SIM.pq_codebooks(books2_src, m=4, ksub=4, iters=2)
    SIM.pq_save_books(spark, books2, f"{base}/books")

    _run_stream(spark, base, [range(40, 50)], subdir="s2")
    # second run re-ingests the same ids under a NEW checkpoint: its
    # epoch 0 OVERWRITES the old epoch-0 directory with new codes
    new = {
        (r.vec_id, tuple(r.codes))
        for r in spark.read.parquet(f"{base}/index").filter("epoch = 0").collect()
    }
    want = {
        (r.vec_id, tuple(r.codes))
        for r in SIM.pq_encode(_vecs(spark, range(40, 50)), books2).collect()
    }
    assert new == want
    old_want = {
        (r.vec_id, tuple(r.codes))
        for r in SIM.pq_encode(_vecs(spark, range(40, 50)), books1).collect()
    }
    assert old == old_want
    assert new != old  # the swap actually changed the encoding


def test_cell_pruning_survives_epoch_layout(spark, tmp_path):
    """The epoch=<id>/cell=<c> tree still partition-prunes on cell —
    the read lever the index exists for is intact under streaming
    maintenance."""
    base = str(tmp_path / "run")
    _stage(spark, base, _vecs(spark, range(0, 40)))
    _run_stream(spark, base, [range(40, 52)])
    stored = spark.read.parquet(f"{base}/index")
    plan = stored.filter(F.col("cell").isin([0, 1]))._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cell" in m.group(1), plan


def test_residual_sink_equals_batch_residual_append(spark, tmp_path):
    """residual=True maintains the residual-encoded index through the
    same sink: streamed epochs must be (id, cell, codes)-identical to
    the batch residual delta path under the same frozen artifacts,
    and the drift metric must be measured in RESIDUAL space (finite,
    one row per epoch)."""
    base = str(tmp_path / "run")
    corpus = _vecs(spark, range(0, 40))
    centroids, books, enc = SIM.ivfpq_residual_index(
        corpus, n_centroids=4, m=4, ksub=4, iters=2
    )
    centroids.write.mode("overwrite").parquet(f"{base}/centroids")
    SIM.pq_save_books(spark, books, f"{base}/books")
    enc.write.mode("overwrite").partitionBy("cell").parquet(
        f"{base}/index/epoch=-1"
    )
    deltas = [range(40, 52), range(52, 64)]
    src = f"{base}/s/src"
    for b, ids in enumerate(deltas):
        _vecs(spark, ids).coalesce(1).write.mode(
            "append" if b else "overwrite"
        ).parquet(src)
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = ann_index_sink(
        stream,
        centroids_path=f"{base}/centroids",
        books_path=f"{base}/books",
        index_path=f"{base}/index",
        metrics_path=f"{base}/metrics",
        checkpoint=f"{base}/s/ckpt",
        residual=True,
        available_now=True,
    )
    q.awaitTermination()
    stored = spark.read.parquet(f"{base}/index")
    cstored = spark.read.parquet(f"{base}/centroids")
    bstored = SIM.pq_load_books(spark, f"{base}/books")
    want = {
        (r.vec_id, r.cell, tuple(r.codes))
        for r in SIM.ivfpq_residual_index_append(
            _vecs(spark, range(40, 64)), cstored, bstored
        ).collect()
    }
    got = {
        (r.vec_id, r.cell, tuple(r.codes))
        for r in stored.filter("epoch >= 0").collect()
    }
    assert got == want
    met = spark.read.parquet(f"{base}/metrics").collect()
    assert {r.epoch: r.n_vectors for r in met} == {0: 12, 1: 12}
    assert all(r.mse >= 0.0 for r in met)
    # residual-space mse under codebooks TRAINED on residuals must be
    # far below raw-space mse under the same books (wrong space)
    raw = SIM.pq_quantization_error(
        _vecs(spark, range(40, 64)), bstored
    ).collect()[0].mse
    assert max(r.mse for r in met) < raw
