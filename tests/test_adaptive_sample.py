"""Adaptive-threshold streaming sample contracts: bounded state, the
stored-state == batch-filter-at-final-threshold identity, threshold
monotonicity, and replay idempotence."""

import hashlib

import pytest
from pyspark.sql import functions as F

from api_kakfa_spark_airflow_s3_athena_spark.operators.quantiles import COIN_SPAN


def _coin(i, salt=":as") -> int:
    return int(hashlib.md5(f"{i}{salt}".encode()).hexdigest()[:5], 16)


def _run(spark, base, files, cap):
    from api_kakfa_spark_airflow_s3_athena_spark.streaming.sketches import (
        adaptive_sample_sink,
    )

    src = f"{base}/src"
    for b, ids in enumerate(files):
        spark.createDataFrame([(i,) for i in ids], "doc_id long").coalesce(
            1
        ).write.mode("append" if b else "overwrite").parquet(src)
    stream = (
        spark.readStream.schema("doc_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = adaptive_sample_sink(
        stream,
        "doc_id",
        ["doc_id"],
        cap=cap,
        store_path=f"{base}/store",
        checkpoint=f"{base}/ckpt",
        available_now=True,
    )
    q.awaitTermination()


def test_state_bounded_and_equals_batch_filter(spark, tmp_path):
    base = str(tmp_path / "run")
    files = [list(range(0, 400)), list(range(400, 800)), list(range(800, 1200))]
    cap = 32
    _run(spark, base, files, cap)
    rows = spark.read.parquet(f"{base}/store/epoch=2").collect()
    assert 0 < len(rows) <= cap
    j = rows[0].j
    assert all(r.j == j for r in rows)
    stream_ids = {i for f in files for i in f}
    expected = {i for i in stream_ids if _coin(i) < (COIN_SPAN >> j)}
    assert {r.doc_id for r in rows} == expected
    # j is the smallest exponent whose FULL-stream sample fits cap —
    # the batch-equality half of the scheme's identity
    assert len(expected) <= cap
    if j > 0:
        bigger = {i for i in stream_ids if _coin(i) < (COIN_SPAN >> (j - 1))}
        assert len(bigger) > cap


def test_threshold_monotone_across_epochs(spark, tmp_path):
    base = str(tmp_path / "run")
    files = [list(range(0, 300)), list(range(300, 600)), list(range(600, 2000))]
    _run(spark, base, files, cap=16)
    js = {
        r.epoch: r.j
        for r in spark.read.parquet(f"{base}/store")
        .select("epoch", "j")
        .distinct()
        .collect()
    }
    assert js[0] <= js[1] <= js[2]
    per_epoch_n = {
        r.epoch: r.n
        for r in spark.read.parquet(f"{base}/store")
        .groupBy("epoch")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert all(n <= 16 for n in per_epoch_n.values())


def test_no_tightening_when_stream_fits(spark, tmp_path):
    base = str(tmp_path / "run")
    _run(spark, base, [[1, 2], [3, 4]], cap=100)
    rows = spark.read.parquet(f"{base}/store/epoch=1").collect()
    assert {r.doc_id for r in rows} == {1, 2, 3, 4}
    assert all(r.j == 0 for r in rows)


def test_replay_is_idempotent(spark, tmp_path):
    base = str(tmp_path / "run")
    files = [list(range(0, 500)), list(range(500, 1000))]
    _run(spark, base, files, cap=24)
    before = {
        (r.epoch, r.doc_id, r.j)
        for r in spark.read.parquet(f"{base}/store").collect()
    }
    # re-running the whole bounded stream with a fresh checkpoint
    # against the existing store overwrites each epoch with identical
    # content (epoch e reads only epoch e-1's state)
    from api_kakfa_spark_airflow_s3_athena_spark.streaming.sketches import (
        adaptive_sample_sink,
    )

    stream = (
        spark.readStream.schema("doc_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/src")
    )
    q = adaptive_sample_sink(
        stream,
        "doc_id",
        ["doc_id"],
        cap=24,
        store_path=f"{base}/store",
        checkpoint=f"{base}/ckpt2",
        available_now=True,
    )
    q.awaitTermination()
    after = {
        (r.epoch, r.doc_id, r.j)
        for r in spark.read.parquet(f"{base}/store").collect()
    }
    assert before == after


def test_redelivered_ids_do_not_overtighten(spark, tmp_path):
    """An at-least-once source re-delivering an epoch's rows must not
    double-count them: the size counts are over the ID SET, so a
    duplicate epoch leaves the threshold where the distinct stream
    puts it (the set-model identity the pure-Python property test
    pins)."""
    base = str(tmp_path / "run")
    ids = list(range(0, 40))
    kept0 = {i for i in ids if _coin(i) < COIN_SPAN}  # j=0 keeps all
    assert len(kept0) == 40
    # epoch 1 re-delivers epoch 0 verbatim; cap 64 > 40 distinct
    _run(spark, base, [ids, ids], cap=64)
    rows = spark.read.parquet(f"{base}/store/epoch=1").collect()
    assert all(r.j == 0 for r in rows), "duplicates over-tightened j"
    assert sorted(r.doc_id for r in rows) == ids


def test_empty_first_batch_then_data(spark, tmp_path):
    """An empty first micro-batch writes an empty epoch store; the
    next epoch must read it without crashing (NULL max(j) → 0)."""
    base = str(tmp_path / "run")
    _run(spark, base, [[], list(range(100))], cap=16)
    rows = spark.read.parquet(f"{base}/store/epoch=1").collect()
    assert 0 < len(rows) <= 16
    j = rows[0].j
    expected = {i for i in range(100) if _coin(i) < (COIN_SPAN >> j)}
    assert {r.doc_id for r in rows} == expected
