"""Bloom join-pruning contracts: bit-parity with a Python reference,
the zero-false-negative guarantee (candidates ⊇ true matches) under a
deliberately saturated filter, and exactness of the screen→verify
composition."""

import hashlib

import pytest
from pyspark.sql import functions as F

from api_kakfa_spark_airflow_s3_athena_spark.operators.bloom import (
    bloom_bits,
    bloom_candidates,
)


def _pos(key, j, m):
    return int(hashlib.md5(f"{j}:{key}".encode()).hexdigest()[:15], 16) % m


def _ref_bits(keys, m, k):
    return {_pos(key, j, m) for key in keys for j in range(k)}


def _ref_member(key, bits, m, k):
    return all(_pos(key, j, m) in bits for j in range(k))


def test_bits_match_python_reference(spark):
    keys = [i * 7 for i in range(40)]
    dim = spark.createDataFrame([(k,) for k in keys], ["key"]).repartition(3)
    got = {r.bit for r in bloom_bits(dim, "key", m=256, n_hashes=3).collect()}
    assert got == _ref_bits(keys, 256, 3)


def test_candidates_superset_of_matches_and_match_reference(spark):
    m, k = 64, 3  # tiny m → saturated filter → real false positives
    dim_keys = list(range(0, 100, 5))
    fact_keys = list(range(100))
    dim = spark.createDataFrame([(x,) for x in dim_keys], ["key"])
    fact = spark.createDataFrame([(x,) for x in fact_keys], ["key"]).repartition(4)
    bits = bloom_bits(dim, "key", m=m, n_hashes=k)
    cand = {r.key for r in bloom_candidates(fact, "key", bits, m=m, n_hashes=k).collect()}
    ref_bits = _ref_bits(dim_keys, m, k)
    expected = {x for x in fact_keys if _ref_member(x, ref_bits, m, k)}
    assert cand == expected
    assert set(dim_keys) <= cand  # NO false negatives, ever
    assert cand - set(dim_keys), "tiny filter should produce false positives"


def test_screen_then_exact_verify_equals_plain_semijoin(spark):
    m, k = 64, 2
    dim_keys = [3, 17, 45, 99]
    fact_keys = list(range(120))
    dim = spark.createDataFrame([(x,) for x in dim_keys], ["key"])
    fact = spark.createDataFrame([(x,) for x in fact_keys], ["key"]).repartition(5)
    bits = bloom_bits(dim, "key", m=m, n_hashes=k)
    cand = bloom_candidates(fact, "key", bits, m=m, n_hashes=k)
    verified = {r.key for r in cand.join(dim, "key", "leftsemi").collect()}
    plain = {r.key for r in fact.join(dim, "key", "leftsemi").collect()}
    assert verified == plain == set(dim_keys)


def test_candidates_preserve_fact_columns_and_rows(spark):
    """Pruning is a filter: surviving rows keep every fact column and
    duplicate multiplicity."""
    dim = spark.createDataFrame([(1,)], ["key"])
    fact = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c")], ["key", "payload"]
    )
    bits = bloom_bits(dim, "key", m=4096, n_hashes=3)
    got = sorted(
        (r.key, r.payload)
        for r in bloom_candidates(fact, "key", bits, m=4096, n_hashes=3).collect()
    )
    assert got == [(1, "a"), (1, "b")]
    assert set(bloom_candidates(fact, "key", bits, m=4096, n_hashes=3).columns) == {
        "key",
        "payload",
    }


def test_bloom_merge_equals_bits_of_union(spark):
    from api_kakfa_spark_airflow_s3_athena_spark.operators.bloom import bloom_merge

    a_keys = list(range(0, 50))
    b_keys = list(range(30, 90))
    mk = lambda keys: bloom_bits(
        spark.createDataFrame([(k,) for k in keys], ["key"]), "key", m=512, n_hashes=3
    )
    merged = {r.bit for r in bloom_merge(mk(a_keys), mk(b_keys)).collect()}
    direct = {r.bit for r in mk(a_keys + b_keys).collect()}
    assert merged == direct == _ref_bits(set(a_keys) | set(b_keys), 512, 3)


def _run_bloom_stream(spark, base, files, m=512, k=3):
    from api_kakfa_spark_airflow_s3_athena_spark.streaming.sketches import bloom_sink

    src = f"{base}/src"
    for b, keys in enumerate(files):
        spark.createDataFrame([(x,) for x in keys], "key long").coalesce(
            1
        ).write.mode("append" if b else "overwrite").parquet(src)
    stream = (
        spark.readStream.schema("key long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = bloom_sink(
        stream,
        "key",
        m=m,
        n_hashes=k,
        store_path=f"{base}/store",
        checkpoint=f"{base}/ckpt",
        available_now=True,
    )
    q.awaitTermination()


def test_streaming_filter_equals_batch_and_prunes(spark, tmp_path):
    base = str(tmp_path / "run")
    files = [list(range(0, 40)), list(range(40, 80)), list(range(0, 20))]
    _run_bloom_stream(spark, base, files)
    final = {
        r.bit for r in spark.read.parquet(f"{base}/store/epoch=2").collect()
    }
    all_keys = {x for f in files for x in f}
    assert final == _ref_bits(all_keys, 512, 3)
    # bits only grow across epochs (insert-only structure)
    store = spark.read.parquet(f"{base}/store")
    sizes = {
        r.epoch: r.n
        for r in store.groupBy("epoch").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert sizes[0] <= sizes[1] and sizes[1] == sizes[2]
    # the streamed filter prunes a batch scan with zero false negatives
    fact = spark.createDataFrame([(x,) for x in range(120)], ["key"])
    bits_df = spark.read.parquet(f"{base}/store/epoch=2")
    cand = {
        r.key
        for r in bloom_candidates(fact, "key", bits_df, m=512, n_hashes=3).collect()
    }
    assert all_keys <= cand


def test_candidates_preserve_preexisting_scratch_columns(spark):
    """A caller's own ``__bit`` / ``__bloom_bit`` columns must survive
    the membership test with their values intact (ADVICE r10: the
    probe previously materialized its positions into ``__bit`` and
    dropped it, destroying user data in that column)."""
    dim = spark.createDataFrame([(1,), (2,)], ["key"])
    fact = spark.createDataFrame(
        [(1, 11, 111), (2, 22, 222), (3, 33, 333)],
        ["key", "__bit", "__bloom_bit"],
    )
    bits = bloom_bits(dim, "key", m=4096, n_hashes=3)
    got = sorted(
        (r.key, r["__bit"], r["__bloom_bit"])
        for r in bloom_candidates(fact, "key", bits, m=4096, n_hashes=3).collect()
    )
    assert got == [(1, 11, 111), (2, 22, 222)]
