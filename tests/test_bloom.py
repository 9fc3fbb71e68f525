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
