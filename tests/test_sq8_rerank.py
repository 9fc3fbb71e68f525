"""SQ8 quantized-rerank contracts: code bit-parity with the Python
floor-rule reference, exactness when candidates cover the corpus, and
recall on separated clusters."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from api_kakfa_spark_airflow_s3_athena_spark.operators.similarity import (
    brute_force_topk,
    sq8_quantize,
    sq8_rerank_topk,
)


def _ref_codes(vec):
    m = max(abs(x) for x in vec)
    if m == 0:
        return [0] * len(vec), 0.0
    scale = m / 127.0
    return [math.floor(x / scale + 0.5) for x in vec], scale


def _emb(spark, vecs, parts=3):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    ).repartition(parts)


def test_quantize_matches_python_floor_rule(spark):
    vecs = [
        [0.5, -2.0, 1.25, 0.0],
        [0.0, 0.0, 0.0, 0.0],  # zero vector
        [1e-3, -1e-3, 5e-4, 0.0],
    ]
    rows = sq8_quantize(_emb(spark, vecs), "embedding").orderBy("vec_id").collect()
    for row, vec in zip(rows, vecs):
        codes, scale = _ref_codes(vec)
        assert list(row.sq8_codes) == codes, vec
        assert row.sq8_scale == scale
        assert all(-127 <= c <= 127 for c in row.sq8_codes)


def test_reconstruction_error_bounded_by_half_scale(spark):
    vecs = [[((i * j) % 17 - 8) * 0.37 for j in range(8)] for i in range(1, 20)]
    rows = sq8_quantize(_emb(spark, vecs), "embedding").collect()
    for r in rows:
        for x, c in zip(r.embedding, r.sq8_codes):
            assert abs(x - r.sq8_scale * c) <= r.sq8_scale / 2 + 1e-12


def test_rerank_equals_brute_force_when_candidates_cover_corpus(spark):
    vecs = [
        [math.cos(i * 0.7 + j) for j in range(6)] for i in range(30)
    ]
    emb = _emb(spark, vecs)
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    approx = sq8_rerank_topk(q, emb, k=5, candidates=30).collect()
    exact = brute_force_topk(q, emb, k=5).collect()
    key = lambda rows: {(r.query_id, r.rank): (r.neighbor_id, r.score) for r in rows}
    assert key(approx) == key(exact)


def test_recall_is_one_on_separated_clusters(spark):
    """Two well-separated direction clusters with the candidate budget
    covering the query's cluster: phase-1 int8 ranking must admit the
    whole near cluster before anything from the far one (cross-cluster
    int8 dots are ≈0 vs ≈127²·dim within), so top-10 recall is exactly
    1. (With candidates < cluster size, int8 ties may legitimately
    drop true top-10 members — that regime is covered by the staged
    query's measured recall10 contract, not asserted here.)"""
    base_a = [1.0, 0.0, 0.0, 0.0]
    base_b = [0.0, 0.0, 0.0, 1.0]
    vecs = []
    for i in range(20):
        eps = (i % 7) * 0.01
        vecs.append([base_a[0] + eps, eps, 0.0, 0.0])
    for i in range(20):
        eps = (i % 5) * 0.01
        vecs.append([0.0, eps, 0.0, base_b[3] + eps])
    emb = _emb(spark, vecs, parts=4)
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    approx = {
        r.neighbor_id for r in sq8_rerank_topk(q, emb, k=10, candidates=25).collect()
    }
    exact = {r.neighbor_id for r in brute_force_topk(q, emb, k=10).collect()}
    assert approx == exact


def test_query_guard_raises_on_oversized_query_set(spark):
    vecs = [[float(i), 1.0] for i in range(30)]
    emb = _emb(spark, vecs)
    q = emb.select(F.col("vec_id").alias("query_id"), "embedding")
    with pytest.raises(ValueError, match="queries"):
        sq8_rerank_topk(q, emb, k=2, max_queries=5)


def test_normalize_recovers_small_norm_high_cosine_neighbor(spark):
    """ADVICE r10: the default phase-1 key is a RAW quantized inner
    product, so on a heterogeneous-norm corpus a perfectly-aligned but
    tiny vector loses its candidate slot to big-norm moderate-cosine
    vectors. ``normalize=True`` makes the key ∝ cosine and recovers
    it; the default path's behavior is pinned too (it is what the
    registered oracle replicates)."""
    # query along e1; neighbor 0 is tiny but perfectly aligned
    # (cosine 1); neighbors 1..8 are huge with cosine ≈ 0.95
    vecs = [[0.001, 0.0, 0.0, 0.0]] + [
        [10.0, 3.0 + 0.1 * i, 0.0, 0.0] for i in range(8)
    ]
    corpus = _emb(spark, vecs)
    q = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0, 0.0])],
        "query_id long, embedding array<double>",
    )
    raw = sq8_rerank_topk(q, corpus, k=1, candidates=1)
    assert [r.neighbor_id for r in raw.collect()] == [1]  # big norm wins
    normed = sq8_rerank_topk(q, corpus, k=1, candidates=1, normalize=True)
    assert [r.neighbor_id for r in normed.collect()] == [0]  # cosine wins
