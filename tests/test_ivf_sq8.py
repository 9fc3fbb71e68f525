"""IVF-SQ8 composed-index contracts: full-coverage equivalence to the
flat SQ8 rerank, probed-cell locality, index structure, and the
planted-duplicate recall pin."""

import math

import pytest
from pyspark.sql import functions as F

from api_kakfa_spark_airflow_s3_athena_spark.operators.similarity import (
    brute_force_topk,
    ivf_index,
    ivf_sq8_index,
    ivf_sq8_topk,
    sq8_rerank_topk,
)


def _emb(spark, vecs, parts=4):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    ).repartition(parts)


def _clustered(n_per=15, dims=6, n_clusters=4):
    # eps unique per member: every vector is distinct (the planted-
    # duplicate test relies on the plant being the ONLY exact copy)
    vecs = []
    for c in range(n_clusters):
        base = [1.0 if d == c else 0.05 for d in range(dims)]
        for i in range(n_per):
            eps = (i + 1) * 0.013
            vecs.append([x + (eps if d == (c + 1) % dims else 0.0) for d, x in enumerate(base)])
    return vecs


def test_full_coverage_equals_flat_sq8(spark):
    vecs = [[math.cos(i * 0.9 + j) for j in range(5)] for i in range(40)]
    emb = _emb(spark, vecs)
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    n_cells = 4
    ivf = ivf_sq8_topk(
        q, emb, k=5, n_centroids=n_cells, nprobe=n_cells, candidates=40
    ).collect()
    flat = sq8_rerank_topk(q, emb, k=5, candidates=40).collect()
    key = lambda rows: {(r.query_id, r.rank): (r.neighbor_id, r.score) for r in rows}
    assert key(ivf) == key(flat)


def test_results_come_only_from_probed_cells(spark):
    vecs = _clustered()
    emb = _emb(spark, vecs)
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    n_cells = 6
    centroids, codes = ivf_sq8_index(emb, n_centroids=n_cells)
    cell_of = {r.neighbor_id: r.cell for r in codes.collect()}
    from api_kakfa_spark_airflow_s3_athena_spark.operators.similarity import _ivf_assign

    probes = {
        r.cell
        for r in _ivf_assign(
            q.select("query_id", F.col("embedding").alias("q_vec")),
            centroids,
            "query_id",
            "q_vec",
            keep=2,
        ).collect()
    }
    out = ivf_sq8_topk(q, emb, k=10, n_centroids=n_cells, nprobe=2, candidates=20)
    for r in out.collect():
        assert cell_of[r.neighbor_id] in probes, (r.neighbor_id, probes)


def test_code_index_mirrors_cell_index(spark):
    vecs = _clustered(n_per=8)
    emb = _emb(spark, vecs)
    centroids, codes = ivf_sq8_index(emb, n_centroids=5)
    _, cells = ivf_index(emb, n_centroids=5)
    assert {(r.neighbor_id, r.cell) for r in codes.collect()} == {
        (r.neighbor_id, r.cell) for r in cells.collect()
    }
    row = codes.limit(1).collect()[0]
    assert len(row.sq8_codes) == 6 and all(-127 <= c <= 127 for c in row.sq8_codes)


def test_planted_duplicate_found_at_rank_one(spark):
    """An exact duplicate vector lands in the same cell with identical
    codes — nprobe=1 must still surface it at rank 1. The candidate
    budget covers the cluster: near-identical vectors quantize to
    IDENTICAL int8 codes, so phase-1 ties resolve by id and a budget
    smaller than the tie group can drop the plant (the flat-SQ8 test's
    lesson; the exact rerank then puts the true duplicate at rank 1)."""
    vecs = _clustered()
    vecs.append(list(vecs[7]))  # plant: duplicate of vec 7
    emb = _emb(spark, vecs)
    plant_id = len(vecs) - 1
    q = emb.filter(F.col("vec_id") == 7).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivf_sq8_topk(q, emb, k=3, n_centroids=4, nprobe=1, candidates=20).collect()
    top = [r for r in out if r.rank == 1][0]
    assert top.neighbor_id == plant_id and top.score == 1.0


def test_recall_matches_brute_force_on_clustered_data(spark):
    vecs = _clustered(n_per=12, n_clusters=3)
    emb = _emb(spark, vecs, parts=3)
    q = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    approx = ivf_sq8_topk(q, emb, k=8, n_centroids=3, nprobe=1, candidates=12)
    exact = brute_force_topk(q, emb, k=8)
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    # same-cluster neighbors dominate the exact top-8; nprobe=1 probes
    # exactly that cluster's cell
    assert len(a & e) / len(e) >= 0.75


def test_assign_matches_window_reference(spark):
    """The round-13 row-local Arrow `_ivf_assign` must choose exactly
    the cells the former broadcast-join + window plan chose — on real
    driver embeddings, on exact ties (planted duplicates), on a zero
    vector (former NULL cosine), and for keep > 1."""
    from pyspark.sql import Window

    from api_kakfa_spark_airflow_s3_athena_spark.functions.vectors import cosine
    from api_kakfa_spark_airflow_s3_athena_spark.operators.similarity import (
        _ivf_assign,
        ivf_centroids,
    )

    real = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    plants = real.filter(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
    )
    zero = spark.createDataFrame(
        [(99_999_999, [0.0] * 64)], "vec_id long, embedding array<double>"
    )
    df = real.unionByName(plants).unionByName(zero).select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_vec")
    )
    centroids = ivf_centroids(real, n_centroids=8)

    def reference(keep):
        scored = df.join(F.broadcast(centroids)).select(
            F.col("neighbor_id"),
            F.col("centroid_id"),
            cosine(F.col("c_vec"), F.col("centroid_vec")).alias("__cs"),
        )
        w = Window.partitionBy("neighbor_id").orderBy(
            F.col("__cs").desc(), F.col("centroid_id")
        )
        return {
            (r.neighbor_id, r.cell)
            for r in scored.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= keep)
            .select("neighbor_id", F.col("centroid_id").alias("cell"))
            .collect()
        }

    for keep in (1, 3):
        got = {
            (r.neighbor_id, r.cell)
            for r in _ivf_assign(df, centroids, "neighbor_id", "c_vec", keep).collect()
        }
        assert got == reference(keep), f"keep={keep}: cell choice diverged"
