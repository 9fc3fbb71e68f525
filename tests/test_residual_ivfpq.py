"""Residual-encoding IVF-PQ (operators/similarity.py): ADC arithmetic
pinned against a transparent numpy reimplementation, append-equals-
rebuild under frozen artifacts, planted-duplicate rank-1 retrieval
under nprobe=1, the measured clustered-data recall advantage over the
non-residual variant at equal bytes, and the empty-query early exit."""

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from api_kakfa_spark_airflow_s3_athena_spark.operators import similarity as SIM


def _clustered(spark, n=800, d=16, nc=6, seed=5, id_start=0):
    rng = np.random.default_rng(seed)
    cents = rng.normal(0, 10, (nc, d))
    v = cents[rng.integers(0, nc, n)] + rng.normal(0, 1.0, (n, d))
    rows = [
        Row(vec_id=int(id_start + i), embedding=[float(x) for x in v[i]])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), v


def test_residual_adc_matches_numpy_reference(spark):
    """The operator's adist for every (query, probed cell) row must
    equal the hand-computed residual ADC: lut[j][code] summed over
    subspaces with the query residual taken against THAT row's cell."""
    emb, _ = _clustered(spark, n=120, d=8, nc=3)
    centroids, books, enc = SIM.ivfpq_residual_index(
        emb, n_centroids=4, m=4, ksub=4, iters=2
    )
    queries = emb.filter(F.col("vec_id") % 40 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {
        (r.query_id, r.neighbor_id): r.adist
        for r in SIM.ivfpq_residual_topk(
            queries, centroids, books, enc, k=120, nprobe=4
        ).collect()
    }
    books = np.asarray(books)
    m, ksub, dsub = books.shape
    cent = {
        r.centroid_id: np.asarray(r.centroid_vec, dtype=np.float64)
        for r in centroids.collect()
    }
    codes = {r.vec_id: (r.cell, np.asarray(r.codes)) for r in enc.collect()}
    qv = {r.query_id: np.asarray(r.embedding, dtype=np.float64) for r in queries.collect()}
    checked = 0
    for (qid, nid), adist in got.items():
        cell, c = codes[nid]
        r = qv[qid] - cent[cell]
        want = 0.0
        for j in range(m):
            sub = r[j * dsub : (j + 1) * dsub]
            want += float(((sub - books[j][c[j]]) ** 2).sum())
        assert adist == round(max(want, 0.0), 6) or abs(adist - want) < 1e-6
        checked += 1
    assert checked > 50


def _uniform(spark, n, d=16, seed=3, id_start=0):
    """Code-DIVERSE vectors (full-spread uniform): the strict planted
    rank-1 property needs the original to be the unique minimum-adist
    row — in a tight cluster many vectors share ALL argmin codes and a
    smaller-id same-code neighbor legitimately ties at rank 1 (ADC
    distance is a function of the codes alone). Same precondition the
    registered non-residual contract gets from the near-uniform driver
    fixture."""
    rng = np.random.default_rng(seed)
    v = rng.uniform(-10, 10, (n, d))
    rows = [
        Row(vec_id=int(id_start + i), embedding=[float(x) for x in v[i]])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_residual_append_equals_rebuild_and_planted_rank1(spark, tmp_path):
    base = str(tmp_path)
    corpus = _uniform(spark, 400, seed=3)
    delta = _uniform(spark, 100, seed=9, id_start=10_000)
    centroids, books, enc = SIM.ivfpq_residual_index(
        corpus, n_centroids=8, m=4, ksub=8, iters=2
    )
    centroids.write.mode("overwrite").parquet(f"{base}/centroids")
    SIM.pq_save_books(spark, books, f"{base}/books")
    cstored = spark.read.parquet(f"{base}/centroids")
    bstored = SIM.pq_load_books(spark, f"{base}/books")
    # plants: re-ingest 10 corpus rows under new ids
    plants = corpus.filter(F.col("vec_id") % 40 == 0).select(
        (F.col("vec_id") + 50_000).alias("vec_id"), "embedding"
    )
    full_delta = delta.unionByName(plants)
    appended = SIM.ivfpq_residual_index_append(full_delta, cstored, bstored)
    rebuilt = SIM.ivfpq_residual_index_append(
        corpus.unionByName(full_delta), cstored, bstored
    )
    app = {
        (r.vec_id, r.cell, tuple(r.codes))
        for r in enc.unionByName(appended).collect()
    }
    reb = {(r.vec_id, r.cell, tuple(r.codes)) for r in rebuilt.collect()}
    assert app == reb  # append == rebuild under frozen artifacts
    # planted duplicates: identical vector -> same cell, same residual
    # codes -> tied adist; the original (smaller id) wins rank 1
    stored = enc.unionByName(appended)
    plant_q = plants.select(F.col("vec_id").alias("query_id"), "embedding")
    hits = SIM.ivfpq_residual_topk(plant_q, cstored, bstored, stored, k=2, nprobe=1)
    found = {
        r.query_id
        for r in hits.collect()
        if r.rnk == 1 and r.neighbor_id + 50_000 == r.query_id
    }
    assert found == {r.query_id for r in plant_q.collect()}


def test_residual_beats_plain_on_clustered_data_at_equal_bytes(spark):
    """The reason the variant exists: on clustered vectors the
    residual codes spend the same byte budget on a tighter
    distribution. Measured margin is wide (0.24 vs 0.09 recall@10 on
    the round-9 fixture); assert a conservative separation."""
    emb, v = _clustered(spark, n=1500, d=16, nc=8, seed=7)
    ids = np.arange(1500)
    qidx = list(range(0, 1500, 149))
    truth = {}
    for qi in qidx:
        d = ((v - v[qi]) ** 2).sum(1)
        truth[qi] = set(ids[np.lexsort((ids, d))[:10]])
    queries = emb.filter(F.col("vec_id").isin(qidx)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    recall = {}
    for name, build, topk in [
        ("plain", SIM.ivfpq_index, SIM.ivfpq_topk),
        ("resid", SIM.ivfpq_residual_index, SIM.ivfpq_residual_topk),
    ]:
        centroids, books, enc = build(emb, n_centroids=12, m=4, ksub=16, iters=3)
        hits = topk(queries, centroids, books, enc, k=10, nprobe=4).collect()
        got = {}
        for h in hits:
            got.setdefault(h.query_id, set()).add(h.neighbor_id)
        recall[name] = np.mean(
            [len(got.get(q, set()) & truth[q]) / 10 for q in truth]
        )
    assert recall["resid"] > recall["plain"] * 1.3, recall


def test_residual_topk_empty_queries(spark):
    emb, _ = _clustered(spark, n=60, d=8, nc=2)
    centroids, books, enc = SIM.ivfpq_residual_index(
        emb, n_centroids=2, m=2, ksub=4, iters=1
    )
    empty = emb.filter("vec_id < 0").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = SIM.ivfpq_residual_topk(empty, centroids, books, enc, k=3)
    assert out.count() == 0
    assert out.columns == ["query_id", "neighbor_id", "adist", "rnk"]


def test_pq_encode_keep_cols_equals_join_reattach(spark):
    """The round-13 keep_cols passthrough must emit exactly the rows
    the former encode-then-join-on-id shape produced."""
    import math

    from api_kakfa_spark_airflow_s3_athena_spark.operators.similarity import (
        pq_codebooks,
        pq_encode,
    )

    vecs = [(i, [math.cos(i * 0.7 + j) for j in range(8)], i % 5) for i in range(60)]
    df = spark.createDataFrame(
        vecs, "vec_id long, embedding array<double>, cell int"
    ).repartition(4)
    books = pq_codebooks(df, m=4, ksub=8, iters=2, vec_col="embedding")
    fused = pq_encode(df, books, keep_cols=("cell",)).collect()
    joined = (
        pq_encode(df, books)
        .join(df.select("vec_id", "cell"), "vec_id")
        .collect()
    )
    key = lambda rows: {(r.vec_id, tuple(r.codes), r.cell) for r in rows}
    assert key(fused) == key(joined) and len(fused) == 60
