"""PCA whitening for embedding columns — the normalization stage a
SemDeDup/ANN pipeline runs before cosine comparisons (decorrelate and
equalize dimension scales so distance is not dominated by a few
high-variance axes). No reference analog; driver-mandated
training-data-pipeline extension (SURVEY.md §2f scope).

Scale design: the ONLY driver-side object is the d x d Gram/covariance
matrix (d = embedding width, 64 here; 4096 doubles at d=64, ~1 MB at
d=1024) — bounded by the embedding width, independent of corpus size.
Partial Gram blocks are computed per Arrow batch as one BLAS
``X.T @ X`` (C-speed, no per-element Python), reduced by a key-wise
Spark aggregate, and only the reduced d² cells are collected. The
eigendecomposition runs on the driver (LAPACK ``eigh`` on a d x d
symmetric matrix — microseconds), and the fitted model is broadcast
back into a vectorized projection pass. The corpus is scanned twice
(fit, transform) and never shuffled.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["PCAWhitening", "fit_pca_whitening", "whiten", "save_model", "load_model"]


@dataclass
class PCAWhitening:
    """Fitted model: ``mean`` (d,), ``components`` (d, k) column
    eigenvectors sorted by descending eigenvalue with a deterministic
    sign convention (largest-|entry| component positive), ``eigvals``
    (k,) of the SAMPLE covariance (n-1 normalization)."""

    mean: "object"
    components: "object"
    eigvals: "object"
    n: int


def _gram_partials(df: DataFrame, vec_col: str) -> DataFrame:
    """Per-partition Gram partials as (i, j, val) cells: one BLAS
    ``X.T @ X`` per Arrow batch, plus the vector sum as j = -1 rows
    and the row count as (-1, -1). Output is O(d²) rows per PARTITION
    (not per row), reduced key-wise before collection."""
    import numpy as np
    import pandas as pd

    def gen(batches):
        G = None
        s = None
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if G is None:
                d = X.shape[1]
                G = np.zeros((d, d))
                s = np.zeros(d)
            G += X.T @ X
            s += X.sum(axis=0)
            n += len(X)
        if G is None:
            return
        d = G.shape[0]
        ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
        yield pd.DataFrame(
            {
                "i": np.concatenate([ii.ravel(), np.arange(d), [-1]]),
                "j": np.concatenate([jj.ravel(), np.full(d, -1), [-1]]),
                "val": np.concatenate([G.ravel(), s, [float(n)]]),
            }
        )

    return df.select(vec_col).mapInPandas(gen, schema="i int, j int, val double")


def fit_pca_whitening(df: DataFrame, vec_col: str = "embedding", k: int = 8) -> PCAWhitening:
    """Fit on the corpus: distributed Gram -> driver covariance ->
    ``eigh`` -> top-k components. The collect is exactly d² + d + 1
    reduced cells whatever the corpus size."""
    import numpy as np

    cells = (
        _gram_partials(df, vec_col)
        .groupBy("i", "j")
        .agg(F.sum("val").alias("val"))
        .collect()
    )
    n_cell = next((r.val for r in cells if r.i == -1 and r.j == -1), None)
    n = int(n_cell) if n_cell is not None else 0
    if n < 2:
        raise ValueError("fit_pca_whitening needs at least 2 vectors")
    d = max(r.i for r in cells) + 1
    G = np.zeros((d, d))
    s = np.zeros(d)
    for r in cells:
        if r.i == -1:
            continue
        if r.j == -1:
            s[r.i] = r.val
        else:
            G[r.i, r.j] = r.val
    mu = s / n
    cov = (G - n * np.outer(mu, mu)) / (n - 1)
    # numerical symmetry guard before eigh
    cov = (cov + cov.T) / 2.0
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    eigvals = w[order]
    comps = v[:, order]
    # deterministic sign: the largest-|entry| coordinate positive
    for c in range(comps.shape[1]):
        col = comps[:, c]
        if col[np.argmax(np.abs(col))] < 0:
            comps[:, c] = -col
    return PCAWhitening(mean=mu, components=comps, eigvals=eigvals, n=n)


def whiten(
    df: DataFrame,
    model: PCAWhitening,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    eps: float = 1e-9,
    out_col: str = "whitened",
) -> DataFrame:
    """Project to the top-k whitened coordinates:
    ``y = diag(1/sqrt(eigval + eps)) @ components.T @ (x - mean)`` —
    per-batch BLAS matmul against the broadcast (d x k) model; output
    variance is eigval/(eigval+eps) ~ 1 per retained dimension."""
    import numpy as np
    import pandas as pd

    mu = model.mean
    # fold the per-dimension scale into the projection matrix once
    W = model.components / np.sqrt(np.maximum(model.eigvals, 0.0) + eps)

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            Y = (X - mu) @ W
            yield pd.DataFrame({id_col: pdf[id_col], out_col: list(Y)})

    return df.select(id_col, vec_col).mapInPandas(
        gen, schema=f"{id_col} long, {out_col} array<double>"
    )


def save_model(spark, model: PCAWhitening, path: str) -> None:
    """Persist the fitted model as a tiny parquet artifact — one row
    per (kind, i, j) cell: mean (j=-1), components, eigvals (i=-1) —
    so the snapshot-fit/serve split works exactly like the MinHash
    band index and IVF index artifacts: fit once per corpus snapshot,
    every downstream job (and engine version) reloads the identical
    projection."""
    rows = [("n", -1, -1, float(model.n))]
    rows += [("mean", int(i), -1, float(v)) for i, v in enumerate(model.mean)]
    rows += [("eig", -1, int(j), float(v)) for j, v in enumerate(model.eigvals)]
    d, k = model.components.shape
    rows += [
        ("comp", int(i), int(j), float(model.components[i, j]))
        for i in range(d)
        for j in range(k)
    ]
    spark.createDataFrame(rows, "kind string, i int, j int, val double").coalesce(
        1
    ).write.mode("overwrite").parquet(path)


def load_model(spark, path: str) -> PCAWhitening:
    """Reload a :func:`save_model` artifact, bit-identical."""
    import numpy as np

    rows = spark.read.parquet(path).collect()
    n = int(next(r.val for r in rows if r.kind == "n"))
    mean_cells = {r.i: r.val for r in rows if r.kind == "mean"}
    eig_cells = {r.j: r.val for r in rows if r.kind == "eig"}
    comp_cells = {(r.i, r.j): r.val for r in rows if r.kind == "comp"}
    d = len(mean_cells)
    k = len(eig_cells)
    mean = np.array([mean_cells[i] for i in range(d)])
    eig = np.array([eig_cells[j] for j in range(k)])
    comp = np.array([[comp_cells[(i, j)] for j in range(k)] for i in range(d)])
    return PCAWhitening(mean=mean, components=comp, eigvals=eig, n=n)


def random_projection(
    df: DataFrame,
    out_dim: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 31,
) -> DataFrame:
    """Johnson-Lindenstrauss random projection. EAGER: one
    ``first()`` probe runs at call time to read the input dimension
    (the matrix is built before the plan returns — pass a cheap
    input frame, not a derived pipeline, or it re-executes once).

    (Achlioptas 2003,
    "Database-friendly random projections": entries drawn from
    ±1/sqrt(out_dim) preserve pairwise distances in expectation with
    JL concentration) — the materialized dimensionality cut a 100 TB
    embedding pipeline runs BEFORE the expensive stages: a 64->16
    sketch shrinks every downstream ANN/cluster/dedup shuffle 4x,
    and unlike PCA whitening it needs NO data pass to fit (the
    matrix is seed-derived, so any worker, any engine, any day
    regenerates it bit-identically).

    The projection matrix is generated driver-side from the seed
    (numpy RandomState Rademacher draws), closed over into ONE Arrow
    pass (BLAS matmul per batch — the pq_encode shape); float64
    accumulation, float32 storage. Deterministic and
    partition-invariant by construction: same seed => same matrix =>
    same sketch for the same row anywhere. Returns ``(id, sketch)``.
    """
    import numpy as np
    import pandas as pd

    head = df.select(vec_col).first()
    if head is None:
        raise ValueError("random_projection: empty input")
    in_dim = len(head[0])
    rng = np.random.RandomState(seed)
    mat = (
        rng.randint(0, 2, size=(in_dim, out_dim)).astype(np.float64) * 2.0 - 1.0
    ) / np.sqrt(out_dim)
    id_type = df.schema[id_col].dataType.simpleString()

    def proj(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            s = (v @ mat).astype(np.float32)
            yield pd.DataFrame({"id": pdf[id_col], "sketch": list(s)})

    return (
        df.select(F.col(id_col), F.col(vec_col))
        .mapInPandas(proj, schema=f"id {id_type}, sketch array<float>")
        .select(F.col("id").alias(id_col), "sketch")
    )
