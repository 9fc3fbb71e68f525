"""PCA whitening: fitted model vs numpy on the same data, whitened
output properties, and partition-layout determinism."""

import numpy as np
import pytest
from pyspark.sql import Row

from api_kakfa_spark_airflow_s3_athena_spark.operators.whitening import (
    fit_pca_whitening,
    whiten,
)


def _correlated(n=400, seed=7):
    """Deterministic 4-dim data with a planted covariance structure:
    two strongly correlated dims, one independent, one near-constant."""
    rng = np.random.RandomState(seed)
    a = rng.randn(n)
    b = 0.9 * a + 0.1 * rng.randn(n)
    c = rng.randn(n) * 2.0
    d = rng.randn(n) * 0.01
    return np.stack([a, b, c, d], axis=1)


def _df(spark, X, parts=4):
    rows = [Row(vec_id=i, embedding=[float(v) for v in x]) for i, x in enumerate(X)]
    return spark.createDataFrame(rows).repartition(parts)


def test_fit_matches_numpy_eigh(spark):
    X = _correlated()
    model = fit_pca_whitening(_df(spark, X), k=4)
    cov = np.cov(X, rowvar=False)  # same n-1 normalization
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1]
    assert model.n == len(X)
    assert np.allclose(model.eigvals, w[order], rtol=0, atol=1e-9)
    # eigenvectors up to the model's sign convention
    for c in range(4):
        col = v[:, order[c]]
        if col[np.argmax(np.abs(col))] < 0:
            col = -col
        assert np.allclose(model.components[:, c], col, atol=1e-9), c
    assert np.allclose(model.mean, X.mean(axis=0), atol=1e-12)


def test_whitened_output_is_decorrelated_unit_variance(spark):
    X = _correlated()
    df = _df(spark, X)
    model = fit_pca_whitening(df, k=4)
    Y = np.stack(
        [
            r.whitened
            for r in whiten(df, model).orderBy("vec_id").collect()
        ]
    )
    covY = np.cov(Y, rowvar=False)
    assert np.allclose(np.diag(covY), 1.0, atol=1e-6)
    off = covY - np.diag(np.diag(covY))
    assert np.max(np.abs(off)) < 1e-6


def test_fit_deterministic_across_partitionings(spark):
    X = _correlated()
    m1 = fit_pca_whitening(_df(spark, X, parts=1), k=3)
    m7 = fit_pca_whitening(_df(spark, X, parts=7), k=3)
    # float partial-sum order differs across layouts; agreement is to
    # summation roundoff, not bit-exact
    assert np.allclose(m1.eigvals, m7.eigvals, atol=1e-9)
    assert np.allclose(m1.components, m7.components, atol=1e-6)
    assert np.allclose(m1.mean, m7.mean, atol=1e-12)


def test_fit_rejects_degenerate_input(spark):
    df = _df(spark, np.zeros((1, 3)))
    with pytest.raises(ValueError, match="at least 2"):
        fit_pca_whitening(df, k=2)


def test_model_roundtrips_through_parquet(spark, tmp_path):
    """save_model/load_model is bit-exact: the reloaded model whitens
    to the identical output (the fit-once/serve-everywhere artifact
    contract, same as the band/IVF indexes)."""
    from api_kakfa_spark_airflow_s3_athena_spark.operators.whitening import (
        load_model,
        save_model,
    )

    X = _correlated(n=120)
    df = _df(spark, X)
    model = fit_pca_whitening(df, k=3)
    path = str(tmp_path / "wmodel")
    save_model(spark, model, path)
    back = load_model(spark, path)
    assert back.n == model.n
    assert np.array_equal(back.mean, model.mean)
    assert np.array_equal(back.eigvals, model.eigvals)
    assert np.array_equal(back.components, model.components)
    a = {r.vec_id: r.whitened for r in whiten(df, model).collect()}
    b = {r.vec_id: r.whitened for r in whiten(df, back).collect()}
    assert a == b
