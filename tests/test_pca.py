"""Trained-PCA property gates (operators/pca.py): the eigenbasis path
is not SQL-expressible (driver eigh), so instead of a DuckDB oracle it
is pinned by linear-algebra invariants + parity with a local NumPy PCA
over the identical covariance definition. The frozen Gram-Schmidt
oracle rows live in the registry (pca_project_residual,
pca_reduced_knn)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from flechasdb_spark.operators.pca import (
    PCAModel,
    gram_schmidt,
    pca_project,
    pca_train,
    residual_energy_expr,
    subspace_coeff_exprs,
)

D, N = 8, 400


def _data() -> np.ndarray:
    """Anisotropic Gaussian with well-separated spectrum (so eigenvector
    comparisons cannot flake on near-degenerate eigenvalues)."""
    rng = np.random.default_rng(7)
    scales = np.array([8.0, 5.0, 3.0, 2.0, 1.3, 0.8, 0.4, 0.2])
    q, _ = np.linalg.qr(rng.normal(size=(D, D)))
    x = rng.normal(size=(N, D)) * scales
    return x @ q.T + rng.normal(size=D)


@pytest.fixture(scope="module")
def xmat():
    return _data()


@pytest.fixture(scope="module")
def vdf(spark, xmat):
    rows = [(i, [float(v) for v in row]) for i, row in enumerate(xmat)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(5)


def _np_pca(x: np.ndarray, k: int):
    mu = x.mean(axis=0)
    xc = x - mu
    cov = xc.T @ xc / len(x)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    return mu, vals[order], vecs[:, order].T


def test_components_orthonormal(vdf):
    m = pca_train(vdf, k=4)
    c = np.asarray(m.components)
    assert np.allclose(c @ c.T, np.eye(4), atol=1e-9)


def test_eigvals_descending_nonnegative(vdf):
    m = pca_train(vdf, k=D)
    v = np.asarray(m.eigvals)
    assert (v >= 0).all()
    assert (np.diff(v) <= 1e-12).all()


def test_numpy_parity(vdf, xmat):
    m = pca_train(vdf, k=4)
    mu, vals, vecs = _np_pca(xmat, 4)
    assert np.allclose(m.mean, mu, atol=1e-10)
    assert np.allclose(m.eigvals, vals, rtol=1e-8)
    # well-separated spectrum: each component matches up to sign, and
    # the deterministic sign fix makes the match exact in direction
    cos = np.abs(np.sum(np.asarray(m.components) * vecs, axis=1))
    assert np.allclose(cos, 1.0, atol=1e-8)


def test_projection_variance_equals_eigval(vdf):
    m = pca_train(vdf, k=3)
    y = np.asarray(
        [
            r["pca"]
            for r in pca_project(vdf, m).select("pca").collect()
        ]
    )
    assert np.allclose(y.var(axis=0), m.eigvals[:3], rtol=1e-6)
    # centered projections: mean ~ 0
    assert np.allclose(y.mean(axis=0), 0.0, atol=1e-9)


def test_whiten_unit_variance(vdf):
    m = pca_train(vdf, k=3)
    y = np.asarray(
        [
            r["pca"]
            for r in pca_project(vdf, m, whiten=True).select("pca").collect()
        ]
    )
    assert np.allclose(y.var(axis=0), 1.0, rtol=1e-6)


def test_full_rank_reconstructs(vdf, xmat):
    m = pca_train(vdf, k=D)
    rows = pca_project(vdf, m).select("vec_id", "pca").collect()
    c = np.asarray(m.components)
    mu = np.asarray(m.mean)
    for r in rows:
        xhat = mu + np.asarray(r["pca"]) @ c
        assert np.allclose(xhat, xmat[r["vec_id"]], atol=1e-8)


def test_impl_equivalence_sql_vs_pandas(vdf):
    m = pca_train(vdf, k=4)
    a = {
        r["vec_id"]: np.asarray(r["pca"])
        for r in pca_project(vdf, m, impl="sql").select(
            "vec_id", "pca"
        ).collect()
    }
    b = {
        r["vec_id"]: np.asarray(r["pca"])
        for r in pca_project(vdf, m, impl="pandas").select(
            "vec_id", "pca"
        ).collect()
    }
    assert a.keys() == b.keys()
    for k in a:  # BLAS reassociates: close, not bit-equal
        assert np.allclose(a[k], b[k], atol=1e-9)


def test_train_deterministic(vdf):
    m1 = pca_train(vdf, k=4)
    m2 = pca_train(vdf, k=4)
    assert m1 == m2  # exact: sorted-pid float64 reduction + sign fix


def test_moments_partitions_coalesce(vdf):
    m1 = pca_train(vdf, k=2)
    m2 = pca_train(vdf, k=2, moments_partitions=1)
    assert np.allclose(m1.eigvals, m2.eigvals, rtol=1e-10)
    assert np.allclose(m1.components, m2.components, atol=1e-10)


def test_train_validates(vdf):
    with pytest.raises(ValueError):
        pca_train(vdf, k=0)
    with pytest.raises(ValueError):
        pca_train(vdf, k=D + 1)
    with pytest.raises(ValueError):
        pca_train(vdf.where(F.lit(False)), k=1)


def test_gram_schmidt_orthonormal_and_raises():
    rng = np.random.default_rng(3)
    vs = rng.normal(size=(4, 16)).tolist()
    b = np.asarray(gram_schmidt(vs))
    assert np.allclose(b @ b.T, np.eye(4), atol=1e-12)
    # span preserved: each input reconstructs from the basis
    for v in vs:
        v = np.asarray(v)
        assert np.allclose(b.T @ (b @ v), v, atol=1e-9)
    with pytest.raises(ValueError):
        gram_schmidt([[1.0, 0.0], [2.0, 0.0]])


def test_residual_energy_parseval(spark):
    """For an orthonormal basis spanning the vector exactly, residual
    is ~0; for an orthogonal-complement vector it is the full energy."""
    basis = gram_schmidt([[1.0, 1.0, 0.0, 0.0], [1.0, -1.0, 0.0, 0.0]])
    df = spark.createDataFrame(
        [(0, [3.0, 1.0, 0.0, 0.0]), (1, [0.0, 0.0, 2.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    cs = subspace_coeff_exprs("embedding", basis)
    out = {
        r["vec_id"]: r["res"]
        for r in df.select(
            "vec_id", residual_energy_expr("embedding", cs).alias("res")
        ).collect()
    }
    assert abs(out[0]) < 1e-12  # in-span
    assert abs(out[1] - 4.0) < 1e-12  # fully out of span


def test_whiten_zero_eigval_guard(spark):
    """A zero-variance direction whitens to 0, not inf."""
    df = spark.createDataFrame(
        [(i, [float(i), 5.0]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    m = pca_train(df, k=2)
    assert m.eigvals[1] <= 1e-12
    y = np.asarray(
        [
            r["pca"]
            for r in pca_project(df, m, whiten=True).select("pca").collect()
        ]
    )
    assert np.isfinite(y).all()
    assert np.allclose(y[:, 1], 0.0)
