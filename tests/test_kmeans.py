"""kmeans_np unit tests — parity with the reference's k-means semantics
(/root/reference/src/kmeans.rs): seeding determinism, k==M identity
short-circuit, M<k rejection, empty-cluster re-seeding, convergence."""

from __future__ import annotations

import numpy as np
import pytest

from flechasdb_spark.operators.kmeans_np import kmeans_fit


def test_deterministic_given_seed():
    rng = np.random.RandomState(0)
    x = rng.randn(500, 16)
    c1, l1 = kmeans_fit(x, 8, seed=42)
    c2, l2 = kmeans_fit(x, 8, seed=42)
    assert np.array_equal(c1, c2)
    assert np.array_equal(l1, l2)
    c3, _ = kmeans_fit(x, 8, seed=43)
    assert not np.array_equal(c1, c3)


def test_k_equals_m_identity():
    # matches src/kmeans.rs:158-170: k == M short-circuits to identity
    x = np.arange(12, dtype=np.float64).reshape(4, 3)
    centers, labels = kmeans_fit(x, 4, seed=1)
    assert np.array_equal(centers, x)
    assert np.array_equal(labels, np.arange(4))


def test_m_less_than_k_rejected():
    # matches src/kmeans.rs:116-120: requires M >= k
    with pytest.raises(ValueError, match="M >= k"):
        kmeans_fit(np.zeros((3, 2)), 4, seed=1)


def test_separable_clusters_recovered():
    rng = np.random.RandomState(7)
    centers_true = np.array([[0.0, 0.0], [10.0, 10.0], [-10.0, 10.0]])
    x = np.vstack(
        [c + 0.1 * rng.randn(100, 2) for c in centers_true]
    )
    centers, labels = kmeans_fit(x, 3, seed=5)
    # each true center has a learned center within 0.5
    for c in centers_true:
        assert np.min(np.linalg.norm(centers - c, axis=1)) < 0.5
    # points from the same blob share a label
    for b in range(3):
        blob = labels[b * 100 : (b + 1) * 100]
        assert len(set(blob.tolist())) == 1


def test_duplicate_points_no_empty_cluster_crash():
    # degenerate input: all points identical; k-means++ total weight 0
    x = np.ones((50, 4))
    centers, labels = kmeans_fit(x, 4, seed=2)
    assert centers.shape == (4, 4)
    assert labels.shape == (50,)
    assert (labels >= 0).all() and (labels < 4).all()


def test_labels_are_nearest_center():
    rng = np.random.RandomState(3)
    x = rng.randn(200, 8)
    centers, labels = kmeans_fit(x, 5, seed=9)
    d2 = ((x[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
    assert np.array_equal(labels, np.argmin(d2, axis=1))
