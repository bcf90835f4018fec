"""OPQ training gates (operators/opq.py): the alternation loop is not
SQL-expressible, so it is pinned by optimization invariants, parity
with a NumPy recomputation, and a measured win over plain PQ on
correlated data (OPQ's entire point)."""

from __future__ import annotations

import numpy as np
import pytest

from flechasdb_spark.operators.opq import (
    _pq_assign,
    opq_encode,
    opq_reconstruct_np,
    opq_train,
)

D_SUB, C, DIM, N = 4, 8, 8, 600


@pytest.fixture(scope="module")
def xmat():
    """Strongly cross-subspace-correlated data: a rotation mixes the
    anisotropic axes across the PQ subspace boundaries, so plain PQ
    (axis-aligned split) pays for the correlation and OPQ can undo it."""
    rng = np.random.default_rng(23)
    scales = np.array([10.0, 7.0, 5.0, 3.0, 1.0, 0.6, 0.3, 0.1])
    q, _ = np.linalg.qr(rng.normal(size=(DIM, DIM)))
    return (rng.normal(size=(N, DIM)) * scales) @ q.T


@pytest.fixture(scope="module")
def vdf(spark, xmat):
    rows = [(i, [float(v) for v in r]) for i, r in enumerate(xmat)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(4)


@pytest.fixture(scope="module")
def model(vdf):
    return opq_train(
        vdf, num_divisions=D_SUB, num_codes=C, iters=8, sample_n=N
    )


def test_loss_monotone_and_beats_plain_pq(model):
    l = np.asarray(model.losses)
    assert (np.diff(l) < 0).all()
    # losses[0] IS plain PQ (R = I, same Lloyd budget); the rotation
    # must buy a real improvement on cross-correlated data
    assert len(l) >= 2
    assert l[-1] < 0.9 * l[0], f"OPQ gained only {1 - l[-1]/l[0]:.1%}"


def test_rotation_orthogonal(model):
    r = model.rotation_np()
    assert np.allclose(r @ r.T, np.eye(DIM), atol=1e-9)


def test_encode_matches_numpy(vdf, xmat, model):
    got = {}
    for row in opq_encode(vdf, model).collect():
        got.setdefault(row["vec_id"], {})[row["division"]] = row["code"]
    codes = _pq_assign(xmat @ model.rotation_np(), model.codebooks_np())
    assert len(got) == N
    for i in range(N):
        assert [got[i][d] for d in range(D_SUB)] == list(codes[i])


def test_reconstruction_error_matches_loss(xmat, model):
    """Reconstruction in the ORIGINAL space has the same total error as
    the rotated-space loss (rotation preserves norms)."""
    codes = _pq_assign(xmat @ model.rotation_np(), model.codebooks_np())
    rec = opq_reconstruct_np(codes, model)
    err = float(((xmat - rec) ** 2).sum())
    assert err == pytest.approx(model.losses[-1], rel=1e-9)


def test_train_deterministic(vdf):
    m1 = opq_train(vdf, num_divisions=2, num_codes=4, iters=3, sample_n=200)
    m2 = opq_train(vdf, num_divisions=2, num_codes=4, iters=3, sample_n=200)
    assert m1 == m2


def test_train_validates(vdf):
    with pytest.raises(ValueError):
        opq_train(vdf, num_divisions=3, num_codes=4)  # 8 % 3 != 0


def test_opq_train_custom_id_col(spark):
    """opq_train must accept a non-default id column for its
    deterministic sample ranking (ADVICE r6: it was hardcoded to
    'vec_id' and failed on any other schema)."""
    import numpy as np
    from flechasdb_spark.operators.opq import opq_train

    rng = np.random.default_rng(3)
    rows = [
        (int(i), [float(v) for v in rng.normal(size=8)]) for i in range(64)
    ]
    df = spark.createDataFrame(rows, "item_id long, embedding array<double>")
    m = opq_train(
        df, num_divisions=2, num_codes=4, iters=2, sample_n=64,
        id_col="item_id",
    )
    r = m.rotation_np()
    assert np.allclose(r @ r.T, np.eye(8), atol=1e-8)
