"""ITQ training gates (operators/itq.py): the rotation loop is not
SQL-expressible, so it is pinned by its optimization invariants and by
encode parity with a NumPy recomputation, while the encode/search
ARITHMETIC it reuses stays oracle-pinned via bq_hamming_knn /
ann_lsh_topk."""

from __future__ import annotations

import numpy as np
import pytest

from flechasdb_spark.operators.itq import itq_encode, itq_train

D, N, BITS = 8, 500, 6


@pytest.fixture(scope="module")
def xmat():
    rng = np.random.default_rng(11)
    scales = np.array([9.0, 6.0, 4.0, 2.5, 1.5, 1.0, 0.5, 0.25])
    q, _ = np.linalg.qr(rng.normal(size=(D, D)))
    return rng.normal(size=(N, D)) * scales @ q.T + 2.0


@pytest.fixture(scope="module")
def vdf(spark, xmat):
    rows = [(i, [float(v) for v in r]) for i, r in enumerate(xmat)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(4)


@pytest.fixture(scope="module")
def model(vdf):
    return itq_train(vdf, bits=BITS, iters=25, sample_n=N)


def test_loss_monotone_and_beats_identity(model):
    l = np.asarray(model.losses)
    assert (np.diff(l) < 0).all(), "loss must strictly decrease per kept step"
    assert len(l) >= 2, "anisotropic data: rotation must improve on identity"
    assert l[-1] < l[0]


def test_effective_components_orthonormal(model):
    c = np.asarray(model.components)
    # R orthogonal x PCA-orthonormal rows => effective rows orthonormal
    assert np.allclose(c @ c.T, np.eye(BITS), atol=1e-9)


def test_encode_matches_numpy(vdf, xmat, model):
    codes = {
        r["vec_id"]: r["code"]
        for r in itq_encode(vdf, model).select("vec_id", "code").collect()
    }
    mu = np.asarray(model.mean)
    c = np.asarray(model.components)
    z = (xmat - mu) @ c.T
    assert (np.abs(z) > 1e-9).all(), "fixture must stay off bit boundaries"
    expect = (np.where(z >= 0, 1, 0) * (1 << np.arange(BITS))).sum(axis=1)
    for i, code in codes.items():
        assert code == int(expect[i])
    # bits actually vary (not a degenerate all-same code)
    assert len(set(codes.values())) > 1


def test_bit_balance_improves(vdf, xmat, model):
    """ITQ's point: variance spreads across bits, so no bit is nearly
    constant, unlike raw PCA-sign where trailing bits can collapse."""
    mu = np.asarray(model.mean)
    z = (xmat - mu) @ np.asarray(model.components).T
    frac_on = (z >= 0).mean(axis=0)
    assert ((frac_on > 0.1) & (frac_on < 0.9)).all()


def test_train_deterministic(vdf):
    m1 = itq_train(vdf, bits=4, iters=10, sample_n=200)
    m2 = itq_train(vdf, bits=4, iters=10, sample_n=200)
    assert m1 == m2


def test_train_validates(vdf):
    with pytest.raises(ValueError):
        itq_train(vdf, bits=0)
    with pytest.raises(ValueError):
        itq_train(vdf, bits=64)


def test_encode_plan_is_map_only(spark, xmat, model):
    # plain (un-repartitioned) input: any Exchange/Join in the plan
    # would then belong to the encode itself
    df = spark.createDataFrame(
        [(i, [float(v) for v in r]) for i, r in enumerate(xmat)],
        "vec_id long, embedding array<double>",
    )
    plan = (
        itq_encode(df, model)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Join" not in plan
