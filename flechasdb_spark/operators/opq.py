"""OPQ — Optimized Product Quantization (Ge et al. 2013, CVPR;
non-parametric alternation). The full learned-ROTATION upgrade over
this repo's variance-balanced dimension PERMUTATION
(`operators/build.py::variance_balanced_permutation`, the
non-parametric OPQ *baseline*): a permutation can only reassign
dimensions to subspaces, a rotation also decorrelates them, so PQ's
independent-subspace assumption costs less reconstruction error.

Reference context: the reference trains plain PQ codebooks
(`/root/reference/src/db/build.rs:423-500`); OPQ is the standard
quality upgrade of exactly that quantizer family (FAISS `OPQMatrix`).

Training (driver, bounded sample — the k-means/PQ/BPE/ITQ pattern):
alternate (a) fix R: Lloyd's step per subspace on the rotated sample,
codebooks WARM-STARTED from the previous round so the joint objective
||X R − reconstruction||² is monotone non-increasing; (b) fix
codes/centers: orthogonal Procrustes R = U Wᵀ from SVD(Xᵀ · recon).
Not SQL-expressible — property-gated in tests/test_opq.py (monotone
loss, beats plain PQ on correlated data, R orthogonal, encode parity).

Scale (100 TB):
- train: sample-bounded driver loop, corpus never collected.
- encode: one Arrow-batched map pass (rotate = one BLAS matmul per
  batch, then the same argmin-per-subspace as PQ) — no shuffle; the
  output (id, division, code) grain matches `operators/pq.py::
  pq_encode`, so storage/ADC search reuse the existing PQ machinery
  with the QUERY rotated once driver-side (rotation is
  distance-preserving, so ADC arithmetic is unchanged).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flechasdb_spark.operators.kmeans_np import kmeans_fit

__all__ = ["OPQModel", "opq_train", "opq_encode", "opq_reconstruct_np"]


@dataclass(frozen=True)
class OPQModel:
    rotation: tuple[tuple[float, ...], ...]  # n x n, applied as x @ R
    codebooks: tuple  # d x c x w nested tuples
    losses: tuple[float, ...]  # per outer round, monotone non-increasing

    @property
    def num_divisions(self) -> int:
        return len(self.codebooks)

    @property
    def dim(self) -> int:
        return len(self.rotation)

    def rotation_np(self) -> np.ndarray:
        return np.asarray(self.rotation, dtype=np.float64)

    def codebooks_np(self) -> np.ndarray:
        return np.asarray(self.codebooks, dtype=np.float64)


def _pq_assign(y: np.ndarray, cb: np.ndarray) -> np.ndarray:
    """codes [m, d] — argmin center per subspace (ties -> lowest code,
    np.argmin's rule, matching the engine's min(struct) tie-break)."""
    d, c, w = cb.shape
    codes = np.empty((y.shape[0], d), dtype=np.int32)
    for di in range(d):
        sub = y[:, di * w : (di + 1) * w]
        sc = (cb[di] ** 2).sum(axis=1)[None, :] - 2.0 * (sub @ cb[di].T)
        codes[:, di] = np.argmin(sc, axis=1)
    return codes


def _pq_reconstruct(codes: np.ndarray, cb: np.ndarray) -> np.ndarray:
    d, c, w = cb.shape
    out = np.empty((codes.shape[0], d * w), dtype=np.float64)
    for di in range(d):
        out[:, di * w : (di + 1) * w] = cb[di][codes[:, di]]
    return out


def opq_train(
    vectors: DataFrame,
    num_divisions: int,
    num_codes: int,
    iters: int = 10,
    lloyd_iters: int = 5,
    sample_n: int = 10_000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
) -> OPQModel:
    """Non-parametric OPQ on a bounded deterministic sample.

    Round 0 fits plain PQ at R = I (so ``losses[0]`` IS the plain-PQ
    loss and every later round's improvement is measurable); each
    round then updates R by Procrustes and re-fits codebooks
    warm-started — both steps non-increasing in the joint objective.
    ``id_col`` names the deterministic-sample ranking key (matches
    ``itq_train``'s signature — it was hardcoded, ADVICE r6).
    """
    from flechasdb_spark.operators.itq import sample_to_driver

    x = sample_to_driver(vectors, vec_col, id_col, sample_n, f"opq{seed}")
    n = x.shape[1]
    d = num_divisions
    if n % d != 0:
        raise ValueError(f"dim {n} not divisible by num_divisions {d}")
    w = n // d
    r = np.eye(n)
    cb = np.empty((d, num_codes, w), dtype=np.float64)
    y = x  # x @ I
    for di in range(d):
        centers, _ = kmeans_fit(
            y[:, di * w : (di + 1) * w],
            num_codes,
            seed=seed + 100 + di,
            max_iter=lloyd_iters,
        )
        cb[di] = centers

    def loss(yv: np.ndarray, cbv: np.ndarray) -> float:
        rec = _pq_reconstruct(_pq_assign(yv, cbv), cbv)
        return float(((yv - rec) ** 2).sum())

    losses = [loss(y, cb)]
    for _ in range(iters):
        # (b) fix codes/centers -> Procrustes rotation update
        rec = _pq_reconstruct(_pq_assign(y, cb), cb)
        u, _, wt = np.linalg.svd(x.T @ rec)
        r_new = u @ wt
        y_new = x @ r_new
        # (a) fix R -> warm-started Lloyd's refinement per subspace
        cb_new = cb.copy()
        for di in range(d):
            sub = y_new[:, di * w : (di + 1) * w]
            centers = cb_new[di]
            for _ in range(lloyd_iters):
                sc = (centers**2).sum(axis=1)[None, :] - 2.0 * (
                    sub @ centers.T
                )
                lab = np.argmin(sc, axis=1)
                for ci in range(num_codes):
                    m = lab == ci
                    if m.any():  # empty clusters keep their center
                        centers = centers.copy()
                        centers[ci] = sub[m].mean(axis=0)
            cb_new[di] = centers
        l_new = loss(y_new, cb_new)
        if l_new >= losses[-1] - 1e-9:
            break
        r, cb, y = r_new, cb_new, y_new
        losses.append(l_new)
    return OPQModel(
        rotation=tuple(tuple(float(e) for e in row) for row in r),
        codebooks=tuple(
            tuple(tuple(float(e) for e in ctr) for ctr in div) for div in cb
        ),
        losses=tuple(losses),
    )


def opq_encode(
    df: DataFrame,
    model: OPQModel,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, division, code) — the `pq_encode` output grain, so manifest
    storage and ADC search reuse the PQ machinery unchanged (queries
    rotate driver-side). One Arrow map pass: rotate (BLAS) + argmin."""
    rot = model.rotation_np()
    cb = model.codebooks_np()
    d = cb.shape[0]

    def _enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.asarray(list(pdf["__v"]), dtype=np.float64)
            codes = _pq_assign(x @ rot, cb)
            m = len(pdf)
            yield pd.DataFrame(
                {
                    "__id": np.repeat(pdf["__id"].to_numpy(), d),
                    "division": np.tile(np.arange(d, dtype=np.int32), m),
                    "code": codes.reshape(-1),
                }
            )

    out = df.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v")
    ).mapInPandas(_enc, "__id long, division int, code int")
    return out.withColumnRenamed("__id", id_col)


def opq_reconstruct_np(codes: np.ndarray, model: OPQModel) -> np.ndarray:
    """Reconstruction back in the ORIGINAL space: (codes -> rotated
    reconstruction) @ R^T (R orthogonal => inverse is transpose)."""
    rec = _pq_reconstruct(codes, model.codebooks_np())
    return rec @ model.rotation_np().T
