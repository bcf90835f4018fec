"""PCA / whitening / orthonormal-subspace vector transforms.

Extension surface (SURVEY.md §2.5): the reference stores raw vectors
and quantizes with PQ (`/root/reference/src/db/build.rs:423-500`); the
standard pre-transform family in front of such an index (FAISS
`VectorTransform`: `PCAMatrix`, whitening, OPQ's learned rotation —
this repo already ships the OPQ-style dim *permutation* in
`operators/build.py`) is a learned linear map y = C (x - mu).  This
module adds it Spark-first:

- ``pca_train``: moments are computed DISTRIBUTED — one ``mapInPandas``
  pass emits per-input-partition ``(n, sum_x, sum_outer)`` rows (O(P)
  rows of d + d^2 doubles; P = scan partitions), the driver sums them
  in partition-id order (deterministic float64 reduction independent
  of task completion order) and runs the O(d^3) eigendecomposition
  locally — the same bounded small-model-to-driver move as k-means /
  PQ / BPE training.  The corpus is never collected and never
  shuffled: the only data movement is the O(P * d^2) moment rows.
- ``pca_project``: map-only.  ``impl="sql"`` inlines each component as
  a literal array and evaluates ``dot(x, c_j) - <mu, c_j>`` as a
  Catalyst fold (whole-stage codegen, the engine-exact form the DuckDB
  oracle can mirror); ``impl="pandas"`` does one Arrow-batched BLAS
  matmul per batch — the throughput path when d * k is large enough
  that k inlined fold expressions stop being sensible codegen.
- ``gram_schmidt``: CLASSICAL Gram-Schmidt over a handful of driver
  vectors in sequential-fold float64 — the deterministic frozen basis
  used by the oracle rows (DuckDB recomputes the identical arithmetic
  from the same table rows; see `queries.py` ``pca_project_residual``).

Scale (100 TB):
- train: one pass, shuffle-free (mapInPandas is a map stage; the
  moment rows come back through collect, not an exchange).  P at
  corpus scale is ~#files; 10k partitions x 1536^2 doubles ~ 190 GB
  would NOT fit a driver — for huge d, coarsen with
  ``moments_partitions`` (coalesce the scan before the moment pass) or
  sample (PCA needs O(d) samples, not the corpus; FAISS trains on a
  slice for the same reason).  At d <= 256 the driver cost is MBs.
- project: map-only in both impls, no shuffle at any corpus size.
- whitening divides each coefficient by sqrt(eigenvalue) — a literal
  per component, folded into the same map stage.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flechasdb_spark.functions.linalg import dot

__all__ = [
    "PCAModel",
    "pca_train",
    "pca_project",
    "gram_schmidt",
    "subspace_coeff_exprs",
    "residual_energy_expr",
]


def _seq_dot(a: Sequence[float], b: Sequence[float]) -> float:
    """Sequential left-fold float64 dot — bit-identical to the Catalyst
    ``F.aggregate`` fold and DuckDB's ``list_sum`` evaluation order, so
    driver-computed basis vectors stay engine-exact."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


@dataclass(frozen=True)
class PCAModel:
    """Trained transform: y = diag(w) * components @ (x - mean), where
    w = 1 (plain PCA) or 1/sqrt(eigvals) (whitening, applied at
    projection time)."""

    mean: tuple[float, ...]
    components: tuple[tuple[float, ...], ...]  # k rows, each dim d
    eigvals: tuple[float, ...]  # descending, >= 0 (clamped)

    @property
    def k(self) -> int:
        return len(self.components)

    @property
    def dim(self) -> int:
        return len(self.mean)


def pca_train(
    vectors: DataFrame,
    k: int,
    vec_col: str = "embedding",
    moments_partitions: int | None = None,
) -> PCAModel:
    """Train a k-component PCA over ``vectors[vec_col]``.

    One distributed moment pass (see module docstring), then a driver
    ``eigh``.  Deterministic: per-partition moments are float64 sums in
    row order, the driver reduces them sorted by partition id, and each
    eigenvector's sign is fixed so its largest-|.| element is positive.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    src = vectors.select(F.col(vec_col).cast("array<double>").alias("v"))
    if moments_partitions is not None:
        src = src.coalesce(moments_partitions)

    def _moments(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        n = 0
        s = None
        o = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.asarray(list(pdf["v"]), dtype=np.float64)
            if s is None:
                d = x.shape[1]
                s = np.zeros(d, dtype=np.float64)
                o = np.zeros((d, d), dtype=np.float64)
            n += x.shape[0]
            s += x.sum(axis=0)
            o += x.T @ x
        if n == 0:
            return
        yield pd.DataFrame(
            {
                "pid": [pid],
                "n": [n],
                "s": [s.tolist()],
                "o": [o.reshape(-1).tolist()],
            }
        )

    rows = (
        src.mapInPandas(
            _moments, "pid int, n long, s array<double>, o array<double>"
        )
        .toPandas()
        .sort_values("pid")
    )
    if len(rows) == 0:
        raise ValueError("pca_train: empty input")
    n_total = int(rows["n"].sum())
    d = len(rows["s"].iloc[0])
    if k > d:
        raise ValueError(f"k={k} exceeds dim={d}")
    s = np.zeros(d, dtype=np.float64)
    o = np.zeros((d, d), dtype=np.float64)
    for _, r in rows.iterrows():  # sorted by pid: deterministic order
        s += np.asarray(r["s"], dtype=np.float64)
        o += np.asarray(r["o"], dtype=np.float64).reshape(d, d)
    mu = s / n_total
    cov = o / n_total - np.outer(mu, mu)
    cov = (cov + cov.T) / 2.0  # enforce symmetry against fp drift
    eigvals, eigvecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eigvals)[::-1][:k]
    comps = eigvecs[:, order].T.copy()  # k x d
    vals = np.clip(eigvals[order], 0.0, None)
    for j in range(k):  # deterministic sign: largest-|.| element > 0
        i = int(np.argmax(np.abs(comps[j])))
        if comps[j, i] < 0:
            comps[j] = -comps[j]
    return PCAModel(
        mean=tuple(float(x) for x in mu),
        components=tuple(tuple(float(x) for x in row) for row in comps),
        eigvals=tuple(float(x) for x in vals),
    )


def _lit_arr(xs: Sequence[float]) -> Column:
    # one py4j call / one Literal node (r13 — see linalg.lit_doubles)
    from flechasdb_spark.functions.linalg import lit_doubles

    return lit_doubles(xs)


def pca_project(
    df: DataFrame,
    model: PCAModel,
    vec_col: str = "embedding",
    out_col: str = "pca",
    whiten: bool = False,
    eps: float = 1e-12,
    impl: str = "sql",
) -> DataFrame:
    """Append ``out_col: array<double>`` = (whitened) PCA coefficients.

    Map-only in both impls.  ``sql``: k Catalyst folds with the
    constant <mu, c_j> folded driver-side (so centering costs nothing
    per row); ``pandas``: one BLAS matmul per Arrow batch.  The two are
    equivalence-tested (atol — BLAS reassociates the sum).
    """
    scale = [
        (1.0 / float(np.sqrt(v)) if v > eps else 0.0) if whiten else 1.0
        for v in model.eigvals
    ]
    if impl == "sql":
        coeffs = [
            (
                (dot(vec_col, _lit_arr(c)) - F.lit(_seq_dot(model.mean, c)))
                * F.lit(s)
            )
            for c, s in zip(model.components, scale)
        ]
        return df.withColumn(out_col, F.array(*coeffs))
    if impl != "pandas":
        raise ValueError(f"impl must be 'sql' or 'pandas', got {impl!r}")

    mean = np.asarray(model.mean, dtype=np.float64)
    mat = np.asarray(model.components, dtype=np.float64) * np.asarray(
        scale, dtype=np.float64
    ).reshape(-1, 1)

    @F.pandas_udf("array<double>")
    def _proj(v: pd.Series) -> pd.Series:
        x = np.asarray(list(v), dtype=np.float64)
        y = (x - mean) @ mat.T
        return pd.Series(list(y))

    return df.withColumn(out_col, _proj(F.col(vec_col)))


def gram_schmidt(vectors: Sequence[Sequence[float]]) -> list[list[float]]:
    """CLASSICAL Gram-Schmidt in sequential-fold float64 — the frozen
    deterministic orthonormal basis for the oracle rows.  Element
    arithmetic is the single expression
    ``u_j[e] = x_j[e] - p_1*b_1[e] - ... - p_{j-1}*b_{j-1}[e]``
    (projections against the ORIGINAL x_j, subtractions left-to-right),
    then ``b_j = u_j / sqrt(<u_j, u_j>)`` — exactly what the DuckDB CTE
    chain in the registry oracle evaluates, so coefficients hash-match.
    Raises on (near-)linearly-dependent input."""
    basis: list[list[float]] = []
    for x in vectors:
        x = [float(e) for e in x]
        ps = [_seq_dot(x, b) for b in basis]
        u = list(x)
        for p, b in zip(ps, basis):
            u = [ue - p * be for ue, be in zip(u, b)]
        nrm = float(np.sqrt(_seq_dot(u, u)))
        if nrm < 1e-9:
            raise ValueError("gram_schmidt: linearly dependent input")
        basis.append([e / nrm for e in u])
    return basis


def subspace_coeff_exprs(
    vec_col: Column | str, basis: Sequence[Sequence[float]]
) -> list[Column]:
    """One fold expression per basis vector: c_j = <x, b_j> (double)."""
    return [dot(vec_col, _lit_arr(b)) for b in basis]


def residual_energy_expr(
    vec_col: Column | str, coeffs: Sequence[Column]
) -> Column:
    """Out-of-subspace energy ||x||^2 - sum_j c_j^2 for an ORTHONORMAL
    basis (Parseval).  Summation is left-to-right over j to stay
    engine-exact with the oracle's literal ``c1*c1 + c2*c2 + ...``."""
    acc: Column = F.lit(0.0)
    for c in coeffs:
        acc = acc + c * c
    return dot(vec_col, vec_col) - acc
