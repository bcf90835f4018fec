"""ITQ binary hashing — Iterative Quantization (Gong & Lazebnik 2011,
CVPR; the standard learned-rotation upgrade over raw sign hashing).

Extension surface (SURVEY.md §2.5). The repo already ships the two
UNTRAINED binary-code families — per-dimension sign bits
(`operators/bq.py`) and random-hyperplane LSH (`operators/
similarity.py`) — whose encode/search ARITHMETIC is oracle-pinned by
`bq_hamming_knn` / `ann_lsh_topk`. ITQ keeps exactly that arithmetic
(project, sign, pack, popcount(xor)) and learns WHERE the hyperplanes
go: PCA to ``bits`` dimensions, then an orthogonal rotation R chosen to
minimize the quantization loss ||B - V R||_F^2 (B = sign(V R)), which
balances variance across bits instead of letting the top eigenvector
dominate every bit. The training loop alternates a closed-form B
update with an orthogonal-Procrustes R update — not SQL-expressible,
so like BPE merge training it is property-gated in tests/test_itq.py
(loss monotone non-increasing, beats the identity rotation, R
orthogonal) rather than oracle-gated.

Scale (100 TB):
- train: PCA moments are the distributed pass (operators/pca.py); the
  ITQ iteration itself runs on a DETERMINISTIC md5-ranked driver
  sample (TakeOrderedAndProject — each task forwards at most
  ``sample_n`` rows), the same bounded small-model-to-driver move as
  k-means/PQ/BPE. ITQ estimates a bits x bits rotation; a few
  thousand rows saturate it regardless of corpus size.
- encode: map-only — the rotation folds into the PCA components
  driver-side (C_eff = R^T C), so encoding is ``bits`` Catalyst dot
  folds + sign + bit-pack, whole-stage codegen, no shuffle, no UDF.
- search: Hamming kNN over packed words (bq.hamming_knn: map +
  TakeOrderedAndProject) or banded candidate generation for near-dup
  joins (dedup.banded_hamming_pairs) — both bounded, never all-pairs.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flechasdb_spark.functions.texthash import md5_long
from flechasdb_spark.operators.pca import PCAModel, pca_train

__all__ = ["ITQModel", "itq_train", "itq_encode", "itq_code_expr", "sample_to_driver"]


@dataclass(frozen=True)
class ITQModel:
    """mean + EFFECTIVE components (rotation pre-folded: row j is the
    j-th bit's hyperplane normal in input space) + training loss per
    iteration (losses[0] = identity-rotation loss)."""

    mean: tuple[float, ...]
    components: tuple[tuple[float, ...], ...]  # bits x dim
    losses: tuple[float, ...]

    @property
    def bits(self) -> int:
        return len(self.components)


def sample_to_driver(
    vectors: DataFrame, vec_col: str, id_col: str, n: int, salt: str
) -> np.ndarray:
    """Deterministic md5-ranked sample — orderBy(hash).limit(n) compiles
    to TakeOrderedAndProject (each task forwards <= n rows)."""
    h = md5_long(
        F.concat(F.lit(salt), F.lit(":"), F.col(id_col).cast("string"))
    )
    rows = (
        vectors.select(F.col(vec_col).cast("array<double>").alias("v"), h.alias("__h"))
        .orderBy("__h")
        .limit(n)
        .collect()
    )
    return np.asarray([r["v"] for r in rows], dtype=np.float64)


def itq_train(
    vectors: DataFrame,
    bits: int,
    iters: int = 30,
    sample_n: int = 10_000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
) -> ITQModel:
    """PCA to ``bits`` dims (distributed moments) + ITQ rotation
    (driver loop over a bounded deterministic sample)."""
    if not 1 <= bits <= 63:
        raise ValueError(f"bits must be in [1, 63], got {bits}")
    pca = pca_train(vectors, k=bits, vec_col=vec_col)
    x = sample_to_driver(vectors, vec_col, id_col, sample_n, f"itq{seed}")
    v = (x - np.asarray(pca.mean)) @ np.asarray(pca.components).T  # n x bits

    def loss(r: np.ndarray) -> float:
        z = v @ r
        b = np.where(z >= 0.0, 1.0, -1.0)
        return float(((b - z) ** 2).sum())

    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.normal(size=(bits, bits)))
    r = np.eye(bits)
    losses = [loss(r)]
    # start from the seeded random rotation if it already beats I
    # (Gong & Lazebnik init); keep I otherwise so losses stay monotone
    if loss(q) < losses[0]:
        r = q
        losses.append(loss(r))
    for _ in range(iters):
        z = v @ r
        b = np.where(z >= 0.0, 1.0, -1.0)
        # orthogonal Procrustes: max tr(R^T V^T B) -> R = U W^T
        u, _, wt = np.linalg.svd(v.T @ b)
        r_new = u @ wt
        l_new = loss(r_new)
        if l_new >= losses[-1] - 1e-9:
            break
        r = r_new
        losses.append(l_new)
    c_eff = r.T @ np.asarray(pca.components)  # bits x dim
    return ITQModel(
        mean=pca.mean,
        components=tuple(tuple(float(e) for e in row) for row in c_eff),
        losses=tuple(losses),
    )


def itq_code_expr(vec_col: Column | str, model: ITQModel) -> Column:
    """Packed code (one BIGINT, LSB = bit 0): bit j set iff
    <x - mu, c_j> >= 0. Pure Catalyst: ``bits`` literal-array dot folds
    + conditional bit weights summed — map-only, codegen'd.

    r13: the components ride as ONE matrix literal and the per-bit
    unrolled when-chain is one aggregate over sequence(0, bits-1) —
    same dot fold per component, same <x-mu, c_j> = <x, c_j> - <mu,
    c_j> arithmetic, same ascending-bit integer sum (0 + b_0 + ...),
    so the packed code is identical while plan construction drops from
    O(bits * dim) py4j round-trips to O(bits)."""
    from flechasdb_spark.functions.linalg import (
        dot,
        lit_double_matrix,
        lit_doubles,
    )
    from flechasdb_spark.operators.pca import _seq_dot

    comps_lit = lit_double_matrix(model.components)
    mdots_lit = lit_doubles(
        [_seq_dot(model.mean, c) for c in model.components]
    )
    col = F.col(vec_col) if isinstance(vec_col, str) else vec_col

    def _bit(acc, j):
        proj = dot(col, F.element_at(comps_lit, (j + 1).cast("int"))) - (
            F.element_at(mdots_lit, (j + 1).cast("int"))
        )
        one = F.call_function(
            "shiftleft", F.lit(1).cast("long"), j.cast("int")
        )
        return acc + F.when(proj >= 0.0, one).otherwise(
            F.lit(0).cast("long")
        )

    return F.aggregate(
        F.sequence(F.lit(0), F.lit(len(model.components) - 1)),
        F.lit(0).cast("long"),
        _bit,
    )


def itq_encode(
    df: DataFrame,
    model: ITQModel,
    vec_col: str = "embedding",
    out_col: str = "code",
) -> DataFrame:
    """Append the packed ITQ code. Hamming search composes with
    bq.hamming_knn (single-word form: bit_count(xor)) or
    dedup.banded_hamming_pairs for bounded near-dup joins."""
    return df.withColumn(out_col, itq_code_expr(vec_col, model))
