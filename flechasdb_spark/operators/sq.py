"""Scalar quantization (SQ8) — per-dimension affine 8-bit compression.

Extension surface (SURVEY.md §2.5): the reference implements product
quantization only (`/root/reference/src/vector.rs`, codebook path
`src/db/build.rs:423-500`); SQ8 is the other standard compression of
the IVF family (FAISS `ScalarQuantizer` QT_8bit): per dimension j keep
``lo_j = min x_j`` and ``hi_j = max x_j`` and store
``code_j = floor((x_j - lo_j) * 255 / (hi_j - lo_j))`` clamped to
[0, 255]. 4x smaller than float32 at far higher fidelity than PQ
(error <= step = (hi_j - lo_j)/255 per dimension, vs PQ's cluster
radius), at the cost of no sub-dimension sharing.

floor (not round) quantization is deliberate: round() tie-breaking
differs across engines, floor over identical double arithmetic is
bit-deterministic everywhere (oracle-verified vs DuckDB).

Scale (100 TB):
- train: one map-side partial aggregation — the shuffle carries
  #partitions x dim rows, never the data.
- encode/decode: map-only `transform` expressions with the 2*dim
  bounds inlined as literals (no join, no shuffle, whole-stage
  codegen).
- knn: map + `TakeOrderedAndProject` (partial top-k per partition,
  k rows per partition to the driver) — same shape as `flat_knn`.
- storage: `array<smallint>` here (Tungsten packs arrays densely); a
  production sink would pack to 1 byte/dim `binary` at write time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "sq_train",
    "sq_bounds",
    "sq_encode_expr",
    "sq_encode",
    "sq_decode",
    "sq_knn",
]


def sq_train(vectors: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension (dim, lo, hi) over the corpus — one partial-agg
    pass, shuffle volume O(#partitions * dim)."""
    return (
        vectors.select(
            F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "x")
        )
        .groupBy("dim")
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    )


def sq_bounds(
    vectors: DataFrame, vec_col: str = "embedding"
) -> tuple[list[float], list[float]]:
    """Collect the trained bounds to the driver — O(dim) rows, the same
    driver-side footprint as a single query vector."""
    rows = sq_train(vectors, vec_col).orderBy("dim").collect()
    return [r.lo for r in rows], [r.hi for r in rows]


def _lit_arr(xs: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in xs])


def _code(x: Column, lo: Column, hi: Column) -> Column:
    # clamp(floor((x-lo)*255/(hi-lo))); constant dimensions encode as 0
    # (the hi==lo guard keeps NaN/Inf division semantics out of the plan)
    c = F.greatest(
        F.lit(0.0),
        F.least(F.lit(255.0), F.floor((x - lo) * 255.0 / (hi - lo)).cast("double")),
    )
    return F.when(hi == lo, F.lit(0)).otherwise(c.cast("int")).cast("smallint")


def sq_encode_expr(
    vec_col: Column | str, lo: list[float], hi: list[float]
) -> Column:
    """The codes column expression — composable into any projection."""
    loA, hiA = _lit_arr(lo), _lit_arr(hi)
    col = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.transform(
        col.cast("array<double>"),
        lambda x, i: _code(
            x, F.element_at(loA, i + F.lit(1)), F.element_at(hiA, i + F.lit(1))
        ),
    )


def sq_encode(
    vectors: DataFrame,
    lo: list[float],
    hi: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_col, codes array<smallint>) — map-only, no shuffle."""
    return vectors.select(
        F.col(id_col), sq_encode_expr(vec_col, lo, hi).alias("codes")
    )


def sq_decode(
    codes_col: Column | str, lo: list[float], hi: list[float]
) -> Column:
    """Reconstruction lo_j + code_j * (hi_j - lo_j) / 255 (double
    elements; cast at the caller if float storage parity is wanted)."""
    loA, hiA = _lit_arr(lo), _lit_arr(hi)
    col = F.col(codes_col) if isinstance(codes_col, str) else codes_col
    return F.transform(
        col,
        lambda c, i: F.element_at(loA, i + F.lit(1))
        + c.cast("double")
        * (F.element_at(hiA, i + F.lit(1)) - F.element_at(loA, i + F.lit(1)))
        / 255.0,
    )


def sq_knn(
    codes: DataFrame,
    lo: list[float],
    hi: list[float],
    query_vector: list[float],
    k: int,
    id_col: str = "vec_id",
    codes_col: str = "codes",
    round_to: int | None = None,
) -> DataFrame:
    """Asymmetric top-k: exact query vs reconstructed corpus —
    Σ_j (q_j - decode(code_j))², the SQ analogue of the reference's ADC
    query (`src/db/stored.rs:560-585`). Map + TakeOrderedAndProject;
    ties break by id (SURVEY.md §2.4)."""
    qA = _lit_arr([float(x) for x in query_vector])
    dec = sq_decode(F.col(codes_col), lo, hi)
    diffs = F.zip_with(
        qA, dec, lambda q, d: (q.cast("double") - d) * (q.cast("double") - d)
    )
    dist = F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)
    out = F.round(dist, round_to) if round_to is not None else dist
    return (
        codes.select(
            F.col(id_col),
            out.alias("squared_distance"),
            dist.alias("__d"),
        )
        .orderBy(F.col("__d").asc(), F.col(id_col).asc())
        .limit(k)
        .drop("__d")
    )
