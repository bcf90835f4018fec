"""Relational product-quantization operators — PQ encode and ADC scoring
expressed PURELY in DataFrame ops (no UDFs), so the whole pipeline stays
in whole-stage codegen and is DuckDB-oracle checkable.

These mirror the reference ops B7 (division), B9 (encode),
Q2 (ADC table) and Q3 (scan scoring) — SURVEY.md §2.1 — against an
explicit codebook table ``(division int, code int, center array<float>)``.
The UDF-based fused variants used by the MLlib-trained index live in
``operators/build.py`` / ``plans/ivf.py``; these relational forms are the
semantics ground truth and work with ANY codebooks (trained or fixed).

Scale: codebooks are D*C rows — always broadcast. Encoding is a
broadcast join + per-(vector, division) argmin window (WindowGroupLimit:
partial top-1 before any shuffle); scoring is a broadcast join + partial
aggregation (map-side combine). No full shuffle of the data anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from flechasdb_spark.functions.linalg import squared_l2

__all__ = ["pq_encode", "adc_table", "adc_score", "fixed_codebooks"]


def fixed_codebooks(spark, num_divisions: int, num_codes: int, width: int) -> DataFrame:
    """The FIXTURES.md F3 deterministic codebooks:
    center[division, code][j] = (code - 3.5) * 0.1 + division * 0.01 * j.
    Pins ADC arithmetic without k-means randomness."""
    rows = [
        (d, c, [float((c - 3.5) * 0.1 + d * 0.01 * j) for j in range(width)])
        for d in range(num_divisions)
        for c in range(num_codes)
    ]
    return spark.createDataFrame(rows, "division int, code int, center array<float>")


def _sliced(vec_col: str, width: int, dim_perm=None) -> Column:
    # per-division subvector view (B7): elements [division*w, (division+1)*w)
    if dim_perm is None:
        return F.expr(f"slice({vec_col}, division * {width} + 1, {width})")
    # OPQ-style permuted split: division d gathers elements
    # dim_perm[d*w : (d+1)*w] — a 2-D literal index array rides the
    # expression (D*N ints, tiny) and the gather is a pure Catalyst
    # transform, still codegen'd
    d = len(dim_perm) // width
    permarr = F.array(
        *[
            F.array(
                *[
                    F.lit(int(p))
                    for p in dim_perm[di * width : (di + 1) * width]
                ]
            )
            for di in range(d)
        ]
    )
    idxs = F.element_at(permarr, F.col("division") + 1)
    return F.transform(idxs, lambda i: F.element_at(F.col(vec_col), i + 1))


def pq_encode(
    vectors: DataFrame,
    codebooks: DataFrame,
    width: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim_perm=None,
) -> DataFrame:
    """B9: nearest codebook entry per (vector, division).

    Returns long-form ``(id_col, division, code)`` — the join-ready shape
    for ADC scoring; ties in distance break by lowest code.

    argmin is a ``min(struct(dist, code))`` aggregation, not a window:
    struct ordering gives the same (dist asc, code asc) tie-break, and
    the partial aggregation combines map-side — the shuffle carries one
    row per (vector, division), not the C-way blowup a window sort
    would.

    ``dim_perm``: optional OPQ-style dimension permutation — division d
    quantizes elements dim_perm[d*w : (d+1)*w] instead of the natural
    contiguous slice (codebooks must be trained in the same order)."""
    pairs = vectors.select(id_col, vec_col).join(F.broadcast(codebooks))
    dist = squared_l2(_sliced(vec_col, width, dim_perm), F.col("center"))
    return (
        pairs.groupBy(id_col, "division")
        .agg(F.min(F.struct(dist.alias("d"), F.col("code"))).alias("__m"))
        .select(id_col, "division", F.col("__m.code").alias("code"))
    )


def adc_table(
    codebooks: DataFrame,
    query_vector: list[float],
    width: int,
    dim_perm=None,
) -> DataFrame:
    """Q2: the D x C partial-distance table for one query —
    table[division, code] = ||query_slice_division - center||^2.
    ``dim_perm`` must match the permutation the codes were encoded
    with (see pq_encode)."""
    from flechasdb_spark.functions.linalg import lit_doubles

    if dim_perm is None:
        qv = lit_doubles(query_vector).cast("array<float>")
        sliced = F.slice(qv, F.col("division") * width + 1, width)
    else:
        pv = [float(query_vector[int(p)]) for p in dim_perm]
        qv = lit_doubles(pv).cast("array<float>")
        sliced = F.slice(qv, F.col("division") * width + 1, width)
    part = squared_l2(sliced, F.col("center"))
    return codebooks.select("division", "code", part.alias("partial"))


def adc_score(
    encoded: DataFrame,
    table: DataFrame,
    id_col: str = "vec_id",
) -> DataFrame:
    """Q3: approximate squared distance per vector = sum of D table
    lookups — a broadcast join on (division, code) + partial agg."""
    return (
        encoded.join(F.broadcast(table), ["division", "code"])
        .groupBy(id_col)
        .agg(F.sum("partial").alias("squared_distance"))
    )
