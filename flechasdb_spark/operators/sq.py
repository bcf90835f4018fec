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
- storage: `array<smallint>` in memory (Tungsten packs arrays
  densely); at rest, `pack_codes_expr`/`unpack_codes_expr` (r10)
  optionally store codes as `binary` — 1 byte/dim for SQ8, 2
  codes/byte for SQ4 — wired behind ``save_ivfsq(pack_codes=True)``
  with a lazy in-scan unpack on load. Both directions are pure
  hex/unhex SQL (codegen, engine-deterministic), and the roundtrip is
  exact (pytest-gated), so query results are unchanged. Measured
  at-rest sizes live in SCALING.md §r10.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "sq_train",
    "sq_bounds",
    "sq_train_grouped",
    "sq_train_quantile",
    "sq_bounds_quantile",
    "sq_encode_expr",
    "sq_encode_cols_expr",
    "sq_encode",
    "sq_decode",
    "sq_decode_cols",
    "sq_knn",
    "pack_mode_for_levels",
    "pack_codes_expr",
    "unpack_codes_expr",
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
    driver-side footprint as a single query vector. The dim ordering
    happens driver-side (r13): an in-plan orderBy of O(dim) rows cost a
    range exchange plus its bounds-sampling job per train."""
    rows = sorted(sq_train(vectors, vec_col).collect(), key=lambda r: r.dim)
    return [r.lo for r in rows], [r.hi for r in rows]


def sq_train_grouped(
    vectors: DataFrame,
    vec_col: str = "embedding",
    group_col: str = "partition_id",
    q_lo: float | None = None,
    q_hi: float | None = None,
    num_buckets: int = 512,
) -> DataFrame:
    """Per-GROUP per-dimension bounds — the per-cell variant (VERDICT
    r7 #6): IVF residuals concentrate near 0 with a per-cell spread
    much smaller than the global residual spread (the same argument
    that justifies quantizing residuals at all), so training (lo, hi)
    per cell tightens the 256-level range cell by cell at O(P * dim)
    extra state. Returns ``(group_col, lo array<double>,
    hi array<double>)``.

    ``q_lo``/``q_hi`` (VERDICT r7 #7): min/max bounds are
    outlier-fragile — ONE extreme residual coordinate inflates the
    step size for every vector in the group. When set, bounds come
    from a fixed-grid histogram quantile instead (two passes: min/max
    grid, then per-(group, dim) bucket counts + cumulative
    interpolation — the `sketch.histogram_quantiles` arithmetic, plain
    double ops on integer counts so it stays engine-exact). Values
    outside the clipped range saturate to code 0/255, which is exactly
    the SQ clipping semantics (FAISS QT_8bit's RS_quantile analogue).

    Scale: both passes are partial-aggregated explodes — shuffles
    carry O(groups * dim [* buckets]) rows, never the corpus; the
    returned table is O(P) rows and broadcasts."""
    from pyspark.sql import Window

    vals = vectors.select(
        F.col(group_col),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "x"),
    )
    mm = vals.groupBy(group_col, "dim").agg(
        F.min("x").alias("lo"), F.max("x").alias("hi")
    )
    if q_lo is not None or q_hi is not None:
        ql = 0.0 if q_lo is None else float(q_lo)
        qh = 1.0 if q_hi is None else float(q_hi)
        if not (0.0 <= ql < qh <= 1.0):
            raise ValueError(f"need 0 <= q_lo < q_hi <= 1, got {ql}, {qh}")
        B = int(num_buckets)
        j = vals.join(F.broadcast(mm), [group_col, "dim"])
        width = (F.col("hi") - F.col("lo")) / F.lit(float(B))
        b = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
            F.least(
                F.greatest(
                    F.floor((F.col("x") - F.col("lo")) / width), F.lit(0)
                ),
                F.lit(B - 1),
            )
        ).cast("long")
        counts = j.groupBy(group_col, "dim", b.alias("__b")).agg(
            F.count(F.lit(1)).cast("double").alias("__cnt"),
            F.first("lo").alias("lo"),
            F.first("hi").alias("hi"),
        )
        w_cum = Window.partitionBy(group_col, "dim").orderBy("__b")
        w_all = Window.partitionBy(group_col, "dim")
        cum = counts.select(
            group_col,
            "dim",
            "__b",
            "__cnt",
            "lo",
            "hi",
            F.sum("__cnt").over(w_cum).alias("__cum"),
            F.sum("__cnt").over(w_all).alias("__n"),
        )
        width2 = (F.col("hi") - F.col("lo")) / F.lit(float(B))

        def _q(p: float, name: str) -> DataFrame:
            # p=0 / p=1 short-circuit to the exact min/max grid edges;
            # otherwise interpolate inside the first bucket whose
            # cumulative count reaches p*n, clamped to the grid edges
            # (the histogram_quantiles arithmetic).
            if p == 0.0:
                return mm.select(group_col, "dim", F.col("lo").alias(name))
            t = F.lit(p) * F.col("__n")
            est = F.col("lo") + width2 * (
                F.col("__b")
                + (t - (F.col("__cum") - F.col("__cnt"))) / F.col("__cnt")
            )
            picked = cum.where(
                (F.col("__cum") >= t)
                & ((F.col("__cum") - F.col("__cnt")) < t)
            )
            return picked.groupBy(group_col, "dim").agg(
                F.min(
                    F.greatest(F.col("lo"), F.least(F.col("hi"), est))
                ).alias(name)
            )

        lo_t = _q(ql, "qlo")
        hi_t = (
            mm.select(group_col, "dim", F.col("hi").alias("qhi"))
            if qh == 1.0
            else _q(qh, "qhi")
        )
        mm = (
            lo_t.join(hi_t, [group_col, "dim"])
            .select(
                group_col,
                "dim",
                F.col("qlo").alias("lo"),
                # a degenerate clip (all mass in one bucket) can invert
                # the pair; keep lo <= hi so the encode guard holds
                F.greatest(F.col("qhi"), F.col("qlo")).alias("hi"),
            )
        )
    packed = mm.groupBy(group_col).agg(
        F.array_sort(F.collect_list(F.struct("dim", "lo"))).alias("__l"),
        F.array_sort(F.collect_list(F.struct("dim", "hi"))).alias("__h"),
    )
    return packed.select(
        group_col,
        F.transform("__l", lambda s: s["lo"]).alias("lo"),
        F.transform("__h", lambda s: s["hi"]).alias("hi"),
    )


def sq_train_quantile(
    vectors: DataFrame,
    vec_col: str = "embedding",
    q_lo: float = 0.001,
    q_hi: float = 0.999,
    num_buckets: int = 512,
) -> DataFrame:
    """Global (ungrouped) quantile-clipped per-dimension bounds —
    `sq_train` with outlier clipping (VERDICT r7 #7). One synthetic
    group folds the grouped machinery down to the global case."""
    g = vectors.select(F.lit(0).alias("__g"), F.col(vec_col))
    return sq_train_grouped(
        g, vec_col, "__g", q_lo=q_lo, q_hi=q_hi, num_buckets=num_buckets
    ).drop("__g")


def sq_bounds_quantile(
    vectors: DataFrame,
    vec_col: str = "embedding",
    q_lo: float = 0.001,
    q_hi: float = 0.999,
    num_buckets: int = 512,
) -> tuple[list[float], list[float]]:
    """Driver-side (lo, hi) lists from `sq_train_quantile` — drop-in
    for `sq_bounds` wherever outliers would inflate the step size."""
    r = sq_train_quantile(vectors, vec_col, q_lo, q_hi, num_buckets).first()
    return [float(x) for x in r["lo"]], [float(x) for x in r["hi"]]


def _lit_arr(xs: list[float]) -> Column:
    # one py4j call / one Literal node (r13 — see linalg.lit_doubles);
    # values bit-identical to the former per-element F.lit(float(x))
    from flechasdb_spark.functions.linalg import lit_doubles

    return lit_doubles(xs)


def _code(x: Column, lo: Column, hi: Column, levels: int = 255) -> Column:
    # clamp(floor((x-lo)*levels/(hi-lo))); constant dimensions encode
    # as 0 (the hi==lo guard keeps NaN/Inf division semantics out of
    # the plan). ``levels`` = max code = 2^bits - 1: 255 for SQ8, 15
    # for SQ4 (FAISS QT_4bit — half the at-rest bytes under
    # save_ivfsq(pack_codes=True)'s nibble packing, measured in
    # SCALING.md §r10; ~2x the per-axis step — the fidelity/footprint
    # dial of the family).
    lv = float(int(levels))
    c = F.greatest(
        F.lit(0.0),
        F.least(F.lit(lv), F.floor((x - lo) * lv / (hi - lo)).cast("double")),
    )
    return F.when(hi == lo, F.lit(0)).otherwise(c.cast("int")).cast("smallint")


def sq_encode_expr(
    vec_col: Column | str,
    lo: list[float],
    hi: list[float],
    levels: int = 255,
) -> Column:
    """The codes column expression — composable into any projection."""
    loA, hiA = _lit_arr(lo), _lit_arr(hi)
    col = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.transform(
        col.cast("array<double>"),
        lambda x, i: _code(
            x,
            F.element_at(loA, i + F.lit(1)),
            F.element_at(hiA, i + F.lit(1)),
            levels,
        ),
    )


def sq_encode_cols_expr(
    vec_col: Column | str,
    lo_col: Column | str,
    hi_col: Column | str,
    levels: int = 255,
) -> Column:
    """`sq_encode_expr` with the bounds coming from COLUMNS (per-row
    array<double>, e.g. per-cell bounds joined on partition_id) instead
    of driver literals. Same clamp/floor arithmetic — values outside
    [lo, hi] saturate to code 0/levels, which is what makes quantile-
    clipped bounds legal."""
    col = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    loA = F.col(lo_col) if isinstance(lo_col, str) else lo_col
    hiA = F.col(hi_col) if isinstance(hi_col, str) else hi_col
    return F.transform(
        col.cast("array<double>"),
        lambda x, i: _code(
            x,
            F.element_at(loA, i + F.lit(1)),
            F.element_at(hiA, i + F.lit(1)),
            levels,
        ),
    )


def sq_decode_cols(
    codes_col: Column | str,
    lo_col: Column | str,
    hi_col: Column | str,
    levels: int = 255,
) -> Column:
    """`sq_decode` with column-borne bounds (per-cell variant)."""
    lv = float(int(levels))
    col = F.col(codes_col) if isinstance(codes_col, str) else codes_col
    loA = F.col(lo_col) if isinstance(lo_col, str) else lo_col
    hiA = F.col(hi_col) if isinstance(hi_col, str) else hi_col
    return F.transform(
        col,
        lambda c, i: F.element_at(loA, i + F.lit(1))
        + c.cast("double")
        * (
            F.element_at(hiA, i + F.lit(1))
            - F.element_at(loA, i + F.lit(1))
        )
        / lv,
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
    codes_col: Column | str,
    lo: list[float],
    hi: list[float],
    levels: int = 255,
) -> Column:
    """Reconstruction lo_j + code_j * (hi_j - lo_j) / levels (double
    elements; cast at the caller if float storage parity is wanted)."""
    lv = float(int(levels))
    loA, hiA = _lit_arr(lo), _lit_arr(hi)
    col = F.col(codes_col) if isinstance(codes_col, str) else codes_col
    return F.transform(
        col,
        lambda c, i: F.element_at(loA, i + F.lit(1))
        + c.cast("double")
        * (F.element_at(hiA, i + F.lit(1)) - F.element_at(loA, i + F.lit(1)))
        / lv,
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


# ---------------------------------------------------------------------------
# At-rest code packing (r10, VERDICT r9 #3): array<smallint> is the
# in-memory/scan form, but each element costs 2 bytes plus array
# overhead at rest. Packing to `binary` stores exactly 1 byte/code
# ("byte" mode, SQ5..SQ8) or 2 codes/byte ("nibble" mode, SQ2..SQ4 —
# the "half the at-rest bytes" the SQ4 dial promises). Both directions
# are pure hex/unhex SQL: deterministic across engines, whole-stage
# codegen, and composable into the load projection so the unpack cost
# rides the (pruned) scan instead of a rewrite.
# ---------------------------------------------------------------------------


def pack_mode_for_levels(levels: int) -> str:
    """The densest lossless byte layout for a code alphabet: codes
    <= 15 fit a hex nibble (2 codes/byte), anything up to 255 fits one
    byte. Raises for a max code above 255: byte mode renders each code
    as exactly 2 hex chars (`lpad(hex(c), 2)`), so a wider code would
    be silently truncated at pack time and the reloaded index would
    return wrong results with no error — fail loudly instead (every
    ``pack_codes=True`` path routes through here, so this bound guards
    save/upsert/compact on both index families)."""
    lv = int(levels)
    if lv > 255:
        raise ValueError(
            "pack_codes=True supports code alphabets up to 256 codes "
            f"(max code value 255); got max code {lv}. Save this index "
            "unpacked (pack_codes=False) — array<smallint> is lossless "
            "at any alphabet size."
        )
    return "nibble" if lv <= 15 else "byte"


def pack_codes_expr(codes_col: Column | str, mode: str) -> Column:
    """``array<smallint>`` codes -> ``binary``: each code rendered as
    1 ("nibble") or 2 ("byte") hex chars, concatenated, unhex'd. An
    odd nibble count (odd dim in nibble mode) gets one trailing pad
    nibble — `unpack_codes_expr` slices by dim, so the pad never
    surfaces."""
    col = F.col(codes_col) if isinstance(codes_col, str) else codes_col
    if mode == "nibble":
        hx = F.array_join(
            F.transform(col, lambda c: F.hex(c.cast("bigint"))), ""
        )
        hx = F.when(
            F.length(hx) % 2 == 1, F.concat(hx, F.lit("0"))
        ).otherwise(hx)
    elif mode == "byte":
        hx = F.array_join(
            F.transform(
                col, lambda c: F.lpad(F.hex(c.cast("bigint")), 2, "0")
            ),
            "",
        )
    else:
        raise ValueError(f"mode must be 'nibble' or 'byte': {mode!r}")
    return F.unhex(hx)


def unpack_codes_expr(
    bin_col: Column | str, dim: int, mode: str
) -> Column:
    """``binary`` -> ``array<smallint>`` codes (the exact inverse of
    `pack_codes_expr` for the first ``dim`` codes). Pure string
    slicing over hex(bin) — stays in codegen, so a packed index's
    scan decodes inline with no Python and no extra pass."""
    col = F.col(bin_col) if isinstance(bin_col, str) else bin_col
    hx = F.hex(col)
    if mode == "nibble":
        return F.transform(
            F.sequence(F.lit(1), F.lit(int(dim))),
            lambda i: F.conv(F.substring(hx, i, F.lit(1)), 16, 10).cast(
                "smallint"
            ),
        )
    if mode == "byte":
        return F.transform(
            F.sequence(F.lit(1), F.lit(int(dim))),
            lambda i: F.conv(
                F.substring(hx, i * 2 - 1, F.lit(2)), 16, 10
            ).cast("smallint"),
        )
    raise ValueError(f"mode must be 'nibble' or 'byte': {mode!r}")
