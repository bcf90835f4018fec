"""IVF + scalar-quantized residuals — the FAISS index-factory shape
``IVF{P},SQ8`` on Spark: coarse k-means cells (plans/ivf.py) with each
member stored as an 8-bit scalar-quantized RESIDUAL (operators/sq.py)
instead of PQ codes.

Where it sits in the quantizer family: SQ8 keeps one code PER DIMENSION
(n bytes/vector, distortion only from 256-level rounding of each axis),
vs PQ's one code per SUBSPACE (D bytes/vector, distortion from a
learned 2^B-cell Voronoi partition of each subspace). IVF+SQ8 is the
standard choice when recall matters more than memory: 4x the footprint
of PQ8 but near-exact distances, and the scan is pure element
arithmetic — no codebook lookups, so it whole-stage-codegens.

Quantizing RESIDUALS (v - centroid) rather than raw vectors matters:
residual coordinates concentrate near 0 with per-cell spread much
smaller than the corpus spread, so the 256 levels cover a tighter range
-> smaller step size -> lower distortion than raw-vector SQ at equal
bits (the same reason the reference PQ-encodes residuals,
/root/reference/src/db/build.rs:85-129).

Scale (100 TB): the build is ivf_assign's one broadcast-join argmin
(map-side combined, one shuffle keyed by vec_id) + ONE O(dim)-row
bounds aggregation + a map-only encode; no extra shuffle vs plain IVF.
The query scans only probed cells (Parquet partition pruning when the
encoded table is written partitionBy(partition_id)), computes
``sum_j (q_j - c_j - decode(code_j))^2`` per candidate inside codegen,
and ends in one TakeOrderedAndProject. All relational — a DuckDB
oracle recomputes the full lifecycle exactly under frozen centroids
(queries.py::ivfsq_knn).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flechasdb_spark.functions.linalg import squared_l2
from flechasdb_spark.operators.knn import flat_knn
from flechasdb_spark.operators.sq import (
    _lit_arr,
    sq_bounds,
    sq_bounds_quantile,
    sq_decode,
    sq_decode_cols,
    sq_encode_cols_expr,
    sq_encode_expr,
    sq_train_grouped,
)
from flechasdb_spark.plans.ivf import cent_col_name, ivf_assign

__all__ = [
    "IVFSQModel",
    "build_ivfsq",
    "assemble_ivfsq",
    "merge_ivfsq",
    "ivfsq_residuals",
    "ivfsq_query",
    "ivfsq_query_batch",
    "ivfsq_range_query",
    "ivfsq_range_query_batch",
    "save_ivfsq",
    "load_ivfsq",
    "train_ivfsq",
    "encode_frozen_residuals",
    "cell_bounds_fingerprint",
]


@dataclass
class IVFSQModel:
    """centroids: (partition_id, centroid) DataFrame; lo/hi: GLOBAL
    residual SQ bounds (length dim, None under per-cell bounds);
    encoded: (id, partition_id, codes); cell_bounds: optional
    (partition_id, lo array, hi array) table — per-cell bounds
    (VERDICT r7 #6), O(P * dim) state that broadcasts into every
    encode/decode join."""

    centroids: DataFrame
    lo: list | None
    hi: list | None
    encoded: DataFrame
    cell_bounds: DataFrame | None = None
    levels: int = 255  # max code = 2^bits - 1: 255 (SQ8) or 15 (SQ4)


def ivfsq_residuals(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: tuple = (),
) -> DataFrame:
    """(id, partition_id, residual[, *keep_cols]): nearest-centroid
    assignment + the per-row residual v - centroid.

    With a driver-small centroid table (the common case) this is ONE
    map-only codegen expression (r12, guide §2.4): the centroids ride
    as a plan literal, the winning centroid comes back on the argmin
    struct, and the residual subtraction happens in the same projection
    — no shuffle, no broadcast exchange, no second join. Huge-P tables
    fall back to the former two-broadcast-join shape (one corpus
    shuffle); distances, tie-breaks and residual arithmetic are
    identical either way (pytest-gated). ``keep_cols`` ride along
    untouched (attribute columns)."""
    from flechasdb_spark.plans.ivf import (
        _cent_array_lit,
        _let,
        _small_centroid_rows,
    )

    from flechasdb_spark.functions.linalg import lit_longs

    cc = cent_col_name(centroids)
    rows = _small_centroid_rows(centroids, "partition_id", cc)
    if rows is not None:
        from flechasdb_spark.plans.ivf import _df_memo

        memo = _df_memo(centroids)
        okey = ("resid_out", vec_col)
        out = memo.get(okey)
        if out is None:
            pid_type = (
                centroids.schema["partition_id"].dataType.simpleString()
            )
            pids_lit = lit_longs([r[0] for r in rows])
            cents_lit = _cent_array_lit(rows)

            def _score(v):
                def _cand(c, i):
                    d = F.aggregate(
                        F.zip_with(
                            v,
                            c,
                            lambda x, y: (x.cast("double") - y.cast("double"))
                            * (x.cast("double") - y.cast("double")),
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    )
                    return F.struct(
                        d.alias("d"),
                        F.element_at(pids_lit, i + 1)
                        .cast(pid_type)
                        .alias("p"),
                        i.alias("i"),
                    )

                return F.array_min(F.transform(cents_lit, _cand))

            # two nested let-bindings guarantee the (possibly expensive)
            # vector expression and the P-way argmin are each evaluated
            # ONCE per row, no matter how the optimizer collapses
            # projects; the finished Column is memoized on the centroid
            # DataFrame (plans/ivf._PLAN_MEMO) so multi-shard lifecycles
            # build it once per plan, not once per shard
            out = _let(
                F.col(vec_col).cast("array<double>"),
                lambda v: _let(
                    _score(v),
                    lambda b: F.struct(
                        b["p"].alias("p"),
                        F.zip_with(
                            v,
                            F.element_at(cents_lit, b["i"] + 1),
                            lambda a, c2: a - c2,
                        ).alias("r"),
                    ),
                ),
            )
            memo[okey] = out
        return vectors.select(
            F.col(id_col), out.alias("__pr"), *keep_cols
        ).select(
            id_col,
            F.col("__pr")["p"].alias("partition_id"),
            F.col("__pr")["r"].alias("residual"),
            *keep_cols,
        )
    assigned = ivf_assign(
        vectors, centroids, id_col=id_col, vec_col=vec_col,
        impl="relational",
    )
    back = assigned.join(F.broadcast(centroids), "partition_id")
    resid = F.zip_with(
        F.col(vec_col).cast("array<double>"),
        F.col(cc).cast("array<double>"),
        lambda a, b: a - b,
    )
    return back.select(
        id_col, "partition_id", resid.alias("residual"), *keep_cols
    )


def build_ivfsq(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bounds: str = "global",
    clip: tuple[float, float] | None = None,
    bits: int = 8,
    attr_cols: tuple = (),
) -> IVFSQModel:
    """Assign, train residual bounds, encode. ``centroids`` come from
    the caller — kmeans_fit on a sample (operators/build.py) in
    production, a frozen table in the oracle.

    ``attr_cols`` (r9 — the PQ side's B10 story): attribute columns
    copied onto the encoded rows, so filtered search (`where` on the
    query paths) can gate on them BEFORE scoring and they persist
    with the index (save_ivfsq writes whatever columns the encoded
    table carries).

    ``bounds`` (VERDICT r7 #6):

    - ``"global"`` (default, the oracle form): one (lo, hi) pair per
      dimension over ALL residuals — one O(dim)-row pass, bounds ride
      as plan literals.
    - ``"per_cell"``: (lo, hi) per (cell, dimension) — residuals
      concentrate per cell far tighter than globally, so each cell's
      256 levels cover its own spread (smaller step -> lower
      distortion -> recall >= the global variant at equal nprobe,
      property-gated in tests/test_ivfsq.py). Costs O(P * dim) model
      state and one broadcast join at encode/decode.

    ``clip`` (VERDICT r7 #7): optional (q_lo, q_hi) quantiles — bounds
    from a fixed-grid histogram quantile instead of min/max, so one
    outlier coordinate cannot inflate the step size for every vector;
    out-of-range values saturate to code 0/255. Composes with either
    ``bounds`` mode; distortion improvement on heavy-tailed residuals
    is property-gated in tests/test_sq.py."""
    if bounds not in ("global", "per_cell"):
        raise ValueError(f"bounds must be 'global' or 'per_cell': {bounds!r}")
    if not 2 <= int(bits) <= 8:
        raise ValueError(f"bits must be in [2, 8], got {bits!r}")
    levels = 2 ** int(bits) - 1
    resid = ivfsq_residuals(
        vectors, centroids, id_col, vec_col, keep_cols=tuple(attr_cols)
    )
    if bounds == "per_cell":
        cb = sq_train_grouped(
            resid,
            vec_col="residual",
            group_col="partition_id",
            q_lo=clip[0] if clip else None,
            q_hi=clip[1] if clip else None,
        ).localCheckpoint(eager=True)  # O(P) rows; cut the train lineage
        enc = resid.join(F.broadcast(cb), "partition_id").select(
            id_col,
            "partition_id",
            sq_encode_cols_expr("residual", "lo", "hi", levels).alias(
                "codes"
            ),
            *attr_cols,
        )
        return IVFSQModel(
            centroids=centroids,
            lo=None,
            hi=None,
            encoded=enc,
            cell_bounds=cb,
            levels=levels,
        )
    if clip is not None:
        lo, hi = sq_bounds_quantile(
            resid, vec_col="residual", q_lo=clip[0], q_hi=clip[1]
        )
    else:
        lo, hi = sq_bounds(resid, vec_col="residual")
    enc = resid.select(
        id_col,
        "partition_id",
        sq_encode_expr("residual", lo, hi, levels).alias("codes"),
        *attr_cols,
    )
    return IVFSQModel(
        centroids=centroids, lo=lo, hi=hi, encoded=enc, levels=levels
    )


def _probe_and_centroid_literal(
    model, query_vector: list, nprobe: int, cc: str
):
    """Probe selection returning BOTH the probed cell ids and a plan
    literal mapping partition_id -> centroid (array<double>) for those
    cells (r12, guide §2.4): the top-nprobe job was already collecting
    the ids — selecting the centroid vector alongside costs nothing
    (O(nprobe * dim) rows) and lets the serving scan reconstruct via
    ``element_at(map, partition_id)`` instead of a broadcast-join
    against the centroid table, removing one exchange and one join
    from every solo serving plan. Values are identical: the map holds
    the exact float centroids the join would have delivered, and
    reconstruction casts to double either way."""
    rows = flat_knn(
        model.centroids,
        query_vector,
        k=nprobe,
        id_col="partition_id",
        vec_col=cc,
        extra_cols=(cc,),
    ).collect()
    from flechasdb_spark.functions.linalg import lit_doubles

    probe_ids = [int(r["partition_id"]) for r in rows]
    entries = []
    for r in rows:
        entries.append(F.lit(int(r["partition_id"])))
        entries.append(lit_doubles(r[cc]))
    return probe_ids, F.element_at(
        F.create_map(*entries), F.col("partition_id")
    )


def _recon(
    codes_col: Column | str,
    cent_col: Column | str,
    lo,
    hi,
    levels: int = 255,
) -> Column:
    """centroid + decoded residual, element-wise (array<double>)."""
    cc = F.col(cent_col) if isinstance(cent_col, str) else cent_col
    return F.zip_with(
        cc.cast("array<double>"),
        sq_decode(codes_col, lo, hi, levels),
        lambda c, r: c + r,
    )


def ivfsq_query(
    model: IVFSQModel,
    query_vector: list,
    k: int,
    nprobe: int,
    id_col: str = "vec_id",
    round_to: int | None = None,
    rerank: DataFrame | None = None,
    rerank_factor: int = 4,
    where=None,
) -> DataFrame:
    """Asymmetric search: exact query vs (centroid + decoded residual),
    scanning only the ``nprobe`` nearest cells. Probe selection is the
    O(P) flat_knn over centroids; the candidate scan is one semi-join
    (partition pruning at rest) + codegen'd element arithmetic +
    TakeOrderedAndProject. Ties break by id (SURVEY.md §2.4).

    ``where`` (r10 — solo parity with `ivfsq_query_batch` and the
    radius paths, VERDICT r9 #8): optional pre-filter predicate
    (Column or SQL string) over the encoded rows' columns (attributes
    included), applied BEFORE scoring, so the k returned rows all
    satisfy it — filtered search without batching a single query.

    ``rerank`` (r9 — parity with the PQ side's refinement modes): a
    DataFrame holding the ORIGINAL vectors (id_col + 'embedding') for
    EVERYTHING indexed — a survivor absent from it is dropped by the
    inner join (the FAISS refine-storage contract).
    The quantized scan keeps ``k * rerank_factor`` survivors, which
    broadcast into one exact-distance join against the originals;
    the emitted distances are then EXACT. Near-free insurance for SQ8
    (distances are near-exact already); for SQ4's coarser codes it
    recovers the recall the 16-level rounding costs (pytest-gated)."""
    cc = cent_col_name(model.centroids)
    # Probe selection collects O(nprobe) ids (one tiny job over the
    # O(P) centroid table) so the cell filter is a LITERAL isin — a
    # static Parquet PartitionFilter on the at-rest layout. The former
    # semi-join against the lazy probe DataFrame never became a
    # partition filter (DPP does not fire on this shape): the scan
    # read every cell and the join discarded nprobe-1/P of it.
    # r12: the same job also collects the probed centroid VECTORS, so
    # reconstruction reads them from a plan literal — no broadcast
    # join against the centroid table in the scan.
    probe_ids, cent_expr = _probe_and_centroid_literal(
        model, query_vector, nprobe, cc
    )
    cands = model.encoded.where(F.col("partition_id").isin(probe_ids))
    if where is not None:
        cands = cands.where(where)
    qA = _lit_arr([float(x) for x in query_vector])
    if model.cell_bounds is not None:
        cands = cands.join(F.broadcast(model.cell_bounds), "partition_id")
        recon = F.zip_with(
            cent_expr,
            sq_decode_cols("codes", "lo", "hi", model.levels),
            lambda c, r: c + r,
        )
        dist = squared_l2(qA, recon)
    else:
        dist = squared_l2(
            qA, _recon("codes", cent_expr, model.lo, model.hi, model.levels)
        )
    # When the caller asks for rounded output, RANK on the rounded
    # score too (id tie-break): ordering full-precision __d while
    # emitting round(__d) lets a sub-5e-5 cross-engine float divergence
    # flip the selected ids vs the oracle — the other frozen rows'
    # ranking convention (ADVICE r7).
    rank = (
        F.round(F.col("__d"), round_to)
        if round_to is not None
        else F.col("__d")
    )
    adc_k = int(k) * int(rerank_factor) if rerank is not None else int(k)
    out = (
        cands.select(F.col(id_col), F.col("partition_id"), dist.alias("__d"))
        .orderBy(rank.asc(), F.col(id_col).asc())
        .limit(adc_k)
    )
    if rerank is not None:
        # the O(k * factor) survivor set broadcasts; the originals scan
        # once map-side (the PQ side's rerank shape, plans/ivf.py)
        cand_ids = out.select(id_col, "partition_id")
        exact = squared_l2(qA, F.col("embedding").cast("array<double>"))
        out = (
            rerank.select(id_col, "embedding")
            .join(F.broadcast(cand_ids), id_col)
            .select(
                F.col(id_col),
                F.col("partition_id"),
                exact.alias("__d"),
            )
        )
        rank2 = (
            F.round(F.col("__d"), round_to)
            if round_to is not None
            else F.col("__d")
        )
        out = out.orderBy(rank2.asc(), F.col(id_col).asc()).limit(int(k))
    score = (
        F.round(F.col("__d"), round_to) if round_to is not None else F.col("__d")
    )
    return out.select(id_col, "partition_id", score.alias("squared_distance"))


def encode_frozen_residuals(
    resid: DataFrame,
    model: IVFSQModel,
    id_col: str = "vec_id",
    missing_cell: str = "error",
) -> DataFrame:
    """Encode (id, partition_id, residual) rows against a FROZEN
    model's bounds — the shared kernel of `assemble_ivfsq` and
    `streaming.stream_ivfsq_encode`.

    Under per-cell bounds the join is a LEFT join: a vector assigned
    to a cell that had zero training residuals (possible once the
    model is frozen from a sample and applied to unseen data) has no
    bounds row, and the former INNER join silently dropped it from
    the index (ADVICE r8 #1). ``missing_cell`` decides instead:

    - ``"error"`` (default): fail the job loudly, naming the cell —
      an arrival can never vanish silently.
    - ``"zero"``: fall back to zero-width bounds (codes all 0, decode
      reconstructs the bare centroid) — lossy for that vector but it
      stays findable, the degraded-service option for a long-running
      ingest that must not stop."""
    if missing_cell not in ("error", "zero"):
        raise ValueError(
            f"missing_cell must be 'error' or 'zero': {missing_cell!r}"
        )
    extras = [
        c for c in resid.columns
        if c not in (id_col, "partition_id", "residual")
    ]
    if model.cell_bounds is None:
        return resid.select(
            id_col,
            "partition_id",
            sq_encode_expr(
                "residual", model.lo, model.hi, model.levels
            ).alias("codes"),
            *extras,
        )
    joined = resid.join(F.broadcast(model.cell_bounds), "partition_id", "left")
    codes = sq_encode_cols_expr("residual", "lo", "hi", model.levels)
    if missing_cell == "error":
        guarded = F.when(
            F.col("lo").isNull(),
            F.raise_error(
                F.concat(
                    F.lit(
                        "ivfsq: no frozen bounds row for cell "
                    ),
                    F.col("partition_id").cast("string"),
                    F.lit(
                        " — assemble with missing_cell='zero' or retrain"
                    ),
                )
            ),
        ).otherwise(codes)
    else:
        zeros = F.array_repeat(
            F.lit(0).cast("smallint"), F.size(F.col("residual"))
        )
        guarded = F.when(F.col("lo").isNull(), zeros).otherwise(codes)
    return joined.select(
        id_col, "partition_id", guarded.alias("codes"), *extras
    )


def ivfsq_range_query(
    model: IVFSQModel,
    query_vector: list,
    radius: float,
    nprobe: int,
    id_col: str = "vec_id",
    round_to: int | None = None,
    limit: int | None = None,
    where=None,
    rerank: DataFrame | None = None,
    rerank_slack: float = 1.5,
) -> DataFrame:
    """RADIUS search over the IVF+SQ index (the FAISS ``range_search``
    contract composed with this index): every candidate in the
    ``nprobe`` nearest cells whose asymmetric distance
    (exact query vs centroid + decoded residual) is <= ``radius``.
    Same probe selection / literal-isin partition pruning / codegen
    distance as `ivfsq_query`; the tail is a FILTER + sort-of-matches
    instead of TakeOrderedAndProject, so the result size is set by the
    radius, not k. Like IVF top-k, neighbors living in unprobed cells
    are missed — the standard IVF recall trade, dialed by nprobe.

    ``round_to`` rounds the emitted distance AND applies the filter to
    the rounded value (the frozen-row convention); ``limit`` optionally
    caps a pathological radius (ordered — keeps the nearest);
    ``where`` pre-filters candidates BEFORE scoring (the filtered
    search mode the top-k paths share).

    ``rerank``/``rerank_slack`` (r10 — the refinement mode on the
    RADIUS contract): with ``rerank`` holding the ORIGINAL vectors,
    the quantized scan keeps everything within ``radius *
    rerank_slack`` (the slack absorbs quantization error in BOTH
    directions), one broadcast join re-scores those survivors
    exactly, and the final filter applies ``radius`` to the EXACT
    distance — exact radius semantics at index cost, modulo only
    probe recall (a true member whose quantized distance exceeds the
    slack band is missed; widen ``rerank_slack`` to trade scan volume
    for that tail). Survivors are O(|matches at slack radius|) —
    broadcast-sized for any radius worth serving."""
    cc = cent_col_name(model.centroids)
    # r12: probe ids + probed centroid vectors in ONE tiny job; the
    # scan reconstructs from a plan literal (see ivfsq_query)
    probe_ids, cent_expr = _probe_and_centroid_literal(
        model, query_vector, nprobe, cc
    )
    cands = model.encoded.where(F.col("partition_id").isin(probe_ids))
    if where is not None:
        cands = cands.where(where)
    qA = _lit_arr([float(x) for x in query_vector])
    if model.cell_bounds is not None:
        cands = cands.join(F.broadcast(model.cell_bounds), "partition_id")
        recon = F.zip_with(
            cent_expr,
            sq_decode_cols("codes", "lo", "hi", model.levels),
            lambda c, r: c + r,
        )
        dist = squared_l2(qA, recon)
    else:
        dist = squared_l2(
            qA, _recon("codes", cent_expr, model.lo, model.hi, model.levels)
        )
    score = F.round(dist, round_to) if round_to is not None else dist
    cut = float(radius) * float(rerank_slack) if rerank is not None else float(radius)
    out = (
        cands.select(
            F.col(id_col),
            F.col("partition_id"),
            score.alias("squared_distance"),
            dist.alias("__d"),
        )
        .where(F.col("squared_distance") <= cut)
    )
    if rerank is not None:
        survivors = out.select(id_col, "partition_id")
        exact = squared_l2(qA, F.col("embedding").cast("array<double>"))
        ex = (
            rerank.select(id_col, "embedding")
            .join(F.broadcast(survivors), id_col)
            .select(F.col(id_col), F.col("partition_id"), exact.alias("__d"))
        )
        score2 = (
            F.round(F.col("__d"), round_to)
            if round_to is not None
            else F.col("__d")
        )
        out = ex.select(
            id_col,
            "partition_id",
            score2.alias("squared_distance"),
            "__d",
        ).where(F.col("squared_distance") <= float(radius))
    out = out.orderBy(F.col("__d").asc(), F.col(id_col).asc())
    if limit is not None:
        out = out.limit(int(limit))
    return out.drop("__d")


def assemble_ivfsq(
    vectors: DataFrame,
    model: IVFSQModel,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    missing_cell: str = "error",
    attr_cols: tuple = (),
) -> IVFSQModel:
    """Encode a corpus SHARD against a FROZEN IVF+SQ model — the
    train-once / encode-everywhere half of the 100 TB build shape
    (`operators/build.py::assemble_index`'s SQ sibling): train
    centroids + bounds once on a bounded sample, `assemble_ivfsq`
    each shard independently (embarrassingly parallel, no cross-shard
    traffic), then `merge_ivfsq`. One broadcast-join argmin + map-only
    encode; no bounds pass (they are inputs). ``missing_cell``: see
    `encode_frozen_residuals` — a cell absent from the frozen per-cell
    bounds errors loudly (default) or degrades to centroid-only codes,
    never a silent drop."""
    resid = ivfsq_residuals(
        vectors, model.centroids, id_col, vec_col,
        keep_cols=tuple(attr_cols),
    )
    enc = encode_frozen_residuals(resid, model, id_col, missing_cell)
    return IVFSQModel(
        centroids=model.centroids,
        lo=model.lo,
        hi=model.hi,
        encoded=enc,
        cell_bounds=model.cell_bounds,
        levels=model.levels,
    )


def cell_bounds_fingerprint(cell_bounds: DataFrame) -> int:
    """Order-independent content fingerprint of a per-cell bounds
    table: bit_xor of per-row xxhash64(partition_id, lo, hi), combined
    with the row count (a sum would overflow under ANSI mode; XOR is
    order-independent and overflow-free, and folding the count back in
    keeps tables differing only by duplicated rows — which XOR cancels
    — distinguishable). One O(P)-row job — cheap by construction (the table
    broadcasts), and it lets two shards RELOADED from disk prove they
    share the one frozen training pass (ADVICE r8 #5: object identity
    rejected the realistic multi-job 100 TB build, where each shard is
    assembled after save/load in its own driver)."""
    row = cell_bounds.select(
        # bit_xor, not sum: order-independent AND overflow-free (ANSI
        # mode makes a bigint sum overflow throw); the row count rides
        # along so two tables differing only by duplicated rows (which
        # XOR out) still compare unequal
        F.expr("bit_xor(xxhash64(partition_id, lo, hi))").alias("fp"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    return (int(row["fp"]) if row["fp"] is not None else 0) ^ (
        int(row["n"]) << 1
    )


def merge_ivfsq(
    base: IVFSQModel,
    other: IVFSQModel,
    id_col: str = "vec_id",
    prefer: str = "other",
    assume_disjoint: bool = False,
    assume_same_bounds: bool = False,
) -> IVFSQModel:
    """Merge two IVF+SQ shards ENCODED WITH THE SAME FROZEN MODEL
    (`maintenance.merge_indexes`' SQ sibling): codes produced under
    identical centroids AND bounds are directly comparable, so a
    disjoint merge is a pure plan union — no shuffle, no scan.
    Overlapping ids cost one id-keyed anti-join (``prefer`` picks the
    winner, "other" = last-write-wins). Raises when the frozen state
    differs: global bounds are compared element-wise; per-cell bounds
    accept the SAME DataFrame object for free, else compare an O(P)
    content fingerprint (ADVICE r8 #5: identity alone rejected shards
    assembled after save/load — the realistic multi-driver 100 TB
    build — even though their frozen bounds are identical).
    ``assume_same_bounds=True`` skips even the fingerprint jobs when
    the caller has out-of-band proof (e.g. both loaded from the same
    manifest path)."""
    if prefer not in ("base", "other"):
        raise ValueError(f"prefer must be 'base' or 'other', got {prefer!r}")
    if (base.cell_bounds is None) != (other.cell_bounds is None):
        raise ValueError("cannot merge global-bounds with per-cell-bounds")
    if int(base.levels) != int(other.levels):
        raise ValueError(
            f"quantization depth differs ({base.levels} vs {other.levels} "
            "levels) — codes are not comparable across shards"
        )
    if base.cell_bounds is not None:
        if (
            not assume_same_bounds
            and base.cell_bounds is not other.cell_bounds
        ):
            if cell_bounds_fingerprint(
                base.cell_bounds
            ) != cell_bounds_fingerprint(other.cell_bounds):
                raise ValueError(
                    "per-cell bounds differ — codes are not comparable "
                    "across shards (assemble both from one frozen model)"
                )
    else:
        if list(base.lo) != list(other.lo) or list(base.hi) != list(
            other.hi
        ):
            raise ValueError(
                "bounds differ — codes are not comparable across shards"
            )
    a, b = base.encoded, other.encoded
    if not assume_disjoint:
        if prefer == "other":
            a = a.join(b.select(id_col), id_col, "left_anti")
        else:
            b = b.join(a.select(id_col), id_col, "left_anti")
    return IVFSQModel(
        centroids=base.centroids,
        lo=base.lo,
        hi=base.hi,
        encoded=a.unionByName(b),
        cell_bounds=base.cell_bounds,
        levels=base.levels,
    )


def ivfsq_query_batch(
    model: IVFSQModel,
    queries: list[tuple[int, list]],
    k: int,
    nprobe: int,
    id_col: str = "vec_id",
    round_to: int | None = None,
    where=None,
    collect_centroids: bool = True,
    rerank: DataFrame | None = None,
    rerank_factor: int = 4,
) -> DataFrame:
    """Batch IVF+SQ8 kNN — serving parity with the PQ side's
    `plans.ivf.ann_query`: one job for Q queries instead of Q jobs.
    Returns ``(query_id, id_col, partition_id, squared_distance,
    rank)``.

    Phase 1 (probe selection), ``collect_centroids`` (VERDICT r8 #2 —
    parity with the PQ side's huge-P mode, `plans.ivf.ann_query`):

    - ``True`` (default): O(Q * P) driver arithmetic over the
      collected centroids — P <= ~1e5 is MBs. The accumulation runs
      dimension-by-dimension (``acc + diff^2`` per dim), the exact
      left-fold the engine's ``squared_l2`` aggregate performs, so
      near-tie centroid distances order IDENTICALLY to `ivfsq_query`
      and the distributed path (ADVICE r8 #3: NumPy's pairwise-summed
      ``.sum(axis=2)`` could flip probed cells on ties).
    - ``False``: probe selection as a DISTRIBUTED job
      (`plans.ivf.select_probes_df` — broadcast queries x centroid
      scan, per-query top-nprobe via WindowGroupLimit); only the
      O(Q * nprobe) winning (query, cell) pairs are collected. Use
      past ~1e5 partitions, where the centroid table stops fitting on
      the driver.

    Either way the probe list ships as a broadcast (query_id,
    partition_id) table whose semi-join prunes the encoded scan to the
    union of probed cells, applied as a LITERAL isin so it lands in
    the Parquet PartitionFilters at rest; query vectors ride a second
    broadcast join; per-query top-k is a row_number window the
    optimizer runs as WindowGroupLimit, so the rank exchange carries
    O(Q * k * tasks) rows, never the scan.

    ``where``: optional pre-filter predicate (Column or SQL string)
    over the encoded rows' columns, applied BEFORE scoring — each
    query still returns up to k rows, all satisfying it (the filtered
    search mode of `ann_query`).

    ``round_to``: output rounding; ranking then orders by the ROUNDED
    score with id tie-break (the frozen-row convention — see
    `ivfsq_query`).

    ``rerank``/``rerank_factor`` (r9): exact re-rank of the quantized
    top ``k * rerank_factor`` per query against the ORIGINAL vectors
    (one broadcast join of the O(Q * k * factor) survivor set) — the
    PQ side's refinement mode; emitted distances become exact."""
    import numpy as np
    from pyspark.sql import Window

    spark = model.encoded.sparkSession
    cc = cent_col_name(model.centroids)
    qids = [int(q) for q, _ in queries]
    if not qids:
        # an empty batch is a legal call (ADVICE r8 #3) — return an
        # empty frame with the contract schema instead of raising in
        # np.array shape inference
        id_type = model.encoded.schema[id_col].dataType.simpleString()
        return spark.createDataFrame(
            [],
            f"query_id long, {id_col} {id_type}, partition_id int, "
            "squared_distance double, rank int",
        )
    Q = np.array([[float(x) for x in v] for _, v in queries])
    if collect_centroids:
        crows = model.centroids.orderBy("partition_id").collect()
        pids = np.array([r["partition_id"] for r in crows])
        C = np.array([list(r[cc]) for r in crows], dtype=np.float64)
        # dimension-major accumulation == the engine's aggregate fold
        # ((0 + d_0^2) + d_1^2) + ... — bit-identical tie behavior
        d2 = np.zeros((Q.shape[0], C.shape[0]))
        for j in range(C.shape[1]):
            diff = Q[:, j, None] - C[None, :, j]
            d2 += diff * diff
        probe_rows = [
            (qid, int(pids[j]))
            for qi, qid in enumerate(qids)
            for j in np.argsort(d2[qi], kind="stable")[: int(nprobe)]
        ]
    else:
        from flechasdb_spark.plans.ivf import select_probes_df

        probe_rows = [
            (int(r["query_id"]), int(r["partition_id"]))
            for r in select_probes_df(
                model.centroids, Q, int(nprobe), query_ids=qids
            )
            .select("query_id", "partition_id")
            .collect()
        ]
    probes = F.broadcast(
        spark.createDataFrame(
            probe_rows, "query_id long, partition_id int"
        )
    )
    qdf = F.broadcast(
        spark.createDataFrame(
            [(qid, [float(x) for x in v]) for qid, v in queries],
            "query_id long, __qv array<double>",
        )
    )
    # the union of probed cells is driver-known — apply it as a
    # LITERAL isin so it lands in the Parquet PartitionFilters (the
    # per-query assignment still comes from the probes join)
    all_probed = sorted({pid for _, pid in probe_rows})
    cands = model.encoded.where(F.col("partition_id").isin(all_probed))
    if where is not None:
        cands = cands.where(where)
    cands = (
        cands.join(probes, "partition_id")
        .join(F.broadcast(model.centroids), "partition_id")
        .join(qdf, "query_id")
    )
    if model.cell_bounds is not None:
        cands = cands.join(F.broadcast(model.cell_bounds), "partition_id")
        recon = F.zip_with(
            F.col(cc).cast("array<double>"),
            sq_decode_cols("codes", "lo", "hi", model.levels),
            lambda c, r: c + r,
        )
    else:
        recon = _recon("codes", cc, model.lo, model.hi, model.levels)
    dist = squared_l2(F.col("__qv"), recon)
    scored = cands.select(
        "query_id", F.col(id_col), F.col("partition_id"), dist.alias("__d")
    )
    rank_col = (
        F.round(F.col("__d"), round_to)
        if round_to is not None
        else F.col("__d")
    )
    w = Window.partitionBy("query_id").orderBy(
        rank_col.asc(), F.col(id_col).asc()
    )
    adc_k = int(k) * int(rerank_factor) if rerank is not None else int(k)
    topk = scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= adc_k
    )
    if rerank is not None:
        cand = topk.select("query_id", id_col, "partition_id")
        exact = (
            rerank.select(id_col, "embedding")
            .join(F.broadcast(cand), id_col)
            .join(qdf, "query_id")
            .select(
                "query_id",
                F.col(id_col),
                F.col("partition_id"),
                squared_l2(
                    F.col("embedding").cast("array<double>"),
                    F.col("__qv"),
                ).alias("__d"),
            )
        )
        rank2 = (
            F.round(F.col("__d"), round_to)
            if round_to is not None
            else F.col("__d")
        )
        w2 = Window.partitionBy("query_id").orderBy(
            rank2.asc(), F.col(id_col).asc()
        )
        topk = exact.withColumn("rank", F.row_number().over(w2)).where(
            F.col("rank") <= int(k)
        )
    out_score = (
        F.round(F.col("__d"), round_to)
        if round_to is not None
        else F.col("__d")
    )
    return topk.select(
        "query_id",
        id_col,
        "partition_id",
        out_score.alias("squared_distance"),
        "rank",
    )


def ivfsq_range_query_batch(
    model: IVFSQModel,
    queries: list[tuple[int, list]],
    radius: float,
    nprobe: int,
    id_col: str = "vec_id",
    round_to: int | None = None,
    limit_per_query: int | None = None,
    collect_centroids: bool = True,
    where=None,
    rerank: DataFrame | None = None,
    rerank_slack: float = 1.5,
) -> DataFrame:
    """Batch radius search — `ivfsq_query_batch`'s serving shape with
    `ivfsq_range_query`'s filter tail: one job for Q radius queries,
    returning ``(query_id, id_col, partition_id, squared_distance)``
    (plus ``rank`` when ``limit_per_query`` caps each query's result
    to its nearest members via WindowGroupLimit). Probe selection,
    broadcast tables, literal-isin partition pruning, and the
    ``collect_centroids=False`` huge-P mode are shared with the top-k
    batch path; the per-candidate filter is codegen, so the only rows
    that reach any exchange are the matches.

    ``rerank``/``rerank_slack`` (r10): exact refinement of the radius
    contract — quantized pre-filter at ``radius * rerank_slack``, one
    broadcast join of the O(matches) survivors against the ORIGINAL
    vectors, final filter of the EXACT (rounded) distance at
    ``radius`` (see `ivfsq_range_query`)."""
    from pyspark.sql import Window

    import numpy as np

    spark = model.encoded.sparkSession
    cc = cent_col_name(model.centroids)
    qids = [int(q) for q, _ in queries]
    if not qids:
        # the empty-batch schema must match the non-empty path's:
        # limit_per_query adds a rank column there, so it does here too
        # (ADVICE r9 #3 — a caller unioning per-shard batches would
        # otherwise see a schema that depends on batch emptiness)
        id_type = model.encoded.schema[id_col].dataType.simpleString()
        schema = (
            f"query_id long, {id_col} {id_type}, partition_id int, "
            "squared_distance double"
        )
        if limit_per_query is not None:
            schema += ", rank int"
        return spark.createDataFrame([], schema)
    Q = np.array([[float(x) for x in v] for _, v in queries])
    if collect_centroids:
        crows = model.centroids.orderBy("partition_id").collect()
        pids = np.array([r["partition_id"] for r in crows])
        C = np.array([list(r[cc]) for r in crows], dtype=np.float64)
        d2 = np.zeros((Q.shape[0], C.shape[0]))
        for j in range(C.shape[1]):
            diff = Q[:, j, None] - C[None, :, j]
            d2 += diff * diff
        probe_rows = [
            (qid, int(pids[j]))
            for qi, qid in enumerate(qids)
            for j in np.argsort(d2[qi], kind="stable")[: int(nprobe)]
        ]
    else:
        from flechasdb_spark.plans.ivf import select_probes_df

        probe_rows = [
            (int(r["query_id"]), int(r["partition_id"]))
            for r in select_probes_df(
                model.centroids, Q, int(nprobe), query_ids=qids
            )
            .select("query_id", "partition_id")
            .collect()
        ]
    probes = F.broadcast(
        spark.createDataFrame(probe_rows, "query_id long, partition_id int")
    )
    qdf = F.broadcast(
        spark.createDataFrame(
            [(qid, [float(x) for x in v]) for qid, v in queries],
            "query_id long, __qv array<double>",
        )
    )
    all_probed = sorted({pid for _, pid in probe_rows})
    cands = model.encoded.where(F.col("partition_id").isin(all_probed))
    if where is not None:
        cands = cands.where(where)
    cands = (
        cands.join(probes, "partition_id")
        .join(F.broadcast(model.centroids), "partition_id")
        .join(qdf, "query_id")
    )
    if model.cell_bounds is not None:
        cands = cands.join(F.broadcast(model.cell_bounds), "partition_id")
        recon = F.zip_with(
            F.col(cc).cast("array<double>"),
            sq_decode_cols("codes", "lo", "hi", model.levels),
            lambda c, r: c + r,
        )
    else:
        recon = _recon("codes", cc, model.lo, model.hi, model.levels)
    dist = squared_l2(F.col("__qv"), recon)
    score = F.round(dist, round_to) if round_to is not None else dist
    cut = (
        float(radius) * float(rerank_slack)
        if rerank is not None
        else float(radius)
    )
    out = cands.select(
        "query_id",
        F.col(id_col),
        F.col("partition_id"),
        score.alias("squared_distance"),
        dist.alias("__d"),
    ).where(F.col("squared_distance") <= cut)
    if rerank is not None:
        survivors = out.select("query_id", id_col, "partition_id")
        ex = (
            rerank.select(id_col, "embedding")
            .join(F.broadcast(survivors), id_col)
            .join(qdf, "query_id")
            .select(
                "query_id",
                F.col(id_col),
                F.col("partition_id"),
                squared_l2(
                    F.col("embedding").cast("array<double>"), F.col("__qv")
                ).alias("__d"),
            )
        )
        score2 = (
            F.round(F.col("__d"), round_to)
            if round_to is not None
            else F.col("__d")
        )
        out = ex.select(
            "query_id",
            id_col,
            "partition_id",
            score2.alias("squared_distance"),
            "__d",
        ).where(F.col("squared_distance") <= float(radius))
    if limit_per_query is not None:
        w = Window.partitionBy("query_id").orderBy(
            F.col("squared_distance").asc(), F.col(id_col).asc()
        )
        return (
            out.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= int(limit_per_query))
            .select(
                "query_id", id_col, "partition_id",
                "squared_distance", "rank",
            )
        )
    return out.drop("__d")


def save_ivfsq(model: IVFSQModel, path: str, pack_codes: bool = False) -> None:
    """Persist the index: encoded codes partitioned by cell (so a
    probed query reads only its cells' directories — Parquet partition
    pruning, the same at-rest layout as the IVF+PQ index), centroids
    as one small parquet, residual bounds in the manifest JSON.

    ``pack_codes`` (r10, VERDICT r9 #3): store codes as ``binary``
    instead of ``array<smallint>`` — 1 byte/code at SQ8, 2 codes/byte
    at SQ4 (`operators.sq.pack_codes_expr`). `load_ivfsq` unpacks
    LAZILY in the scan projection (pure hex SQL, codegen), so every
    query path works unchanged and the roundtrip is exact
    (pytest-gated); only the at-rest bytes shrink (measured table in
    SCALING.md §r10)."""
    import os

    from flechasdb_spark.operators.sq import (
        pack_codes_expr,
        pack_mode_for_levels,
    )
    from flechasdb_spark.sources.manifest import write_manifest_json

    spark = model.encoded.sparkSession
    enc = model.encoded
    meta: dict = {"kind": "ivfsq", "levels": int(model.levels)}
    if pack_codes:
        mode = pack_mode_for_levels(model.levels)
        if model.lo is not None:
            dim = len(model.lo)
        else:
            dim = len(model.cell_bounds.select("lo").first()["lo"])
        meta["packed"] = mode
        meta["dim"] = int(dim)
        others = [c for c in enc.columns if c != "codes"]
        enc = enc.select(
            *others, pack_codes_expr("codes", mode).alias("codes_bin")
        )
    (
        enc.repartition("partition_id")
        .write.mode("overwrite")
        .partitionBy("partition_id")
        .parquet(os.path.join(path, "index"))
    )
    model.centroids.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "centroids")
    )
    if model.cell_bounds is not None:
        meta["bounds"] = "per_cell"
        model.cell_bounds.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(path, "cell_bounds")
        )
    else:
        meta["bounds"] = "global"
        meta["lo"] = [float(x) for x in model.lo]
        meta["hi"] = [float(x) for x in model.hi]
    write_manifest_json(spark, os.path.join(path, "ivfsq.json"), meta)


def load_ivfsq(spark, path: str) -> IVFSQModel:
    """Load a persisted IVF+SQ index. The encoded side stays lazy — a
    query's probe semi-join prunes to the probed ``partition_id=``
    directories (plan-gated in tests/test_ivfsq.py). A packed index
    (``save_ivfsq(pack_codes=True)``) unpacks in the load projection:
    the hex-slice decode composes into every downstream scan, so the
    serving paths see the same ``codes array<smallint>`` column and
    the partition pruning is untouched."""
    import os

    from flechasdb_spark.operators.sq import unpack_codes_expr
    from flechasdb_spark.sources.manifest import read_manifest_json

    t = read_manifest_json(spark, os.path.join(path, "ivfsq.json"))
    if t is None or t.get("kind") != "ivfsq":
        raise ValueError(f"not an ivfsq index: {path}")
    levels = int(t.get("levels", 255))  # pre-r9 manifests are SQ8
    encoded = spark.read.parquet(os.path.join(path, "index"))
    if t.get("packed"):
        encoded = encoded.withColumn(
            "codes",
            unpack_codes_expr("codes_bin", int(t["dim"]), t["packed"]),
        ).drop("codes_bin")
    if t.get("bounds") == "per_cell":
        return IVFSQModel(
            centroids=spark.read.parquet(os.path.join(path, "centroids")),
            lo=None,
            hi=None,
            encoded=encoded,
            cell_bounds=spark.read.parquet(
                os.path.join(path, "cell_bounds")
            ),
            levels=levels,
        )
    return IVFSQModel(
        centroids=spark.read.parquet(os.path.join(path, "centroids")),
        lo=[float(x) for x in t["lo"]],
        hi=[float(x) for x in t["hi"]],
        encoded=encoded,
        levels=levels,
    )


def train_ivfsq(
    vectors: DataFrame,
    num_partitions: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    sample_n: int = 100_000,
    bounds: str = "global",
    clip: tuple[float, float] | None = None,
    bits: int = 8,
    attr_cols: tuple = (),
) -> IVFSQModel:
    """Production one-call build: coarse k-means on a bounded
    deterministic sample (the build_index training pattern —
    operators/build.py), then `build_ivfsq` against the trained
    centroids. The oracle row keeps the frozen-centroid path.
    ``attr_cols`` ride onto the encoded rows for filtered search,
    exactly as in `build_ivfsq` (r10: forwarded so the transformed
    factory composition can use them too, VERDICT r9 #4)."""
    import numpy as np

    from flechasdb_spark.operators.itq import sample_to_driver
    from flechasdb_spark.operators.kmeans_np import kmeans_fit

    x = sample_to_driver(
        vectors, vec_col, id_col, sample_n, f"ivfsq{seed}"
    )
    cent, _ = kmeans_fit(x, int(num_partitions), seed=seed)
    spark = vectors.sparkSession
    cent_df = spark.createDataFrame(
        [
            (int(i), [float(v) for v in row])
            for i, row in enumerate(np.asarray(cent))
        ],
        "partition_id int, centroid array<double>",
    )
    return build_ivfsq(
        vectors, cent_df, id_col=id_col, vec_col=vec_col,
        bounds=bounds, clip=clip, bits=bits, attr_cols=tuple(attr_cols),
    )
