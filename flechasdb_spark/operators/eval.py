"""Evaluation operators: recall of an approximate result set against
the exact baseline — the metric the reference's ANN quality is judged
by (SURVEY.md §5.2 oracle (c): IVF+PQ top-k vs exact top-k recall).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flechasdb_spark.functions.linalg import squared_l2

__all__ = [
    "recall_at_k",
    "index_partition_stats",
    "rank_metrics",
    "classification_report",
    "margin_calibration",
    "embedding_centroid_report",
    "psi_report",
    "prefix_dim_recall_curve",
    "prefix_dim_recall_multi",
    "auto_nprobe",
]


def prefix_dim_recall_curve(
    vectors: DataFrame,
    query_vector: list,
    k: int,
    dims: list[int],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka truncation sweep (Kusupati et al. 2022, MRL): for
    each prefix width d' in ``dims``, exact top-k by squared L2 over
    the FIRST d' dimensions, scored against the full-dimension exact
    top-k — "how many dims can serving truncate away before recall
    falls off". MRL-trained embeddings stay near 1.0 well below full
    width; conventional embeddings decay fast — this measurement is
    how a 100 TB store decides whether to keep a cheap truncated
    serving tier (a d'/N scan-byte and ADC-table cut with NO
    re-encode, orthogonal to the SQ/PQ choice).

    Returns one row per arm: ``(dims, k, n_hit)`` with n_hit =
    |prefix top-k ∩ full top-k| — integer-exact, engine-portable.

    Scale: each arm is a map-only prefix-slice distance +
    TakeOrderedAndProject over the same scan (no shuffle, no join);
    the intersection joins two O(k)-row driver-sized sets. The
    full-width exact top-k is localCheckpointed once (O(k) rows), so
    the per-arm joins reuse it instead of re-scanning the corpus
    (ADVICE r8 #4). For a statistically meaningful estimate over a
    QUERY SET, use `prefix_dim_recall_multi`."""
    if not list(dims):
        raise ValueError("dims must be a non-empty list of prefix widths")
    full_dim = len(list(query_vector))
    q = [float(x) for x in query_vector]

    def _topk(d: int) -> DataFrame:
        from flechasdb_spark.functions.linalg import lit_doubles

        qd = lit_doubles(q[:d])
        vd = (
            F.col(vec_col).cast("array<double>")
            if d == full_dim
            else F.slice(F.col(vec_col).cast("array<double>"), 1, d)
        )
        dist = squared_l2(qd, vd)
        return (
            vectors.select(F.col(id_col), dist.alias("__d"))
            .orderBy(F.col("__d").asc(), F.col(id_col).asc())
            .limit(int(k))
            .select(id_col)
        )

    # materialize the O(k)-row exact set once; every arm joins against
    # these k rows instead of re-deriving the full-width scan per arm
    exact = _topk(full_dim).localCheckpoint(eager=True)
    arms = None
    for d in dims:
        hit = (
            _topk(int(d))
            .join(exact, id_col, "left_semi")
            .agg(F.count(F.lit(1)).alias("n_hit"))
            .select(
                F.lit(int(d)).cast("long").alias("dims"),
                F.lit(int(k)).cast("long").alias("k"),
                F.col("n_hit").cast("long"),
            )
        )
        arms = hit if arms is None else arms.unionByName(hit)
    return arms


def prefix_dim_recall_multi(
    vectors: DataFrame,
    queries: list[tuple[int, list]],
    k: int,
    dims: list[int],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """`prefix_dim_recall_curve` over a QUERY SET (VERDICT r8 #5): the
    single-query row estimates recall from k draws — the truncation
    decision a 100 TB store makes deserves per-arm aggregates over
    many queries. One row per prefix width: ``(dims, k, n_queries,
    sum_hit, min_hit, max_hit)`` — integer-exact, engine-portable
    (recall = sum_hit / (n_queries * k); min_hit exposes the worst
    query, which a mean alone hides).

    ONE job: squared diffs are computed once per (vector, query) pair,
    each arm then folds a PREFIX SLICE of that shared array (so the
    arm sweep adds slice-sum work, not recomputed distances); per-
    (query, arm) top-k is a row_number window Spark runs as
    WindowGroupLimit — the rank exchange carries O(Q * arms * k *
    tasks) rows, never the scan. The full-width arm doubles as the
    exact baseline. Every (query, arm) group carries exactly k top-k
    rows, so zero-hit groups still aggregate (left join + indicator,
    not a vanishing semi-join).

    Scale: compute is O(N * Q * sum(dims)) map-side — the exhaustive
    eval harness's cost, run on a sampled corpus/query set; the
    serving-side equivalent composes prefix slicing with the IVF
    index instead."""
    from pyspark.sql import Window

    dims = [int(d) for d in dims]
    if not dims:
        raise ValueError("dims must be a non-empty list of prefix widths")
    if not queries:
        raise ValueError("queries must be non-empty")
    full_dim = len(list(queries[0][1]))
    if any(d < 1 or d > full_dim for d in dims):
        raise ValueError(f"every dim must be in [1, {full_dim}]: {dims}")
    spark = vectors.sparkSession
    qdf = F.broadcast(
        spark.createDataFrame(
            [(int(q), [float(x) for x in v]) for q, v in queries],
            "query_id long, __qv array<double>",
        )
    )
    arm_vals = sorted(set(dims) | {full_dim})
    armdf = F.broadcast(
        spark.createDataFrame([(d,) for d in arm_vals], "dims int")
    )
    diffs2 = F.zip_with(
        F.col(vec_col).cast("array<double>"),
        F.col("__qv"),
        lambda a, b: (a - b) * (a - b),
    )
    scored = (
        vectors.select(id_col, vec_col)
        .join(qdf)
        .withColumn("__d2", diffs2)
        .join(armdf)
        .select(
            "query_id",
            "dims",
            F.col(id_col),
            F.aggregate(
                F.slice(F.col("__d2"), F.lit(1), F.col("dims")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("__d"),
        )
    )
    w = Window.partitionBy("query_id", "dims").orderBy(
        F.col("__d").asc(), F.col(id_col).asc()
    )
    topk = (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= int(k))
        .select("query_id", "dims", id_col)
    )
    exact = (
        topk.where(F.col("dims") == full_dim)
        .select("query_id", id_col, F.lit(1).alias("__hit"))
    )
    per_q = (
        topk.where(F.col("dims").isin(dims))
        .join(exact, ["query_id", id_col], "left")
        .groupBy("query_id", "dims")
        .agg(F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_hit"))
    )
    return (
        per_q.groupBy("dims")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_queries"),
            F.sum("n_hit").cast("long").alias("sum_hit"),
            F.min("n_hit").cast("long").alias("min_hit"),
            F.max("n_hit").cast("long").alias("max_hit"),
        )
        .select(
            F.col("dims").cast("long"),
            F.lit(int(k)).cast("long").alias("k"),
            "n_queries",
            "sum_hit",
            "min_hit",
            "max_hit",
        )
    )


def recall_at_k(
    exact: DataFrame,
    approx: DataFrame,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-query recall: |approx ∩ exact| / |exact| over the id sets.

    Both inputs carry (query_id, id) rows (ranks/scores ignored).
    Returns (query_id, n_exact, n_hit, recall) — partial-aggregable
    counts, one small shuffle on query_id."""
    e = exact.select(query_id_col, id_col).distinct()
    a = approx.select(query_id_col, id_col).distinct()
    hits = e.join(a, [query_id_col, id_col], "left_semi")
    n_exact = e.groupBy(query_id_col).agg(F.count(F.lit(1)).alias("n_exact"))
    n_hit = hits.groupBy(query_id_col).agg(F.count(F.lit(1)).alias("n_hit"))
    return (
        n_exact.join(n_hit, query_id_col, "left")
        .select(
            query_id_col,
            "n_exact",
            F.coalesce(F.col("n_hit"), F.lit(0)).alias("n_hit"),
            F.round(
                F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_exact"), 4
            ).alias("recall"),
        )
    )


def index_partition_stats(
    encoded: DataFrame, pid_col: str = "partition_id"
) -> DataFrame:
    """Partition-balance report for an IVF index: per-partition vector
    count and corpus share, plus the imbalance factor P * max / total
    (1.0 = perfectly uniform) repeated on every row. The 100 TB
    operational question this answers: is one IVF cell hot? A skewed
    cell means probe-time stragglers (a probed partition is one scan
    unit) and argues for re-training the coarse quantizer or splitting
    the cell.

    One partial-agg pass over (pid) + a broadcast 1-row summary — no
    data shuffle beyond the P-row count table."""
    counts = encoded.groupBy(pid_col).agg(
        F.count(F.lit(1)).alias("n_vectors")
    )
    summary = counts.agg(
        F.sum("n_vectors").alias("__tot"),
        F.max("n_vectors").alias("__mx"),
        F.count(F.lit(1)).alias("__p"),
    )
    return counts.crossJoin(F.broadcast(summary)).select(
        pid_col,
        F.col("n_vectors").cast("long").alias("n_vectors"),
        F.round(F.col("n_vectors") / F.col("__tot"), 6).alias("share"),
        F.round(F.col("__p") * F.col("__mx") / F.col("__tot"), 4).alias(
            "imbalance"
        ),
    )


def rank_metrics(
    ranked: DataFrame,
    truth: DataFrame,
    k: int = 10,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-query ranking quality of a retrieval result against a binary
    relevance set: MRR (reciprocal rank of the first relevant hit in
    the top-k) and nDCG@k (log2-discounted gain over the ideal).

    Determinism: each rank's discount gain is quantized to an integer
    (round(1e6 / log2(rank+1))), so DCG and ideal-DCG are
    order-independent INTEGER sums — same engine-exactness contract as
    the DSIR scores; the final ndcg is one exact integer division,
    rounded to 4 decimals.

    Scale: top-k filter bounds the join to O(Q*k) rows; relevance
    counts are partial aggs; the ideal-DCG explodes <= k rows per query
    (F.sequence). Everything keys on query_id — no corpus-sized
    shuffle.

    Returns (query_id, n_rel, n_hits, first_rel_rank, rr, ndcg) — one
    row per query id appearing in EITHER the ranked top-k or the truth
    set (r4 ADVICE: the former truth-keyed output silently dropped
    queries ranked with zero relevant docs, so a downstream mean
    excluded them); first_rel_rank = 0 and rr = ndcg = 0.0 when no
    relevant doc is retrieved (n_rel = 0 queries score 0 by
    convention, and now actually appear as rows).
    """
    gain = lambda r: F.round(1e6 / F.log(2.0, r + 1)).cast("long")
    topk = ranked.where(F.col(rank_col) <= k).select(
        query_id_col, id_col, F.col(rank_col).alias("__rk")
    )
    tr = truth.select(query_id_col, id_col).distinct()
    qids = (
        topk.select(query_id_col)
        .union(tr.select(query_id_col))
        .distinct()
    )
    nrel = qids.join(
        tr.groupBy(query_id_col).agg(F.count(F.lit(1)).alias("n_rel")),
        query_id_col,
        "left",
    ).select(
        query_id_col,
        F.coalesce(F.col("n_rel"), F.lit(0)).cast("long").alias("n_rel"),
    )
    hits = topk.join(tr, [query_id_col, id_col])
    dcg = hits.groupBy(query_id_col).agg(
        F.min("__rk").cast("long").alias("__first"),
        F.sum(gain(F.col("__rk"))).alias("__dcg"),
        F.count(F.lit(1)).alias("n_hits"),
    )
    ideal = (
        # n_rel = 0 must not reach the explode: F.sequence(1, 0) yields
        # a DESCENDING [1, 0] in Spark, and rank 0's discount divides
        # by log2(1) = 0. Such queries keep __idcg null -> ndcg 0.
        nrel.where(F.col("n_rel") >= 1)
        .select(
            query_id_col,
            F.explode(
                F.sequence(F.lit(1), F.least(F.col("n_rel"), F.lit(k)))
            ).alias("__i"),
        )
        .groupBy(query_id_col)
        .agg(F.sum(gain(F.col("__i"))).alias("__idcg"))
    )
    return (
        nrel.join(dcg, query_id_col, "left")
        .join(ideal, query_id_col, "left")
        .select(
            query_id_col,
            "n_rel",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            F.coalesce(F.col("__first"), F.lit(0)).alias("first_rel_rank"),
            F.round(
                F.when(F.col("__first").isNull(), F.lit(0.0)).otherwise(
                    1.0 / F.col("__first")
                ),
                4,
            ).alias("rr"),
            F.round(
                F.when(
                    F.col("__idcg").isNull() | (F.col("__idcg") == 0),
                    F.lit(0.0),
                ).otherwise(
                    F.coalesce(F.col("__dcg"), F.lit(0)).cast("double")
                    / F.col("__idcg")
                ),
                4,
            ).alias("ndcg"),
        )
    )


def classification_report(
    scored: DataFrame,
    actual_col: str = "actual",
    pred_col: str = "predicted",
) -> DataFrame:
    """Per-label precision/recall/F1 from a (actual, predicted) frame —
    the audit a curation pipeline runs before trusting a quality/domain
    classifier's labels to route 100 TB of documents (the fastText-
    filter practice: inspect per-class errors, not just accuracy).

    Plan: ONE partial-aggregable shuffle collapses the corpus to the
    O(L^2) confusion table; every per-label count (support, n_pred,
    tp) is then an agg over THAT table, and the label spine is a full
    outer join of the two tiny marginals — a label that only ever
    appears as a prediction (or only in truth) still gets a row, with
    the undefined ratio reported as 0.0 by the usual convention.
    The confusion table is eagerly ``localCheckpoint``ed before the
    marginals branch off it: three DataFrame branches over one parent
    would otherwise re-execute the ENTIRE upstream scoring lineage
    three times (measured 4.4 s vs 2.0 s for the bare classifier at
    sf0.1 — at corpus scale, three full passes instead of one); the
    checkpoint pins the one corpus pass and the branches read O(L^2)
    materialized rows.

    precision = tp / n_pred, recall = tp / support,
    f1 = 2 p r / (p + r) computed from the UNROUNDED ratios, each
    rounded to 4 decimals only at the output — integer counts
    everywhere else, so the report is engine-exact.

    Returns (label, support, n_pred, tp, precision, recall, f1),
    one row per label in truth OR predictions.
    """
    conf = scored.groupBy(
        F.col(actual_col).alias("__a"), F.col(pred_col).alias("__p")
    ).agg(F.count(F.lit(1)).alias("__c"))
    # r13 (guide §2.4, VERDICT r12 #4): the three marginals (support,
    # n_pred, tp) and their label-spine full-outer join collapse into
    # ONE explode + aggregate over the O(L^2) confusion rows — each
    # confusion cell contributes a support addend under its actual
    # label and an n_pred addend under its predicted label (tp rides
    # the actual-side struct), and the groupBy's key set IS the union
    # of truth and prediction labels, which is exactly what the former
    # full_outer spine produced. No checkpoint needed: the corpus pass
    # is executed once because the single aggregate has one consumer.
    # Counts are identical integer sums.
    cell = F.explode(
        F.array(
            F.struct(
                F.col("__a").alias("label"),
                F.col("__c").alias("s"),
                F.lit(0).cast("long").alias("p"),
                F.when(F.col("__a") == F.col("__p"), F.col("__c"))
                .otherwise(F.lit(0))
                .cast("long")
                .alias("t"),
            ),
            F.struct(
                F.col("__p").alias("label"),
                F.lit(0).cast("long").alias("s"),
                F.col("__c").cast("long").alias("p"),
                F.lit(0).cast("long").alias("t"),
            ),
        )
    )
    counts = (
        conf.select(cell.alias("__e"))
        .groupBy(F.col("__e")["label"].alias("label"))
        .agg(
            F.sum(F.col("__e")["s"]).alias("support"),
            F.sum(F.col("__e")["p"]).alias("n_pred"),
            F.sum(F.col("__e")["t"]).alias("tp"),
        )
    )
    prec = F.when(F.col("n_pred") == 0, F.lit(0.0)).otherwise(
        F.col("tp").cast("double") / F.col("n_pred")
    )
    rec = F.when(F.col("support") == 0, F.lit(0.0)).otherwise(
        F.col("tp").cast("double") / F.col("support")
    )
    return (
        counts.select(
            "label",
            F.col("support").cast("long").alias("support"),
            F.col("n_pred").cast("long").alias("n_pred"),
            F.col("tp").cast("long").alias("tp"),
        )
        .select(
            "label",
            "support",
            "n_pred",
            "tp",
            F.round(prec, 4).alias("precision"),
            F.round(rec, 4).alias("recall"),
            F.round(
                F.when(prec + rec == 0, F.lit(0.0)).otherwise(
                    2.0 * prec * rec / (prec + rec)
                ),
                4,
            ).alias("f1"),
        )
    )


def margin_calibration(
    scored: DataFrame,
    margin_col: str = "margin_micro_nats",
    correct_col: str = "correct",
    bin_width: int = 100_000,
    max_bin: int = 9,
) -> DataFrame:
    """Reliability table over the classifier's top-2 score margin: bin
    predictions by confidence gap (integer micro-nats, so the binning
    is exact integer division — no float bucket-edge ambiguity) and
    report empirical accuracy per bin. A well-behaved classifier's
    accuracy rises monotonically with margin; the table is how a
    pipeline picks the "keep only confident predictions" threshold
    with evidence instead of folklore.

    ``max_bin`` caps the top bin (open-ended: everything at or above
    max_bin * bin_width), bounding the output no matter how confident
    the tail gets. One partial-aggregable shuffle to O(max_bin + 1)
    rows — at 100 TB the map-side combine absorbs the corpus and the
    shuffle carries a handful of (bin, count, count_correct) triples
    per task.

    Returns (bin, margin_lo, n, n_correct, accuracy) sorted by bin.
    """
    w = int(bin_width)
    b = F.least(
        F.expr(f"{margin_col} DIV {w}"), F.lit(int(max_bin))
    ).cast("long")
    return (
        scored.groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(correct_col).cast("long")).alias("n_correct"),
        )
        .select(
            "bin",
            (F.col("bin") * w).cast("long").alias("margin_lo"),
            F.col("n").cast("long").alias("n"),
            F.col("n_correct").cast("long").alias("n_correct"),
            F.round(F.col("n_correct").cast("double") / F.col("n"), 4).alias(
                "accuracy"
            ),
        )
        .orderBy("bin")
    )


def embedding_centroid_report(
    df: DataFrame,
    by: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-geometry health report per group: vector count, mean
    squared norm, and the cosine of the group centroid to the global
    centroid — the drift monitor an embedding pipeline runs when a
    model version, encoder shard, or source starts emitting vectors
    whose scale or direction silently changed (all downstream ANN
    recall quietly degrades before anything errors).

    Engine-exact construction (every value reproducible by the DuckDB
    oracle bit-for-bit):

    - components quantize SHIFTED: q = round((x + 64) * 1e6), so every
      integer division below has a NON-NEGATIVE dividend — Spark's
      ``div`` truncates toward zero while DuckDB's ``//`` floors, and
      they only agree on non-negatives; the shift un-does exactly
      because (a + k*n) DIV n = a DIV n + k for integer k.
    - per-(group, pos) component sums and squared-norm sums accumulate
      as DECIMAL(38,0) (order-independent integer sums that cannot
      overflow long at corpus scale; DuckDB's SUM(BIGINT) is already
      exact int128).
    - centroid components floor to micro-units (s DIV n - 64e6), so
      dot products and squared norms of centroids stay EXACT longs
      (|c| <= ~1e7 -> dot <= dims * 1e14); the only float is the final
      cosine, one fixed-shape expression over exact integers.

    Plan: ONE corpus-grain posexplode + partial-agg shuffle to
    O(groups * dims) rows; everything after is arithmetic over that
    tiny table (global centroid = re-agg of the group sums). Returns
    (by, n_vectors, mean_norm2_micro2, cos_to_global), cosine 0.0 for
    a zero centroid.
    """
    SHIFT = 64_000_000  # 64.0 in micro-units
    q = F.transform(
        F.col(vec_col),
        # explicit double BEFORE adding the shift: a float32 + 64 in
        # single precision loses every bit below ~7.6e-6 (the DuckDB
        # oracle's FLOAT + INTEGER addition did exactly that)
        lambda x: F.round((x.cast("double") + 64.0) * 1e6).cast("long"),
    )
    ex = df.select(F.col(by), F.posexplode(q).alias("pos", "qs")).select(
        by,
        "pos",
        F.col("qs"),
        ((F.col("qs") - SHIFT) * (F.col("qs") - SHIFT)).alias("q2"),
    )
    comp = ex.groupBy(by, "pos").agg(
        F.sum(F.col("qs").cast("decimal(38,0)")).alias("s"),
        F.sum(F.col("q2").cast("decimal(38,0)")).alias("s2"),
        F.count(F.lit(1)).alias("n"),
    )
    cent = comp.select(
        by,
        "pos",
        "n",
        (F.expr("CAST(s DIV n AS BIGINT)") - SHIFT).alias("c"),
        F.col("s2"),
        F.col("s"),
    )
    glob = comp.groupBy("pos").agg(
        F.sum("s").alias("gs"), F.sum("n").alias("gn")
    ).select(
        "pos", (F.expr("CAST(gs DIV gn AS BIGINT)") - SHIFT).alias("g")
    )
    joined = cent.join(F.broadcast(glob), "pos")
    per_group = joined.groupBy(by).agg(
        F.max("n").alias("n_vectors"),
        F.sum(F.col("c") * F.col("g")).alias("dot"),
        F.sum(F.col("c") * F.col("c")).alias("na"),
        F.sum(F.col("g") * F.col("g")).alias("nb"),
        F.sum("s2").alias("s2tot"),
    )
    return per_group.select(
        by,
        F.col("n_vectors").cast("long").alias("n_vectors"),
        F.expr("CAST(s2tot DIV n_vectors AS BIGINT)").alias(
            "mean_norm2_micro2"
        ),
        F.round(
            F.when(
                (F.col("na") == 0) | (F.col("nb") == 0), F.lit(0.0)
            ).otherwise(
                F.col("dot")
                / (F.sqrt(F.col("na")) * F.sqrt(F.col("nb")))
            ),
            4,
        ).alias("cos_to_global"),
    )


def psi_report(
    cur: DataFrame,
    ref: DataFrame,
    value_col: str = "value",
    group_cols: list[str] | None = None,
    lo: float = 0.0,
    hi: float = 500.0,
    n_bins: int = 16,
) -> DataFrame:
    """Population Stability Index per group — the standard production
    drift metric for a numeric distribution (scores, features,
    quality signals) against a reference snapshot: PSI =
    sum_bins (p_cur - p_ref) * ln(p_cur / p_ref), with the usual
    reading <0.1 stable / 0.1-0.25 drifting / >0.25 shifted. The
    monitoring sibling of ``embedding_centroid_report`` for scalar
    columns.

    Engine-exact: fixed-grid clamped buckets (the
    ``histogram_quantiles`` idiom — identical double expression both
    engines), add-one smoothing over the dense bin grid so empty bins
    are defined, proportions as single divisions of exact integers,
    and each bin's term quantized to integer NANO-units before the
    sum (a float sum over bins would be order-dependent; the term
    (p-q)*ln(p/q) is always >= 0, so the rounding has no sign edge).

    Plan: one partial-agg pass per side to O(groups * bins) counts, a
    dense grid from the O(groups) spine (never data-sized), broadcast
    joins, O(groups) output. Returns (group_cols..., n_cur, n_ref,
    psi).
    """
    group_cols = group_cols or []
    B = int(n_bins)
    width = (hi - lo) / B
    b = F.least(
        F.greatest(
            F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)),
            F.lit(0),
        ),
        F.lit(B - 1),
    ).cast("long")

    def side(df: DataFrame, name: str) -> DataFrame:
        return df.groupBy(*group_cols, b.alias("__b")).agg(
            F.count(F.lit(1)).alias(name)
        )

    cc = side(cur, "__cc")
    cr = side(ref, "__cr")
    if group_cols:
        spine = (
            cur.select(*group_cols)
            .union(ref.select(*group_cols))
            .distinct()
            .select(
                *group_cols,
                F.explode(
                    F.sequence(F.lit(0), F.lit(B - 1))
                ).alias("__b"),
            )
        )
    else:
        # Ungrouped: the spine is the literal bin grid — a zero-column
        # select()/join-on-[] would be degenerate (ADVICE r6), so build
        # the B-row grid from range() and cross-join the 1-row totals.
        spine = cur.sparkSession.range(B).select(
            F.col("id").cast("long").alias("__b")
        )
    keys = [*group_cols, "__b"]
    joined = (
        spine.join(cc, keys, "left")
        .join(cr, keys, "left")
        .select(
            *group_cols,
            F.coalesce("__cc", F.lit(0)).alias("__cc"),
            F.coalesce("__cr", F.lit(0)).alias("__cr"),
        )
    )
    tot = joined.groupBy(*group_cols).agg(
        F.sum("__cc").alias("__nc"), F.sum("__cr").alias("__nr")
    )
    pc = (F.col("__cc") + 1) / (F.col("__nc") + B)
    pr = (F.col("__cr") + 1) / (F.col("__nr") + B)
    term_q = F.round((pc - pr) * F.log(pc / pr) * 1e9).cast("long")
    withtot = (
        joined.join(F.broadcast(tot), group_cols)
        if group_cols
        else joined.crossJoin(F.broadcast(tot))
    )
    return withtot.groupBy(*group_cols).agg(
        F.max("__nc").cast("long").alias("n_cur"),
        F.max("__nr").cast("long").alias("n_ref"),
        F.round(F.sum(term_q) / 1e9, 6).alias("psi"),
    )


def auto_nprobe(
    exact: DataFrame,
    search_fn,
    nprobes,
    target_recall: float,
    return_counts: bool = False,
):
    """FAISS-autotune analogue (r10): pick the SMALLEST nprobe whose
    mean recall@k over a query sample meets ``target_recall``,
    measured against a precomputed exact baseline — the tuning loop a
    100 TB store runs once per (index, workload) before pinning the
    serving knob, instead of guessing.

    ``exact``: (query_id, vec_id) — the flat-search truth for the
    sample (`knn_join` once; shared across arms). ``search_fn(nprobe)
    -> DataFrame(query_id, vec_id)`` — the serving path under test,
    family-agnostic: wrap `plans.ivf.ann_query`,
    `plans.ivfsq.ivfsq_query_batch`, a transformed composition, with
    or without rerank — whatever combination is being tuned. The loop
    EARLY-STOPS at the first candidate that meets the target (probed
    cells only per arm — never a corpus rescan, and no arm beyond the
    answer), so cost is sum(nprobe <= answer) partition scans.

    Returns ``(nprobe | None, curve)`` with ``curve`` =
    [(nprobe, mean_recall), ...] for every arm actually run — None
    when no candidate meets the target (widen the list, raise the
    rerank factor, or lower the target; the curve shows which stage
    to move, the `ann_nprobe_recall_curve` row's lesson).
    ``return_counts=True`` gives curve entries as the raw integer
    cells ``(nprobe, sum_n_hit, sum_n_exact)`` instead — the
    oracle-able form (registry row `ann_nprobe_autotune` rounds the
    ratio in-engine so the rounding rule matches DuckDB's; Python's
    banker's round here would not)."""
    # r12 (guide §2.4): the stopping rule only reads the GLOBAL sums
    # sum(n_hit) / sum(n_exact), so the per-query recall_at_k table is
    # unnecessary work per arm — sum(n_exact) is one count over the
    # deduplicated truth, paid ONCE, and each arm needs exactly one
    # semi-join count (|exact ∩ approx| pairs). Values are identical:
    # summing per-query counts equals counting pairs.
    ex = exact.select("query_id", "vec_id").distinct().persist()
    n_exact = ex.count()
    curve: list = []
    try:
        for np_ in sorted(int(n) for n in nprobes):
            approx = search_fn(np_)
            n_hit = ex.join(
                approx.select("query_id", "vec_id"),
                ["query_id", "vec_id"],
                "left_semi",
            ).count()
            r = float(n_hit) / float(n_exact) if n_exact else 0.0
            if return_counts:
                curve.append((np_, int(n_hit), int(n_exact)))
            else:
                curve.append((np_, round(r, 6)))
            if r >= float(target_recall):
                return np_, curve
        return None, curve
    finally:
        ex.unpersist()
