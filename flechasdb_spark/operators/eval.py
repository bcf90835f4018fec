"""Evaluation operators: recall of an approximate result set against
the exact baseline — the metric the reference's ANN quality is judged
by (SURVEY.md §5.2 oracle (c): IVF+PQ top-k vs exact top-k recall).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["recall_at_k", "index_partition_stats", "rank_metrics"]


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
