"""Evaluation operators: recall of an approximate result set against
the exact baseline — the metric the reference's ANN quality is judged
by (SURVEY.md §5.2 oracle (c): IVF+PQ top-k vs exact top-k recall).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["recall_at_k", "index_partition_stats"]


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
