"""Evaluation operators: recall of an approximate result set against
the exact baseline — the metric the reference's ANN quality is judged
by (SURVEY.md §5.2 oracle (c): IVF+PQ top-k vs exact top-k recall).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["recall_at_k"]


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
