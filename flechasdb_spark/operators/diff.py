"""Corpus snapshot diff — the incremental-ingest audit between two
versions of a document corpus.

Extension surface (SURVEY.md §2.5): every recurring training-data
pipeline re-crawls or re-ingests sources; before re-running dedup /
curation / sharding over 100 TB, the first question is "what actually
changed?". `corpus_diff` answers it row-level (added / removed /
changed / unchanged, by content hash), `corpus_diff_summary` as the
one-look report. Pairs with `operators/maintenance.py` (which applies
upserts/deletes to a built index) and `source_token_kl` (which
detects DISTRIBUTION drift where the diff detects ROW drift).

Scale (100 TB): one full-outer equi-join keyed on the unique document
id (no skew by construction), md5 computed in the same map stage as
the scan — no window, no driver state. The summary adds one O(4)
partial agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["corpus_diff", "corpus_diff_summary"]


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, status, old_hash, new_hash) for every id in either
    snapshot; status in {'added','removed','changed','unchanged'}
    by exact content (md5) comparison."""
    o = old.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("old_hash")
    )
    n = new.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("new_hash")
    )
    j = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(F.col("old_hash") != F.col("new_hash"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(id_col, status.alias("status"), "old_hash", "new_hash")


def corpus_diff_summary(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(status, n_docs, pct) over the diff — pct of the union id set,
    an exact integer ratio rounded once."""
    d = corpus_diff(old, new, id_col=id_col, text_col=text_col)
    counts = d.groupBy("status").agg(F.count(F.lit(1)).alias("n_docs"))
    total = counts.agg(F.sum("n_docs").alias("__t"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "status",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.round(F.col("n_docs") / F.col("__t"), 6).alias("pct"),
        )
        .orderBy("status")
    )
