"""Serving-path extras in miniature: positional phrase search, MMR
diversity re-ranking over vector candidates, and a sketch-based
audience-overlap report — the query surfaces added on top of plain
top-k retrieval.

Usage:
    python examples/diverse_search.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flechasdb_spark.operators.retrieval import phrase_topk
from flechasdb_spark.operators.similarity import cosine_topk, mmr_rerank
from flechasdb_spark.operators.sketch import kmv_set_ops
from flechasdb_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="example_diverse_search")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")

    # 1. phrase search: exact consecutive occurrences, not bag-of-words
    phrases = spark.createDataFrame(
        [(0, "order fast"), (1, "merge part window")],
        "query_id long, phrase string",
    )
    print("Phrase search top-5 (docs ranked by exact occurrences):")
    phrase_topk(docs, phrases, k=5).orderBy("query_id", "rank").show(10)

    # 2. plain cosine top-k vs MMR-diversified top-k for one query
    qs = emb.where(F.col("vec_id") == 7).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvector")
    )
    corpus = emb.where(F.col("vec_id") != 7)
    print("Plain cosine top-5:")
    cosine_topk(corpus, qs, k=5, round_to=4).orderBy("rank").show()
    print("MMR-diversified top-5 (lam=0.5, 20 candidates):")
    mmr_rerank(corpus, qs, k=5, n_candidates=20).orderBy("mmr_rank").show()

    # 3. audience overlap between event types from merged KMV sketches
    print("KMV audience overlap (event-type pairs, k=64 sketches):")
    kmv_set_ops(ev, "user_id", "event_type", k=64).orderBy(
        "group_a", "group_b"
    ).show(10)

    spark.stop()


if __name__ == "__main__":
    main()
