"""Hybrid retrieval in miniature: BM25 keyword candidates + vector
cosine candidates fused with reciprocal ranks — the standard
lexical+semantic search layout around a vector index.

Usage:
    python examples/hybrid_search.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from flechasdb_spark.functions.linalg import cosine_similarity
from flechasdb_spark.operators.retrieval import bm25_topk, rrf_fuse
from flechasdb_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="example_hybrid_search")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    # lexical: one keyword query
    q = spark.createDataFrame(
        [(0, "vector"), (0, "hash"), (0, "merge")], "query_id long, term string"
    )
    lexical = bm25_topk(docs, q, k=10)
    print("BM25 top-5:")
    lexical.orderBy("rank").show(5, truncate=False)

    # semantic: cosine top-10 of embedding 7 (vec_id doubles as doc_id
    # on the synthetic tables)
    qv = [float(x) for x in emb.where(F.col("vec_id") == 7).first().embedding]
    qarr = F.array(*[F.lit(v) for v in qv]).cast("array<double>")
    d = 1 - cosine_similarity(F.col("embedding").cast("array<double>"), qarr)
    w = Window.partitionBy("query_id").orderBy(F.col("__d").asc(), "doc_id")
    semantic = (
        emb.select(
            F.lit(0).cast("long").alias("query_id"),
            F.col("vec_id").alias("doc_id"),
            d.alias("__d"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .select("query_id", "doc_id", "rank")
    )

    fused = rrf_fuse([lexical.select("query_id", "doc_id", "rank"), semantic], k=10)
    print("fused top-10 (reciprocal-rank, c=60):")
    fused.orderBy("rank").show(10, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
