"""Local scale smoke: replicate the sf0.1 embeddings 20x (~40k vectors),
build a production-shaped index (P=64, D=16, C=64), and measure build
throughput, batch-query latency, and recall vs the exact baseline.

Usage:
    python examples/scale_smoke.py [sf_dir] [replication]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flechasdb_spark.operators.build import IndexConfig, build_index
from flechasdb_spark.operators.eval import recall_at_k
from flechasdb_spark.operators.knn import knn_join
from flechasdb_spark.plans.ivf import ann_query
from flechasdb_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark(app_name="scale_smoke")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rep = spark.range(reps).select(F.col("id").alias("rep"))
    big = (
        emb.crossJoin(rep)
        .select(
            (F.col("vec_id") + F.col("rep") * 10_000_000).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: x
                + (F.hash(F.col("rep"), i) % 1000).cast("float") / 1e6,
            ).cast("array<float>").alias("embedding"),
            "label",
        )
        .repartition(32)
        .persist()
    )
    n = big.count()
    print(f"corpus: {n} vectors x 64 dims")

    cfg = IndexConfig(num_partitions=64, num_divisions=16, num_codes=64, seed=7)
    t0 = time.time()
    model = build_index(big, cfg)
    dt = time.time() - t0
    print(f"build P=64/D=16/C=64: {dt:.1f}s ({n / dt:.0f} vec/s) "
          f"stages={model.stage_seconds}")

    qs = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in emb.where(F.col("vec_id") < 100).collect()
    ]
    t0 = time.time()
    ann_query(model, qs, k=10, nprobe=8).collect()
    print(f"cold 100-query batch: {time.time() - t0:.1f}s")
    t0 = time.time()
    approx = ann_query(model, qs, k=10, nprobe=8)
    approx.collect()
    dt = time.time() - t0
    print(f"warm 100-query batch: {dt:.1f}s ({100 / dt:.0f} qps)")

    # pre-trained encode-only pass (the per-shard number at 100 TB)
    from flechasdb_spark.operators.build import assemble_index

    t0 = time.time()
    m2 = assemble_index(big, model.centroids, model.codebooks, cfg)
    dt = time.time() - t0
    print(f"assemble_index (encode only): {dt:.1f}s ({n / dt:.0f} vec/s)")
    m2.encoded.unpersist()

    # exact re-rank refinement: recall and marginal cost
    t0 = time.time()
    reranked = ann_query(model, qs, k=10, nprobe=8, rerank=big, rerank_factor=4)
    reranked.collect()
    print(f"re-ranked 100-query batch: {time.time() - t0:.1f}s")

    # fused re-rank: vectors stored on the encoded rows, exact distances
    # computed inside the same pruned ADC scan (no second scan/join)
    kept_cfg = IndexConfig(
        num_partitions=64, num_divisions=16, num_codes=64, seed=7,
        keep_vectors=True,
    )
    kept = assemble_index(big, model.centroids, model.codebooks, kept_cfg)
    kept.encoded.count()  # materialize cache before timing the query
    t0 = time.time()
    fused = ann_query(
        kept, qs, k=10, nprobe=8, rerank="stored", rerank_factor=4
    )
    fused.collect()
    print(f"FUSED re-ranked 100-query batch: {time.time() - t0:.1f}s")
    kept.encoded.unpersist()

    qdf = emb.where(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvector")
    )
    exact = knn_join(qdf, big, k=10).select("query_id", "vec_id")
    ap = approx.select("query_id", F.col("vector_id").alias("vec_id"))
    r = recall_at_k(exact, ap).agg(F.avg("recall")).first()[0]
    print(f"recall@10 (nprobe=8/64, near-random vectors): {r:.3f}")
    # NOTE exact-rank recall is an artifact of this replicated fixture:
    # every replica shares PQ codes (jitter << cell size), so ADC ties
    # across all reps while the exact order is jitter noise — the
    # meaningful quality metric is the replica hit rate (bench.py
    # scale_smoke_metrics reports it as replica_recall_at_10)
    hit = ap.where(
        F.col("vec_id") % 10_000_000 == F.col("query_id")
    ).count() / ap.count()
    print(f"replica hit rate @10: {hit:.3f}")
    rr = recall_at_k(
        exact, reranked.select("query_id", F.col("vector_id").alias("vec_id"))
    ).agg(F.avg("recall")).first()[0]
    print(f"recall@10 with exact re-rank x4: {rr:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
