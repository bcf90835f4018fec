"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

The headline set covers every engine surface: vector kernels, exact and
batch kNN, the deterministic IVF/PQ relational pipeline, the full
MLlib IVF+PQ build + ANN query lifecycle, and the relational TPC-H-ish
queries (BASELINE.md: the honest comparables are index-build wall-clock
and batch kNN throughput)."""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_label(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def ann_lifecycle(spark, sf_dir, timings):
    """Full lifecycle: build seeded IVF+PQ index, batch-query 100
    vectors cold, then re-query warm (the serving-path comparable to
    the reference's warm-cache latency — BASELINE.md)."""
    from pyspark.sql import functions as F

    from flechasdb_spark.operators.build import IndexConfig, build_index
    from flechasdb_spark.plans.ivf import ann_query

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cfg = IndexConfig(num_partitions=16, num_divisions=16, num_codes=16, seed=7)
    t0 = time.perf_counter()
    model = build_index(emb, cfg)
    timings["ann_build"] = round(time.perf_counter() - t0, 3)
    qs = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in emb.where(F.col("vec_id") < 100).collect()
    ]
    t0 = time.perf_counter()
    ann_query(model, qs, k=10, nprobe=5).collect()
    timings["ann_query_cold"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    ann_query(model, qs, k=10, nprobe=5).collect()
    warm = time.perf_counter() - t0
    timings["ann_query_warm"] = round(warm, 3)
    timings["ann_warm_qps"] = round(100 / warm, 1)
    # the recall-lifting exact re-rank refinement (adds one broadcast
    # join against the original vectors — measure its marginal cost)
    t0 = time.perf_counter()
    ann_query(model, qs, k=10, nprobe=5, rerank=emb, rerank_factor=4).collect()
    timings["ann_query_rerank"] = round(time.perf_counter() - t0, 3)
    # fused re-rank (product path at scale): vectors stored on the
    # encoded rows, exact re-score inside the same pruned ADC scan
    from flechasdb_spark.operators.build import assemble_index

    kept_cfg = IndexConfig(
        num_partitions=16, num_divisions=16, num_codes=16, seed=7,
        keep_vectors=True,
    )
    kept = assemble_index(emb, model.centroids, model.codebooks, kept_cfg)
    t0 = time.perf_counter()
    ann_query(
        kept, qs, k=10, nprobe=5, rerank="stored", rerank_factor=4
    ).collect()
    timings["ann_query_rerank_fused"] = round(time.perf_counter() - t0, 3)
    kept.encoded.unpersist()


def fused_encode(spark, sf_dir, timings):
    """The PRODUCT encode path (fused Arrow assign+residual+encode UDF,
    one map pass) on the same input the relational pq_encode oracle form
    times — BENCH tracks both so the baseline comparison uses what
    ships."""
    from flechasdb_spark.queries import _frozen_model

    t0 = time.perf_counter()
    model, _ = _frozen_model(spark, sf_dir)  # assemble_index: encode+count
    timings["pq_encode_fused"] = round(time.perf_counter() - t0, 3)
    model.encoded.unpersist()


def fused_semantic(spark, sf_dir, timings):
    """The PRODUCT semantic near-dup path (per-cluster BLAS blocks via
    applyInPandas) on the same frozen centroids the relational oracle
    form times — BENCH tracks both so the baseline comparison uses what
    ships."""
    from pyspark.sql import functions as F

    from flechasdb_spark.operators.similarity import cluster_neardup_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = emb.where(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("center")
    )
    t0 = time.perf_counter()
    cluster_neardup_pairs(emb, cents, threshold=0.3, impl="pandas").count()
    timings["semantic_neardup_fused"] = round(time.perf_counter() - t0, 3)


def main() -> None:
    from flechasdb_spark.session import get_spark
    from flechasdb_spark.queries import REGISTRY

    spark = get_spark(app_name="flechasdb_bench")
    names = [
        "vector_norms",
        "flat_knn",
        "knn_join",
        "ivf_flat_query",
        "pq_encode",
        "pq_adc_topk",
        "tpch_q1",
        "tpch_q3",
        "tpch_q5",
        "tpch_q13",
        "tpch_q18",
        "tpch_q2",
        "tpch_q9",
        # extension surfaces (LLM-pipeline operators)
        "cosine_topk",
        "ann_lsh_topk",
        "dedup_exact",
        "simhash",
        "minhash_dedup",
        "token_stats",
        "quality_score",
        "lang_id",
        "payload_stats",
        "image_features",
        "events_sessionize",
        "events_tumbling_agg",
        "events_asof_join",
        "events_value_bands",
        "tpch_q8",
        "sq_knn",
        "segment_dedup",
        "semantic_neardup",
        "temperature_sample",
        "pii_scrub",
        "sequence_pack",
        "build_vocab",
        "length_bucket_batches",
        "tpch_q11",
        "tpch_q20",
    ]
    names = [n for n in names if n in REGISTRY]
    # warm up the session (JVM, parquet footers) outside the timings
    spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()

    # Per-query timing is the WARM second execution: the reference
    # baseline's comparables (BASELINE.md) are warm-cache numbers, and
    # the first run's Catalyst compile + codegen cost is fixed overhead
    # that vanishes at any real data scale. Cold (first-run) times are
    # reported alongside under queries_cold.
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        REGISTRY[name](spark, SF_DIR).collect()
        cold[name] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        REGISTRY[name](spark, SF_DIR).collect()
        timings[name] = round(time.perf_counter() - t0, 3)

    fused_encode(spark, SF_DIR, timings)
    fused_semantic(spark, SF_DIR, timings)
    ann_lifecycle(spark, SF_DIR, timings)

    total = round(
        sum(v for k, v in timings.items() if k != "ann_warm_qps"), 3
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_cold": cold,
                "sf": _sf_label(SF_DIR),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
