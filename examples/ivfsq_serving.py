"""IVF+SQ8 serving lifecycle (round-8 surface): train with PER-CELL
quantile-clipped residual bounds, persist, reload, and serve a
FILTERED BATCH of queries in one job — then size a truncated serving
tier with the matryoshka recall sweep.

Why this shape: SQ8 is the recall-over-memory point of the quantizer
family (one code per DIMENSION — near-exact distances, 4x smaller than
float32, and the scan is pure codegen arithmetic with no codebook
join). Per-cell bounds (FAISS trains ScalarQuantizer state per
inverted list for the same reason) let each cell's 256 levels cover
only its own residual spread; quantile clipping keeps one outlier
coordinate from inflating every vector's step size.

The reference serves one query at a time against PQ codes
(/root/reference/src/db/stored.rs:560-585); batching and attribute
pre-filtering are the Spark-native extensions (SURVEY.md §2.5).

Usage:
    python examples/ivfsq_serving.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flechasdb_spark.operators.eval import prefix_dim_recall_multi
from flechasdb_spark.plans.ivfsq import (
    ivfsq_query_batch,
    load_ivfsq,
    save_ivfsq,
    train_ivfsq,
)
from flechasdb_spark.plans.transform import (
    build_transformed_ivfsq,
    load_transformed_ivfsq,
    save_transformed_ivfsq,
    transformed_ivfsq_query,
)
from flechasdb_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = (
        sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp("_flechas_sq")
    )
    spark = get_spark(app_name="example_ivfsq_serving")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    # 1. Train: coarse k-means on a bounded sample, per-cell residual
    #    bounds with 1%/99% quantile clipping.
    model = train_ivfsq(
        emb, num_partitions=8, seed=7, bounds="per_cell", clip=(0.01, 0.99)
    )
    print(f"trained: P=8, per-cell clipped bounds "
          f"({model.cell_bounds.count()} bound rows)")

    # 2. Persist + reload: the encoded table lands partitionBy(cell) so
    #    probed queries prune at rest; bounds ride in cell_bounds/.
    idx_path = os.path.join(out_dir, "ivfsq_idx")
    save_ivfsq(model, idx_path)
    served = load_ivfsq(spark, idx_path)
    print(f"persisted -> {idx_path} (bounds mode recorded in manifest)")

    # 3. Serve a filtered batch: three queries, one Spark job, only
    #    even-id vectors eligible (attribute pre-filter BEFORE scoring,
    #    so every query still fills k qualifying ranks).
    qs = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.where(F.col("vec_id").isin(0, 11, 23)).collect()
    ]
    hits = ivfsq_query_batch(
        served, qs, k=5, nprobe=3, round_to=4,
        where=F.col("vec_id") % 2 == 0,
    )
    hits.orderBy("query_id", "rank").show(15, truncate=False)

    #    Huge-P variant (r9): past ~1e5 cells the centroid table stops
    #    fitting on the driver — probe selection runs as a distributed
    #    WindowGroupLimit job instead, same results (pytest-gated).
    dist_hits = ivfsq_query_batch(
        served, qs, k=5, nprobe=3, round_to=4,
        where=F.col("vec_id") % 2 == 0, collect_centroids=False,
    )
    assert sorted(map(tuple, hits.collect())) == sorted(
        map(tuple, dist_hits.collect())
    )
    print("distributed probe selection: identical ranks")

    # 4. Would a truncated serving tier hold? Exact top-10 recall when
    #    scanning only the first d' dimensions (MRL-style truncation —
    #    a d'/64 scan-byte cut with no re-encode if it stays high),
    #    aggregated over the whole query set (r9): min_hit shows the
    #    worst query, the number a mean hides.
    print("prefix-dimension recall sweep (all queries):")
    prefix_dim_recall_multi(emb, qs, k=10, dims=[8, 16, 32, 64]).orderBy(
        "dims"
    ).show()

    # 5. PCAR{16},IVF{8},SQ8 (r9): learned 64->16 projection in front
    #    of the same lifecycle — 4x fewer stored bytes and scan ops,
    #    one map-only projection folded into the build, queries
    #    projected driver-side. Persisted as index + transform.json.
    ti = build_transformed_ivfsq(emb, pca_k=16, num_partitions=8, seed=7)
    t_path = os.path.join(out_dir, "pcar_ivfsq_idx")
    save_transformed_ivfsq(ti, t_path)
    t_served = load_transformed_ivfsq(spark, t_path)
    print("PCAR+IVF+SQ8 top-5 in the 16-dim projected metric:")
    transformed_ivfsq_query(
        t_served, qs[0][1], k=5, nprobe=3, round_to=4
    ).show()

    # 6. Maintenance + the other serving contracts (late r9):
    #    upsert new arrivals with the FROZEN model (touches only their
    #    cells), radius search ("everything within r", count set by the
    #    data), and exact re-rank (quantized survivors re-scored
    #    against the originals — the SQ4 recall-recovery mode).
    from flechasdb_spark.operators.maintenance import ivfsq_upsert
    from flechasdb_spark.plans.ivfsq import ivfsq_range_query, ivfsq_query

    arrivals = emb.where(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 900000).alias("vec_id"), "embedding"
    )
    touched = ivfsq_upsert(spark, served, idx_path, arrivals)
    print(f"upserted 3 arrivals, rewrote cells {touched}")
    refreshed = load_ivfsq(spark, idx_path)
    print("radius search (everything within 1.5):")
    ivfsq_range_query(refreshed, qs[0][1], radius=1.5, nprobe=3,
                      round_to=4).show(5)
    print("exact-reranked top-5 (true-metric distances):")
    # the rerank table must hold originals for EVERYTHING indexed —
    # a survivor missing from it is dropped, so include the arrivals
    originals = emb.select("vec_id", "embedding").unionByName(arrivals)
    ivfsq_query(refreshed, qs[0][1], k=5, nprobe=3, rerank=originals,
                rerank_factor=4, round_to=4).show()

    # 7. r10 additions: EXACT radius semantics (quantized pre-filter
    #    at radius*slack, exact verify at the true radius) and the
    #    packed at-rest form (binary codes, lazy in-scan unpack —
    #    2 codes/byte at SQ4, queries unchanged).
    print("radius 1.5 with EXACT re-rank (equals exact range search "
          "within the probed cells):")
    ivfsq_range_query(refreshed, qs[0][1], radius=1.5, nprobe=3,
                      round_to=4, rerank=originals,
                      rerank_slack=2.0).show(5)
    # note: pack-save from the POST-upsert reload — `served` was loaded
    # before the upsert, so its lazy plan lists files the maintenance
    # rewrite has since replaced (maintenance invalidates earlier
    # loaded handles; always reload after it)
    packed_path = os.path.join(out_dir, "ivfsq_idx_packed")
    save_ivfsq(refreshed, packed_path, pack_codes=True)
    packed = load_ivfsq(spark, packed_path)
    print("packed-store top-5 (binary codes at rest, same results):")
    ivfsq_query(packed, qs[0][1], k=5, nprobe=3, round_to=4).show()

    spark.stop()


if __name__ == "__main__":
    main()
