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

from flechasdb_spark.operators.eval import prefix_dim_recall_curve
from flechasdb_spark.plans.ivfsq import (
    ivfsq_query_batch,
    load_ivfsq,
    save_ivfsq,
    train_ivfsq,
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

    # 4. Would a truncated serving tier hold? Exact top-10 recall when
    #    scanning only the first d' dimensions (MRL-style truncation —
    #    a d'/64 scan-byte cut with no re-encode if it stays high).
    qv = qs[0][1]
    print("prefix-dimension recall sweep (query 0):")
    prefix_dim_recall_curve(emb, qv, k=10, dims=[8, 16, 32, 64]).orderBy(
        "dims"
    ).show()

    spark.stop()


if __name__ == "__main__":
    main()
