"""Operating a DRIFTING index, the cold side: when a corpus's
distribution moves, some IVF cells drain — each cold cell still costs
a probe-selection candidate and a scan unit while returning almost
nothing. `index_partition_stats` diagnoses it; `merge_partitions`
(r12) folds the cold cells into their members' nearest surviving
cells on the persisted store through the journaled cell-rewrite swap,
WITHOUT a rebuild — the complement of `split_partition`
(examples/hot_cell_rebalance.py covers the hot side).

Also shown: the same fold on a BINARY (IVF+BQ) store — there the
codes derive from the raw vector (route-only centroids), so moved
members keep their packed words bit-for-bit and the fold is one
broadcast argmin plus the touched-cell rewrite — and the binary
family's full r12 serving ladder over the refreshed store: symmetric
Hamming top-k, exact re-rank (the IndexBinaryIVF+IndexRefine shape),
asymmetric margins, batch, and radius.

No reference counterpart: the reference fixes its partition count at
build time (/root/reference/src/db/build.rs:48-50).

Usage:
    python examples/cold_cell_merge.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flechasdb_spark.operators.eval import index_partition_stats
from flechasdb_spark.operators.maintenance import (
    ivfbq_merge_partitions,
    merge_partitions,
)
from flechasdb_spark.plans.ivfbq import (
    build_ivfbq,
    ivfbq_query,
    ivfbq_query_batch,
    load_ivfbq,
    save_ivfbq,
)
from flechasdb_spark.plans.ivfsq import (
    build_ivfsq,
    ivfsq_query,
    load_ivfsq,
    save_ivfsq,
)
from flechasdb_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = (
        sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp("_flechas_merge")
    )
    spark = get_spark(app_name="cold_cell_merge", shuffle_partitions=8)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # frozen centroids keep the walkthrough deterministic; production
    # uses train_ivfsq / train_ivfbq (sampled k-means)
    cent = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("partition_id"),
        F.col("embedding").alias("centroid"),
    )
    qv = [float(x) for x in emb.where(F.col("vec_id") == 5).first()["embedding"]]

    # ---- SQ store: diagnose, fold the two coldest cells, re-serve ----
    sq = build_ivfsq(emb, cent)
    sq_path = os.path.join(out_dir, "sq_idx")
    save_ivfsq(sq, sq_path)
    stats = index_partition_stats(sq.encoded).orderBy("n_vectors")
    print("-- cell balance before --")
    stats.show(8)
    cold = [int(r.partition_id) for r in stats.limit(2).collect()]
    res = merge_partitions(spark, sq, sq_path, emb, pids=cold)
    print(f"folded {res['merged']} into {res['receiving']}")
    refreshed = load_ivfsq(spark, sq_path)
    print("-- cell balance after --")
    index_partition_stats(refreshed.encoded).orderBy("n_vectors").show(8)
    print("-- top-5 over the rebalanced SQ store --")
    ivfsq_query(refreshed, qv, k=5, nprobe=3, round_to=4).show()

    # ---- binary store: route-only fold + the full serving ladder ----
    bq = build_ivfbq(emb, cent, dim=64)
    bq_path = os.path.join(out_dir, "bq_idx")
    save_ivfbq(bq, bq_path)
    counts = {
        r.partition_id: r["count"]
        for r in spark.read.parquet(f"{bq_path}/index")
        .groupBy("partition_id")
        .count()
        .collect()
    }
    cold_bq = sorted(
        p for p, _ in sorted(counts.items(), key=lambda kv: (kv[1], kv[0]))[:2]
    )
    res = ivfbq_merge_partitions(spark, bq, bq_path, emb, pids=cold_bq)
    print(f"binary fold: {res['merged']} -> {res['receiving']} "
          "(words unchanged bit-for-bit)")
    served = load_ivfbq(spark, bq_path)
    print("-- symmetric Hamming top-5 --")
    ivfbq_query(served, qv, k=5, nprobe=3).show()
    print("-- exact re-rank (Hamming top k*4 -> float verify) --")
    ivfbq_query(
        served, qv, k=5, nprobe=3, rerank=emb, rerank_factor=4, round_to=4
    ).show()
    print("-- batch serving, one probe pass + one pruned scan --")
    qs = [
        [float(x) for x in r.embedding]
        for r in emb.where(F.col("vec_id").isin(2, 9)).orderBy("vec_id").collect()
    ]
    ivfbq_query_batch(served, qs, k=3, nprobe=3, query_ids=[2, 9]).show()
    print(f"stores under {out_dir}")
    spark.stop()


if __name__ == "__main__":
    main()
