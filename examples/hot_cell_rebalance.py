"""Operating a skewed index: diagnose the hot IVF cell with
`index_partition_stats`, split it with `split_partition` (round-7
maintenance), verify serving results are unchanged under exact
re-rank, and persist the rebalanced index — plus the OPQ-rotated
build (`build_opq_index`, the FAISS `OPQ{D},IVF{P},PQ{D}` factory
shape) as the training-time alternative when PQ error, not cell
skew, is the bottleneck.

No reference counterpart: the reference fixes its partition count at
build time (/root/reference/src/db/build.rs:48-50) and has no learned
rotation.

Usage:
    python examples/hot_cell_rebalance.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flechasdb_spark.operators.build import IndexConfig, build_index
from flechasdb_spark.operators.eval import index_partition_stats
from flechasdb_spark.operators.maintenance import split_partition
from flechasdb_spark.plans.ivf import ann_query
from flechasdb_spark.plans.transform import build_opq_index, opq_ann_query
from flechasdb_spark.session import get_spark
from flechasdb_spark.sources.manifest import load_index, save_index


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = (
        sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp("_flechas_split")
    )
    spark = get_spark(app_name="example_hot_cell_rebalance")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    # 1. Build deliberately under-partitioned (P=3) so one cell runs hot.
    cfg = IndexConfig(num_partitions=3, num_divisions=4, num_codes=8, seed=7)
    model = build_index(emb, cfg)
    stats = index_partition_stats(model.encoded).collect()
    for r in sorted(stats, key=lambda r: -r.n_vectors):
        print(
            f"cell {r.partition_id}: {r.n_vectors} vectors "
            f"({r.share:.1%} of corpus)"
        )
    hot = max(stats, key=lambda r: r.n_vectors)
    print(f"hot cell: {hot.partition_id} at {hot.share:.1%}")

    # 2. Split it: local 2-means over the cell's members, one pruned
    #    Arrow re-encode — cost is O(cell), not index size.
    split = split_partition(spark, model, emb, pid=hot.partition_id)
    stats2 = index_partition_stats(split.encoded).collect()
    print(
        f"after split: {len(stats2)} cells, max share "
        f"{max(r.share for r in stats2):.1%} "
        f"(was {max(r.share for r in stats):.1%})"
    )

    # 3. Serving results under exact re-rank are IDENTICAL pre/post:
    #    full probe + full re-rank collapses both to exact kNN.
    qs = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in emb.where(F.col("vec_id") < 5).collect()
    ]
    a = sorted(
        (r.query_id, r.vector_id)
        for r in ann_query(
            model, qs, k=5, nprobe=3, rerank=emb, rerank_factor=10_000
        ).collect()
    )
    b = sorted(
        (r.query_id, r.vector_id)
        for r in ann_query(
            split, qs, k=5, nprobe=4, rerank=emb, rerank_factor=10_000
        ).collect()
    )
    assert a == b, "split changed exact-reranked results"
    print("exact-reranked results identical pre/post split")

    # 4. Persist and reload — P+1 centroids flow through the standard
    #    manifest machinery.
    save_index(split, out_dir)
    loaded = load_index(spark, out_dir)
    print(
        f"saved + loaded split index: {loaded.centroids_np().shape[0]} cells, "
        f"{loaded.num_vectors} vectors at {out_dir}"
    )

    # 5. The training-time alternative: OPQ-rotated IVF+PQ — one extra
    #    map-only matmul at build, queries rotated driver-side.
    ocfg = IndexConfig(num_partitions=4, num_divisions=4, num_codes=8, seed=7)
    oi = build_opq_index(emb, ocfg, opq_iters=4, opq_sample_n=2000)
    hits = opq_ann_query(oi, qs, k=3, nprobe=4).count()
    print(
        f"OPQ index: training loss {oi.losses[0]:.1f} -> {oi.losses[-1]:.1f} "
        f"({len(oi.losses) - 1} productive rounds), {hits} query hits"
    )
    spark.stop()


if __name__ == "__main__":
    main()
