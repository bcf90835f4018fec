"""The 100 TB build/serve lifecycle in miniature: train models once on
a sample, encode corpus shards independently (embarrassingly parallel),
merge the shard indexes without a shuffle, serve with the huge-P
distributed probe path, ingest a late batch, and compact the small
files it leaves behind.

No reference counterpart (one single-threaded build per database,
/root/reference/src/db/build.rs:44-129) — this is the Spark-native
scale-out of that build.

Usage:
    python examples/shard_lifecycle.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flechasdb_spark.operators.build import IndexConfig, assemble_index, build_index
from flechasdb_spark.operators.maintenance import (
    compact_index,
    merge_indexes,
    upsert_vectors,
)
from flechasdb_spark.plans.ivf import ann_query
from flechasdb_spark.session import get_spark
from flechasdb_spark.sources.manifest import load_index, save_index


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp("_flechas_shards")
    spark = get_spark(app_name="example_shard_lifecycle")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    # 1. Train ONCE on a sample (here: the whole small table); at 100 TB
    #    this is a bounded-sample driver fit, not a full-data scan.
    cfg = IndexConfig(num_partitions=8, num_divisions=8, num_codes=16, seed=7)
    trained = build_index(emb.where(F.col("vec_id") % 7 == 0), cfg)
    cent, cb = trained.centroids, trained.codebooks
    print(f"trained models on {trained.num_vectors} sampled vectors")

    # 2. Encode shards independently with the FROZEN models — each
    #    shard is one map pass; shards can run on different clusters.
    shards = [
        assemble_index(emb.where(F.col("vec_id") % 3 == r), cent, cb, cfg)
        for r in range(3)
    ]
    print("shard sizes:", [s.num_vectors for s in shards])

    # 3. Merge: disjoint shards union with no shuffle and no scan.
    merged = shards[0]
    for s in shards[1:]:
        merged = merge_indexes(merged, s, assume_disjoint=True)
    print(f"merged index: {merged.num_vectors} vectors")
    path = os.path.join(out_dir, "index")
    save_index(merged, path)

    # 4. Serve in huge-P mode: centroids stay distributed; probe
    #    selection is a Spark job collecting only probed centroids.
    lazy = load_index(spark, path, collect_centroids=False)
    qs = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in emb.where(F.col("vec_id") < 5).collect()
    ]
    res = ann_query(lazy, qs, k=5, nprobe=4, round_to=4)
    res.show(10, truncate=False)

    # 5. Late arrivals: upsert (rewrites only touched partitions), then
    #    simulate append-mode streaming ingest and compact the small
    #    files it accumulates (upsert itself leaves partitions compact;
    #    appends are what fragment — see streaming.incremental_encode's
    #    compact_every for doing this automatically).
    late = emb.where(F.col("vec_id") < 20).withColumn(
        "vec_id", F.col("vec_id") + 1_000_000
    )
    loaded = load_index(spark, path)
    touched = upsert_vectors(spark, loaded, path, late)
    print(f"upserted late batch into partitions {touched}")
    fresh = spark.read.parquet(f"{path}/index").limit(20).cache()
    fresh.count()
    for i in (2, 3):
        (
            fresh.withColumn("vec_id", F.col("vec_id") + 1_000_000 * i)
            .write.mode("append")
            .partitionBy("partition_id")
            .parquet(f"{path}/index")
        )
    fresh.unpersist()
    stats = compact_index(spark, path)
    print(f"compaction: {stats}")
    spark.stop()


if __name__ == "__main__":
    main()
