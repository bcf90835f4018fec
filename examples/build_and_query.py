"""Build an IVF+PQ index over the synthetic embeddings, persist it, and
run flat + ANN queries — the Spark counterpart of the reference's
``examples/build-random`` + ``examples/query-sync`` crates
(/root/reference/examples/build-random/src/main.rs:10-37).

Usage:
    python examples/build_and_query.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flechasdb_spark.operators.build import IndexConfig, build_index
from flechasdb_spark.operators.knn import flat_knn
from flechasdb_spark.plans.ivf import ann_query
from flechasdb_spark.session import get_spark
from flechasdb_spark.sources.manifest import load_index, save_index


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp("_flechas_idx")
    spark = get_spark(app_name="example_build_and_query")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    print(f"input: {emb.count()} vectors of dim "
          f"{emb.select(F.size('embedding')).first()[0]}")

    # ---- build (reference DatabaseBuilder.build) ----
    cfg = IndexConfig(num_partitions=10, num_divisions=8, num_codes=16, seed=42)
    model = build_index(
        emb, cfg, on_event=lambda s, t: print(f"  build stage {s}: {t:.2f}s")
    )

    # ---- persist + load (reference serialize/load_database) ----
    save_index(model, out_dir)
    loaded = load_index(spark, out_dir)
    print(f"index saved to {out_dir}: {loaded.num_vectors} vectors, "
          f"P={loaded.config.num_partitions} D={loaded.config.num_divisions}")

    # ---- query (reference Database.query(v, k, nprobe)) ----
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).first().embedding]
    print("\nexact flat kNN (k=10):")
    flat_knn(emb, qv, k=10, round_to=4).show()

    print("approx IVF+PQ kNN (k=10, nprobe=3):")
    ann_query(loaded, [(0, qv)], k=10, nprobe=3, round_to=4).show()

    spark.stop()


if __name__ == "__main__":
    main()
