"""Learned vector transforms in front of a quantizing index:
PCA/whitening -> ITQ binary codes -> OPQ rotated product quantization,
with reconstruction-error accounting per family — the FAISS
`VectorTransform`/`OPQMatrix` preprocessing story on Spark
(train = bounded driver models, apply = map-only stages).

Usage:
    python examples/vector_transforms.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from flechasdb_spark.operators.itq import itq_encode, itq_train
from flechasdb_spark.operators.opq import (
    _pq_assign,
    opq_encode,
    opq_reconstruct_np,
    opq_train,
)
from flechasdb_spark.operators.pca import pca_project, pca_train
from flechasdb_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="example_vector_transforms")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()

    # 1) PCA: how much energy do k dims keep? (train the full spectrum
    # once; the k=16 transform is just its head)
    full = pca_train(emb, k=64)
    pca = pca_train(emb, k=16)
    share = sum(full.eigvals[:16]) / sum(full.eigvals)
    print(
        f"PCA: eigval head {['%.3f' % v for v in pca.eigvals[:4]]}; "
        f"top-16 of 64 dims keep {share:.1%} of the variance"
    )

    # whitened projection is a map-only stage
    y = pca_project(emb, pca, whiten=True)
    stats = y.select(
        F.aggregate(
            "pca", F.lit(0.0), lambda a, x: a + x * x
        ).alias("e")
    ).agg(F.avg("e")).first()[0]
    print(f"whitened mean energy per vector ~= k: {stats:.2f} (k=16)")

    # 2) ITQ: 16-bit binary codes, learned rotation
    itq = itq_train(emb, bits=16, iters=20, sample_n=2000)
    codes = itq_encode(emb, itq)
    distinct = codes.select("code").distinct().count()
    print(
        f"ITQ(16 bits): loss {itq.losses[0]:.0f} -> {itq.losses[-1]:.0f} "
        f"({1 - itq.losses[-1] / itq.losses[0]:.1%} better than identity), "
        f"{distinct}/{n} distinct codes"
    )

    # 3) OPQ: rotated PQ vs plain PQ at the same bit budget
    opq = opq_train(emb, num_divisions=8, num_codes=16, iters=8, sample_n=2000)
    print(
        f"OPQ(8x16): plain-PQ loss {opq.losses[0]:.1f} -> rotated "
        f"{opq.losses[-1]:.1f} ({1 - opq.losses[-1] / opq.losses[0]:.1%} "
        f"less reconstruction error at the same bits)"
    )
    enc = opq_encode(emb, opq)
    print(f"OPQ codes written: {enc.count()} (= n * divisions = {n * 8})")

    # round-trip a few vectors through the rotated reconstruction
    sample = emb.orderBy("vec_id").limit(4).collect()
    x = np.asarray([r["embedding"] for r in sample], dtype=np.float64)
    rec = opq_reconstruct_np(
        _pq_assign(x @ opq.rotation_np(), opq.codebooks_np()), opq
    )
    err = float(((x - rec) ** 2).mean())
    print(f"OPQ per-vector mean reconstruction error on 4 samples: {err:.3f}")

    # 4) geometry health check before trusting any of the transforms:
    # per-label centroid direction vs the global centroid + norm scale
    # (a drifting encoder shows up here before recall numbers move)
    from flechasdb_spark.operators.eval import embedding_centroid_report

    rep = embedding_centroid_report(emb).orderBy("cos_to_global")
    lo = rep.first()
    n_groups = rep.count()
    print(
        f"centroid report: {n_groups} labels, most drifted label "
        f"{lo['label']} (cos to global {lo['cos_to_global']}, "
        f"mean |v|^2 {lo['mean_norm2_micro2'] / 1e12:.3f})"
    )
    spark.stop()


if __name__ == "__main__":
    main()
