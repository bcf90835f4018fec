"""VERDICT r12 #9: demonstrate the assign-shuffle removal at scale.

A/B the coarse-assign implementations (plans/ivf.py::ivf_assign) —
``impl="literal"`` (map-only codegen argmin over a plan literal, the
r12 optimization) vs ``impl="relational"`` (broadcast join +
min(struct) aggregate, the former shape and the automatic huge-P
fallback) — on synthetic corpora replicated from sf0.1's embeddings
(2000 x dim64) up to 800x (1.6M vectors), timed against the noop sink
(guide §1.4) so the computation is measured, not a sink.

The replicas are generated in-plan (explode(sequence)) so the probe
measures assign cost, not parquet writes; ids are offset per replica
to keep the id grain honest. Interleaved A/B (lit, rel, lit, rel ...)
per scale point, best-of-2, canary-stamped per the bench protocol.

Usage: python scripts/assign_scale_ab.py  (idle host; prints a
markdown table + one JSON line).
"""

from __future__ import annotations

import json
import time

REPLICAS = [25, 100, 400, 800]  # 50k, 200k, 800k, 1.6M vectors
P = 64  # centroid count: 64 x dim64 = 4096 elements, inside the
# default literal budget (65536) — the regime the auto path picks
REPS = 2


def main() -> None:
    import os
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import pyspark.sql.functions as F

    from bench import _cpu_canary_gflops
    from flechasdb_spark.plans.ivf import ivf_assign
    from flechasdb_spark.session import get_spark

    spark = get_spark(app_name="assign_scale_ab")
    base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    # fixed centroid table: the first P base vectors re-labelled — the
    # probe times assignment, not training
    centroids = (
        base.orderBy("vec_id")
        .limit(P)
        .select(
            F.col("vec_id").cast("int").alias("partition_id"),
            F.col("embedding").alias("centroid"),
        )
    )
    centroids = spark.createDataFrame(
        centroids.collect(), schema=centroids.schema
    )  # pin rows driver-side so both impls see an identical tiny input

    def corpus(r: int):
        # the 2000-row base parquet is one row group → one scan task;
        # spread the rows BEFORE the r-fold explode so the synthetic
        # corpus (and both assign impls downstream) run 32-wide
        return (
            base.repartition(32)
            .select(
                "vec_id",
                "embedding",
                F.explode(
                    F.sequence(F.lit(0), F.lit(r - 1))
                ).alias("__rep"),
            )
            .select(
                (
                    F.col("vec_id")
                    + F.col("__rep").cast("long") * F.lit(10_000_000)
                ).alias("vec_id"),
                "embedding",
            )
        )

    def run(r: int, impl: str) -> float:
        df = ivf_assign(corpus(r), centroids, impl=impl)
        spark.sparkContext.setJobDescription(
            f"assign_ab r={r} impl={impl}"
        )
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # warm the JVM and both code paths once at the smallest point
    run(REPLICAS[0], "literal")
    run(REPLICAS[0], "relational")

    canary = _cpu_canary_gflops()
    out = {}
    print(f"canary_gflops={canary}")
    print("| vectors | literal s | relational s | speedup |")
    print("|---|---|---|---|")
    for r in REPLICAS:
        lits, rels = [], []
        for _ in range(REPS):  # interleaved A/B
            lits.append(run(r, "literal"))
            rels.append(run(r, "relational"))
        lit, rel = min(lits), min(rels)
        n = 2000 * r
        out[str(n)] = {"literal": round(lit, 3), "relational": round(rel, 3)}
        print(f"| {n} | {lit:.3f} | {rel:.3f} | {rel / lit:.2f}x |")
    print(json.dumps({"canary": canary, "points": out}))
    spark.stop()


if __name__ == "__main__":
    main()
