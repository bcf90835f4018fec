"""IVF+PQ index build — the reference's ``DatabaseBuilder.build()``
(``/root/reference/src/db/build.rs:44-129``) restructured for Spark
(SURVEY.md §3.1, §7 step 3).

Pipeline (B2-B9 of SURVEY.md §2.1):
1. Coarse partitioner: distributed MLlib KMeans (k = P) over the full
   dataset -> ``partition_id`` per vector + P centroids on the driver.
   (k-means++ seeding and Lloyd's are MLlib's k-means|| — B3-B5.)
2. PQ codebooks: per division, seeded NumPy k-means (k = C) over a
   bounded driver-side SAMPLE of residual subvectors. Codebooks are
   D*C*(N/D) floats — tiny. Training on a sample + encoding the full
   data distributed is the 100 TB-correct shape (a full-data MLlib fit
   per division would be D extra full scans for no recall gain).
3. Encode: ONE distributed Arrow-batched pass computing, per row,
   residual = v - centroid[partition_id] and codes[d] = argmin_c
   ||residual_slice_d - codebook[d][c]||^2 (B6-B9 fused: no join, no
   shuffle; centroids/codebooks ride along as a broadcast).

The result keeps every non-vector column as an attribute column — the
Spark-idiomatic form of the reference's attribute table (SURVEY.md §1.1).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flechasdb_spark.operators.kmeans_np import kmeans_fit

__all__ = ["IndexConfig", "IndexModel", "build_index"]


@dataclass(frozen=True)
class IndexConfig:
    """Mirrors the reference's builder knobs
    (defaults P=10, D=8, C=16 — /root/reference/src/db/build.rs:48-50)."""

    num_partitions: int = 10
    num_divisions: int = 8
    num_codes: int = 16
    seed: int = 42
    max_iter: int = 100
    tol: float = 1e-6
    id_col: str = "vec_id"
    vec_col: str = "embedding"
    # max sample rows collected to the driver for PQ codebook training
    train_sample_rows: int = 100_000


@dataclass
class IndexModel:
    """A built IVF+PQ index: small models on the driver, encoded data
    distributed."""

    config: IndexConfig
    vector_size: int
    num_vectors: int
    centroids: np.ndarray  # (P, N) float64
    codebooks: np.ndarray  # (D, C, N/D) float64
    encoded: DataFrame  # (id_col, partition_id int, codes array<int>, attrs...)
    attr_cols: list[str] = field(default_factory=list)

    @property
    def subvector_width(self) -> int:
        return self.vector_size // self.config.num_divisions

    def centroids_df(self, spark) -> DataFrame:
        return spark.createDataFrame(
            [
                (int(i), [float(x) for x in c])
                for i, c in enumerate(self.centroids)
            ],
            "partition_id int, centroid array<float>",
        )

    def codebooks_df(self, spark) -> DataFrame:
        rows = []
        for d in range(self.codebooks.shape[0]):
            for c in range(self.codebooks.shape[1]):
                rows.append(
                    (int(d), int(c), [float(x) for x in self.codebooks[d, c]])
                )
        return spark.createDataFrame(
            rows, "division int, code int, center array<float>"
        )


def _coarse_kmeans(
    df: DataFrame, cfg: IndexConfig
) -> tuple[np.ndarray, DataFrame]:
    """Distributed coarse clustering; returns (centroids, df+partition_id)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = df.withColumn("__features", array_to_vector(F.col(cfg.vec_col)))
    km = KMeans(
        k=cfg.num_partitions,
        seed=cfg.seed,
        maxIter=cfg.max_iter,
        tol=cfg.tol,
        featuresCol="__features",
        predictionCol="partition_id",
    )
    model = km.fit(feat)
    centroids = np.array(
        [np.asarray(c, dtype=np.float64) for c in model.clusterCenters()]
    )
    assigned = model.transform(feat).drop("__features")
    return centroids, assigned


def _train_codebooks(
    assigned: DataFrame, centroids: np.ndarray, cfg: IndexConfig, n: int
) -> np.ndarray:
    """Seeded per-division k-means over a driver-side sample of residuals."""
    total = assigned.count()
    frac = min(1.0, cfg.train_sample_rows / max(total, 1))
    sample = (
        assigned.select(cfg.vec_col, "partition_id")
        .sample(fraction=frac, seed=cfg.seed)
        .toPandas()
    )
    vecs = np.array([np.asarray(v, dtype=np.float64) for v in sample[cfg.vec_col]])
    pids = sample["partition_id"].to_numpy()
    residuals = vecs - centroids[pids]
    d, w = cfg.num_divisions, n // cfg.num_divisions
    codebooks = np.empty((d, cfg.num_codes, w), dtype=np.float64)
    for di in range(d):
        sub = residuals[:, di * w : (di + 1) * w]
        centers, _ = kmeans_fit(
            sub, cfg.num_codes, seed=cfg.seed + 1000 + di,
            max_iter=cfg.max_iter, tol=cfg.tol,
        )
        codebooks[di] = centers
    return codebooks


def _encode(
    assigned: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    cfg: IndexConfig,
    attr_cols: list[str],
) -> DataFrame:
    """One distributed pass: residualize + PQ-encode (B6, B9 fused)."""
    spark = assigned.sparkSession
    sc = spark.sparkContext
    b_cent = sc.broadcast(centroids)
    b_cb = sc.broadcast(codebooks)
    d, c, w = codebooks.shape

    @F.pandas_udf("array<int>")
    def pq_encode(vec: pd.Series, pid: pd.Series) -> pd.Series:
        cent = b_cent.value
        cb = b_cb.value  # (D, C, w)
        x = np.array([np.asarray(v, dtype=np.float64) for v in vec])
        res = x - cent[pid.to_numpy()]
        m = res.shape[0]
        codes = np.empty((m, d), dtype=np.int32)
        # argmin_c ||sub - cb[d,c]||^2 == argmin_c (||cb||^2 - 2 sub.cb)
        for di in range(d):
            sub = res[:, di * w : (di + 1) * w]
            cb_d = cb[di]
            scores = (cb_d**2).sum(axis=1)[None, :] - 2.0 * (sub @ cb_d.T)
            codes[:, di] = np.argmin(scores, axis=1)
        return pd.Series(list(codes))

    return assigned.select(
        cfg.id_col,
        "partition_id",
        pq_encode(F.col(cfg.vec_col), F.col("partition_id")).alias("codes"),
        *attr_cols,
    )


def build_index(df: DataFrame, cfg: IndexConfig | None = None) -> IndexModel:
    """Build an IVF+PQ index over ``df`` (must contain cfg.id_col and
    cfg.vec_col; every other column becomes an attribute column)."""
    cfg = cfg or IndexConfig()
    first = df.select(F.size(F.col(cfg.vec_col)).alias("n")).first()
    if first is None:
        raise ValueError("cannot build an index over an empty DataFrame")
    n = int(first["n"])
    if n % cfg.num_divisions != 0:
        # invariant of the reference: src/vector.rs:162-168
        raise ValueError(
            f"vector_size {n} not divisible by num_divisions {cfg.num_divisions}"
        )
    attr_cols = [c for c in df.columns if c not in (cfg.id_col, cfg.vec_col)]
    centroids, assigned = _coarse_kmeans(df, cfg)
    assigned = assigned.persist()
    try:
        num_vectors = assigned.count()
        codebooks = _train_codebooks(assigned, centroids, cfg, n)
        encoded = _encode(assigned, centroids, codebooks, cfg, attr_cols)
        # materialize before unpersisting the upstream
        encoded = encoded.persist()
        encoded.count()
    finally:
        assigned.unpersist()
    return IndexModel(
        config=cfg,
        vector_size=n,
        num_vectors=num_vectors,
        centroids=centroids,
        codebooks=codebooks,
        encoded=encoded,
        attr_cols=attr_cols,
    )
