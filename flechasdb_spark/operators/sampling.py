"""Deterministic sampling and split assignment for training-data
pipelines — train/val/test splits and downsampling that are stable
across runs, engines, and cluster sizes.

Extension surface (no reference counterpart). The assignment key is a
60-bit md5 hash of (salt, id) reduced mod 10,000 — pure Catalyst
expressions (functions/texthash.py), so every split is a map-only
projection (no shuffle, no RNG state) and exactly recomputable by the
DuckDB oracle. At 100 TB this is the only sane split design: Spark's
``randomSplit`` re-draws under retries/recomputation, hash splits don't.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flechasdb_spark.functions.texthash import md5_long

__all__ = ["hash_split", "hash_sample", "SPLIT_BUCKETS"]

SPLIT_BUCKETS = 10_000  # hash resolution: fractions quantize to 0.01 %


def _bucket(id_col: str, salt: str):
    h = md5_long(
        F.concat(F.lit(salt), F.lit(":"), F.col(id_col).cast("string"))
    )
    return h % SPLIT_BUCKETS


def hash_split(
    df: DataFrame,
    splits: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Add a ``split`` column assigning each row to a named split by
    deterministic hash buckets ([0, 10000) ranges stacked in ``splits``
    insertion order). Fractions must sum to <= 1; rows past the last
    range get NULL (i.e. held out). Same (id, salt) -> same split,
    always."""
    total = sum(splits.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"split fractions sum to {total} > 1")
    b = _bucket(id_col, salt)
    col = None
    acc = 0
    for name, frac in splits.items():
        lo, hi = acc, acc + int(round(frac * SPLIT_BUCKETS))
        cond = (b >= lo) & (b < hi)
        col = F.when(cond, name) if col is None else col.when(cond, name)
        acc = hi
    return df.withColumn("split", col)


def hash_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows by id hash — the
    reproducible form of ``df.sample`` (and composable with it: a
    different salt draws an independent subset)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction {fraction} outside [0, 1]")
    return df.where(_bucket(id_col, salt) < int(round(fraction * SPLIT_BUCKETS)))
