"""Scalar quantization (SQ8) — oracle parity, the per-dim error bound,
and the map-only plan shape the 100 TB design depends on."""

from __future__ import annotations

from pyspark.sql import functions as F

from flechasdb_spark.operators.sq import (
    sq_bounds,
    sq_decode,
    sq_encode,
    sq_knn,
)
from flechasdb_spark.queries import ORACLES, REGISTRY
from tests.oracle_harness import compare, duck_con


def test_sq_queries_match_oracle(spark, sf_dir):
    con = duck_con(sf_dir)
    for name in ["sq_roundtrip", "sq_knn"]:
        sdf = REGISTRY[name](spark, sf_dir)
        odf = con.execute(ORACLES[name]).df()
        assert compare(sdf, odf) == [], name


def test_sq_error_bound(spark, sf_dir):
    """Floor quantization error is < one step = (hi-lo)/255 per dim."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    lo, hi = sq_bounds(emb)
    step = max((h - l) / 255.0 for l, h in zip(lo, hi))
    enc = sq_encode(emb, lo, hi)
    max_err = (
        enc.join(emb.select("vec_id", "embedding"), "vec_id")
        .select(
            F.array_max(
                F.zip_with(
                    F.col("embedding").cast("array<double>"),
                    sq_decode(F.col("codes"), lo, hi),
                    lambda x, d: F.abs(x - d),
                )
            ).alias("e")
        )
        .agg(F.max("e"))
        .first()[0]
    )
    assert max_err <= step + 1e-12
    codes_ty = dict(enc.dtypes)["codes"]
    assert codes_ty == "array<smallint>"


def test_sq_encode_is_map_only(spark, sf_dir):
    """Encode must stay a single map-side projection: bounds are inlined
    literals, so the plan has no Exchange at all."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    lo, hi = sq_bounds(emb)
    plan = (
        sq_encode(emb, lo, hi)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_sq_knn_partial_topk(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    lo, hi = sq_bounds(emb)
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    enc = sq_encode(emb, lo, hi)
    top = sq_knn(enc, lo, hi, qv, k=5)
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    rows = top.collect()
    assert [r.vec_id for r in rows][0] == 0  # self is nearest
    ds = [r.squared_distance for r in rows]
    assert ds == sorted(ds)
