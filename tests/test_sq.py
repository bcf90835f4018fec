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


# ---------------------------------------------------------------------------
# quantile-clipped bounds (VERDICT r7 #7)
# ---------------------------------------------------------------------------


def _vec_err(df, lo, hi):
    """Per-vector squared reconstruction error under (lo, hi) bounds."""
    from flechasdb_spark.operators.sq import sq_decode, sq_encode_expr

    rec = sq_decode(sq_encode_expr("v", lo, hi), lo, hi)
    err = F.aggregate(
        F.zip_with(
            F.col("v").cast("array<double>"),
            rec,
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return df.select(err.alias("e"))


def _median_err(df, lo, hi):
    return _vec_err(df, lo, hi).agg(
        F.expr("percentile(e, 0.5)")
    ).first()[0]


def test_quantile_bounds_beat_minmax_on_heavy_tails(spark):
    """One extreme coordinate inflates the min/max step size for EVERY
    vector; quantile-clipped bounds pay a bounded saturation error on
    the outliers ONLY. The honest metric is therefore the TYPICAL
    (median) per-vector distortion — mean MSE is dominated by the
    handful of saturated outliers by construction (their squared
    saturation error is O(outlier^2) while everyone else's gain is
    O(step^2)), and those vectors were unrepresentable at 8 bits
    either way. Gates: (a) median per-vector error drops >= 10x under
    clipping and improves monotonically as the clip tightens toward
    the inlier mass; (b) on a clean fixture clipping is harmless
    (median within 2x of min/max); (c) (0, 1) degenerates to exact
    min/max bounds."""
    import random

    import pytest

    from flechasdb_spark.operators.sq import sq_bounds, sq_bounds_quantile

    rng = random.Random(7)
    dim, n = 8, 4000
    rows = []
    for i in range(n):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        if i % 1000 == 0:  # 0.1% outliers at +/-500
            v[i // 1000 % dim] = 500.0 if i % 2000 == 0 else -500.0
        rows.append((i, v))
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")

    lo_mm, hi_mm = sq_bounds(df, "v")
    med_mm = _median_err(df, lo_mm, hi_mm)
    med_q1 = _median_err(
        df, *sq_bounds_quantile(df, "v", q_lo=0.01, q_hi=0.99)
    )
    med_q2 = _median_err(
        df, *sq_bounds_quantile(df, "v", q_lo=0.05, q_hi=0.95)
    )
    # monotone improvement of the typical vector's distortion as the
    # clip tightens toward the inlier mass, and a >= 10x win overall
    assert med_q2 < med_q1 < med_mm, (med_mm, med_q1, med_q2)
    assert med_q1 < med_mm / 10

    clean = spark.createDataFrame(
        [(i, [rng.gauss(0.0, 1.0) for _ in range(dim)]) for i in range(2000)],
        "vec_id long, v array<double>",
    )
    lo_c, hi_c = sq_bounds(clean, "v")
    med_c = _median_err(clean, lo_c, hi_c)
    med_cq = _median_err(
        clean, *sq_bounds_quantile(clean, "v", q_lo=0.001, q_hi=0.999)
    )
    assert med_cq < med_c * 2

    # (0, 1) degenerates to exact min/max
    lo0, hi0 = sq_bounds_quantile(df, "v", q_lo=0.0, q_hi=1.0)
    assert lo0 == pytest.approx(lo_mm) and hi0 == pytest.approx(hi_mm)


def test_ivfsq_clip_composes_with_per_cell(spark, sf_dir):
    """build_ivfsq(bounds='per_cell', clip=...) runs end to end and
    queries return k rows with non-negative distances (the embeddings
    fixture has no outliers, so this pins the plumbing; the distortion
    win is gated above on the heavy-tailed fixture)."""
    from flechasdb_spark.plans.ivfsq import build_ivfsq, ivfsq_query

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cent = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").cast("int").alias("partition_id"),
        F.col("embedding").alias("centroid"),
    )
    m = build_ivfsq(emb, cent, bounds="per_cell", clip=(0.01, 0.99))
    qv = [float(x) for x in emb.where(F.col("vec_id") == 2).first()["embedding"]]
    rows = ivfsq_query(m, qv, k=10, nprobe=4).collect()
    assert len(rows) == 10
    assert all(r.squared_distance >= 0 for r in rows)


def test_quantile_bounds_containment_and_nesting(spark):
    """Structural invariants over randomized corpora (3 seeds):
    quantile bounds always lie WITHIN the min/max bounds, tighter
    clips nest inside looser ones, and lo <= hi per dimension."""
    import random

    from flechasdb_spark.operators.sq import sq_bounds, sq_bounds_quantile

    for seed in (1, 2, 3):
        rng = random.Random(seed)
        dim = rng.choice([4, 8])
        df = spark.createDataFrame(
            [
                (i, [rng.uniform(-5, 5) * (j + 1) for j in range(dim)])
                for i in range(800)
            ],
            "vec_id long, v array<double>",
        )
        lo_mm, hi_mm = sq_bounds(df, "v")
        lo_w, hi_w = sq_bounds_quantile(df, "v", q_lo=0.01, q_hi=0.99)
        lo_t, hi_t = sq_bounds_quantile(df, "v", q_lo=0.05, q_hi=0.95)
        eps = 1e-9
        for j in range(dim):
            assert lo_mm[j] - eps <= lo_w[j] <= lo_t[j] + eps, (seed, j)
            assert hi_t[j] - eps <= hi_w[j] <= hi_mm[j] + eps, (seed, j)
            assert lo_w[j] <= hi_w[j] and lo_t[j] <= hi_t[j], (seed, j)
