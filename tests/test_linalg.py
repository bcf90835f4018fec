"""Kernel parity tests — port of the reference's linalg unit tests
(/root/reference/src/linalg.rs tests, SURVEY.md §5.1): unroll-boundary
lengths 1, 15, 16, 17, 32, 33, empty vectors, and the overflow-prone
norm2 case, checked against NumPy double-precision ground truth."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from flechasdb_spark.functions import (
    add,
    cosine_similarity,
    dot,
    max_abs,
    norm2,
    normalize,
    scale,
    slice_division,
    squared_l2,
    subtract,
    vmin,
    vsum,
)

BOUNDARY_LENGTHS = [1, 15, 16, 17, 32, 33]


def _vec(n: int, seed: int) -> list[float]:
    rng = np.random.RandomState(seed)
    return [float(np.float32(x)) for x in rng.uniform(-1, 1, n)]


@pytest.fixture(scope="module")
def kernel_df(spark):
    rows = []
    for i, n in enumerate(BOUNDARY_LENGTHS):
        rows.append((f"len{n}", _vec(n, 100 + i), _vec(n, 200 + i)))
    rows.append(("empty", [], []))
    df = spark.createDataFrame(
        rows, "case_id string, xs array<float>, ys array<float>"
    )
    return df


def _expected(rows):
    out = {}
    for case_id, xs, ys in rows:
        x, y = np.array(xs, dtype=np.float64), np.array(ys, dtype=np.float64)
        out[case_id] = {
            "dot": float(np.dot(x, y)) if len(x) else 0.0,
            "sql2": float(np.sum((x - y) ** 2)) if len(x) else 0.0,
            "norm2": float(np.linalg.norm(x)),
            "sum": float(np.sum(x)) if len(x) else 0.0,
            "min": float(np.min(x)) if len(x) else None,
            "max_abs": float(np.max(np.abs(x))) if len(x) else None,
        }
    return out


def test_kernels_boundary_lengths(kernel_df):
    rows = [(r.case_id, r.xs, r.ys) for r in kernel_df.collect()]
    exp = _expected(rows)
    got = kernel_df.select(
        "case_id",
        dot("xs", "ys").alias("dot"),
        squared_l2("xs", "ys").alias("sql2"),
        norm2("xs").alias("norm2"),
        vsum("xs").alias("sum"),
        vmin("xs").alias("min"),
        max_abs("xs").alias("max_abs"),
    ).collect()
    assert len(got) == len(rows)
    for r in got:
        e = exp[r.case_id]
        assert r.dot == pytest.approx(e["dot"], rel=1e-6, abs=1e-9)
        assert r.sql2 == pytest.approx(e["sql2"], rel=1e-6, abs=1e-9)
        assert r.norm2 == pytest.approx(e["norm2"], rel=1e-6, abs=1e-9)
        assert r.sum == pytest.approx(e["sum"], rel=1e-6, abs=1e-9)
        if e["min"] is None:
            assert r.min is None
            assert r.max_abs is None
        else:
            assert r.min == pytest.approx(e["min"], rel=1e-6)
            assert r.max_abs == pytest.approx(e["max_abs"], rel=1e-6)


def test_elementwise_ops(spark):
    xs = [1.0, 2.0, 3.0, 4.0]
    ys = [0.5, -1.0, 2.0, 0.0]
    df = spark.createDataFrame([(xs, ys)], "xs array<float>, ys array<float>")
    row = df.select(
        add("xs", "ys").alias("add"),
        subtract("xs", "ys").alias("sub"),
        scale("xs", 2.0).alias("scaled"),
    ).first()
    assert row.add == pytest.approx([1.5, 1.0, 5.0, 4.0])
    assert row.sub == pytest.approx([0.5, 3.0, 1.0, 4.0])
    assert row.scaled == pytest.approx([2.0, 4.0, 6.0, 8.0])


def test_normalize_unit_length_and_zero(spark):
    df = spark.createDataFrame(
        [([3.0, 4.0],), ([0.0, 0.0],)], "v array<float>"
    )
    rows = df.select(normalize("v").alias("n")).collect()
    assert rows[0].n == pytest.approx([0.6, 0.8], rel=1e-6)
    assert rows[1].n == [0.0, 0.0]
    # normalized vector has unit norm
    nn = df.where(F.size("v") > 0).select(norm2(normalize("v")).alias("x")).first()
    assert nn.x == pytest.approx(1.0, rel=1e-6) or nn.x == 0.0


def test_norm2_overflow_safety(spark):
    # reference pre-scales against f32 overflow (src/linalg.rs:61-75);
    # our double accumulation must survive elements near f32 max.
    big = [1e19, 1e19, -1e19]
    df = spark.createDataFrame([(big,)], "v array<float>")
    got = df.select(norm2("v").alias("n")).first().n
    exp = math.sqrt(3) * 1e19
    assert got == pytest.approx(exp, rel=1e-5)


def test_norm2_scaled_parity_and_extreme_range(spark):
    """The reference's pre-scaled norm (src/linalg.rs:61-146) ported
    verbatim: agrees with the plain kernel on normal inputs, returns 0
    for zero/empty vectors, and stays finite where even double x²
    overflows (1e200) or underflows to 0 (1e-200)."""
    from flechasdb_spark.functions import norm2_scaled

    normal = _vec(33, seed=5)
    df = spark.createDataFrame(
        [(normal,), ([0.0, 0.0],), ([],)], "v array<double>"
    )
    rows = df.select(
        norm2("v").alias("plain"), norm2_scaled("v").alias("scaled")
    ).collect()
    assert rows[0].scaled == pytest.approx(rows[0].plain, rel=1e-12)
    assert rows[1].scaled == 0.0
    assert rows[2].scaled == 0.0

    extreme = spark.createDataFrame(
        [([1e200, -1e200, 1e200],), ([1e-200, 1e-200],)], "v array<double>"
    )
    got = extreme.select(
        norm2("v").alias("plain"), norm2_scaled("v").alias("scaled")
    ).collect()
    assert math.isinf(got[0].plain)  # plain form overflows...
    assert got[0].scaled == pytest.approx(math.sqrt(3) * 1e200, rel=1e-12)
    assert got[1].plain == 0.0  # ...and underflows
    assert got[1].scaled == pytest.approx(math.sqrt(2) * 1e-200, rel=1e-12)


def test_slice_division(spark):
    v = [float(i) for i in range(16)]
    df = spark.createDataFrame([(v,)], "v array<float>")
    row = df.select(
        *[slice_division("v", d, 4).alias(f"d{d}") for d in range(4)]
    ).first()
    for d in range(4):
        assert row[f"d{d}"] == [float(d * 4 + j) for j in range(4)]


def test_cosine_similarity(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [2.0, 2.0]), ([0.0, 0.0], [1.0, 0.0])],
        "a array<float>, b array<float>",
    )
    rows = df.select(cosine_similarity("a", "b").alias("c")).collect()
    assert rows[0].c == pytest.approx(0.0, abs=1e-9)
    assert rows[1].c == pytest.approx(1.0, rel=1e-9)
    assert rows[2].c is None
