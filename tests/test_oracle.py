"""The local correctness gate: every queries() entry with an oracle must
match DuckDB exactly at sf0.01 (the driver's t2 scale)."""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod
from tests.oracle_harness import compare, duck_con

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF_DIR)
    yield c
    c.close()


def test_every_query_has_callable():
    assert _QUERIES, "no queries registered"
    for name, fn in _QUERIES.items():
        assert callable(fn), name


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_match(spark, con, name):
    sdf = _QUERIES[name](spark, SF_DIR)
    odf = con.execute(_ORACLES[name]).df()
    issues = compare(sdf, odf)
    assert not issues, f"{name}: " + "; ".join(issues)


@pytest.mark.parametrize(
    "name", sorted(set(_QUERIES) - set(_ORACLES))
)
def test_rows_only(spark, name):
    # queries without an oracle still must run and return a stable schema
    sdf = _QUERIES[name](spark, SF_DIR)
    assert sdf.columns
    assert sdf.count() >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_driver_rows_have_scalar_columns_only(spark):
    """Registry-wide guard (VERDICT r5 #2): the driver canonicalizes a
    result by sorting RAW rows before stringifying, so an array/map/
    struct output column raises `unhashable type` at the driver even
    when values are correct. Every row in the driver's 50-entry window
    must therefore emit scalar columns only; complex types belong in
    pytest-gated operator tests, or reshaped (explode / array_join)
    for the registry. Schema inspection only — no execution."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    from flechasdb_spark.queries import DRIVER_ORDER

    offenders = []
    for name in DRIVER_ORDER:
        assert name in _QUERIES, f"DRIVER_ORDER names unknown query {name}"
        schema = _QUERIES[name](spark, SF_DIR).schema
        for f in schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                offenders.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not offenders, (
        "driver-window rows with non-scalar columns (driver canon "
        "cannot sort these): " + "; ".join(offenders)
    )


def test_canon_fails_on_array_column_like_driver():
    """The deliberate array-shaped fixture (VERDICT r5 #2 'done'
    criterion): a list-typed result column must FAIL local
    canonicalization with the driver's exact error class, not pass
    because it was stringified first."""
    import pandas as pd

    from tests.oracle_harness import _canon

    pdf = pd.DataFrame({"doc_id": [2, 1], "token_ids": [[1, 2], [3]]})
    with pytest.raises(TypeError, match="unhashable"):
        _canon(pdf)


def test_compare_is_signbit_exact_like_driver(spark):
    """VERDICT r7 #2 'done' criterion: the exact shape that shipped the
    r7 red row — Spark emits +0.0 where the oracle emits -0.0
    (numerically equal, string-hash-distinct at the driver) — must FAIL
    the local gate; and even an AGREEING -0.0 pair is flagged by the
    registry-wide sweep as a latent hazard."""
    import pandas as pd

    sdf = spark.createDataFrame(
        pd.DataFrame({"vec_id": [0, 1], "c2": [0.0, 1.5]})
    )
    odf = pd.DataFrame({"vec_id": [0, 1], "c2": [-0.0, 1.5]})
    issues = compare(sdf, odf)
    assert issues and any("c2" in i for i in issues), issues

    sdf2 = spark.createDataFrame(
        pd.DataFrame({"vec_id": [0], "c2": [-0.0]})
    )
    odf2 = pd.DataFrame({"vec_id": [0], "c2": [-0.0]})
    issues2 = compare(sdf2, odf2)
    assert issues2 and any("negative zero" in i for i in issues2), issues2

    # and the clean shape still passes
    sdf3 = spark.createDataFrame(
        pd.DataFrame({"vec_id": [0, 1], "c2": [0.0, -1.5]})
    )
    odf3 = pd.DataFrame({"vec_id": [0, 1], "c2": [0.0, -1.5]})
    assert compare(sdf3, odf3) == []
