"""As-of join semantics: backward inclusive match, unmatched rows,
tolerance, and the no-range-join plan guarantee."""

from __future__ import annotations

from pyspark.sql import functions as F

from flechasdb_spark.operators.temporal import asof_join


def _fixture(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "a"), (3, 5, "b"), (4, 30, "b")],
        "event_id long, t long, k string",
    )
    right = spark.createDataFrame(
        [(10, "a", 1.0), (15, "a", 2.0), (25, "b", 9.0)],
        "rt long, k string, v double",
    )
    return left, right


def test_asof_backward_inclusive_and_unmatched(spark):
    left, right = _fixture(spark)
    out = {
        r.event_id: (r.v, r["__matched_t"])
        for r in asof_join(
            left, right, on="t", by="k", right_on="rt", value_cols=["v"]
        ).collect()
    }
    assert out[1] == (1.0, 10)  # inclusive: rt == t matches
    assert out[2] == (2.0, 15)  # latest prior wins
    assert out[3] == (None, None)  # before any right row
    assert out[4] == (9.0, 25)


def test_asof_tolerance_nulls_stale_matches(spark):
    left, right = _fixture(spark)
    out = {
        r.event_id: r.v
        for r in asof_join(
            left, right, on="t", by="k", right_on="rt",
            value_cols=["v"], tolerance=4,
        ).collect()
    }
    assert out[1] == 1.0  # age 0 <= 4
    assert out[2] is None  # age 5 > 4
    assert out[4] is None  # age 5 > 4


def test_asof_plan_has_no_range_join(spark):
    left, right = _fixture(spark)
    plan = (
        asof_join(left, right, on="t", by="k", right_on="rt", value_cols=["v"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin"):
        assert bad not in plan, f"range-join blowup in as-of plan: {bad}"


def test_asof_rejects_colliding_value_cols(spark):
    left, right = _fixture(spark)
    import pytest

    with pytest.raises(ValueError, match="collide"):
        asof_join(
            left.withColumn("v", F.lit(0.0)), right,
            on="t", by="k", right_on="rt", value_cols=["v"],
        )
