"""Bucketed range join: equivalence with the naive range join, outer
semantics, boundary robustness, and the no-cross-join plan guarantee."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flechasdb_spark.operators.ranges import range_join


@pytest.fixture(scope="module")
def pts(spark):
    return spark.createDataFrame(
        [(i, float(i)) for i in range(50)], "pid long, p double"
    )


@pytest.fixture(scope="module")
def ivs(spark):
    # overlapping, touching, and disjoint intervals; widths straddle
    # several bucket sizes
    return spark.createDataFrame(
        [
            (0, 0.0, 10.0),
            (1, 5.0, 6.0),
            (2, 10.0, 30.0),
            (3, 29.5, 29.6),
            (4, 45.0, 100.0),
        ],
        "iid long, lo double, hi double",
    )


def _naive(pts, ivs):
    return pts.join(ivs, (pts.p >= ivs.lo) & (pts.p < ivs.hi))


@pytest.mark.parametrize("w", [0.5, 3.0, 10.0, 64.0])
def test_matches_naive_range_join_any_bucket_width(pts, ivs, w):
    got = sorted(
        (r.pid, r.iid)
        for r in range_join(
            pts, ivs, point="p", lo="lo", hi="hi", bucket_width=w
        ).collect()
    )
    want = sorted((r.pid, r.iid) for r in _naive(pts, ivs).collect())
    assert got == want and len(want) > 0


def test_half_open_boundaries(spark, ivs):
    edge = spark.createDataFrame(
        [(0, 10.0), (1, 29.999999999)], "pid long, p double"
    )
    got = sorted(
        (r.pid, r.iid)
        for r in range_join(
            edge, ivs, point="p", lo="lo", hi="hi", bucket_width=7.0
        ).collect()
    )
    # p=10.0: excluded from [0,10) , included in [10,30)
    assert got == [(0, 2), (1, 2)]


def test_left_outer_keeps_unmatched(spark, ivs):
    lonely = spark.createDataFrame([(0, 40.0)], "pid long, p double")
    rows = range_join(
        lonely, ivs, point="p", lo="lo", hi="hi",
        bucket_width=5.0, how="left_outer",
    ).collect()
    assert len(rows) == 1 and rows[0].iid is None


def test_by_keys_and_no_cross_join_plan(spark):
    pts = spark.createDataFrame(
        [(0, "a", 5.0), (1, "b", 5.0)], "pid long, k string, p double"
    )
    ivs = spark.createDataFrame(
        [("a", 0.0, 10.0)], "k string, lo double, hi double"
    )
    out = range_join(
        pts, ivs, point="p", lo="lo", hi="hi", bucket_width=2.0, by=["k"]
    )
    assert [r.pid for r in out.collect()] == [0]
    plan = out._jdf.queryExecution().executedPlan().toString()
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        assert bad not in plan, f"range join fell back to {bad}"


def test_rejects_bad_width(pts, ivs):
    with pytest.raises(ValueError, match="bucket_width"):
        range_join(pts, ivs, point="p", lo="lo", hi="hi", bucket_width=0)
    with pytest.raises(ValueError, match="how"):
        range_join(
            pts, ivs, point="p", lo="lo", hi="hi", bucket_width=1.0,
            how="right",
        )


def test_interval_overlap_join_unique_meeting_and_semantics(spark):
    """A pair overlapping MANY buckets must appear exactly once (the
    unique meeting-bucket filter replaces a post-join distinct);
    touching half-open intervals do not overlap; `by` keys isolate
    groups; disjoint-name and width validation raise."""
    import pytest as _pt
    from flechasdb_spark.operators.ranges import interval_overlap_join

    left = spark.createDataFrame(
        [
            ("u", 1, 0, 100),      # spans buckets 0..9 at w=10
            ("u", 2, 50, 60),
            ("v", 3, 0, 100),      # same range, other key
        ],
        "k string, lid long, a_lo long, a_hi long",
    )
    right = spark.createDataFrame(
        [
            ("u", 10, 5, 95),      # overlaps lid=1 across 9 buckets
            ("u", 11, 100, 110),   # touches lid=1 at 100 -> NO overlap
            ("u", 12, 55, 56),     # inside lid=1 and lid=2
            ("v", 13, 98, 99),     # only lid=3
        ],
        "k string, rid long, b_lo long, b_hi long",
    )
    out = interval_overlap_join(
        left, right, "a_lo", "a_hi", "b_lo", "b_hi",
        bucket_width=10, by=["k"],
    )
    pairs = sorted((r.lid, r.rid) for r in out.collect())
    assert pairs == [(1, 10), (1, 12), (2, 10), (2, 12), (3, 13)]

    with _pt.raises(ValueError):
        interval_overlap_join(
            left, right, "a_lo", "a_hi", "b_lo", "b_hi", bucket_width=0
        )
    with _pt.raises(ValueError):
        interval_overlap_join(
            left,
            left.select("k", "lid", "a_lo", "a_hi"),
            "a_lo", "a_hi", "a_lo", "a_hi",
            bucket_width=10,
        )


def test_interval_overlap_join_skips_empty_intervals(spark):
    """ADVICE r6: an EMPTY half-open interval [5,5) overlaps nothing,
    but the unfiltered bucket explode generated a descending sequence
    for it and emitted a spurious pair against [4,6). Empty intervals
    on either side must produce zero output rows."""
    from flechasdb_spark.operators.ranges import interval_overlap_join

    left = spark.createDataFrame(
        [(1, 5, 5), (2, 4, 6)], "lid long, a_lo long, a_hi long"
    )
    right = spark.createDataFrame(
        [(10, 4, 6), (11, 7, 7)], "rid long, b_lo long, b_hi long"
    )
    out = interval_overlap_join(
        left, right, "a_lo", "a_hi", "b_lo", "b_hi", bucket_width=4
    ).collect()
    # only the genuine overlap [4,6)x[4,6) survives; both empty
    # intervals ([5,5) left, [7,7) right) emit nothing
    assert [(r.lid, r.rid) for r in out] == [(2, 10)]
