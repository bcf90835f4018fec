"""Bucketed range join: point-in-interval joins without the cross join.

No reference counterpart (the reference has no relational joins at
all — SURVEY.md §2.3); this is a training-pipeline scale primitive
(value banding, time-window attribution, length-bucket histograms).

Spark executes ``L JOIN R ON L.p >= R.lo AND L.p < R.hi`` as a
BroadcastNestedLoopJoin (small R) or a cartesian product (big R) —
O(|L|·|R|) comparisons either way. The bucketed decomposition turns it
into an EQUI-join both engines can hash:

    right:  explode each interval into the integer buckets it covers
            (floor(lo/w)-1 .. floor(hi/w)+1 — one bucket of slack each
            side absorbs floating-point boundary rounding)
    left:   bucket = floor(p/w)
    join:   on (by..., bucket), then the EXACT residual lo <= p < hi

Each (interval, point) pair meets in exactly one bucket — the point's
own — so no post-join dedup is needed. Cost: |R| grows by
O(interval_width / w) replicas; the join is a hash equi-join with
map-side-combinable aggregation on top. Pick ``bucket_width`` near the
typical interval width: wider buckets = fewer replicas but more
residual-filtered pairs; narrower = the reverse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["range_join", "interval_overlap_join"]


def range_join(
    left: DataFrame,
    right: DataFrame,
    point: str,
    lo: str,
    hi: str,
    bucket_width: float,
    by: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join left rows to every right interval containing them:
    ``by`` keys equal AND lo <= point < hi (half-open).

    ``how``: "inner" or "left_outer" (unmatched left rows keep NULL
    interval columns). Output: left columns + right columns.
    """
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be > 0, got {bucket_width}")
    by = by or []
    w = F.lit(float(bucket_width))
    r = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                (F.floor(F.col(lo) / w) - 1).cast("long"),
                (F.floor(F.col(hi) / w) + 1).cast("long"),
            )
        ),
    )
    l = left.withColumn("__bucket", F.floor(F.col(point) / w).cast("long"))
    if how not in ("inner", "left_outer"):
        raise ValueError(f"unsupported how: {how}")
    # condition built from explicit side references so shared `by`
    # column names never hit ambiguous auto-resolution
    full = l["__bucket"] == r["__bucket"]
    for k in by:
        full = full & (l[k] == r[k])
    full = full & (l[point] >= r[lo]) & (l[point] < r[hi])
    out = l.join(r, full, how)
    keep_left = [l[c] for c in left.columns]
    keep_right = [
        r[c] for c in right.columns if c not in set(by) and c != "__bucket"
    ]
    return out.select(*keep_left, *keep_right)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    bucket_width: int,
    by: list[str] | None = None,
) -> DataFrame:
    """Interval x interval OVERLAP join (half-open: ``a_lo < b_hi AND
    b_lo < a_hi``) as a hash equi-join — the two-sided sibling of
    ``range_join``'s point-in-interval. Spark plans the naive
    inequality join as BroadcastNestedLoopJoin / cartesian,
    O(|L|*|R|); here BOTH sides explode into the integer buckets they
    cover and meet on the bucket key.

    An overlapping pair shares every bucket the overlap spans, so a
    plain bucket join would duplicate it; instead of a post-join
    ``distinct`` (an extra shuffle over the whole result), each pair
    is kept only in the ONE bucket that contains the overlap's start
    ``greatest(a_lo, b_lo)`` — unique per pair by construction, so
    the output needs no dedup.

    Integer domains only (timestamps in us/ns, scaled values):
    buckets use exact ``div`` arithmetic, never float floor, so the
    DuckDB oracle reproduces the join bit for bit. Cost: each side
    grows by O(interval_width / bucket_width) replicas; pick
    ``bucket_width`` near the typical interval width.

    Returns all columns of both inputs (names must be disjoint) for
    every overlapping pair."""
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    by = by or []
    clash = set(left.columns) & set(right.columns)
    if clash - set(by):
        raise ValueError(
            f"column names must be disjoint outside `by`, clash: "
            f"{sorted(clash - set(by))}"
        )
    w = int(bucket_width)

    def _explode(df: DataFrame, lo: str, hi: str) -> DataFrame:
        # drop EMPTY half-open intervals (lo >= hi) before the bucket
        # explode: they overlap nothing by definition, but Spark's
        # sequence((hi-1) div w < lo div w) is DESCENDING (non-empty),
        # so an unfiltered [5,5) produced spurious bucket rows that
        # survived the a_lo<b_hi predicate (ADVICE r6)
        return df.where(F.col(lo) < F.col(hi)).withColumn(
            "__b",
            F.explode(
                F.sequence(
                    F.expr(f"{lo} div {w}"), F.expr(f"({hi} - 1) div {w}")
                )
            ),
        )

    lb = _explode(left, left_lo, left_hi)
    rb = _explode(right, right_lo, right_hi)
    pairs = lb.join(rb, [*by, "__b"])
    return pairs.where(
        (F.col(left_lo) < F.col(right_hi))
        & (F.col(right_lo) < F.col(left_hi))
        & (F.expr(f"greatest({left_lo}, {right_lo}) div {w}") == F.col("__b"))
    ).drop("__b")
