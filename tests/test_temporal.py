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


def test_asof_matches_pandas_merge_asof_randomized(spark):
    """Seeded randomized parity with pandas merge_asof (backward,
    inclusive, by-key, with and without tolerance) — 600 left x 300
    right rows across 5 keys, duplicate instants on the left allowed
    (right instants unique per key, as the contract requires)."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(7)
    lpdf = pd.DataFrame(
        {
            "lid": np.arange(600),
            "k": rng.randint(0, 5, 600).astype(str),
            "t": rng.randint(0, 10_000, 600),
        }
    )
    v = np.round(rng.uniform(0, 100, 300), 2)
    v[rng.uniform(size=300) < 0.2] = np.nan  # matched-row NULLs must carry
    rpdf = (
        pd.DataFrame(
            {
                "k": rng.randint(0, 5, 300).astype(str),
                "rt": rng.randint(0, 10_000, 300),
                "v": v,
            }
        )
        .drop_duplicates(["k", "rt"])
        .reset_index(drop=True)
    )
    left = spark.createDataFrame(lpdf.assign(t=lpdf.t.astype("int64")))
    right = spark.createDataFrame(rpdf.assign(rt=rpdf.rt.astype("int64")))

    for tol in (None, 500):
        got = (
            asof_join(
                left, right, on="t", by="k", right_on="rt",
                value_cols=["v"], tolerance=tol,
            )
            .toPandas()
            .sort_values("lid")
            .reset_index(drop=True)
        )
        want = pd.merge_asof(
            lpdf.sort_values("t", kind="mergesort"),
            rpdf.sort_values("rt", kind="mergesort"),
            left_on="t",
            right_on="rt",
            by="k",
            direction="backward",
            allow_exact_matches=True,
            tolerance=tol,
        ).sort_values("lid").reset_index(drop=True)
        pd.testing.assert_series_equal(
            got["v"], want["v"], check_names=False
        )


def test_asof_rejects_colliding_value_cols(spark):
    left, right = _fixture(spark)
    import pytest

    with pytest.raises(ValueError, match="collide"):
        asof_join(
            left.withColumn("v", F.lit(0.0)), right,
            on="t", by="k", right_on="rt", value_cols=["v"],
        )


def test_asof_matched_row_nulls_are_preserved(spark):
    """A NULL value column in the MATCHED right row must come through as
    NULL — not be papered over by an older right row's non-NULL value
    (DuckDB ASOF JOIN / pandas merge_asof both return the matched row
    verbatim). Regression test for the independent-last() carry bug."""
    left = spark.createDataFrame(
        [(1, 20, "a"), (2, 12, "a")], "event_id long, t long, k string"
    )
    right = spark.createDataFrame(
        [(10, "a", 1.0, "old"), (15, "a", None, "new")],
        "rt long, k string, v double, tag string",
    )
    out = {
        r.event_id: (r.v, r.tag, r["__matched_t"])
        for r in asof_join(
            left, right, on="t", by="k", right_on="rt",
            value_cols=["v", "tag"],
        ).collect()
    }
    # matched row rt=15 holds (NULL, "new"): both columns must come from it
    assert out[1] == (None, "new", 15)
    assert out[2] == (1.0, "old", 10)


def test_event_transitions_counts_and_probs(spark):
    """Adjacency is per key in (ts, id) order: cross-user pairs never
    count, ties break on event_id, the last event of a key emits no
    transition, and per-current probabilities sum to 1."""
    from flechasdb_spark.operators.temporal import event_transitions

    ev = spark.createDataFrame(
        [
            # user 1: a -> b -> a   (ts tie at 20 broken by event_id)
            (1, 10, 100, "a"),
            (2, 20, 100, "b"),
            (3, 20, 100, "a"),
            # user 2: b -> b
            (4, 5, 200, "b"),
            (5, 6, 200, "b"),
            # user 3: single event -> nothing
            (6, 9, 300, "a"),
        ],
        "event_id long, ts long, user_id long, event_type string",
    )
    out = {
        (r.cur, r.nxt): (r.n, r.p)
        for r in event_transitions(ev).collect()
    }
    assert out == {
        ("a", "b"): (1, 1.0),
        ("b", "a"): (1, 0.5),
        ("b", "b"): (1, 0.5),
    }


def test_retention_cohorts_churn_matrix(spark):
    """Hand-built two-cohort log with churn: cohort sizes, offsets, and
    rates come out exactly; a returning-after-a-gap user still counts
    in the gap-skipping offset only."""
    import pytest

    from flechasdb_spark.operators.temporal import retention_cohorts

    wk = 7 * 86_400 * 1_000_000_000  # one period in ns
    rows = [
        # cohort week 0: users 1, 2, 3
        (1, 0), (2, 0), (3, 0),
        # week 1: users 1, 2 return
        (1, 1 * wk), (2, 1 * wk + 5),
        # week 2: only user 1 — user 3 returns after skipping week 1
        (1, 2 * wk), (3, 2 * wk),
        # cohort week 1: user 4 joins, returns week 2
        (4, 1 * wk), (4, 2 * wk),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts long")
    out = {
        (r.cohort_period, r.period_offset): (r.n_users, r.retention_rate)
        for r in retention_cohorts(ev).collect()
    }
    assert out == {
        (0, 0): (3, 1.0),
        (0, 1): (2, round(2 / 3, 4)),
        (0, 2): (2, round(2 / 3, 4)),
        (1, 0): (1, 1.0),
        (1, 1): (1, 1.0),
    }
    with pytest.raises(ValueError, match="period_days"):
        retention_cohorts(ev, period_days=0)


def test_rate_zscores_gap_filled_grid(spark):
    """The grid includes empty buckets as zeros (changing the stats), a
    constant series gets z = 0 everywhere, and a spike stands out with
    the exact population z-score."""
    import math

    import pytest

    from flechasdb_spark.operators.temporal import rate_zscores

    h = 3600 * 1_000_000_000
    rows = (
        # type "flat": 1 event in each of buckets 0..3 -> z = 0
        [(i, i * h, "flat") for i in range(4)]
        # type "spiky": 4 events in bucket 0, none in 1..2, 1 in bucket 3
        + [(10 + j, j, "spiky") for j in range(4)]
        + [(20, 3 * h, "spiky")]
    )
    ev = spark.createDataFrame(rows, "event_id long, ts long, event_type string")
    out = {
        (r.event_type, r.bucket_epoch): (r.cnt, r.zscore)
        for r in rate_zscores(ev).collect()
    }
    assert len(out) == 8  # 2 types x 4 grid buckets, gaps filled
    assert all(v == (1, 0.0) for k, v in out.items() if k[0] == "flat")
    # spiky: counts 4,0,0,1 -> mean 1.25, var (16+0+0+1)/4 - 1.5625
    mean, var = 1.25, 17 / 4 - 1.25 * 1.25
    z0 = round((4 - mean) / math.sqrt(var), 4)
    z_gap = round((0 - mean) / math.sqrt(var), 4)
    assert out[("spiky", 0)] == (4, z0)
    assert out[("spiky", 3600)][0] == 0 and out[("spiky", 3600)][1] == z_gap
    with pytest.raises(ValueError, match="bucket_seconds"):
        rate_zscores(ev, bucket_seconds=0)


def test_batch_rate_zscores_frozen_reference(spark):
    """Scoring a batch against frozen rate_stats: z uses the REFERENCE
    mean/std (not the batch's), unknown types are dropped, and only
    buckets present in the batch are scored."""
    from flechasdb_spark.operators.temporal import (
        batch_rate_zscores,
        rate_stats,
    )

    h = 3600 * 1_000_000_000
    hist = spark.createDataFrame(
        # history: counts 4,0,0,1 for "spiky" -> mean 1.25, std sqrt(2.6875)
        [(10 + j, j, "spiky") for j in range(4)] + [(20, 3 * h, "spiky")],
        "event_id long, ts long, event_type string",
    )
    stats = rate_stats(hist)
    batch = spark.createDataFrame(
        # 3 spiky events land in one NEW bucket; one event of an
        # unknown type must be dropped (no baseline)
        [(100 + j, 7 * h + j, "spiky") for j in range(3)]
        + [(200, 7 * h, "brand_new")],
        "event_id long, ts long, event_type string",
    )
    out = batch_rate_zscores(batch, stats).collect()
    assert len(out) == 1  # one bucket present, unknown type dropped
    r = out[0]
    import math

    mean, var = 1.25, 17 / 4 - 1.25 * 1.25
    assert r.event_type == "spiky" and r.cnt == 3
    assert r.bucket_epoch == 7 * 3600
    assert r.zscore == round((3 - mean) / math.sqrt(var), 4)
