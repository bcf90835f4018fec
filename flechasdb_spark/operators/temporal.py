"""Temporal operators: as-of join (point-in-time join).

The reference engine has no temporal surface; this is part of the
training-data-pipeline extension (feature backfill, point-in-time
correctness for label joins, "latest state as of event time").

Spark lacks a native as-of join, and the naive formulation — a range
join ``l.ts >= r.ts`` plus a per-row argmax — explodes into
O(|L| * |R|) pairs per key. This implementation is the scale-safe
union form:

    union(left tagged 1, right tagged 0)
      -> one shuffle on the ``by`` keys
      -> running ``last(value, ignorenulls)`` over (time, tag) order
      -> keep left rows

Every right value is carried forward to exactly the left rows it is
the as-of match for, so the cost is one shuffle + one sort of
|L| + |R| rows — no range-join blowup, no skew beyond what the ``by``
keys already have (salt upstream if a single key dominates).

Semantics (matching DuckDB ``ASOF LEFT JOIN`` with ``l.t >= r.t``):
backward-looking, inclusive — each left row gets the right row with
the greatest time <= its own; unmatched left rows keep NULLs. Right
rows must be unique per (by, time) — pre-aggregate otherwise (ties
within one instant have no defined winner in any engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "asof_join",
    "decayed_counts",
    "sequential_funnel",
    "event_transitions",
    "retention_cohorts",
    "rate_zscores",
    "rate_stats",
    "batch_rate_zscores",
]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | str,
    value_cols: list[str] | None = None,
    tolerance: int | None = None,
    right_on: str | None = None,
) -> DataFrame:
    """Backward inclusive as-of join.

    Parameters
    ----------
    on: ordering column (numeric or timestamp) in ``left``; ``right``
        uses ``right_on`` (default: same name).
    by: equality key column(s) present on both sides.
    value_cols: columns of ``right`` to carry onto matched left rows
        (default: every right column except keys/time). Names must not
        collide with left columns — alias upstream.
    tolerance: when set, a match older than ``tolerance`` (in the units
        of ``on``) is treated as no match (values nulled), like pandas
        ``merge_asof(tolerance=...)``.

    Returns ``left`` columns + ``value_cols`` + ``__matched_{on}`` (the
    matched right time, NULL when unmatched).
    """
    by = [by] if isinstance(by, str) else list(by)
    right_on = right_on or on
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in (*by, right_on)
        ]
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(f"value_cols collide with left columns: {sorted(clash)}")

    matched_on = f"__matched_{on}"
    # Pack (matched time, *values) into ONE struct per right row and
    # carry the struct with a single last(ignorenulls=True): all output
    # columns then come from the same matched right row, so a NULL value
    # in the matched row stays NULL instead of leaking an older row's
    # non-NULL value (DuckDB ASOF JOIN / pandas merge_asof semantics).
    r = right.select(
        *by,
        F.col(right_on).alias(on),
        F.struct(
            F.col(right_on).alias(matched_on),
            *[F.col(c).alias(c) for c in value_cols],
        ).alias("__asof"),
        F.lit(0).alias("__side"),
    )
    l = left.select(
        "*",
        F.lit(None).cast(r.schema["__asof"].dataType).alias("__asof"),
        F.lit(1).alias("__side"),
    )
    both = l.unionByName(r, allowMissingColumns=True)

    # right rows (__side=0) sort before left rows at the same instant,
    # so "inclusive" falls out of the (on, __side) sort order
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pack = F.last("__asof", ignorenulls=True).over(w)
    carried = both.select(
        *left.columns,
        "__side",
        pack[matched_on].alias(matched_on),
        *[pack[c].alias(c) for c in value_cols],
    ).where(F.col("__side") == 1)

    if tolerance is not None:
        stale = F.col(matched_on).isNull() | (
            (F.col(on) - F.col(matched_on)) > F.lit(tolerance)
        )
        carried = carried.select(
            *left.columns,
            *[
                F.when(stale, F.lit(None)).otherwise(F.col(c)).alias(c)
                for c in (matched_on, *value_cols)
            ],
        )
    else:
        carried = carried.drop("__side")
    return carried


def decayed_counts(
    events: DataFrame,
    half_life_sec: float,
    by: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Exponentially time-decayed event counts per key: score =
    Σ 2^(-(t_ref − t)/half_life), t_ref = the corpus max timestamp —
    the standard recency-weighted activity aggregate (trending users /
    hot keys) where a plain count weights a year-old event like
    yesterday's.

    Determinism (the DSIR/LM contract): each event's weight is
    quantized ONCE to integer micro-units round(1e6 * exp(-ln2·Δt/h)),
    so per-key sums are order-independent integer sums at any
    parallelism.

    Scale (100 TB): one 1-row max broadcast + a map-side-combinable
    partial agg keyed on ``by`` — no window, no driver state.
    ``ts_col`` is long nanoseconds (session.normalize_event_ts).
    """
    import math

    ref = events.agg(F.max(F.col(ts_col)).alias("__tref"))
    lam = math.log(2.0) / float(half_life_sec)
    w_micro = F.round(
        F.exp(
            -F.lit(lam)
            * ((F.col("__tref") - F.col(ts_col)) / F.lit(1e9))
        )
        * 1e6
    ).cast("long")
    return (
        events.crossJoin(F.broadcast(ref))
        .select(F.col(by), w_micro.alias("__w"))
        .groupBy(by)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("__w").alias("__dm"),
        )
        .select(
            by,
            F.col("n_events").cast("long").alias("n_events"),
            F.round(F.col("__dm") / 1e6, 6).alias("decayed_count"),
        )
        .orderBy(by)
    )


def sequential_funnel(
    events: DataFrame,
    stages: list[str],
    by: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel completion counts: a key reaches stage i when it
    has a stage-i event STRICTLY AFTER its earliest qualifying
    stage-(i-1) event (min-timestamp semantics per stage). Returns one
    row per stage: (stage_idx, stage, n_keys).

    Scale (100 TB): per stage one type-filtered partial agg + one
    key-equi-join against the previous stage's (key, t) table — the
    table SHRINKS at every stage, no windows, no per-key sequence
    materialization.
    """
    if not stages:
        raise ValueError("stages must be non-empty")
    cur = (
        events.where(F.col(type_col) == stages[0])
        .groupBy(by)
        .agg(F.min(ts_col).alias("__t"))
    )
    out_rows = [(0, stages[0], cur)]
    for i, st in enumerate(stages[1:], start=1):
        nxt = (
            events.where(F.col(type_col) == st)
            .join(cur.select(by, F.col("__t").alias("__prev")), by)
            .where(F.col(ts_col) > F.col("__prev"))
            .groupBy(by)
            .agg(F.min(ts_col).alias("__t"))
        )
        out_rows.append((i, st, nxt))
        cur = nxt
    spark = events.sparkSession
    counts = None
    for i, st, df in out_rows:
        c = df.agg(F.count(F.lit(1)).alias("n_keys")).select(
            F.lit(i).cast("long").alias("stage_idx"),
            F.lit(st).alias("stage"),
            F.col("n_keys").cast("long").alias("n_keys"),
        )
        counts = c if counts is None else counts.unionByName(c)
    return counts.orderBy("stage_idx")


def event_transitions(
    events: DataFrame,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    round_to: int = 4,
) -> DataFrame:
    """First-order Markov transition matrix over per-key event
    sequences: for each (current, next) event-type pair, the count of
    adjacent occurrences and the conditional probability
    P(next | current) — the sequence-analytics view next to
    ``sequential_funnel``'s fixed-order completion.

    Ordering within a key is (ts, id) so timestamp ties are
    deterministic cross-engine. One window pass keyed on the entity
    (lead over the per-key sort — the same shuffle sessionization
    pays), then an O(types^2) partial agg; the per-current totals come
    from a window over the O(types^2) aggregate, not a second corpus
    pass. Counts are exact integers; the probability is one integer
    division both engines compute identically, rounded for display.

    Returns (cur, nxt, n, p) with p summing to 1 within each cur."""
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    steps = (
        events.select(key_col, ts_col, id_col, F.col(type_col).alias("cur"))
        .withColumn("nxt", F.lead("cur").over(w))
        .where(F.col("nxt").isNotNull())
    )
    agg = steps.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n"))
    tot = Window.partitionBy("cur")
    return agg.select(
        "cur",
        "nxt",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(tot), round_to
        ).alias("p"),
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_days: int = 7,
    round_to: int = 4,
) -> DataFrame:
    """Classic cohort-retention matrix: users grouped by the period of
    their FIRST event, tracked by how many return in each later period
    (the product-analytics "week-N retention" table).

    Periods are integer epoch indices — ``ts div period_ns`` on the
    long-nanosecond event time (session.normalize_event_ts, the same
    convention as ``decayed_counts``) — pure INTEGER division, never a
    double (2024 epoch-nanos exceed 2^53, so ``floor(ts/period)`` in
    doubles would mis-bucket), and no engine week-start conventions.
    cohort = min period per user; retention_rate divides by the
    cohort's period-0 size (every user is active in their own first
    period by construction).

    Scale shape: distinct (user, period) first — O(users * periods)
    rows, the only corpus-sized pass — then a user-keyed window for the
    cohort min and an O(cohorts * offsets) agg. No self-join of the
    event log.

    Returns (cohort_period, period_offset, n_users, retention_rate)."""
    if period_days < 1:
        raise ValueError(f"period_days must be >= 1, got {period_days}")
    period_ns = int(period_days) * 86_400 * 1_000_000_000
    pairs = (
        events.select(
            F.col(user_col).alias("__u"),
            F.expr(f"CAST(`{ts_col}` div {period_ns} AS BIGINT)").alias(
                "__p"
            ),
        )
        .distinct()
    )
    w = Window.partitionBy("__u")
    labeled = pairs.withColumn("__cohort", F.min("__p").over(w))
    agg = labeled.groupBy(
        F.col("__cohort").alias("cohort_period"),
        (F.col("__p") - F.col("__cohort")).alias("period_offset"),
    ).agg(F.count(F.lit(1)).alias("n_users"))
    base = Window.partitionBy("cohort_period")
    cohort_size = F.max(
        F.when(F.col("period_offset") == 0, F.col("n_users"))
    ).over(base)
    return agg.select(
        "cohort_period",
        "period_offset",
        "n_users",
        F.round(
            F.col("n_users").cast("double") / cohort_size.cast("double"),
            round_to,
        ).alias("retention_rate"),
    )


def rate_zscores(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    bucket_seconds: int = 3600,
    round_to: int = 4,
) -> DataFrame:
    """Per-type event-rate z-scores over a GAP-FILLED time grid — the
    rate-anomaly view ("which hours were unusually hot/quiet for this
    event type?").

    Empty buckets count as zero: the grid spans every ``bucket_seconds``
    step between the corpus min and max bucket (inclusive), crossed
    with the type dimension, so the mean/std are over the true time
    series, not just the buckets that happened to have events (a
    present-buckets-only std understates variance exactly where
    anomaly detection needs it).

    Determinism: bucket = ``ts div bucket_ns`` on the long-nanosecond
    event time (INTEGER division — 2024 epoch-nanos exceed 2^53, so a
    double floor would mis-bucket); counts / Σc / Σc² are exact
    BIGINTs; mean = S1/n, var = S2/n - mean², std = sqrt(var) (IEEE
    sqrt is correctly rounded in both engines), z = (c - mean)/std
    with z = 0 where std = 0 — the identical expression tree the
    DuckDB oracle evaluates.

    Scale shape: one partial-aggregated groupBy to O(types * buckets)
    count rows, a 1-row global min/max, a broadcast grid join, and an
    O(types) stats agg joined back broadcast. The corpus is read once.

    Returns (event_type, bucket_epoch, cnt, zscore) over the full grid."""
    full = _gap_filled_counts(events, type_col, ts_col, bucket_seconds)
    stats = _grid_stats(full)
    return _attach_zscores(full, stats, bucket_seconds, round_to).select(
        "event_type", "bucket_epoch", "cnt", "zscore"
    )


def _gap_filled_counts(
    events: DataFrame, type_col: str, ts_col: str, bucket_seconds: int
) -> DataFrame:
    """(event_type, __b, cnt) over the FULL bucket grid (empty buckets
    as zeros) between the corpus min and max bucket."""
    if bucket_seconds < 1:
        raise ValueError(f"bucket_seconds must be >= 1, got {bucket_seconds}")
    bucket_ns = int(bucket_seconds) * 1_000_000_000
    b = F.expr(f"CAST(`{ts_col}` div {bucket_ns} AS BIGINT)")
    # checkpoint the tiny O(types * buckets) count table: span, the
    # type dimension, the grid join AND the downstream stats agg all
    # read it, and without the checkpoint Catalyst re-derives each
    # consumer's subtree from the corpus scan (4 full scans at 100 TB;
    # one here)
    counts = (
        events.select(F.col(type_col).alias("event_type"), b.alias("__b"))
        .groupBy("event_type", "__b")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)
    )
    span = counts.agg(
        F.min("__b").alias("lo"), F.max("__b").alias("hi")
    )
    grid = span.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("__b")
    )
    types = counts.select("event_type").distinct()
    return (
        types.crossJoin(F.broadcast(grid))
        .join(counts, ["event_type", "__b"], "left")
        .select(
            "event_type",
            "__b",
            F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("cnt"),
        )
    )


def _grid_stats(full: DataFrame) -> DataFrame:
    """(event_type, __n, __s1, __s2) — exact-integer sufficient
    statistics of the gap-filled series."""
    return full.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("cnt").alias("__s1"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("__s2"),
    )


def _attach_zscores(
    buckets: DataFrame, stats: DataFrame, bucket_seconds: int, round_to: int
) -> DataFrame:
    """Join (event_type, __b, cnt) rows against the integer sufficient
    statistics (broadcast) and emit bucket_epoch + zscore."""
    mean = F.col("__s1").cast("double") / F.col("__n").cast("double")
    var = F.col("__s2").cast("double") / F.col("__n").cast("double") - (
        F.col("__mean") * F.col("__mean")
    )
    joined = (
        buckets.join(F.broadcast(stats), "event_type")
        .withColumn("__mean", mean)
        .withColumn("__std", F.sqrt(F.greatest(var, F.lit(0.0))))
    )
    z = F.when(F.col("__std") == 0.0, F.lit(0.0)).otherwise(
        (F.col("cnt").cast("double") - F.col("__mean")) / F.col("__std")
    )
    return joined.select(
        *[c for c in buckets.columns if c not in ("__b", "cnt")],
        (F.col("__b") * int(bucket_seconds)).alias("bucket_epoch"),
        "cnt",
        F.round(z, round_to).alias("zscore"),
    )


def rate_stats(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """The FROZEN reference for streaming rate anomalies: per-type
    exact-integer sufficient statistics (n buckets, Σc, Σc²) of the
    gap-filled historical series — train offline, broadcast at ingest.
    Integer sums make the downstream z arithmetic deterministic and
    the reference mergeable (add the sums to extend the history).

    Returns (event_type, n_buckets, sum_cnt, sum_cnt_sq)."""
    full = _gap_filled_counts(events, type_col, ts_col, bucket_seconds)
    return _grid_stats(full).select(
        "event_type",
        F.col("__n").alias("n_buckets"),
        F.col("__s1").alias("sum_cnt"),
        F.col("__s2").alias("sum_cnt_sq"),
    )


def batch_rate_zscores(
    batch: DataFrame,
    stats: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    bucket_seconds: int = 3600,
    round_to: int = 4,
) -> DataFrame:
    """Score ONE batch's per-type bucket counts against a frozen
    ``rate_stats`` reference: z = (cnt - mean_ref) / std_ref. Only
    buckets PRESENT in the batch are scored (an ingest monitor cannot
    see buckets that haven't arrived; quiet-hour detection is the
    batch-mode ``rate_zscores``' job). Types absent from the reference
    are dropped — an unknown type has no baseline (surface them with a
    separate novelty check).

    Per batch: one partial agg to O(types * buckets_present) rows + a
    broadcast join of the O(types) reference. Returns
    (event_type, bucket_epoch, cnt, zscore)."""
    if bucket_seconds < 1:
        raise ValueError(f"bucket_seconds must be >= 1, got {bucket_seconds}")
    bucket_ns = int(bucket_seconds) * 1_000_000_000
    b = F.expr(f"CAST(`{ts_col}` div {bucket_ns} AS BIGINT)")
    counts = (
        batch.select(F.col(type_col).alias("event_type"), b.alias("__b"))
        .groupBy("event_type", "__b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    s = stats.select(
        "event_type",
        F.col("n_buckets").alias("__n"),
        F.col("sum_cnt").alias("__s1"),
        F.col("sum_cnt_sq").alias("__s2"),
    )
    return _attach_zscores(counts, s, bucket_seconds, round_to).select(
        "event_type", "bucket_epoch", "cnt", "zscore"
    )
