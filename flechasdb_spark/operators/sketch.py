"""Sketch aggregates with DETERMINISTIC, oracle-checkable arithmetic.

Spark's built-in sketches (approx_count_distinct's HLL++,
percentile_approx's KLL) give engine-specific answers, so they can't be
driver-gated against DuckDB. KMV (k-minimum-values) over the shared
md5-based hash (functions/texthash.py) can: both engines compute the
same k smallest 60-bit hashes, hence the same estimate, bit for bit —
a sketch with an exact cross-engine oracle.

Estimator (Bar-Yossef et al.): with h uniform on [0, 2^60) and H_k the
k-th smallest distinct hash, distinct-count ≈ (k-1) * 2^60 / H_k; when
fewer than k distinct hashes exist the count is exact. Standard error
~ 1/sqrt(k-2).

Scale: one distinct + one per-group top-k (WindowGroupLimit — each task
keeps k hashes per group before the exchange), so the shuffle carries
O(groups * k) rows regardless of data size — the whole point of a
sketch at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from flechasdb_spark.functions.texthash import md5_long

__all__ = [
    "kmv_distinct",
    "kmv_set_ops",
    "hll_distinct",
    "hll_register_exprs",
    "hll_estimate_from_registers",
    "histogram_quantiles",
    "cms_build",
    "cms_estimate",
    "bloom_build",
    "bloom_maybe_contains",
    "KMV_SPACE",
]

KMV_SPACE = float(2**60)  # md5_long is the first 15 hex chars = 60 bits


def kmv_distinct(
    df: DataFrame,
    value_col: str | Column,
    group_cols: list[str] | None = None,
    k: int = 256,
) -> DataFrame:
    """Per-group distinct-count estimate of ``value_col`` via KMV.

    Returns (group_cols..., n_kept, kmv_estimate) where n_kept is the
    number of hashes retained (= exact distinct count when < k)."""
    if k < 3:
        raise ValueError(f"k must be >= 3 (estimator needs k-2 > 0), got {k}")
    group_cols = group_cols or []
    c = F.col(value_col) if isinstance(value_col, str) else value_col
    hashes = df.select(
        *group_cols, md5_long(c.cast("string")).alias("__h")
    ).distinct()
    if group_cols:
        # rank-filter <= k compiles to WindowGroupLimit: each task keeps
        # k hashes per group before the exchange
        w = Window.partitionBy(*group_cols).orderBy("__h")
        kept = hashes.withColumn("__rn", F.row_number().over(w)).where(
            F.col("__rn") <= k
        )
    else:
        # global k smallest -> TakeOrderedAndProject (per-partition
        # heaps + one O(k) merge), never a single-task global window
        kept = hashes.orderBy("__h").limit(k)
    agg = kept.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("__h").alias("__hk"),
    )
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise((F.lit(float(k - 1)) * F.lit(KMV_SPACE)) / F.col("__hk"))
    return agg.select(
        *group_cols, "n_kept", F.round(est, 4).alias("kmv_estimate")
    )


def kmv_set_ops(
    df: DataFrame,
    value_col: str | Column,
    group_col: str,
    k: int = 128,
) -> DataFrame:
    """KMV sketch SET ALGEBRA between every pair of groups: union /
    intersection cardinality and Jaccard estimates from the merged
    k-minimum-values sketches (Beyer et al. 2007 / Bar-Yossef et al.
    2002). The audience-overlap question ("how many users do sources A
    and B share?") answered from O(groups * k) sketch rows instead of
    an exact pairwise distinct-intersection over the corpus.

    Per unordered pair (group_a < group_b):
      - merged sketch = k smallest of (kept_A union kept_B) hashes;
      - union_est  = exact count when the merge holds < k hashes, else
        (k-1) * 2^60 / h_k (the standard KMV estimator);
      - jaccard_est = |{h in merged-k present in BOTH sketches}| / |merged-k|
        (EXACT Jaccard of the full sets whenever the merge is exact);
      - inter_est  = jaccard_est * union_est (inclusion via the
        min-wise sampling identity).

    Scale shape: per-group k-smallest is a WindowGroupLimit (each task
    keeps k before the exchange); the pair fan-out joins the O(T*k)
    kept rows against the O(T^2) group-pair table on the group key --
    bounded by sketch size, never by the corpus. Deterministic md5
    hashing -> the DuckDB oracle recomputes every cell exactly."""
    if k < 3:
        raise ValueError(f"k must be >= 3, got {k}")
    c = F.col(value_col) if isinstance(value_col, str) else value_col
    hashes = df.select(
        F.col(group_col).alias("__g"), md5_long(c.cast("string")).alias("__h")
    ).distinct()
    w = Window.partitionBy("__g").orderBy("__h")
    kept = (
        hashes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )
    gs = kept.select("__g").distinct()
    gp = (
        gs.select(F.col("__g").alias("group_a"))
        .join(gs.select(F.col("__g").alias("group_b")))
        .where(F.col("group_a") < F.col("group_b"))
    )
    ka = gp.join(kept, F.col("__g") == F.col("group_a")).select(
        "group_a", "group_b", "__h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b")
    )
    kb = gp.join(kept, F.col("__g") == F.col("group_b")).select(
        "group_a", "group_b", "__h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b")
    )
    m = (
        ka.unionAll(kb)
        .groupBy("group_a", "group_b", "__h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    wp = Window.partitionBy("group_a", "group_b").orderBy("__h")
    mk = (
        m.withColumn("__rn", F.row_number().over(wp))
        .where(F.col("__rn") <= k)
    )
    agg = mk.groupBy("group_a", "group_b").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("__h").alias("__hk"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("n_both"),
    )
    union_raw = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise((F.lit(float(k - 1)) * F.lit(KMV_SPACE)) / F.col("__hk"))
    jacc_raw = F.col("n_both").cast("double") / F.col("n_kept")
    return agg.select(
        "group_a",
        "group_b",
        "n_kept",
        F.round(union_raw, 4).alias("union_est"),
        F.round(jacc_raw, 4).alias("jaccard_est"),
        F.round(jacc_raw * union_raw, 4).alias("inter_est"),
    )


def hll_distinct(
    df: DataFrame,
    value_col: str | Column,
    group_cols: list[str] | None = None,
    p: int = 6,
) -> DataFrame:
    """Per-group HyperLogLog distinct-count estimate (Flajolet et al.
    2007) with REGISTER-EXACT cross-engine arithmetic — the classic
    fixed-memory counterpart to ``kmv_distinct``'s order-statistics
    sketch (reference has no sketches; SURVEY §2.3 sketch family).

    m = 2^p registers over the shared 60-bit md5 hash: register index =
    the top p bits, rank = 1 + leading zeros of the remaining W = 60-p
    bits (via ``length(bin(rest))`` — identical string semantics in
    Spark and DuckDB, so the oracle recomputes every register).
    Estimate:

      raw   = alpha_m * m^2 / sum_j 2^(-M_j)   (harmonic mean)
      E     = m * ln(m / V)  when V > 0 zero registers and raw <= 2.5m
              (linear-counting small-range correction), else raw.

    The harmonic sum is kept EXACT as the integer sum of
    2^(max_rank - M_j) (max_rank = W+1 <= 55, so each term and the
    m-bounded sum fit in BIGINT); the only transcendental, ln(m/V),
    is quantized to integer micro-nats per the repo's determinism
    contract (SURVEY §2.4). Scale shape: one partial-aggregated
    groupBy to O(groups * m) register rows, then an O(groups) agg —
    the shuffle never carries corpus-sized data, and unlike
    ``approx_count_distinct`` (engine-private HLL++) every cell is
    oracle-recomputable.

    Returns (group_cols..., v_zero, hll_estimate, used_linear)."""
    if not 2 <= p <= 12:
        raise ValueError(f"p must be in [2, 12], got {p}")
    group_cols = group_cols or []
    idx, rank = hll_register_exprs(value_col, p)
    regs = (
        df.select(*group_cols, idx.alias("__idx"), rank.alias("__rank"))
        .groupBy(*group_cols, "__idx")
        .agg(F.max("__rank").alias("__m"))
    )
    return hll_estimate_from_registers(regs, group_cols, p)


def hll_register_exprs(value_col: str | Column, p: int) -> tuple:
    """(register index, rank) column expressions over the shared
    60-bit md5 hash — the per-ROW half of the HLL, factored out so a
    STREAMING windowed register-max (``streaming.stream_hll_users``)
    can reuse the identical arithmetic the batch/oracle form uses."""
    m = 1 << p
    w = 60 - p  # bits remaining after the register index
    max_rank = w + 1
    c = F.col(value_col) if isinstance(value_col, str) else value_col
    h = md5_long(c.cast("string"))
    rest = h.bitwiseAND(F.lit((1 << w) - 1))
    rank = F.when(rest == 0, F.lit(max_rank)).otherwise(
        F.lit(max_rank) - F.length(F.bin(rest))
    )
    return F.shiftright(h, w), rank


def hll_estimate_from_registers(
    regs: DataFrame, group_cols: list[str], p: int
) -> DataFrame:
    """The estimate half of ``hll_distinct``: from (group_cols...,
    __idx, __m) register-max rows to the per-group estimate. Register
    maxes are idempotent and mergeable, so this runs unchanged over
    registers materialized by a streaming windowed max — merging
    batch and stream sketches is a further max over the same rows."""
    m = 1 << p
    w = 60 - p
    max_rank = w + 1
    # alpha_m per the paper: 16 -> 0.673, 32 -> 0.697, 64 -> 0.709,
    # m >= 128 -> 0.7213 / (1 + 1.079 / m). Constant double; both
    # engines parse the same literal.
    alpha = {4: 0.673, 5: 0.697, 6: 0.709}.get(
        p, 0.7213 / (1.0 + 1.079 / m)
    )
    agg = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__n_present"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({max_rank} - __m AS INT))")
        ).alias("__s_present"),
    )
    # absent registers have M = 0 -> each contributes 2^max_rank
    s_int = F.col("__s_present") + (
        (F.lit(m) - F.col("__n_present")) * F.lit(1 << max_rank)
    )
    v_zero = (F.lit(m) - F.col("__n_present")).cast("long")
    raw = F.lit(alpha * m * m * float(1 << max_rank)) / s_int.cast("double")
    # ln(m / V) in integer micro-nats (the DSIR/unigram-LM contract)
    ln_q = F.round(F.log(F.lit(float(m)) / v_zero.cast("double")) * 1e6).cast(
        "long"
    )
    linear = F.lit(float(m)) * ln_q.cast("double") / F.lit(1e6)
    use_linear = (v_zero > 0) & (raw <= F.lit(2.5 * m))
    return agg.select(
        *group_cols,
        v_zero.alias("v_zero"),
        F.round(F.when(use_linear, linear).otherwise(raw), 4).alias(
            "hll_estimate"
        ),
        use_linear.cast("int").alias("used_linear"),
    )


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    probs: list[float],
    lo: float,
    hi: float,
    num_buckets: int = 256,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Per-group approximate quantiles from a FIXED-GRID histogram —
    the deterministic, mergeable scale path for percentiles (the exact
    `percentile` sorts every group; Spark's approx_percentile KLL is
    engine-specific and can't be oracle-gated).

    One pass: bucket = clamp(floor((v-lo)/w), 0, B-1) -> per-(group,
    bucket) counts (map-side combinable, shuffle carries <= groups * B
    rows regardless of data size) -> cumulative counts -> for each
    p in ``probs`` (0 < p <= 1) the quantile is linearly interpolated
    inside the first bucket whose cumulative count reaches p*n:

        q(p) = lo + w * (b + (p*n - cum_before) / cnt_b)

    Every step is plain double arithmetic on integer counts — DuckDB
    recomputes it bit-identically. Error is bounded by the bucket width
    (hi-lo)/B; values outside [lo, hi) clamp into the edge buckets.

    Returns (group_cols..., prob, n_rows, q_est).
    """
    if not probs or any(p <= 0 or p > 1 for p in probs):
        raise ValueError(f"probs must be in (0, 1], got {probs}")
    if hi <= lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    group_cols = group_cols or []
    width = (hi - lo) / num_buckets
    b = F.least(
        F.greatest(
            F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)), F.lit(0)
        ),
        F.lit(num_buckets - 1),
    ).cast("long")
    counts = df.groupBy(*group_cols, b.alias("__b")).agg(
        F.count(F.lit(1)).cast("double").alias("__cnt")
    )
    part = group_cols if group_cols else [F.lit(1)]
    w_cum = Window.partitionBy(*part).orderBy("__b")
    w_all = Window.partitionBy(*part)
    cum = counts.select(
        *group_cols,
        "__b",
        "__cnt",
        F.sum("__cnt").over(w_cum).alias("__cum"),
        F.sum("__cnt").over(w_all).alias("__n"),
    )
    pdf = F.broadcast(
        df.sparkSession.createDataFrame(
            [(float(p),) for p in probs], "prob double"
        )
    )
    t = F.col("prob") * F.col("__n")
    est = F.lit(lo) + F.lit(width) * (
        F.col("__b") + (t - (F.col("__cum") - F.col("__cnt"))) / F.col("__cnt")
    )
    return (
        cum.join(pdf)
        .where((F.col("__cum") >= t) & ((F.col("__cum") - F.col("__cnt")) < t))
        .select(
            *group_cols,
            "prob",
            F.col("__n").cast("long").alias("n_rows"),
            F.round(est, 4).alias("q_est"),
        )
    )


def cms_build(
    df: DataFrame,
    value_col: str | Column,
    width: int = 1024,
    depth: int = 4,
    salt: str = "cms",
) -> DataFrame:
    """Count-min sketch of ``value_col``\'s frequency distribution:
    depth hash rows x width buckets, cell[j][b] = count of rows whose
    j-th hash lands in bucket b. Hashes are the repo\'s shared md5-based
    arithmetic (salt "<salt><j>:"), so both engines compute identical
    cells — a frequency sketch with an exact cross-engine oracle, the
    companion to KMV\'s distinct-count.

    Returns (row, bucket, cnt) — depth * width cells max. One explode
    (depth rows per input row) + one partial-agged groupBy; the shuffle
    carries O(depth * width) cells regardless of data size."""
    c = F.col(value_col) if isinstance(value_col, str) else value_col
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row"),
                        (
                            md5_long(
                                F.concat(
                                    F.lit(f"{salt}{j}:"), c.cast("string")
                                )
                            )
                            % width
                        ).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            ).alias("__cells")
        ).alias("cell")
    ).select("cell.row", "cell.bucket")
    return rows.groupBy("row", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_estimate(
    cells: DataFrame,
    values: DataFrame,
    value_col: str,
    width: int = 1024,
    depth: int = 4,
    salt: str = "cms",
) -> DataFrame:
    """Point-query the sketch for each row of ``values``: estimate =
    min over hash rows of the matching cell (>= true count always;
    = true count in expectation error N/width per row). ``cells`` is
    broadcast (depth * width rows); the lookup is a small equi-join —
    no rescan of the sketched data.

    Returns (value_col, est)."""
    c = F.col(value_col)
    keyed = values.select(
        c,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row"),
                        (
                            md5_long(
                                F.concat(
                                    F.lit(f"{salt}{j}:"), c.cast("string")
                                )
                            )
                            % width
                        ).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("cell"),
    ).select(value_col, "cell.row", "cell.bucket")
    return (
        keyed.join(F.broadcast(cells), ["row", "bucket"], "left")
        .groupBy(value_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def bloom_build(
    df: DataFrame,
    value_col: str | Column,
    n_words: int = 2048,
    k: int = 4,
    salt: str = "bl",
) -> DataFrame:
    """Deterministic Bloom filter over the distinct values of
    ``value_col``: k md5-derived bit positions per value, packed into
    63-bit BIGINT words (bit 63 is never used, so the words — and the
    oracle's — stay positive and engine-portable; DuckDB recomputes the
    identical words from the same md5 arithmetic, unlike Spark's
    internal BloomFilterAggregate whose layout is engine-private).

    The scale primitive this enables: membership PRE-filtering before
    an expensive shuffle join/anti-join — ship the O(n_words) filter,
    not the set. m = 63 * n_words bits; false-positive rate
    ~(1 - e^(-k*n/m))^k, no false negatives ever (one-sided error, the
    property the prefilter contract needs).

    Shape: explode k positions per distinct value (map-side), one
    hash-groupBy on word index with ``bit_or`` partial aggregation —
    output is exactly ``<= n_words`` rows no matter the input size.

    Returns (word_idx long, word long, n_words long) — ``n_words``
    rides along as a constant so ``bloom_maybe_contains`` can verify
    the probe sizing matches the build in BOTH directions (r5 ADVICE:
    an OVERSIZED probe n_words silently changed the modulus m and
    produced false negatives, which breaks the filter's one-sided-error
    contract; the old guard only caught undersizing).
    """
    c = F.col(value_col) if isinstance(value_col, str) else value_col
    m = 63 * int(n_words)
    vals = df.select(c.cast("string").alias("__v")).distinct()
    pos = vals.select(
        "__v",
        F.explode(
            F.array(*[
                (
                    md5_long(
                        F.concat(
                            F.lit(salt), F.lit(":"), F.lit(str(j)),
                            F.lit(":"), F.col("__v"),
                        )
                    )
                    % m
                )
                for j in range(int(k))
            ])
        ).alias("__p"),
    )
    return (
        pos.select(
            (F.col("__p") / 63).cast("long").alias("word_idx"),
            # shiftleft needs a column bit count -> SQL form
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__p % 63 AS INT))").alias(
                "__mask"
            ),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(__mask)").alias("word"))
        .withColumn("n_words", F.lit(int(n_words)).cast("long"))
    )


def bloom_maybe_contains(
    df: DataFrame,
    bloom: DataFrame,
    value_col: str | Column,
    n_words: int = 2048,
    k: int = 4,
    salt: str = "bl",
    out_col: str = "maybe",
    impl: str = "map",
) -> DataFrame:
    """Probe each row's ``value_col`` against a ``bloom_build`` filter:
    ``out_col`` is true iff ALL k probed bits are set (possible member
    — FP rate per the build sizing), false = definitely absent.

    ``n_words``/``k``/``salt`` must match the build call.

    ``impl="map"`` (default, the product path): the sparse
    (word_idx, word) rows are collapsed into a one-row dense
    ``array<bigint>`` (map_from_entries + a transform over
    sequence(0, n_words-1)), eagerly ``localCheckpoint``ed — one tiny
    Spark job that also fires the sizing guard immediately — and then
    referenced from the probe scan as a SCALAR SUBQUERY, so each probe
    row evaluates k md5 + ``element_at`` + shift expressions entirely
    inside whole-stage codegen. NO explode, NO equi-join, NO exchange
    of ``df`` at any width (ADVICE r4: the former relational probe
    regrouped the probe side on all of df's columns, a full exchange
    that undercut the prefilter framing), and no driver collect of the
    words (the subquery result is bound JVM-side). Design history, all
    measured at sf0.1: a broadcast crossJoin + ``forall`` bit-test kept
    one exchange-free plan but the higher-order function is
    CodegenFallback, interpreting the whole per-row expression (~2x
    slower than relational); an eager literal array decayed to a
    per-row n_words-child CreateArray; and a NON-checkpointed scalar
    subquery re-executed the whole (non-deterministic, collect_list)
    build aggregate once PER REFERENCE — k times the build cost.
    Row multiplicity is preserved exactly. A build/probe ``n_words``
    mismatch raises at probe-construction time (the checkpoint
    materializes the guard).

    ``impl="relational"``: the original explode + broadcast-join +
    regroup form, kept for plan-comparison tests and for probing with
    a bloom too large to collect. It requires the rows of ``df`` to be
    distinct (the regroup collapses duplicates) and ``df`` must not
    already carry the internal names it uses (guarded).

    Returns df's columns plus ``out_col`` boolean (map mode appends;
    relational mode regroups to df's distinct rows).
    """
    c = F.col(value_col) if isinstance(value_col, str) else value_col
    m = 63 * int(n_words)
    probes = [
        md5_long(
            F.concat(
                F.lit(salt), F.lit(":"), F.lit(str(j)),
                F.lit(":"), c.cast("string"),
            )
        )
        % m
        for j in range(int(k))
    ]
    if impl == "map":
        wcol, xcol = "__bloom_words", "__bloom_max_idx"
        vcol = "__bloom_probe_val"
        clash = {wcol, xcol, vcol} & set(df.columns)
        if clash:
            raise ValueError(
                f"map bloom probe reserves column names {sorted(clash)}"
            )
        # mismatch detection is two-sided (r5 ADVICE): word_idx past
        # the probe range catches an UNDERSIZED probe, and the n_words
        # the build recorded catches an OVERSIZED one (larger probe
        # n_words = different modulus m = false negatives, silently).
        # Blooms built before the column existed fall back to the
        # one-sided check.
        has_n = "n_words" in bloom.columns
        built_n = (
            F.max("n_words") if has_n else F.lit(None).cast("long")
        )
        dense = (
            bloom.groupBy()
            .agg(
                F.map_from_entries(
                    F.collect_list(
                        F.struct(
                            F.col("word_idx").cast("int").alias("k"),
                            F.col("word").alias("v"),
                        )
                    )
                ).alias("__m"),
                F.max("word_idx").alias(xcol),
                built_n.alias("__bn"),
            )
            .select(
                F.transform(
                    F.sequence(F.lit(0), F.lit(int(n_words) - 1)),
                    lambda i: F.coalesce(
                        F.element_at(F.col("__m"), i), F.lit(0)
                    ),
                ).alias(wcol),
                # the n_words-mismatch guard evaluates ONCE here, on
                # the single dense row at broadcast-build time (a
                # per-probe-row raise_error blocked codegen — measured
                # +0.5 s); the row path only reads the 0 back
                F.when(
                    (F.coalesce(F.col(xcol), F.lit(-1)) >= int(n_words))
                    | (
                        F.coalesce(F.col("__bn"), F.lit(int(n_words)))
                        != int(n_words)
                    ),
                    F.raise_error(
                        F.lit(
                            "bloom probe n_words "
                            f"{int(n_words)} does not match the "
                            "bloom_build sizing — the bit modulus "
                            "differs and membership answers would be "
                            "wrong in both directions"
                        )
                    ).cast("int"),
                )
                .otherwise(0)
                .alias(xcol),
            )
        )
        # ONE eager one-row checkpoint: runs the bloom build exactly
        # once, fires the sizing guard now (fail-fast at construction),
        # and gives the scalar subqueries below a trivially-rescannable
        # one-row table — required because the build aggregate contains
        # collect_list, which is non-deterministic, so ReuseSubquery
        # cannot dedup a plain subquery and each of the k references
        # would re-run the whole build (measured: k x build cost)
        dense = dense.localCheckpoint(eager=True)
        # the probe value as a pre-projected string column so the SQL
        # below needs no arbitrary-expression stringification
        pre = df.withColumn(vcol, c.cast("string"))
        if "{" in f"{salt}{out_col}" or "}" in f"{salt}{out_col}":
            raise ValueError(
                "map bloom probe: salt/out_col may not contain braces"
            )
        esc_salt = str(salt).replace("'", "''")
        esc_out = str(out_col).replace("`", "``")

        def p_sql(j: int) -> str:
            # identical bytes to bloom_build's md5_long(concat(salt,
            # ':', j, ':', value)) — the hashes MUST match the build
            return (
                "(CAST(CONV(SUBSTRING(MD5(CONCAT("
                f"'{esc_salt}:', '{j}', ':', {vcol}"
                f")),1,15),16,10) AS BIGINT) % {m})"
            )

        bits = " AND ".join(
            "((shiftright(element_at((SELECT "
            + wcol
            + " FROM {dense}), CAST("
            + p_sql(j)
            + "/63 AS INT)+1), CAST("
            + p_sql(j)
            + " % 63 AS INT)) & CAST(1 AS BIGINT)) = 1)"
            for j in range(int(k))
        )
        res = df.sparkSession.sql(
            "SELECT p.*, (" + bits + ") AS `" + esc_out + "` "
            "FROM {probe} p",
            probe=pre,
            dense=dense,
        )
        return res.select(*df.columns, F.col(out_col))
    if impl != "relational":
        raise ValueError(f"impl {impl!r} must be 'map' or 'relational'")
    reserved = {"__p", "__hit", "word_idx", "word"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(
            f"relational bloom probe reserves column names {sorted(clash)};"
            " rename them or use impl='map'"
        )
    cols = df.columns
    # same two-sided sizing guard as the map impl, evaluated on the
    # O(n_words) broadcast side (never per probe row): any bloom row
    # whose recorded n_words differs from the probe's raises at
    # broadcast build time
    if "n_words" in bloom.columns:
        bloom = bloom.select(
            "word_idx",
            F.when(
                F.col("n_words") != int(n_words),
                F.raise_error(
                    F.lit(
                        "bloom probe n_words "
                        f"{int(n_words)} does not match the "
                        "bloom_build sizing"
                    )
                ).cast("long"),
            )
            .otherwise(F.col("word"))
            .alias("word"),
        )
    pos = df.select("*", F.explode(F.array(*probes)).alias("__p"))
    probed = pos.join(
        F.broadcast(bloom.select("word_idx", "word")),
        (F.col("__p") / 63).cast("long") == F.col("word_idx"),
        "left",
    ).withColumn(
        "__hit",
        F.when(
            F.col("word").isNotNull()
            & (
                F.expr(
                    "shiftright(word, CAST(__p % 63 AS INT)) & CAST(1 AS BIGINT)"
                )
                == 1
            ),
            1,
        ).otherwise(0),
    )
    return (
        probed.groupBy(*cols)
        .agg((F.sum("__hit") == int(k)).alias(out_col))
    )
