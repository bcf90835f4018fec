"""Explicit skew mitigation: salted fact-fact equi-join.

AQE's skew-join splitting (enabled in session.py) handles most runtime
skew; this operator is the EXPLICIT form for when the skew is known
up-front and the layout must be deterministic (bucketed writes, stable
partitioning across stages) or AQE is unavailable (streaming
micro-batches, stateful stages).

Shape: each left row gets a deterministic salt in [0, salt); the right
side is replicated salt times (one copy per salt value); the join key
becomes (key, salt). A key with R left rows now spreads over salt
shuffle partitions instead of one. The result set is EXACTLY the plain
join's (every left row still meets every matching right row exactly
once) — oracle-checkable.

Cost model: right side is duplicated salt× through the shuffle — use for
a hot FACT side against a MEDIUM dimension (too big to broadcast, small
enough that salt copies are cheap). A broadcastable right side should
just broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "salted_join",
    "join_skew_report",
    "write_bucketed",
    "zorder_key",
    "zorder_write",
]


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 8,
    row_col: str | None = None,
) -> DataFrame:
    """Equi-join ``left`` with ``right`` on column ``on`` with an
    ``salt``-way spread of hot keys. ``row_col`` (a column unique-ish
    per left row, e.g. an event id) drives the deterministic salt;
    defaults to hashing all left columns."""
    if salt < 1:
        raise ValueError(f"salt must be >= 1, got {salt}")
    salt_src = [F.col(row_col)] if row_col else [F.col(c) for c in left.columns]
    l2 = left.withColumn("__salt", F.pmod(F.xxhash64(*salt_src), F.lit(salt)))
    r2 = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return l2.join(r2, [on, "__salt"]).drop("__salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 32,
    path: str | None = None,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hash-bucketed (and optionally sorted) by ``key``.

    Bucketing is the pre-shuffle-at-write-time technique for repeated
    fact-fact joins at 100 TB: two tables bucketed by the same key into
    the same bucket count join with ZERO Exchange on either side (and
    with ``sort=True``, zero Sort too — the SortMergeJoin reads the
    bucket files directly). One shuffle is paid once at write; every
    subsequent join/groupBy on the key is shuffle-free, which is the
    right trade for dimension-stable layouts like (orderkey, lineitem)
    or (doc_id, embeddings).

    Uses ``saveAsTable`` (bucket metadata lives in the catalog;
    plain ``.parquet()`` cannot record it). ``path`` pins an external
    location; with the default in-memory catalog + warehouse dir the
    table survives the session's filesystem, not the catalog.
    """
    w = df.write.format("parquet").mode(mode)
    if path is not None:
        w = w.option("path", path)
    w = w.bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def zorder_key(bucket_cols, bits: int = 8):
    """Morton (Z-order) key: bit-interleave of pre-bucketed INTEGER
    columns (each in [0, 2^bits)). Bit b of column i lands at position
    b * n_cols + i, so a range predicate on ANY of the interleaved
    columns maps to a bounded set of key ranges — the multi-column
    clustering trick behind Delta/Iceberg OPTIMIZE ZORDER. Pure integer
    shift/mask Catalyst expressions, codegen'd, engine-exact."""
    cols = [F.col(c) if isinstance(c, str) else c for c in bucket_cols]
    n = len(cols)
    acc = None
    for i, c in enumerate(cols):
        cl = c.cast("long")
        for b in range(bits):
            term = F.shiftleft(
                F.shiftright(cl, b).bitwiseAND(F.lit(1)), b * n + i
            )
            acc = term if acc is None else acc + term
    return acc


def zorder_write(
    df: DataFrame,
    cols: list[str],
    path: str,
    bits: int = 8,
    num_files: int = 32,
) -> None:
    """Write ``df`` clustered by the Z-order of ``cols``: each column is
    linearly bucketed to 2^bits by its min/max (one tiny agg), rows are
    range-partitioned and sorted by the interleaved key, and the files
    land so that every file covers a NARROW range of EVERY interleaved
    column — parquet min/max row-group stats then prune scans filtered
    on any of them. A single-column sort gives perfect pruning on one
    column and none on the others; Z-order trades a little of the first
    for useful pruning on all (the right layout when a 100 TB table is
    filtered sometimes by user, sometimes by time, sometimes by key).

    One range exchange + in-partition sort — the same cost as any
    clustered write; no extra passes."""
    stats = df.agg(
        *[
            m
            for c in cols
            for m in (
                F.min(c).alias(f"__lo_{c}"),
                F.max(c).alias(f"__hi_{c}"),
            )
        ]
    ).first()
    top = (1 << bits) - 1
    bcols = []
    for c in cols:
        lo = float(stats[f"__lo_{c}"])
        hi = float(stats[f"__hi_{c}"])
        span = (hi - lo) or 1.0
        b = F.floor((F.col(c) - F.lit(lo)) / F.lit(span) * F.lit(1 << bits))
        bcols.append(
            F.greatest(F.lit(0), F.least(F.lit(top), b.cast("long")))
        )
    (
        df.withColumn("__z", zorder_key(bcols, bits))
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def join_skew_report(
    df: DataFrame, key_col: str, top: int = 10
) -> DataFrame:
    """Measure join-key skew BEFORE paying for it: the top-N hottest
    keys with their corpus share, skew factor (rows-at-key / mean
    rows-per-key — 1.0 means uniform), and the salt factor
    ``salted_join`` would need to spread that key over average-sized
    shuffle partitions. This closes the skew loop: SCALING prescribes
    salting for hot keys; this is the operator that finds them and
    sizes the salt with evidence instead of folklore.

    Plan: one partial-aggregable shuffle to O(distinct keys) counts, a
    1-row broadcast summary, and a TakeOrderedAndProject top-N (count
    desc, key asc — deterministic ties). recommended_salt is exact
    integer ceiling arithmetic: (n * n_keys + total - 1) DIV total.

    Returns (key string, n, share, skew_factor, recommended_salt).
    """
    counts = df.groupBy(
        F.col(key_col).cast("string").alias("key")
    ).agg(F.count(F.lit(1)).alias("n"))
    summary = counts.agg(
        F.sum("n").alias("__tot"), F.count(F.lit(1)).alias("__k")
    )
    return (
        counts.crossJoin(F.broadcast(summary))
        .select(
            "key",
            F.col("n").cast("long").alias("n"),
            F.round(F.col("n") / F.col("__tot"), 6).alias("share"),
            F.round(
                F.col("n") * F.col("__k") / F.col("__tot"), 4
            ).alias("skew_factor"),
            F.expr("(n * __k + __tot - 1) DIV __tot")
            .cast("long")
            .alias("recommended_salt"),
        )
        .orderBy(F.col("n").desc(), F.col("key").asc())
        .limit(int(top))
    )
