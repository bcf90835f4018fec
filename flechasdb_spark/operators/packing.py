"""Sequence packing — assign documents to fixed-size context windows by
concatenating the token stream in a deterministic order and splitting
every ``ctx_tokens`` (the "concat-then-split" sample packing used to
build LLM training batches).

Extension surface (no reference counterpart; task-brief LLM-pipeline
requirement). A document's pack is decided by its global token START
offset: pack_id = start_offset DIV ctx_tokens — documents that straddle
a boundary count toward the pack they start in, which keeps the
assignment a pure function of the prefix sum (no sequential splitting
state).

Scale (100 TB): the naive formulation is a global ordered window —
``sum() OVER (ORDER BY ...)`` with no partition key, which Spark
executes in ONE task (the whole corpus through a single sort — a
non-starter). This implementation is the classic distributed prefix
sum instead:

1. bucket every row by a deterministic hash range (``n_buckets``),
2. cumulative-sum WITHIN each bucket (parallel windows, one shuffle
   keyed on the bucket),
3. collect only the per-bucket totals (O(n_buckets) rows) to the
   driver, turn them into exclusive bucket offsets, broadcast back.

global_start = bucket_offset + within_bucket_cumsum - own_tokens. The
order is (bucket, md5(salt:id), id) — deterministic on any engine and
any cluster size, and recomputable by the DuckDB oracle as one ordered
window over the same keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flechasdb_spark.functions.texthash import md5_long

__all__ = ["sequence_pack", "pack_summary", "shard_shuffle", "sequence_pack_fragments"]


def sequence_pack(
    df: DataFrame,
    ctx_tokens: int,
    n_tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    salt: str = "pack",
    n_buckets: int = 32,
) -> DataFrame:
    """Returns ``(id_col, n_tokens, start_offset, pack_id)`` — one row
    per input document. ``n_tokens_col`` must already hold the
    document's token count (compose with ``token_stats``)."""
    key = F.concat(F.lit(salt), F.lit(":"), F.col(id_col).cast("string"))
    rows = df.select(
        F.col(id_col),
        F.col(n_tokens_col).cast("long").alias("n_tokens"),
        F.md5(key).alias("__h"),
        (md5_long(key) % n_buckets).alias("__b"),
    )
    # bucket totals come from the UN-windowed rows — a plain partial
    # aggregation — so the per-bucket sort behind the cumsum window
    # executes exactly once, in the final pass
    totals = {
        r["__b"]: r["t"]
        for r in rows.groupBy("__b").agg(F.sum("n_tokens").alias("t")).collect()
    }
    w = (
        Window.partitionBy("__b")
        .orderBy(F.col("__h").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rows = rows.withColumn("__cum", F.sum("n_tokens").over(w))
    offsets, acc = [], 0
    for b in range(n_buckets):
        offsets.append((b, acc))
        acc += int(totals.get(b, 0))
    off_df = F.broadcast(
        df.sparkSession.createDataFrame(offsets, "__b long, __off long")
    )
    start = F.col("__off") + F.col("__cum") - F.col("n_tokens")
    # integral SQL `div` on longs — exact at ANY magnitude (ADVICE r4:
    # the former floor(x / double) could exceed the true floor once
    # ulp(x/d)/2 >= 1/d, i.e. past ~2^52 total tokens)
    return (
        rows.join(off_df, "__b")
        .select(id_col, "n_tokens", start.alias("start_offset"))
        .select(
            id_col,
            "n_tokens",
            "start_offset",
            F.expr(f"start_offset div {int(ctx_tokens)}")
            .cast("long")
            .alias("pack_id"),
        )
    )


def pack_summary(packed: DataFrame) -> DataFrame:
    """Per-pack (pack_id, n_docs, n_tokens) — the batch-shape audit."""
    return packed.groupBy("pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
    )


def shard_shuffle(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "shuf",
    n_buckets: int = 64,
) -> DataFrame:
    """Deterministic corpus shuffle + round-robin shard assignment — the
    loader step that turns a curated corpus into per-worker training
    shards with a reproducible global order. The canonical order is
    (md5-bucket, md5(salt:id), id): a fixed pseudorandom permutation,
    identical on any engine and any cluster size; vary ``salt`` (e.g.
    "epoch3") to re-shuffle per epoch without touching the data.

    Each document gets the global rank of its position in that order;
    shard = rank % n_shards and pos = rank DIV n_shards deal the stream
    round-robin, so shard sizes differ by at most 1 and every shard's
    ``pos`` is a dense 0..ceil(M/S)-1 sequence — no post-balancing pass.

    Scale (100 TB): the global rank uses the same distributed prefix
    scheme as ``sequence_pack`` — rank within each of ``n_buckets``
    hash buckets via parallel windows (one shuffle keyed on the
    bucket), plus O(n_buckets) exclusive counts collected and broadcast
    back. No global-order window (that would be one task sorting the
    corpus), no skew (md5-uniform buckets).

    Returns ``(id_col, shard int, pos long)``.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards {n_shards} must be >= 1")
    key = F.concat(F.lit(salt), F.lit(":"), F.col(id_col).cast("string"))
    rows = df.select(
        F.col(id_col),
        F.md5(key).alias("__h"),
        (md5_long(key) % n_buckets).alias("__b"),
    )
    counts = {
        r["__b"]: r["c"]
        for r in rows.groupBy("__b").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    offsets, acc = [], 0
    for b in range(n_buckets):
        offsets.append((b, acc))
        acc += int(counts.get(b, 0))
    off_df = F.broadcast(
        df.sparkSession.createDataFrame(offsets, "__b long, __off long")
    )
    w = Window.partitionBy("__b").orderBy(F.col("__h").asc(), F.col(id_col).asc())
    rank = F.col("__off") + F.row_number().over(w) - 1
    # integral `div` on longs — exact at any corpus size (ADVICE r4)
    return (
        rows.join(off_df, "__b")
        .select(id_col, rank.alias("__rank"))
        .select(
            id_col,
            (F.col("__rank") % n_shards).cast("int").alias("shard"),
            F.expr(f"__rank div {int(n_shards)}").cast("long").alias("pos"),
        )
    )


def sequence_pack_fragments(
    packed: DataFrame,
    ctx_tokens: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Expand ``sequence_pack`` output into per-(doc, pack) FRAGMENTS —
    the loader-side view a trainer needs to build attention-reset masks
    and per-window token slices: a document whose token stream straddles
    pack boundaries contributes one fragment row per covered pack, with
    the exact token count landing in that window.

    Pure arithmetic on the prefix sum (no second tokenization pass):
    a doc starting at s with n tokens covers packs floor(s/ctx) ..
    floor((s+n-1)/ctx); the fragment in pack p holds
    min(s+n, (p+1)*ctx) - max(s, p*ctx) tokens. Fragment counts per doc
    sum back to n (invariant-tested). Zero-token docs yield no
    fragments. Map-only: one F.sequence explode, no shuffle, output
    rows = docs + boundary crossings.

    Returns (id_col, pack_id, frag_idx, frag_tokens), frag_idx 0-based
    within the doc.
    """
    L = int(ctx_tokens)
    s, n = F.col("start_offset"), F.col("n_tokens")
    # integral `div` on longs — exact at any offset (ADVICE r4)
    p0 = F.expr(f"start_offset div {L}").cast("long")
    p1 = F.expr(f"(start_offset + n_tokens - 1) div {L}").cast("long")
    fr = packed.where(n > 0).select(
        F.col(id_col),
        s.alias("__s"),
        n.alias("__n"),
        p0.alias("__p0"),
        F.explode(F.sequence(p0, p1)).alias("pack_id"),
    )
    frag = F.least(
        F.col("__s") + F.col("__n"), (F.col("pack_id") + 1) * int(ctx_tokens)
    ) - F.greatest(F.col("__s"), F.col("pack_id") * int(ctx_tokens))
    return fr.select(
        id_col,
        "pack_id",
        (F.col("pack_id") - F.col("__p0")).cast("long").alias("frag_idx"),
        frag.cast("long").alias("frag_tokens"),
    )
