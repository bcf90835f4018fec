"""Deduplication family for training-data pipelines: exact, n-gram
Jaccard, MinHash+LSH, SimHash, and embedding-cosine near-dup.

Extension surface (no reference counterpart). Every operator is built
from deterministic md5-based arithmetic (functions/texthash.py) so a
DuckDB oracle recomputes results exactly.

Scale design (100 TB):
- exact: one hash-groupBy, map-side combine, no data movement beyond the
  grouped hash column.
- ngram_jaccard / minhash verify: candidate pairs come from an inverted
  shingle/band join — only docs SHARING a shingle/band meet, never a
  cross join. Hot shingles are the skew risk: AQE skew-join handles the
  shuffle; a df-threshold (drop shingles appearing in > max_df docs)
  bounds the worst case without changing near-dup semantics materially
  (disabled by default to keep oracle parity).
- simhash: map-side only (fingerprint per doc), pairs via band equality.
- embedding near-dup: exact variant is a blocked self-join (oracle-
  matched); the LSH-bucketed variant (operators/similarity.py) is the
  approximate scale path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from flechasdb_spark.functions.linalg import cosine_similarity
from flechasdb_spark.functions.texthash import MERSENNE_P, md5_long, minhash_perm
from flechasdb_spark.operators.text import tokens

__all__ = [
    "dedup_exact",
    "dedup_exact_normalized",
    "normalized_text",
    "cross_source_dup_matrix",
    "ngram_containment_pairs",
    "boilerplate_fraction",
    "word_ngrams",
    "ngram_jaccard_pairs",
    "minhash_signature",
    "minhash_band_keys",
    "minhash_lsh_pairs",
    "minhash_estimate_error",
    "minhash_verified_pairs",
    "minhash_dedup",
    "simhash",
    "simhash_neardup_pairs",
    "embedding_neardup",
    "embedding_neardup_pairs",
    "connected_components",
    "select_representatives",
    "cross_ngram_overlap",
    "doc_novelty",
    "segment_dedup",
    "cdc_chunk_dedup",
    "banded_hamming_pairs",
    "repeated_ngram_spans",
    "repeated_span_removal",
    "cross_source_span_matrix",
    "window_keys",
    "edit_distance_neardup",
]


def dedup_exact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup by content hash: returns (id, content_hash, keep)
    where keep marks the lowest id per hash group (last-write-wins
    analogue of the reference's attribute upsert, inverted to
    first-wins for stable dedup)."""
    h = F.md5(F.col(text_col))
    w = Window.partitionBy("content_hash").orderBy(F.col(id_col).asc())
    return (
        df.select(id_col, h.alias("content_hash"))
        .withColumn("keep", (F.row_number().over(w) == 1))
    )


def word_ngrams(col: Column | str, n: int) -> Column:
    """Distinct word n-gram shingles (space-joined) of the token stream."""
    t = tokens(col)
    m = F.size(t)
    idx = F.sequence(F.lit(1), F.greatest(m - n + 1, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.array_join(F.slice(t, i, n), " ")
    )
    return F.when(m < n, F.array().cast("array<string>")).otherwise(
        F.array_distinct(grams)
    )


def _parallel_scan(df: DataFrame) -> DataFrame:
    """Defensive input widening for the inverted-index operators: the
    shingle explode inflates each row by O(tokens), so a pathologically
    narrow scan (a single-row-group parquet file reads as ONE
    partition) serializes the whole explode+self-join onto one core —
    measured 2.5 s -> ~22 s on `ngram_containment` at sf0.1 (SCALING
    §r6; VERDICT r6 called it the real 100x-scale caveat). Repartition
    ONLY when the scan is far below the session's shuffle width; a
    well-partitioned 100 TB input passes through untouched (no extra
    shuffle)."""
    try:
        sp = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    except ValueError:
        # AQE-managed sessions may set the conf to a non-numeric value
        # (e.g. "auto") — the runtime is re-sizing partitions itself, so
        # skip both the rdd probe (a full plan-to-RDD conversion) and
        # the corrective repartition (ADVICE r7)
        return df
    if df.rdd.getNumPartitions() * 4 < sp:
        return df.repartition(sp)
    return df


def ngram_jaccard_pairs(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.2,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = 1000,
) -> DataFrame:
    """Near-dup pairs by n-gram Jaccard >= threshold.

    Inverted-index algorithm: explode distinct shingles, self-join on
    shingle (id_a < id_b) to count intersections, then
    |A u B| = |A| + |B| - |A n B|. Only docs sharing >= 1 shingle are
    ever paired — the scalable form of the quadratic definition.

    ``max_df`` (default 1000): shingles appearing in more than max_df
    documents are dropped from the inverted index BEFORE the self-join —
    a shingle shared by k docs emits k^2 candidate rows, so one
    stopword-like shingle at corpus scale is a job-killer while carrying
    ~0 Jaccard evidence. Set sizes |A|, |B| still count every shingle;
    dropping hot ones only lowers the measured intersection (measured
    jaccard is a lower bound). ``None`` disables the cut (exact
    small-data form). The driver oracle mirrors the cut.

    No caching: the shingle pipeline is recomputed per use (3 map-only
    scans) — cheaper at scale than materializing the exploded corpus.
    """
    df = _parallel_scan(df)
    exploded = df.select(
        F.col(id_col), word_ngrams(text_col, n).alias("shingles")
    ).select(
        F.col(id_col),
        F.size("shingles").alias("n_sh"),
        F.explode("shingles").alias("shingle"),
    )
    if max_df is not None:
        hot = (
            exploded.groupBy("shingle")
            .count()
            .where(F.col("count") > max_df)
            .select("shingle")
        )
        exploded = exploded.join(F.broadcast(hot), "shingle", "left_anti")
    a = exploded.select(
        F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"), "shingle"
    )
    b = exploded.select(
        F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"), "shingle"
    )
    # set sizes ride the exploded rows (constant per doc) — no extra
    # joins back to a sizes table, one shuffle total on (id_a, id_b)
    inter = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("n_inter"),
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
        )
    )
    return (
        inter.withColumn(
            "jaccard",
            F.col("n_inter")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )


def cross_ngram_overlap(
    left: DataFrame,
    right: DataFrame,
    n: int = 3,
    min_shared: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = 1000,
    bloom_prefilter: bool = True,
    bloom_words: int = 4096,
) -> DataFrame:
    """Contamination check: for each (left, right) document pair sharing
    >= min_shared distinct word n-grams, the shared count — the standard
    train/eval overlap detector (run it between a training corpus and a
    benchmark set before training).

    Same inverted-index shape as ngram_jaccard_pairs: explode distinct
    shingles on both sides, equi-join on the shingle, count per pair —
    never a cross join. ``max_df`` drops shingles present in more than
    max_df LEFT documents (stopword phrases match everything and carry
    no contamination signal).

    ``bloom_prefilter`` (default on): collapse the right side's shingle
    set to a broadcastable Bloom filter (``sketch.bloom_build``,
    O(bloom_words) rows) and drop every left shingle the filter
    definitely rules out BEFORE the equi-join. One-sided error means
    the surviving join is over exactly the shingles that could match —
    results are bit-identical with the filter on or off (equivalence
    pytest-gated), but at 100 TB the train side ships only its
    (typically tiny) bloom-positive sliver through the shuffle instead
    of every shingle. Applied AFTER the ``max_df`` hot-shingle cut so
    the cut's counts are unchanged. Size ``bloom_words`` ~ right-side
    distinct shingles / 10 for ~0.5% FP (false positives only cost
    wasted join rows, never correctness).

    Returns (id_left, id_right, n_shared) — one shuffle on the pair key.
    """
    lx = left.select(
        F.col(id_col).alias("id_left"),
        F.explode(word_ngrams(text_col, n)).alias("shingle"),
    )
    rx = right.select(
        F.col(id_col).alias("id_right"),
        F.explode(word_ngrams(text_col, n)).alias("shingle"),
    )
    if max_df is not None:
        hot = (
            lx.groupBy("shingle")
            .count()
            .where(F.col("count") > max_df)
            .select("shingle")
        )
        lx = lx.join(F.broadcast(hot), "shingle", "left_anti")
    if bloom_prefilter:
        from flechasdb_spark.operators.sketch import (
            bloom_build,
            bloom_maybe_contains,
        )

        bloom = bloom_build(
            rx.select("shingle").distinct(), "shingle", n_words=bloom_words
        )
        lx = (
            bloom_maybe_contains(lx, bloom, "shingle", n_words=bloom_words)
            .where(F.col("maybe"))
            .drop("maybe")
        )
    pairs = (
        lx.join(rx, "shingle")
        .groupBy("id_left", "id_right")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
    return pairs


def doc_novelty(
    docs: DataFrame,
    reference: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document novelty against a reference corpus: the fraction of
    the doc's DISTINCT word n-grams absent from the reference's n-gram
    set. The curation dual of ``cross_ngram_overlap``: overlap finds
    contaminated PAIRS, novelty scores each doc for filtering/boosting
    (keep high-novelty docs when growing a training corpus; flag
    near-zero novelty as redundant with what's already ingested).

    Shape: reference shingles -> distinct (one shuffle on the shingle
    key, duplicates combined map-side); doc shingles explode -> LEFT
    equi-join against that distinct set (1:1 fan-out per doc-shingle
    row, so no max_df cut is needed — the pair operators' k^2 blowup is
    on the PAIR key, which never materializes here) -> per-doc counts.
    At 100 TB both sides shuffle on the shingle hash; no driver state.

    Returns (doc_id, n_grams, n_seen, novelty); docs too short for a
    full n-gram score novelty 1.0 by convention.
    """
    grams = docs.select(
        F.col(id_col), word_ngrams(text_col, n).alias("__g")
    )
    ref_set = (
        reference.select(F.explode(word_ngrams(text_col, n)).alias("shingle"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    ex = grams.select(F.col(id_col), F.explode("__g").alias("shingle"))
    agg = (
        ex.join(ref_set, "shingle", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_seen"),
        )
    )
    return grams.select(id_col).join(agg, id_col, "left").select(
        id_col,
        F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
        F.coalesce("n_seen", F.lit(0)).cast("long").alias("n_seen"),
        F.round(
            F.when(F.coalesce(F.col("n_grams"), F.lit(0)) == 0, F.lit(1.0))
            .otherwise(1.0 - F.col("n_seen") / F.col("n_grams")),
            4,
        ).alias("novelty"),
    )


def decontaminate(
    train: DataFrame,
    eval_set: DataFrame,
    n: int = 3,
    min_shared: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = 1000,
) -> DataFrame:
    """The filter-out form of ``cross_ngram_overlap``: returns ``train``
    with every document that shares >= ``min_shared`` distinct word
    n-grams with ANY eval/benchmark document REMOVED. ``cross_ngram_
    overlap`` is the report (which pairs overlap); this is the action a
    training pipeline actually takes before a run — drop the
    contaminated training docs so the benchmark stays held out.

    Shape: the pair detection is the same inverted-index equi-join
    (never a cross join), collapsed to the distinct contaminated
    id_left set (partial-agg'd), then removed with one LEFT ANTI join
    on the id key. The contaminated set is usually tiny relative to
    train (AQE turns the anti-join into a broadcast when it is); no
    driver-side state at any size.

    All columns of ``train`` pass through unchanged.
    """
    bad = (
        cross_ngram_overlap(
            train,
            eval_set,
            n=n,
            min_shared=min_shared,
            text_col=text_col,
            id_col=id_col,
            max_df=max_df,
        )
        .select(F.col("id_left").alias(id_col))
        .distinct()
    )
    return train.join(bad, id_col, "left_anti")


def minhash_signature(
    df: DataFrame,
    num_hashes: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash signature over distinct tokens: sig[j] = min over tokens
    of ((2j+1) * md5_long(tok) + j^2+7) mod P. Long form
    (id, j, minhash) — the join-ready shape for banding."""
    tok = df.select(
        F.col(id_col), F.explode(F.array_distinct(tokens(text_col))).alias("tok")
    )
    hashed = tok.select(
        id_col, (md5_long(F.col("tok")) % MERSENNE_P).alias("h")
    )
    perms = [
        minhash_perm(F.col("h"), j).alias(f"p{j}") for j in range(num_hashes)
    ]
    wide = hashed.select(id_col, *perms)
    aggs = [F.min(f"p{j}").alias(f"m{j}") for j in range(num_hashes)]
    sig = wide.groupBy(id_col).agg(*aggs)
    stacked = sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"), F.col(f"m{j}").alias("minhash")
                    )
                    for j in range(num_hashes)
                ]
            )
        ).alias("s"),
    )
    return stacked.select(id_col, F.col("s.j").alias("j"), F.col("s.minhash"))


def minhash_band_keys(
    df: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, band, band_key) — one LSH band key per (doc, band); docs
    agreeing on a whole band share the key. The join-ready shape for
    both pair generation (minhash_lsh_pairs) and the online/streaming
    novelty filter (streaming.pipeline.stream_minhash_dedup)."""
    rows_per_band = num_hashes // bands
    sig = minhash_signature(df, num_hashes, text_col, id_col)
    return (
        sig.withColumn("band", (F.col("j") / rows_per_band).cast("int"))
        .groupBy(id_col, "band")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("j", "minhash"))
                    ),
                    lambda s: s["minhash"].cast("string"),
                ),
                "_",
            ).alias("band_key")
        )
    )


def minhash_lsh_pairs(
    df: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """LSH banding: docs agreeing on ALL rows of any band become a
    candidate pair. Returns (id_a, id_b, n_bands) — verification against
    true Jaccard composes with ngram_jaccard_pairs/token Jaccard."""
    banded = minhash_band_keys(df, num_hashes, bands, text_col, id_col)
    a = banded.select(
        F.col(id_col).alias("id_a"), "band", "band_key"
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), "band", "band_key"
    )
    return (
        a.join(b, ["band", "band_key"])
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_bands"))
    )


def _banded(
    df: DataFrame, num_hashes: int, bands: int, text_col: str, id_col: str
) -> DataFrame:
    """(id, band, band_key) — band_key concatenates the band's minhash
    rows in j order."""
    rows_per_band = num_hashes // bands
    sig = minhash_signature(df, num_hashes, text_col, id_col)
    return (
        sig.withColumn("band", (F.col("j") / rows_per_band).cast("int"))
        .groupBy(id_col, "band")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("j", "minhash"))),
                    lambda s: s["minhash"].cast("string"),
                ),
                "_",
            ).alias("band_key")
        )
    )


def _capped_candidates(
    df: DataFrame,
    num_hashes: int,
    bands: int,
    max_bucket: int,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """LSH banding candidates (id_a < id_b, distinct) with oversized
    buckets dropped BEFORE pairing. The bucket-size cap is a window
    count: ONE pass over the signatures (the groupBy+join form
    recomputes the minhash expressions for the count side — at scale
    that's the expensive half) and one shuffle on (band, band_key),
    which the a x b pairing below needs anyway."""
    from pyspark.sql import Window

    banded = _banded(df, num_hashes, bands, text_col, id_col)
    wcnt = F.count(F.lit(1)).over(Window.partitionBy("band", "band_key"))
    banded = (
        banded.withColumn("__n", wcnt)
        .where(F.col("__n") <= max_bucket)
        .drop("__n")
    )
    a = banded.select(F.col(id_col).alias("id_a"), "band", "band_key")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "band_key")
    return (
        a.join(b, ["band", "band_key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_estimate_error(
    df: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    max_bucket: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sketch-accuracy audit for the MinHash near-dup pipeline: for
    every LSH candidate pair, the Jaccard ESTIMATE the signature implies
    (fraction of the num_hashes components that agree — the Broder
    min-wise identity E[est] = J) next to the EXACT distinct-token
    Jaccard, plus their absolute error. This is the measurement that
    justifies (or indicts) a chosen num_hashes before trusting the
    verify threshold at corpus scale — std(est) ~ sqrt(J(1-J)/H).

    Scale shape: candidates are the same banding + ``max_bucket``
    equi-join as ``minhash_verified_pairs`` (never all-pairs); the
    estimate side joins the O(docs * H) signature rows on (pair, j) —
    O(candidates * H) rows; the exact side is the same bounded
    intersection join verification pays anyway. Determinism: est =
    integer-match-count / H, exact = n_inter / union — single double
    divisions both engines compute identically.

    Returns (id_a, id_b, est_jaccard, exact_jaccard, abs_err)."""
    # the candidate list feeds TWO aggregation branches (signature
    # match count + exact intersection); materialize the O(candidates)
    # pairs once so neither branch re-executes the banding pipeline.
    # Modest at sf0.1 (4.9 -> 4.5 s warm — fixture fixed costs
    # dominate) but at corpus scale it deletes one full signature +
    # window + self-join pass, the expensive half of the row
    cand = _capped_candidates(
        df, num_hashes, bands, max_bucket, text_col, id_col
    ).localCheckpoint(eager=True)
    # semi-join the signature/token tables down to docs that appear in
    # a candidate pair, then materialize ONCE: sig feeds two join
    # branches (sa/sb) and toks three (ta/tb/sizes), and each branch
    # would otherwise re-derive the full corpus scan + minhash /
    # tokenize pipeline (different join keys, so exchange reuse never
    # kicks in — VERDICT r6 #3). The reduced tables are
    # O(candidate_docs * H) / O(candidate_docs * tokens): bounded by
    # banding + max_bucket, tiny next to the corpus at scale.
    ids = (
        cand.select(F.col("id_a").alias(id_col))
        .union(cand.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    sig = (
        minhash_signature(df, num_hashes, text_col, id_col)
        .join(ids, id_col, "semi")
        .localCheckpoint(eager=True)
    )
    toks = (
        df.select(
            F.col(id_col),
            F.explode(F.array_distinct(tokens(text_col))).alias("tok"),
        )
        .join(ids, id_col, "semi")
        .localCheckpoint(eager=True)
    )
    # r13 (guide §2.4, VERDICT r12 #7): the estimate branch (join on
    # signature component j) and the exact branch (join on token)
    # shared the whole join-aggregate shape but ran as two chains plus
    # a pair-merge join. One UNIFIED key space — 's:<j>' rows carrying
    # the minhash, 't:<tok>' rows carrying nothing — runs both through
    # ONE cand -> side_a -> side_b join chain and ONE per-pair
    # aggregate: n_match counts 's' rows whose minhashes agree (every
    # candidate doc has all H signature rows, so each pair appears —
    # the former left-join + coalesce(0) empty-intersection case falls
    # out naturally as sum() = 0 over 't' rows), n_inter counts 't'
    # rows (a 't:<tok>' key joins exactly when both docs share the
    # token — the same intersection count). Counts are identical
    # integers; one join chain, one aggregate and one merge join fewer.
    u = sig.select(
        F.col(id_col),
        F.concat(F.lit("s:"), F.col("j").cast("string")).alias("__k"),
        F.col("minhash").alias("__v"),
    ).unionByName(
        toks.select(
            F.col(id_col),
            F.concat(F.lit("t:"), F.col("tok")).alias("__k"),
            F.lit(None).cast("long").alias("__v"),
        )
    )
    ua = u.select(
        F.col(id_col).alias("id_a"), "__k", F.col("__v").alias("__va")
    )
    ub = u.select(
        F.col(id_col).alias("id_b"), "__k", F.col("__v").alias("__vb")
    )
    both = (
        cand.join(ua, "id_a")
        .join(ub, ["id_b", "__k"])
        .groupBy("id_a", "id_b")
        .agg(
            F.sum(
                F.when(
                    F.col("__k").startswith("s:")
                    & (F.col("__va") == F.col("__vb")),
                    1,
                ).otherwise(0)
            ).alias("__n_match"),
            F.sum(
                F.when(F.col("__k").startswith("t:"), 1).otherwise(0)
            ).alias("__n_inter"),
        )
    )
    sizes = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_tok"))
    za = sizes.select(F.col(id_col).alias("id_a"), F.col("n_tok").alias("__n_a"))
    zb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_tok").alias("__n_b"))
    est = F.col("__n_match").cast("double") / F.lit(float(num_hashes))
    exact = F.col("__n_inter").cast("double") / (
        F.col("__n_a") + F.col("__n_b") - F.col("__n_inter")
    )
    return (
        both.join(za, "id_a")
        .join(zb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(est, 4).alias("est_jaccard"),
            F.round(exact, 4).alias("exact_jaccard"),
            F.round(F.abs(est - exact), 4).alias("abs_err"),
        )
    )


def minhash_verified_pairs(
    df: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.7,
    max_bucket: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """VERIFIED near-dup edges: MinHash+LSH banding candidates (capped
    buckets) -> exact distinct-token Jaccard verification. Returns
    (id_a, id_b) with id_a < id_b and true Jaccard >= ``threshold``.

    This is the candidate-bounded edge source for everything that
    consumes a duplicate graph (``minhash_dedup`` keep flags,
    ``connected_components`` clusters, ``leakage_safe_split``): pair
    volume is capped by banding + ``max_bucket``, never all-pairs —
    unlike ``ngram_jaccard_pairs``, whose inverted-index self-join
    emits k^2 rows per shared shingle and is the exact (but
    hot-shingle-sensitive) form.

    ``max_bucket`` drops LSH buckets larger than the cap before pairing:
    heavily templated corpora produce identical band keys for thousands
    of docs, and an uncapped bucket is a quadratic blowup (measured:
    74 s at sf0.1 without the cap). Docs in dropped buckets still meet
    in their other, more selective bands."""
    # materialize the bounded candidate list once, then semi-join the
    # token table down to candidate docs and materialize THAT once:
    # toks feeds three branches (ta/tb/sizes) which would each re-run
    # the corpus tokenize pipeline (VERDICT r6 #3; same shape as
    # minhash_estimate_error)
    cand = _capped_candidates(
        df, num_hashes, bands, max_bucket, text_col, id_col
    ).localCheckpoint(eager=True)
    ids = (
        cand.select(F.col("id_a").alias(id_col))
        .union(cand.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    toks = (
        df.select(
            F.col(id_col),
            F.explode(F.array_distinct(tokens(text_col))).alias("tok"),
        )
        .join(ids, id_col, "semi")
        .localCheckpoint(eager=True)
    )
    sizes = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_tok"))
    ta = toks.select(F.col(id_col).alias("id_a"), "tok")
    tb = toks.select(F.col(id_col).alias("id_b"), "tok")
    inter = (
        cand.join(ta, "id_a")
        .join(tb, ["id_b", "tok"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_tok").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_tok").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .where(
            F.col("n_inter")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            >= threshold
        )
        .select("id_a", "id_b")
    )


def minhash_dedup(
    df: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.7,
    max_bucket: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """End-to-end scalable near-dedup: ``minhash_verified_pairs``
    edges -> greedy keep-lowest-id.

    Returns (id, keep): keep=false iff the doc has a LOWER-id verified
    duplicate neighbor (Jaccard >= threshold). Greedy min-neighbor, not
    full transitive closure — the deterministic single-pass policy
    (full connected components needs iteration; at threshold >= 0.7
    near-dup clusters are cliques in practice, where both coincide).
    Compose the same edges with ``connected_components`` /
    ``select_representatives`` / ``leakage_safe_split`` for the
    closure-grade policies."""
    dup_edges = minhash_verified_pairs(
        df, num_hashes, bands, threshold, max_bucket, text_col, id_col
    )
    dropped = dup_edges.select(F.col("id_b").alias(id_col)).distinct()
    return (
        df.select(id_col)
        .join(dropped.withColumn("__drop", F.lit(True)), id_col, "left")
        .select(id_col, F.coalesce(~F.col("__drop"), F.lit(True)).alias("keep"))
    )


def simhash(
    df: DataFrame,
    bits: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """SimHash fingerprint: bit i of the fingerprint is 1 iff the sum
    over distinct tokens of (2 * bit_i(md5_long(tok)) - 1) is positive.

    Explode + hash-aggregate form: one row per (doc, distinct token),
    per-bit ±1 sums under groupBy(doc), sign-packed into the
    fingerprint. The shuffle is NOT O(doc*token): a document's tokens
    are colocated in its input partition, so the partial (map-side)
    aggregation collapses them to ONE 16-long row per doc before any
    data moves — the shuffle carries O(docs) rows. This beats the
    "zero-shuffle" array-aggregate/zip_with form ~5x on CPU (measured
    7.3 s vs 1.4 s warm at sf0.1): the per-bit sums run inside
    whole-stage codegen while higher-order array lambdas are
    interpreted per element. Integer ±1 sums are order-exact, so
    fingerprints are bit-identical to the relational form the oracle
    recomputes. Docs with zero tokens produce no row (matching the
    oracle's unnest semantics)."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(tokens(text_col))).alias("__tok"),
    )
    h = toks.select(id_col, md5_long(F.col("__tok")).alias("__h"))
    per_bit = h.groupBy(id_col).agg(
        *[
            F.sum(
                F.shiftright(F.col("__h"), i).bitwiseAND(F.lit(1)) * 2 - 1
            ).alias(f"__s{i}")
            for i in range(bits)
        ]
    )
    fp = None
    for i in range(bits):
        term = F.when(F.col(f"__s{i}") > 0, F.lit(2**i)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return per_bit.select(F.col(id_col), fp.cast("long").alias("simhash"))


def simhash_neardup_pairs(
    df: DataFrame,
    bits: int = 60,
    bands: int = 4,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming.

    Banded candidate generation (the Manku/Jain/Sarma web-dedup shape):
    the fingerprint splits into ``bands`` equal bit-ranges; candidates
    share at least one band value — an equi-join on (band, value), never
    a cross join. By pigeonhole, ``max_hamming < bands`` makes the
    banding EXACT (a pair within distance max_hamming must agree on
    >= 1 whole band), so results equal the quadratic definition and the
    oracle can verify with the naive form.

    Returns (id_a, id_b, hamming). Scale: expected band fan-in is
    M / 2^(bits/bands) per value — the BAND WIDTH is the scale knob.
    The default is bits=60 (the full md5_long hash width) / bands=4 =
    15-bit bands, 32768 values per band: measured at 100k docs the
    16-bit default's 4-bit bands (16 values!) made every bucket hold
    M/16 docs and the candidate join go quadratic (~1.2B pairs, job
    death); 15-bit bands keep expected buckets at M/32768. True
    duplicate clusters still meet pairwise — that output is inherently
    quadratic in cluster size, so run exact dedup_exact first on
    corpora with heavy exact replication. Remaining hot buckets are
    equi-join skew — AQE splits them.
    """
    if bits % bands != 0:
        raise ValueError(f"bits {bits} not divisible by bands {bands}")
    if max_hamming >= bands:
        raise ValueError(
            f"max_hamming {max_hamming} >= bands {bands}: banding would "
            "miss pairs (pigeonhole needs max_hamming < bands)"
        )
    w = bits // bands
    sh = simhash(df, bits=bits, text_col=text_col, id_col=id_col)
    banded = sh.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), b * w)
                        .bitwiseAND(F.lit((1 << w) - 1))
                        .alias("val"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bv"),
    ).select(id_col, "simhash", "bv.band", "bv.val")
    a = banded.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("ha"),
        "band", "val",
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("hb"),
        "band", "val",
    )
    cand = (
        a.join(b, ["band", "val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ha", "hb")
        .distinct()  # a pair can meet in several bands
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        cand.withColumn("hamming", ham.cast("long"))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def banded_hamming_pairs(
    df: DataFrame,
    hash_col: str = "h",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bits: int = 63,
) -> DataFrame:
    """Generic banded Hamming-near pair join over ANY integer hash
    column (the machinery behind ``simhash_neardup_pairs``, exposed
    for other fingerprints — e.g. image dHash): split the ``bits``-bit
    hash into ``max_hamming + 1`` bands; by pigeonhole, any pair
    within ``max_hamming`` bit flips agrees on at least one whole
    band, so the equi-join on (band index, band value) finds EXACTLY
    the qualifying pairs, never all-pairs. Returns
    (id_a, id_b, hamming), id_a < id_b.

    Scale: map-side band explode (max_hamming+1 rows per input), one
    equi-join on the band key, ``bit_count(xor)`` verify on the
    bounded candidates. Hot bands (many identical hashes) are real
    duplicates — exactly the rows the caller wants."""
    n_bands = int(max_hamming) + 1
    width = -(-int(bits) // n_bands)
    mask = (1 << width) - 1
    banded = df.select(
        F.col(id_col),
        F.col(hash_col),
        F.posexplode(
            F.array(*[
                F.shiftright(F.col(hash_col), i * width).bitwiseAND(
                    F.lit(mask)
                )
                for i in range(n_bands)
            ])
        ).alias("band", "val"),
    )
    a = banded.select(
        F.col(id_col).alias("id_a"), F.col(hash_col).alias("ha"),
        "band", "val",
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col(hash_col).alias("hb"),
        "band", "val",
    )
    cand = (
        a.join(b, ["band", "val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ha", "hb")
        .distinct()
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        cand.withColumn("hamming", ham.cast("long"))
        .where(F.col("hamming") <= int(max_hamming))
        .select("id_a", "id_b", "hamming")
    )


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    driver_edges: int = 2_000_000,
) -> DataFrame:
    """Connected components over an undirected edge list by min-label
    propagation: every node repeatedly adopts the smallest component
    id among itself and its neighbors until a fixpoint.

    Converges in O(diameter) hops (each a self-join + min-aggregate —
    both map-side combinable); ``max_iter`` bounds the number of HOPS
    exactly (an odd bound runs an odd number of propagations — r5
    ADVICE: the former two-hop loop could overshoot by one).
    Returns (node, component) where component = min node id reachable.

    Hybrid execution (the k-means sample-train pattern, r6): the dup
    GRAPH is orders of magnitude smaller than the corpus it came from,
    and for graphs at or under ``driver_edges`` unique edges the
    iteration runs as plain Python label propagation over the
    collected edge list — identical hop semantics, zero per-round
    Spark jobs (the distributed loop's checkpoint + convergence-check
    fixed costs dominated ``leakage_safe_split``, r5 VERDICT #6).
    Larger graphs take the distributed two-hops-per-round loop with a
    seed-fixpoint shortcut; the cutover is a one-job count of the
    already-materialized edge list. Set ``driver_edges=0`` to force
    the distributed path.

    This is the full transitive closure the greedy ``minhash_dedup``
    keep-policy approximates; use it when duplicate clusters are long
    chains rather than cliques (e.g. chained near-identical crawls)."""
    # materialize the edge list ONCE: every iteration joins against it,
    # and without this the edge-producing plan (often an expensive
    # candidate-pair generation, e.g. an n-gram inverted-index
    # self-join) re-executes per round — measured 28 s -> ~3 s for
    # leakage_safe_split at sf0.1
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionAll(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # the dup GRAPH is tiny relative to the corpus (it holds only the
    # near-dup pairs), but the checkpoint inherits the corpus job's
    # partition count — every iterative stage then schedules dozens of
    # near-empty tasks, and at a handful of rounds that scheduling
    # overhead IS the runtime (r6: ~0.7 s of the ~3 s fixed cost at
    # sf0.1). The count is one cheap job over materialized blocks;
    # coalesce is narrow (no shuffle, no re-checkpoint).
    n_edges = sym.count()
    if max_iter > 0 and n_edges <= int(driver_edges):
        # driver fast path: EXACT hop-for-hop parity with the
        # distributed loop (seed = one propagation from identity,
        # then up to max_iter - 1 more, early exit at the fixpoint),
        # O(E) per hop over at most driver_edges rows. The transfer is
        # one Arrow batch (toPandas) and the propagation is vectorized
        # (np.minimum.at over the edge index arrays) for numeric ids,
        # with a plain dict loop for string/other id types. Bounded by
        # construction — the same small-model-to-driver move as
        # k-means/PQ/BPE training.
        import numpy as np

        node_t = sym.schema["a"].dataType.simpleString()
        pdf = sym.toPandas()
        av, bv = pdf["a"].to_numpy(), pdf["b"].to_numpy()
        if np.issubdtype(av.dtype, np.number):
            nodes, a_idx = np.unique(av, return_inverse=True)
            b_idx = np.searchsorted(nodes, bv)
            label = nodes.copy()
            for _ in range(int(max_iter)):
                new = label.copy()
                np.minimum.at(new, a_idx, label[b_idx])
                if (new == label).all():
                    break
                label = new
            items = list(zip(nodes.tolist(), label.tolist()))
        else:
            lab: dict = {}
            for a in av:
                lab.setdefault(a, a)
            for _ in range(int(max_iter)):
                changed = False
                new = dict(lab)
                for a, b in zip(av, bv):
                    if lab[b] < new[a]:
                        new[a] = lab[b]
                        changed = True
                lab = new
                if not changed:
                    break
            items = list(lab.items())
        return edges.sparkSession.createDataFrame(
            items, f"node {node_t}, component {node_t}"
        )
    target = max(1, -(-n_edges // 500_000))
    if target < sym.rdd.getNumPartitions():
        sym = sym.coalesce(target)
    # seed labels with the ONE-HOP minimum, min(node, neighbors) — a
    # single map-side-combinable aggregate over the materialized edge
    # list. Near-dup clusters are overwhelmingly cliques (every copy
    # meets every other in some band), and for a clique the seed IS the
    # fixpoint: the loop's first convergence check then exits after ONE
    # materialized round instead of two, halving the per-call fixed
    # cost (checkpoint + count jobs) that dominated leakage_safe_split
    # (r5 VERDICT #6). The seed counts as hop 1 of the max_iter budget.
    if max_iter <= 0:
        return (
            sym.select(F.col("a").alias("node"))
            .distinct()
            .withColumn("component", F.col("node"))
        )
    labels = (
        sym.groupBy("a")
        .agg(F.least(F.col("a"), F.min("b")).alias("component"))
        .select(F.col("a").alias("node"), "component")
    )

    def _propagate(lbl):
        neighbor_min = (
            sym.join(lbl, sym.b == lbl.node)
            .groupBy("a")
            .agg(F.min("component").alias("n_comp"))
        )
        return (
            lbl.join(neighbor_min, lbl.node == neighbor_min.a, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("n_comp"), F.col("component"))
                ).alias("component"),
            )
        )

    # Seed-fixpoint shortcut: labels constant across every edge ⟺
    # converged (and the constant is then necessarily the component
    # min, since the min node m always has seed label m). Near-dup
    # clusters are overwhelmingly cliques, whose seed IS the fixpoint —
    # one cheap limit(1) probe job then skips the entire loop (zero
    # checkpoint rounds instead of r5's two).
    if max_iter > 1:
        la = labels.select(
            F.col("node").alias("a"), F.col("component").alias("__ca")
        )
        lb = labels.select(
            F.col("node").alias("b"), F.col("component").alias("__cb")
        )
        mismatch = (
            sym.join(la, "a")
            .join(lb, "b")
            .where(F.col("__ca") != F.col("__cb"))
            .limit(1)
            .count()
        )
        if mismatch == 0:
            return labels
    # Up to TWO hops per materialization round: the per-round fixed
    # cost (checkpoint job + convergence-check job) dominates on small
    # dup graphs, and chaining two propagations inside one round halves
    # it for the same O(diameter) label movement. max_iter bounds HOPS
    # exactly: the seed spends hop 1, each round spends min(2,
    # remaining). Checkpoint FIRST (truncates the iterative-join
    # lineage), then run the convergence check against the materialized
    # rows so the round's plan executes once — and skip the check
    # entirely when the hop budget is exhausted (the loop exits either
    # way, so the count job would be pure overhead — r5 VERDICT #6).
    hops = 1
    while hops < max_iter:
        step = min(2, max_iter - hops)
        new_labels = labels
        for _ in range(step):
            new_labels = _propagate(new_labels)
        new_labels = new_labels.localCheckpoint(eager=True)
        hops += step
        if hops >= max_iter:
            labels = new_labels
            break
        changed = (
            new_labels.alias("u")
            .join(labels.alias("l"), "node")
            .where(F.col("u.component") != F.col("l.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def select_representatives(
    docs_scores: DataFrame,
    components: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "quality",
    node_col: str = "node",
    comp_col: str = "component",
) -> DataFrame:
    """Keep-best dedup policy: per near-dup cluster, keep the
    HIGHEST-SCORING member (ties -> smallest id) instead of
    ``minhash_dedup``'s keep-first/min-id — the curation-grade choice
    when duplicates differ in quality (crawl copies with boilerplate vs
    the clean original). Documents absent from ``components`` are
    singletons and always kept, reported with their own id as the
    component.

    ``docs_scores`` is (id, score) for EVERY doc (compose with
    ``quality_score``); ``components`` is ``connected_components``
    output. Returns (id_col, comp_col, score_col, keep).

    Scale: the per-cluster argmax is ``min(struct(-score, id))`` — a
    partially-aggregable reduction (map-side combined, one shuffle on
    the cluster key), never a per-cluster sort window; attaching the
    verdict back is one equi-join on the cluster key plus a broadcast-
    friendly join of the O(clusters) winner table. Linear at any corpus
    size.
    """
    labeled = docs_scores.select(
        F.col(id_col), F.col(score_col)
    ).join(
        components.select(
            F.col(node_col).alias(id_col), F.col(comp_col)
        ),
        id_col,
        "left",
    ).withColumn(comp_col, F.coalesce(F.col(comp_col), F.col(id_col)))
    winners = labeled.groupBy(comp_col).agg(
        F.min(F.struct((-F.col(score_col)).alias("ns"), F.col(id_col).alias("i")))
        .alias("w")
    ).select(comp_col, F.col("w.i").alias("__rep"))
    return labeled.join(winners, comp_col).select(
        id_col,
        comp_col,
        score_col,
        (F.col(id_col) == F.col("__rep")).alias("keep"),
    )


def embedding_neardup(
    df: DataFrame,
    threshold: float = 0.9,
    dim: int | None = None,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
) -> DataFrame:
    """Embedding near-dup pairs (id_a < id_b, cosine >= threshold).

    DEFAULT path is LSH-bucketed (similarity.lsh_neardup_pairs): random-
    hyperplane buckets bound the candidate set to same-bucket pairs —
    the only shape that survives 100 TB. ``exact=True`` opts into the
    O(M^2) self-join (embedding_neardup_pairs) — complete but quadratic;
    keep it for oracles and small data. ``dim`` (vector width) is
    required for the LSH path; ``bits`` trades recall vs bucket size
    (expected pairs ~= M^2 / 2^bits per hash)."""
    if exact:
        return embedding_neardup_pairs(
            df, threshold=threshold, id_col=id_col, vec_col=vec_col
        )
    from flechasdb_spark.operators.similarity import lsh_neardup_pairs

    if dim is None:
        first = df.select(F.size(vec_col).alias("n")).first()
        if first is None:
            raise ValueError("empty DataFrame and no dim given")
        dim = int(first["n"])
    return lsh_neardup_pairs(
        df, threshold=threshold, dim=dim, bits=bits,
        id_col=id_col, vec_col=vec_col,
    )


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine near-dup pairs (id_a < id_b, cos >= threshold).

    Quadratic candidate set — the oracle-parity variant behind
    ``embedding_neardup(..., exact=True)``. The public default is the
    LSH-bucketed scale path (operators/similarity.py), which
    approximates the same output with a bounded candidate set."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    cos = cosine_similarity(F.col("va"), F.col("vb"))
    return (
        pairs.select("id_a", "id_b", cos.alias("cos"))
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 4).alias("cos"))
    )


def segment_dedup(
    docs: DataFrame,
    seg_words: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact substring dedup at fixed segment granularity (the
    train-set shape of Lee et al. "Deduplicating Training Data Makes
    Language Models Better", arXiv:2107.06499, with the suffix-array
    replaced by deterministic ``seg_words``-word segmentation): every
    segment is kept only at its first global occurrence (ordered by
    (doc, position)); later copies anywhere in the corpus are removed
    and the surviving segments are stitched back per document.

    Returns ``(id_col, n_segs, n_kept, clean_text)`` — one row per input
    document; a fully-duplicated document survives with ``n_kept = 0``
    and empty ``clean_text``.

    Scale (100 TB): exactly two shuffles and zero joins — segmentation
    is map-only; first-occurrence is a whole-partition ``min`` window
    keyed on the segment (data moves once, by segment); reassembly is
    one aggregation keyed on the document, with the keep-flag folded
    into conditional aggregates so no kept-rows join is needed. The
    order key is ``min(struct(doc, pos))`` — lexicographic struct min,
    partially aggregable like a plain long, and safe at any segment
    count or doc_id magnitude (a packed ``doc*K + pos`` BIGINT key
    breaks once a document exceeds K segments or ids approach 2^63/K).
    """
    words = F.split(F.col(text_col), " ")
    nseg = F.ceil(F.size(words) / F.lit(float(seg_words))).cast("int")
    segs = docs.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), nseg - 1),
                lambda i: F.array_join(
                    F.slice(words, i * seg_words + 1, seg_words), " "
                ),
            )
        ).alias("pos", "seg"),
    ).withColumn("okey", F.struct(F.col(id_col).alias("d"), F.col("pos").alias("p")))
    kept_flag = F.col("okey") == F.min("okey").over(Window.partitionBy("seg"))
    flagged = segs.withColumn("__keep", kept_flag)
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_segs"),
        F.sum(F.col("__keep").cast("long")).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("__keep"), F.struct("pos", "seg"))
                    )
                ),
                lambda x: x["seg"],
            ),
            " ",
        ).alias("clean_text"),
    )


def cdc_chunk_dedup(
    docs: DataFrame,
    divisor: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact substring dedup at CONTENT-DEFINED chunk granularity —
    the shift-robust sibling of ``segment_dedup``. Fixed ``seg_words``
    segmentation breaks when a duplicate passage is merely OFFSET (one
    inserted word upstream shifts every later segment boundary, so no
    segment matches); content-defined chunking (the LBFS/rsync family
    — Muthitacharoen et al. 2001 — at word granularity) cuts AFTER any
    word whose md5 hash is ``0 mod divisor``, so boundaries travel
    with the CONTENT and duplicate passages re-align within one chunk
    of their start regardless of offset. Expected chunk length is
    ``divisor`` words.

    Keep policy matches ``segment_dedup``: a chunk survives only at
    its first global occurrence ordered by (doc, chunk position);
    survivors are stitched back per document. Returns
    ``(id_col, n_chunks, n_kept, clean_text)``.

    Scale (100 TB): the cut-point marking is map-only; the chunk id is
    a running boundary count over a window PARTITIONED BY DOCUMENT
    (bounded by doc length, one shuffle keyed on the doc); chunk
    assembly is one aggregation on (doc, chunk); first-occurrence is
    the same whole-partition ``min(struct(doc, pos))`` window keyed on
    the chunk text as ``segment_dedup`` (data moves once, by chunk);
    reassembly folds the keep flag into conditional aggregates — no
    joins anywhere.
    """
    words = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "w"),
    )
    # boundary AFTER a cut word: the NEXT word starts a new chunk, so
    # chunk id = count of cut words strictly before this position
    cut = (md5_long(F.col("w")) % int(divisor) == 0).cast("long")
    prev = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    chunked = words.select(
        id_col,
        "pos",
        "w",
        F.coalesce(F.sum(cut).over(prev), F.lit(0)).alias("__chunk"),
    )
    chunks = chunked.groupBy(id_col, "__chunk").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "w"))),
                lambda x: x["w"],
            ),
            " ",
        ).alias("chunk_text"),
    )
    okey = F.struct(F.col(id_col).alias("d"), F.col("__chunk").alias("p"))
    flagged = chunks.withColumn(
        "__keep",
        okey == F.min(okey).over(Window.partitionBy("chunk_text")),
    )
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.col("__keep").cast("long")).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("__keep"),
                            F.struct(
                                F.col("__chunk").alias("pos"),
                                F.col("chunk_text").alias("seg"),
                            ),
                        )
                    )
                ),
                lambda x: x["seg"],
            ),
            " ",
        ).alias("clean_text"),
    )


def edit_distance_neardup(
    docs: DataFrame,
    max_dist: int = 20,
    prefix_len: int = 16,
    max_block: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
    suffix_pass: bool = True,
) -> DataFrame:
    """Edit-distance-verified near-dup pairs with prefix blocking —
    the record-linkage member of the dedup family: unlike MinHash /
    SimHash (token/bit sketches, probabilistic), a kept pair carries a
    HARD guarantee (levenshtein <= max_dist on the normalized text),
    which is the contract deduplication-of-near-identical-records
    pipelines (log dedup, form/spam variants, template families) ask
    for.

    Candidate generation is classic TWO-PASS blocking (VERDICT r8 #6):
    documents meet within their normalized ``prefix_len``-char PREFIX
    block, and (``suffix_pass``, default on) within their reversed-
    text prefix block — the complementary pass that catches pairs
    whose edits fall inside the first ``prefix_len`` chars, which
    prefix blocking alone provably misses. A pair differing inside
    BOTH its first and last ``prefix_len`` chars is still missed (the
    blocking trade); the candidate set stays bounded by block sizes,
    never all-pairs. The length lower bound
    ``|len(a) - len(b)| <= max_dist`` (any edit changes length by at
    most 1) applies BEFORE the quadratic verify; candidates found by
    both passes dedupe on (id_a, id_b) before it. Blocks larger than
    ``max_block`` are dropped deterministically PER PASS (hot
    boilerplate prefixes carry no linkage signal — the
    `max_df`/`max_bucket` practice, mirrored exactly in the oracle).

    Returns ``(id_a, id_b, edit_distance, len_a, len_b)`` with
    id_a < id_b — integer columns only, engine-exact (Spark and DuckDB
    implement the same unit-cost Levenshtein DP; `reverse` is
    codepoint-wise in both, astral chars included).

    Scale: one block-keyed shuffle per pass for the self-join + one
    (id_a, id_b)-keyed dedup of the bounded candidate set; verify cost
    is O(len * max_dist) per candidate under Spark >= 3.5's banded
    ``levenshtein(l, r, threshold)`` (falls back to the full
    O(len^2) DP on older runtimes — results identical: the banded
    form returns the exact distance whenever it is <= threshold)."""
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    base = docs.select(
        F.col(id_col),
        norm.alias("__t"),
        F.substring(norm, 1, int(prefix_len)).alias("__blk_p"),
        F.substring(F.reverse(norm), 1, int(prefix_len)).alias("__blk_s"),
        F.length(norm).alias("__len"),
    )

    def _pass(blk_col: str) -> DataFrame:
        b = base.select(
            id_col, "__t", "__len", F.col(blk_col).alias("__blk")
        )
        if max_block is not None:
            small = (
                b.groupBy("__blk")
                .agg(F.count(F.lit(1)).alias("__c"))
                .where(F.col("__c") <= int(max_block))
                .select("__blk")
            )
            b = b.join(small, "__blk", "left_semi")
        a = b.select(
            F.col(id_col).alias("id_a"),
            F.col("__t").alias("__ta"),
            F.col("__blk"),
            F.col("__len").alias("len_a"),
        )
        c = b.select(
            F.col(id_col).alias("id_b"),
            F.col("__t").alias("__tb"),
            F.col("__blk"),
            F.col("__len").alias("len_b"),
        )
        return (
            a.join(c, "__blk")
            .where(F.col("id_a") < F.col("id_b"))
            .where(
                F.abs(F.col("len_a") - F.col("len_b"))
                <= F.lit(int(max_dist))
            )
            .select("id_a", "id_b", "__ta", "__tb", "len_a", "len_b")
        )

    pairs = _pass("__blk_p")
    if suffix_pass:
        pairs = pairs.unionByName(_pass("__blk_s")).dropDuplicates(
            ["id_a", "id_b"]
        )
    try:
        d = F.levenshtein("__ta", "__tb", int(max_dist))  # banded DP
        pairs = pairs.withColumn("edit_distance", d).where(
            F.col("edit_distance") >= 0  # -1 = above threshold
        )
    except TypeError:  # pre-3.5 runtime: full DP + post-filter
        pairs = pairs.withColumn(
            "edit_distance", F.levenshtein("__ta", "__tb")
        ).where(F.col("edit_distance") <= int(max_dist))
    return pairs.select(
        "id_a",
        "id_b",
        F.col("edit_distance").cast("long"),
        F.col("len_a").cast("long"),
        F.col("len_b").cast("long"),
    )


def normalized_text(col: Column | str) -> Column:
    """Canonical text for NORMALIZED exact dedup (the CCNet/Dolma
    "fuzzy exact" step: hash after normalization so trivial variants —
    case, runs of whitespace, punctuation — collapse to one group):
    lowercase, keep only Unicode letters/digits and whitespace
    (``\\p{L}\\p{N}`` — Latin-only classes silently emptied non-Latin
    scripts, ADVICE r6), collapse whitespace runs, trim. Each regex is
    an engine-portable class (Java and RE2 both support the Unicode
    categories), mirrored verbatim by the oracle (with DuckDB's
    explicit 'g' flag)."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.lower(c)
    s = F.regexp_replace(s, "[^\\p{L}\\p{N} \\t\\n]", "")
    s = F.regexp_replace(s, "\\s+", " ")
    return F.trim(s)


def normalized_hash(
    text_col: str = "text",
) -> Column:
    """md5 over the normalized text, with the empty-normalization
    guard: a document whose normalization is EMPTY (all-symbol /
    all-punctuation content) falls back to hashing its RAW text, so
    distinct symbol-only documents never collapse into one "duplicate"
    group (silent-loss edge, ADVICE r6). Mirrored in the oracle."""
    norm = normalized_text(text_col)
    return F.when(
        norm == "", F.md5(F.concat(F.lit("__RAW__"), F.col(text_col)))
    ).otherwise(F.md5(norm))


def dedup_exact_normalized(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """`dedup_exact` over the normalized text: (id, content_hash, keep)
    where hash groups also capture case/whitespace/punctuation variants
    of the same content. Map-only hash + one window per hash group —
    the same two-stage shape as the raw form. Unicode-aware
    normalization + raw-hash fallback for empty normalizations (see
    `normalized_text` / `normalized_hash`)."""
    h = normalized_hash(text_col)
    w = Window.partitionBy("content_hash").orderBy(F.col(id_col).asc())
    return (
        df.select(id_col, h.alias("content_hash"))
        .withColumn("keep", (F.row_number().over(w) == 1))
    )


def cross_source_dup_matrix(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Which sources duplicate WHICH: for every source pair (a <= b),
    the number of exact-duplicate document PAIRS spanning them —
    within-source rows (a == b) count C(c, 2) per hash group,
    cross-source rows count c_a * c_b. The provenance view of
    duplication that `source_mix_report`'s per-source dup rate
    aggregates away — a mirror/scraper relationship between two
    sources shows up as a hot off-diagonal cell.

    Scale (100 TB): one partial agg to (hash, source, count) — one row
    per hash x source, so the self-join joins AGGREGATES, never
    documents, and a million-copy template costs one row per source.
    The matrix itself is O(S^2) rows.
    """
    hs = df.groupBy(
        F.md5(F.col(text_col)).alias("__h"),
        F.col(source_col).alias("source"),
    ).agg(F.count(F.lit(1)).alias("c"))
    a = hs.select(
        "__h", F.col("source").alias("source_a"), F.col("c").alias("ca")
    )
    b = hs.select(
        "__h", F.col("source").alias("source_b"), F.col("c").alias("cb")
    )
    cross = (
        a.join(b, "__h")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("n_dup_pairs"))
    )
    within = hs.groupBy(F.col("source").alias("source_a")).agg(
        F.sum(F.expr("div(c * (c - 1), 2)")).alias("n_dup_pairs")
    ).select(
        "source_a", F.col("source_a").alias("source_b"), "n_dup_pairs"
    )
    return (
        cross.unionByName(within)
        .where(F.col("n_dup_pairs") > 0)
        .select(
            "source_a",
            "source_b",
            F.col("n_dup_pairs").cast("long").alias("n_dup_pairs"),
        )
        .orderBy("source_a", "source_b")
    )


def ngram_containment_pairs(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = 1000,
) -> DataFrame:
    """DIRECTED near-dup pairs by n-gram containment
    |A ∩ B| / |A| >= threshold: "most of A's shingles appear in B" —
    the asymmetric complement of Jaccard that catches excerpts, quotes
    and supersets a symmetric measure dilutes (a paragraph quoted
    inside a book has tiny Jaccard but containment ~1 in the
    paragraph->book direction).

    Same bounded inverted-index shape as `ngram_jaccard_pairs`
    (including the ``max_df`` hot-shingle cut, under which the measured
    containment is a lower bound); each undirected intersection emits
    both directions, filtered independently.
    """
    df = _parallel_scan(df)
    exploded = df.select(
        F.col(id_col), word_ngrams(text_col, n).alias("shingles")
    ).select(
        F.col(id_col),
        F.size("shingles").alias("n_sh"),
        F.explode("shingles").alias("shingle"),
    )
    if max_df is not None:
        hot = (
            exploded.groupBy("shingle")
            .count()
            .where(F.col("count") > max_df)
            .select("shingle")
        )
        exploded = exploded.join(F.broadcast(hot), "shingle", "left_anti")
    a = exploded.select(
        F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"), "shingle"
    )
    b = exploded.select(
        F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"), "shingle"
    )
    inter = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("n_inter"),
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
        )
    )
    # both directions exploded from ONE pass over the intersection
    # table — a fwd/rev union plans the whole inverted-index pipeline
    # (3 scans + the shingle self-join) once PER BRANCH, doubling the
    # dominant cost at corpus scale; the explode emits both directed
    # rows inside the single aggregated pass
    both = inter.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a"),
                    F.col("id_b"),
                    (F.col("n_inter") / F.col("n_a")).alias("containment"),
                ),
                F.struct(
                    F.col("id_b").alias("id_a"),
                    F.col("id_a").alias("id_b"),
                    (F.col("n_inter") / F.col("n_b")).alias("containment"),
                ),
            )
        ).alias("r")
    ).select("r.*")
    return (
        both.where(F.col("containment") >= threshold)
        .select("id_a", "id_b", F.round("containment", 4).alias("containment"))
    )


def boilerplate_fraction(
    df: DataFrame,
    n: int = 3,
    hot_df: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document corpus-boilerplate exposure: the fraction of the
    doc's DISTINCT word n-grams whose corpus document-frequency exceeds
    ``hot_df`` — the cross-document complement of the WITHIN-doc
    `repetition_stats` rules (Gopher) and the score-form sibling of
    `doc_novelty` (which measures unseen-ness against a reference; this
    measures template-ness against the corpus itself). High fraction =
    the doc is mostly made of spans the corpus repeats everywhere
    (navigation chrome, license blocks, generated templates) — a
    standard drop signal, and the document-level proxy for the
    memorized-span risk of Lee et al. 2022.

    Scale (100 TB): one shingle partial agg to O(shingle-types) df
    counts, one equi-join back on the shingle key (AQE broadcast while
    the hot set is small, shuffle fallback beyond), one per-doc
    map-side-combinable agg. Docs too short for any n-gram report
    fraction 0.
    """
    df = _parallel_scan(df)
    sh = df.select(
        F.col(id_col), word_ngrams(text_col, n).alias("shingles")
    ).select(
        F.col(id_col),
        F.size("shingles").alias("n_sh"),
        F.explode("shingles").alias("shingle"),
    )
    dfc = sh.groupBy("shingle").agg(
        F.count(F.lit(1)).alias("__df")
    )
    j = sh.join(dfc, "shingle").groupBy(id_col).agg(
        F.first("n_sh").alias("n_shingles"),
        F.sum(F.when(F.col("__df") > hot_df, 1).otherwise(0)).alias(
            "n_hot"
        ),
    )
    return (
        df.select(id_col)
        .join(j, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_shingles", F.lit(0))
            .cast("long")
            .alias("n_shingles"),
            F.coalesce("n_hot", F.lit(0)).cast("long").alias("n_hot"),
            F.round(
                F.when(
                    F.coalesce("n_shingles", F.lit(0)) == 0, F.lit(0.0)
                ).otherwise(F.col("n_hot") / F.col("n_shingles")),
                4,
            ).alias("hot_fraction"),
        )
        .orderBy(id_col)
    )


def repeated_ngram_spans(
    docs: DataFrame,
    window_words: int = 15,
    id_col: str = "doc_id",
    text_col: str = "text",
    key_mode: str = "hash",
    flag_mode: str = "window",
    token_col: str | None = None,
) -> DataFrame:
    """Maximal cross-corpus duplicated spans at ANY word alignment —
    the detection half of ExactSubstr dedup (Lee et al.,
    "Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499), with the suffix array replaced by overlapping
    sliding windows. `segment_dedup` only sees duplicates that land on
    its fixed segment grid; this operator slides a ``window_words``-word
    window one word at a time, flags every window whose content occurs
    more than once in the corpus (any document, any offset, including
    elsewhere in the same document), and merges overlapping/touching
    duplicated windows per document into maximal spans.

    Exactness at word granularity: a duplicated substring of >= L words
    has ALL of its L-word windows duplicated, and every duplicated
    L-window is itself a duplicated substring — so the union of
    flagged windows equals the union of maximal duplicated substrings
    of length >= L, and the gaps-and-islands merge recovers exactly
    the connected components of that union.

    Returns one row per span: ``(id_col, span_start, span_end_excl,
    span_words, n_windows)`` with word positions 0-based and the end
    exclusive. Documents shorter than ``window_words`` words emit no
    windows (they cannot contain a >= L-word duplicate).

    Scale (100 TB): window generation is map-only; shuffled rows carry
    ~24 bytes in hash ``key_mode`` (see below). The duplicate flag has
    two measured plans (``flag_mode``, both semantics-identical and
    equality-gated in pytest):

    - ``"window"`` (default): ONE shuffle of the window table keyed on
      the window, count over the key partition. Fastest when
      duplication is pervasive but per-key copy counts are modest
      (200k-doc replicated smoke: 39-46k docs/s vs 27k for "join") —
      the cost is that window functions have no partial aggregation
      and no AQE skew handling, so ONE window repeated millions of
      times (hot boilerplate) serializes its copies into one task.
    - ``"join"``: map-side-combined per-key count filtered to the
      duplicated-key table, semi-joined back (AQE: broadcast when the
      dup-key table is small, skew-split sort-merge otherwise —
      verified BroadcastHashJoin LeftSemi on the fixture). Straggler-
      proof, but when duplication is pervasive the dup-key table is
      nearly as big as the window table and the join re-shuffles the
      windows — two big shuffles vs one, measured ~1.6x slower on the
      smoke corpus. Choose it when the corpus carries hot boilerplate.

    ``key_mode``:

    - ``"hash"`` (production default): windows are reduced map-side to
      ``xxhash64`` keys, so shuffled rows carry ~24 bytes
      (id, pos, key) instead of an L-word string — at L=15 that is a
      ~30-60x shuffle-byte cut on typical English text.
    - ``"text"``: groups on the window string itself — the
      collision-free oracle form (DuckDB recomputes it verbatim;
      xxhash64 is not portable). tests/test_dedup_spans.py pins
      hash == text on the fixture corpus.

    ``token_col``: slide over a caller-tokenized array column instead
    of space-split words (see `window_keys`); span positions are then
    token positions.
    """
    keyed = window_keys(
        docs, window_words, id_col, text_col, key_mode, token_col=token_col
    )
    dup = _flag_dup(keyed, flag_mode)
    return _merge_spans(dup, int(window_words), id_col).select(
        id_col,
        "span_start",
        "span_end_excl",
        (F.col("span_end_excl") - F.col("span_start")).alias("span_words"),
        "n_windows",
    )


def window_keys(
    docs: DataFrame,
    window_words: int,
    id_col: str,
    text_col: str,
    key_mode: str,
    carry_cols: list[str] | None = None,
    token_col: str | None = None,
) -> DataFrame:
    """(id, pos, __k[, carry...]): every sliding L-word window of every
    document, keyed for the duplicate shuffle. Hash mode drops the
    window text BEFORE the shuffle so the exchange carries only
    (id, pos, key). ``carry_cols`` ride along per window (e.g. source
    for provenance attribution) — cheaper than joining them back onto
    the window table afterwards (that join would re-shuffle every
    window row by doc id).

    ``token_col`` (VERDICT r7 #5): when set, windows slide over the
    caller-tokenized ``array<...>`` column (BPE ids from
    `text.encode_token_ids`, characters, code tokens) instead of
    ``split(text_col, ' ')`` — Lee et al.'s token-level semantics for
    corpora where space tokenization is wrong (CJK, code). Hash mode
    hashes the window slice directly (`xxhash64` accepts arrays);
    "text" mode keys on the slice itself — arrays group/join exactly
    in both engines, so the oracle form carries over unchanged."""
    if key_mode not in ("hash", "text"):
        raise ValueError(f"key_mode must be 'hash' or 'text': {key_mode!r}")
    carry = list(carry_cols or [])
    L = int(window_words)
    if token_col is not None:
        toks = F.col(token_col)
        wins = docs.where(F.size(toks) >= L).select(
            F.col(id_col),
            *carry,
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.size(toks) - L),
                    lambda i: F.slice(toks, i + 1, L),
                )
            ).alias("pos", "win"),
        )
    else:
        words = F.split(F.col(text_col), " ")
        wins = docs.where(F.size(words) >= L).select(
            F.col(id_col),
            *carry,
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.size(words) - L),
                    lambda i: F.array_join(F.slice(words, i + 1, L), " "),
                )
            ).alias("pos", "win"),
        )
    key = F.xxhash64("win") if key_mode == "hash" else F.col("win")
    return wins.select(id_col, *carry, "pos", key.alias("__k"))


def _flag_dup(keyed: DataFrame, flag_mode: str) -> DataFrame:
    """Rows of the window-key table whose key occurs more than once.
    Two measured plans with identical semantics — see
    `repeated_ngram_spans`' docstring for the trade: "window" = one
    shuffle, hot-key straggler risk; "join" = map-side-combined agg +
    AQE semi-join back, straggler-proof but a second big shuffle when
    duplication is pervasive."""
    if flag_mode == "window":
        return keyed.withColumn(
            "__dup", F.count(F.lit(1)).over(Window.partitionBy("__k")) > 1
        ).where("__dup").drop("__dup")
    if flag_mode == "join":
        dup_keys = (
            keyed.groupBy("__k")
            .agg(F.count(F.lit(1)).alias("__c"))
            .where(F.col("__c") > 1)
            .select("__k")
        )
        return keyed.join(dup_keys, "__k", "left_semi")
    raise ValueError(f"flag_mode must be 'window' or 'join': {flag_mode!r}")


def _first_occurrence(
    keyed: DataFrame,
    okey: Column,
    flag_mode: str,
    extra_aggs: list | None = None,
):
    """Later occurrences of duplicated keys: rows where ``okey`` is not
    the key's ``min(okey)``, restricted to keys with count > 1 — under
    either flag plan. Returns the keyed rows joined/annotated with
    ``__first`` (and any ``extra_aggs``, e.g. the first occurrence's
    source), filtered to later occurrences."""
    aggs = extra_aggs or []  # list of (aggregate Column, output name)
    if flag_mode == "window":
        wk = Window.partitionBy("__k")
        cols = [F.min(okey).over(wk).alias("__first")] + [
            a.over(wk).alias(name) for a, name in aggs
        ]
        return (
            keyed.select("*", *cols)
            .withColumn(
                "__later",
                (F.count(F.lit(1)).over(wk) > 1)
                & (okey != F.col("__first")),
            )
            .where("__later")
            .drop("__later")
        )
    if flag_mode == "join":
        firsts = (
            keyed.groupBy("__k")
            .agg(
                F.count(F.lit(1)).alias("__c"),
                F.min(okey).alias("__first"),
                *[a.alias(name) for a, name in aggs],
            )
            .where(F.col("__c") > 1)
            .drop("__c")
        )
        return keyed.join(firsts, "__k").where(okey != F.col("__first"))
    raise ValueError(f"flag_mode must be 'window' or 'join': {flag_mode!r}")


def _merge_spans(flagged: DataFrame, L: int, id_col: str) -> DataFrame:
    """Gaps-and-islands over flagged window positions: windows at pos p
    cover words [p, p+L); a new span starts when the gap to the
    previous flagged window exceeds L (touching intervals
    [p0,p0+L) + [p0+L,p0+2L) union contiguously). Returns one row per
    maximal span: (id, span_start, span_end_excl, n_windows), longs."""
    wd = Window.partitionBy(id_col).orderBy("pos")
    brk = (
        F.when(F.lag("pos").over(wd).isNull(), 1)
        .when(F.col("pos") > F.lag("pos").over(wd) + L, 1)
        .otherwise(0)
    )
    grp = flagged.withColumn(
        "__grp",
        F.sum(brk).over(wd.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        grp.groupBy(id_col, "__grp")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + L).cast("long").alias("span_end_excl"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select(id_col, "span_start", "span_end_excl", "n_windows")
    )


def repeated_span_removal(
    docs: DataFrame,
    window_words: int = 15,
    id_col: str = "doc_id",
    text_col: str = "text",
    key_mode: str = "hash",
    flag_mode: str = "window",
    token_col: str | None = None,
) -> DataFrame:
    """The removal half of ExactSubstr dedup (Lee et al.,
    arXiv:2107.06499): every duplicated ``window_words``-word window
    keeps its globally FIRST occurrence (ordered by (doc, pos)); later
    copies are merged into maximal removal spans per document and the
    surviving words are stitched back. The any-alignment counterpart
    of `segment_dedup`'s grid-aligned removal — a duplicate shifted by
    one word still dies here.

    Returns one row per input document: ``(id_col, n_words,
    removed_words, n_spans, clean_text)`` — documents without
    removals pass through with ``removed_words = 0`` and their
    original text.

    ``token_col`` (VERDICT r7 #5): dedupe over a caller-tokenized
    ``array<...>`` column (BPE ids, characters for no-space scripts,
    code tokens) instead of space-split words. The output is then
    ``(id_col, n_tokens, removed_tokens, n_spans, clean_tokens)`` with
    ``clean_tokens`` the surviving token array — the caller owns
    detokenization, exactly as it owned tokenization.

    Scale (100 TB): the first-occurrence rule is ``min(struct(doc,
    pos))`` per duplicated key (the `segment_dedup` order key; no
    packed-bigint overflow), computed under either ``flag_mode`` plan
    — see `repeated_ngram_spans`' docstring for the measured
    window-vs-join trade (`_first_occurrence` implements both, pytest
    pins their equality) — then the doc-keyed island merge over
    flagged rows and ONE doc-keyed join to attach the bounded per-doc
    span list; reconstruction is a map-only array filter
    (O(words x spans) per doc, spans tiny)."""
    L = int(window_words)
    keyed = window_keys(
        docs, L, id_col, text_col, key_mode, token_col=token_col
    )
    okey = F.struct(F.col(id_col).alias("d"), F.col("pos").alias("p"))
    marked = _first_occurrence(keyed, okey, flag_mode).select(id_col, "pos")
    unit = "token" if token_col is not None else "word"
    spans = (
        _merge_spans(marked, L, id_col)
        .groupBy(id_col)
        .agg(
            F.collect_list(
                F.struct("span_start", "span_end_excl")
            ).alias("__spans"),
            F.sum(
                F.col("span_end_excl") - F.col("span_start")
            ).alias(f"removed_{unit}s"),
            F.count(F.lit(1)).alias("n_spans"),
        )
    )
    seq = (
        F.col(token_col)
        if token_col is not None
        else F.split(F.col(text_col), " ")
    )
    empty = F.array().cast(
        "array<struct<span_start: bigint, span_end_excl: bigint>>"
    )
    sp = F.coalesce(F.col("__spans"), empty)
    kept = F.filter(
        F.zip_with(
            seq,
            F.sequence(F.lit(0), F.size(seq) - 1),
            lambda w, i: F.struct(w.alias("w"), i.alias("i")),
        ),
        lambda x: ~F.exists(
            sp,
            lambda s: (x["i"] >= s["span_start"])
            & (x["i"] < s["span_end_excl"]),
        ),
    )
    clean = (
        F.transform(kept, lambda x: x["w"]).alias("clean_tokens")
        if token_col is not None
        else F.array_join(
            F.transform(kept, lambda x: x["w"]), " "
        ).alias("clean_text")
    )
    return docs.join(spans, id_col, "left").select(
        id_col,
        F.size(seq).cast("long").alias(f"n_{unit}s"),
        F.coalesce(f"removed_{unit}s", F.lit(0)).cast("long").alias(
            f"removed_{unit}s"
        ),
        F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
        clean,
    )


def cross_source_span_matrix(
    docs: DataFrame,
    window_words: int = 15,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    key_mode: str = "hash",
    flag_mode: str = "window",
    token_col: str | None = None,
) -> DataFrame:
    """Window-level copy-provenance: for every duplicated
    ``window_words``-word window, attribute its LATER occurrences to
    the source of its globally-first occurrence — "whose content
    reappears where". The span-granular sibling of
    `cross_source_dup_matrix` (whole-doc hashes): a page that quotes
    one paragraph from another source shows up here and not there.

    Returns one row per (origin, copier) pair — including the
    diagonal, self-copying within a source:
    ``(src_first, src_later, n_windows, n_docs)`` where n_windows
    counts later-occurrence windows and n_docs the distinct copying
    documents.

    Scale: first-occurrence (doc, pos) AND its source come from
    `min(struct)` / `min_by(source, struct)` per duplicated key,
    under either ``flag_mode`` plan (see `repeated_ngram_spans` for
    the measured window-vs-join trade; the DuckDB oracle's
    `first_value` window is the semantics statement, not the plan).
    The final matrix is an O(sources^2)-row aggregate."""
    sel = [id_col, source_col] + (
        [token_col] if token_col is not None else [text_col]
    )
    keyed_src = window_keys(
        docs.select(*sel),
        window_words, id_col, text_col, key_mode,
        carry_cols=[source_col],
        token_col=token_col,
    )
    okey = F.struct(F.col(id_col).alias("d"), F.col("pos").alias("p"))
    marked = _first_occurrence(
        keyed_src,
        okey,
        flag_mode,
        extra_aggs=[(F.min_by(F.col(source_col), okey), "src_first")],
    ).select(id_col, F.col(source_col).alias("src_later"), "src_first")
    return (
        marked.groupBy("src_first", "src_later")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.countDistinct(id_col).alias("n_docs"),
        )
    )
