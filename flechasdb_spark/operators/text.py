"""Text-analysis operators for large-scale training-data pipelines:
tokenization, token/char stats, quality scoring, language ID, and
document fingerprinting — all pure Catalyst expressions (JVM-side,
no UDFs), each with an exactly-recomputable DuckDB oracle.

Extension surface (no reference counterpart — the reference is a vector
DB); designed per the task brief's LLM-pipeline requirements. At 100 TB
these are embarrassingly parallel map-side ops: no shuffle, no skew,
full whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from flechasdb_spark.functions.texthash import MERSENNE_P, md5_long

__all__ = [
    "build_vocab",
    "gopher_quality_filter",
    "GOPHER_REQUIRED_STOPWORDS",
    "encode_token_ids",
    "decode_token_ids",
    "length_bucket_batches",
    "chunk_text_udtf",
    "scrub_pii",
    "pii_counts",
    "PII_PATTERNS",
    "tokens",
    "token_stats",
    "bpe_ish_tokens",
    "bpe_token_stats",
    "BPE_ISH_PATTERN",
    "quality_score",
    "unigram_logprob_score",
    "bigram_backoff_score",
    "ppl_band_select",
    "lang_id",
    "doc_fingerprint",
    "repetition_stats",
    "tfidf_top_terms",
    "source_token_kl",
    "vocab_coverage",
    "unigram_lm_tables",
    "batch_source_kl",
    "pmi_collocations",
    "STOPWORDS",
]

# Small fixed stopword sets (top function words) for the n-gram-free
# language-ID heuristic. Deliberately tiny + frozen: the oracle SQL
# inlines the same lists.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "auf"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"],
    "es": ["el", "la", "los", "las", "es", "un", "una", "en", "por", "que"],
}


def chunk_text_udtf(chunk_size: int = 32, overlap: int = 8):
    """Context-window chunking as a Python UDTF (one input row ->
    many chunk rows): sliding token windows of ``chunk_size`` with
    ``overlap`` tokens of context carry-over — the packing step that
    turns variable-length documents into model-context-sized training
    rows. The table-function analogue of the reference's vector
    chunking (B1, /root/reference/src/vector.rs:24-60: fixed-width
    chunks over a flat buffer).

    UDTF (not explode-over-array) exercises Spark's user table-function
    surface; rows stream out per input row, so no document's full chunk
    list ever materializes as one array value. Use via
    ``df.lateralJoin(Chunk(F.col("text").outer()))`` or register with
    ``spark.udtf.register``. Scale shape: map-only, no shuffle; output
    grows by ~n_tokens/stride rows per doc.

    Returns the decorated UDTF class; columns
    (chunk_idx int, n_tokens bigint, chunk string), chunk_idx 1-based.
    """
    if overlap >= chunk_size:
        raise ValueError(f"overlap {overlap} must be < chunk_size {chunk_size}")
    from pyspark.sql.functions import udtf

    stride = chunk_size - overlap

    class ChunkText:
        def eval(self, text: str):
            toks = [t for t in (text or "").split(" ") if t]
            idx = 0
            for start in range(0, len(toks), stride):
                piece = toks[start : start + chunk_size]
                idx += 1
                yield idx, len(piece), " ".join(piece)

    return udtf(ChunkText, returnType="chunk_idx int, n_tokens bigint, chunk string")


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of lowercased text (empty string -> [])."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.split(F.lower(F.trim(c)), r"\s+")
    return F.when(F.trim(c) == "", F.array().cast("array<string>")).otherwise(t)


# BPE-ish pre-tokenization pattern (the GPT-2 family's shape, ASCII-only
# so Java (Spark) and RE2 (DuckDB) agree): letter runs, digit runs, and
# single non-alphanumeric glyphs each become one token.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_ish_tokens(col: Column | str) -> Column:
    """Regex pre-tokenization (BPE-style splitting, before merges)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(BPE_ISH_PATTERN), 0)


def bpe_token_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Token counting with the BPE-ish regex tokenizer (the brief's
    'whitespace + a BPE-ish regex' pair with token_stats)."""
    t = bpe_ish_tokens(text_col)
    return df.select(
        id_col,
        F.size(t).cast("long").alias("n_bpe_tokens"),
        F.size(F.array_distinct(t)).cast("long").alias("n_distinct_bpe"),
        F.size(F.filter(t, lambda x: x.rlike("^[0-9]+$")))
        .cast("long")
        .alias("n_number_tokens"),
        F.size(F.filter(t, lambda x: x.rlike("^[^A-Za-z0-9]$")))
        .cast("long")
        .alias("n_symbol_tokens"),
    )


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document token/char statistics (token counting per the brief;
    a BPE-ish proxy ``n_subtokens`` counts 4-char chunks, the common
    tokens-per-word heuristic)."""
    t = tokens(text_col)
    n_tok = F.size(t)
    n_chars = F.length(F.col(text_col))
    return df.select(
        id_col,
        n_tok.cast("long").alias("n_tokens"),
        n_chars.cast("long").alias("n_chars"),
        F.round(
            F.when(n_tok == 0, F.lit(0.0)).otherwise(
                F.aggregate(t, F.lit(0.0), lambda acc, x: acc + F.length(x))
                / n_tok
            ),
            4,
        ).alias("avg_token_len"),
        F.ceil(n_chars / F.lit(4.0)).cast("long").alias("n_subtokens"),
        F.size(F.array_distinct(t)).cast("long").alias("n_distinct_tokens"),
    )


def _all_ngrams(t: Column, n: int) -> Column:
    """Word n-grams WITH duplicates (repetition_stats needs the
    multiset; dedup.word_ngrams is the distinct variant)."""
    m = F.size(t)
    idx = F.sequence(F.lit(1), F.greatest(m - n + 1, F.lit(0)))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(t, i, n), " "))
    return F.when(m < n, F.array().cast("array<string>")).otherwise(grams)


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals: per-document fraction of
    DUPLICATE word n-grams (n=2,3) — boilerplate/spam documents repeat
    phrases, and 'duplicate n-gram fraction' is the standard filter
    rule. Pure Catalyst, map-only."""
    t = tokens(text_col)
    cols = [F.col(id_col)]
    for n in (2, 3):
        grams = _all_ngrams(t, n)
        total = F.size(grams)
        distinct = F.size(F.array_distinct(grams))
        ratio = F.when(
            total > 0,
            F.round(
                1.0 - distinct.cast("double") / total.cast("double"), 4
            ),
        ).otherwise(F.lit(0.0))
        cols.append(total.cast("long").alias(f"n_{n}grams"))
        cols.append(ratio.alias(f"dup_{n}gram_ratio"))
    return df.select(*cols)


def quality_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Heuristic document quality in [0,1]:
      0.4 * min(1, n_tokens/50)            (length credit)
    + 0.3 * (1 - punct_ratio)              (low symbol noise)
    + 0.3 * min(1, 5 * stopword_ratio)     (natural-language-ness)
    Frozen formula; the oracle recomputes it exactly."""
    t = tokens(text_col)
    n_tok = F.size(t)
    n_chars = F.length(F.col(text_col))
    n_punct = n_chars - F.length(
        F.regexp_replace(F.col(text_col), r"[^\w\s]", "")
    )
    punct_ratio = F.when(n_chars == 0, F.lit(0.0)).otherwise(n_punct / n_chars)
    en = STOPWORDS["en"]
    n_stop = F.size(
        F.filter(t, lambda x: x.isin(en))
    )
    stop_ratio = F.when(n_tok == 0, F.lit(0.0)).otherwise(n_stop / n_tok)
    score = (
        0.4 * F.least(F.lit(1.0), n_tok / F.lit(50.0))
        + 0.3 * (1.0 - punct_ratio)
        + 0.3 * F.least(F.lit(1.0), 5.0 * stop_ratio)
    )
    # +1e-9 before rounding: the formula's rationals frequently land
    # exactly on a half boundary at 4 decimals (e.g. 0.86875) where
    # Spark and DuckDB doubles disagree by one ulp; the bias pushes both
    # engines to the same side deterministically.
    eps = F.lit(1e-9)
    return df.select(
        id_col,
        F.round(
            F.when(n_tok == 0, F.lit(0.0)).otherwise(stop_ratio) + eps, 4
        ).alias("stopword_ratio"),
        F.round(punct_ratio + eps, 4).alias("punct_ratio"),
        F.round(score + eps, 4).alias("quality"),
    )


def _lm_literal_budget() -> int:
    """Model-entry budget for the literal LM scorers (driver-collected
    rows; 256k entries of token + int64 is a few MB)."""
    import os

    return int(os.environ.get("SPARK_GRAFT_LM_LITERAL_MAX", "262144"))


def _collect_bounded(df: DataFrame, budget: int):
    """All rows, or None when the table exceeds ``budget`` (one
    limit-bounded job — the `_small_centroid_rows` pattern)."""
    rows = df.limit(budget + 1).collect()
    if len(rows) > budget:
        return None
    return rows


def unigram_logprob_score(
    df: DataFrame,
    reference: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    impl: str = "auto",
) -> DataFrame:
    """CCNet-style LM quality signal with a RELATIONAL unigram language
    model (Wenzek et al. 2020 use a KenLM 5-gram; the unigram form is
    the engine-exact member of the same family): train add-one-smoothed
    token probabilities on ``reference`` (default: ``df`` itself), then
    score every document by its total and mean negative log-likelihood.
    Low mean NLL ~ looks like the reference corpus; the standard
    pipeline move is to keep the head/middle perplexity buckets and
    drop the tail.

    Determinism (same contract as DSIR): each vocabulary entry's
    log-prob is quantized ONCE to integer micro-nats
    (round(1e6 * ln((c+1)/(N+V)))), so every per-doc sum is an
    order-independent INTEGER sum; unseen tokens take the smoothing
    floor round(1e6 * ln(1/(N+V))). The mean is one exact integer
    division rounded to 4 decimals at the end.

    Scale (100 TB): reference token counts are ONE partial-agg pass
    collapsing to O(V) rows; (N, V) totals broadcast as a 1-row table;
    scoring explodes the doc tokens once and meets the O(V) log-prob
    table in an equi-join keyed on the token — AQE broadcasts it while
    V is small and falls back to a linear shuffle join keyed on the
    token when the vocabulary outgrows broadcast (no driver state
    either way); the per-doc sum is map-side combinable. No window, no
    skew beyond natural token frequency (mitigated by the same
    map-side combine).

    Returns (id_col, n_tokens, nll_micro_nats, mean_nll, seen_ratio);
    empty documents score nll 0 / mean 0.0 / seen_ratio 1.0 by
    convention.

    r13 (guide §2.4 + §4.2, VERDICT r12 #5 — NB's literal-model
    recipe): the trained table is O(V) integer micro-nats, so when V
    fits the driver budget ($SPARK_GRAFT_LM_LITERAL_MAX, default
    262144 entries) it is collected once and scoring runs as ONE
    Arrow-batched map pass — tokenization stays the codegen SQL
    expression, the kernel only does dict lookups over the batch's
    UNIQUE tokens plus exact int64 segment sums, and the ratio
    columns keep the identical SQL expressions over the kernel's
    integer outputs. Crucially every log/round is still evaluated BY
    THE JVM at train time (the collected lq values); the kernel never
    touches a transcendental, so scores are bit-identical to the
    explode + join + aggregate shape, which remains the fallback for
    an over-budget vocabulary (``impl="relational"`` forces it).
    """
    if impl not in ("auto", "literal", "relational"):
        raise ValueError(f"unknown impl: {impl!r}")
    ref = reference if reference is not None else df
    rtok = ref.select(F.explode(tokens(text_col)).alias("__tok"))
    counts = rtok.groupBy("__tok").agg(F.count(F.lit(1)).alias("__c"))
    totals = counts.agg(
        F.sum("__c").alias("__n"), F.count(F.lit(1)).alias("__v")
    )
    lp = counts.crossJoin(F.broadcast(totals)).select(
        "__tok",
        F.round(
            (F.log(F.col("__c") + 1) - F.log(F.col("__n") + F.col("__v")))
            * 1e6
        )
        .cast("long")
        .alias("__lq"),
    )
    floor_lq = (
        totals.select(
            F.round(-F.log(F.col("__n") + F.col("__v")) * 1e6)
            .cast("long")
            .alias("__floor")
        )
    )
    if impl != "relational":
        # one bounded collect: the lq table plus the floor as a
        # NULL-token row (tokens are never null, so the key is free)
        model_rows = _collect_bounded(
            lp.unionByName(
                floor_lq.select(
                    F.lit(None).cast("string").alias("__tok"),
                    F.col("__floor").alias("__lq"),
                )
            ),
            _lm_literal_budget(),
        )
        if model_rows is None and impl == "literal":
            raise ValueError(
                "vocabulary exceeds SPARK_GRAFT_LM_LITERAL_MAX — use "
                "impl='relational' or 'auto'"
            )
        if model_rows is not None:
            floor = next(
                int(r["__lq"]) for r in model_rows if r["__tok"] is None
            )
            lq_map = {
                r["__tok"]: int(r["__lq"])
                for r in model_rows
                if r["__tok"] is not None
            }
            return _unigram_kernel_score(df, lq_map, floor, text_col, id_col)
    dtok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("__tok"))
    scored = (
        dtok.join(lp, "__tok", "left")
        .crossJoin(F.broadcast(floor_lq))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (-F.sum(F.coalesce(F.col("__lq"), F.col("__floor")))).alias(
                "nll_micro_nats"
            ),
            F.sum(
                F.when(F.col("__lq").isNotNull(), 1).otherwise(0)
            ).alias("__seen"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("nll_micro_nats", F.lit(0))
            .cast("long")
            .alias("nll_micro_nats"),
            F.round(
                F.when(F.coalesce("n_tokens", F.lit(0)) == 0, F.lit(0.0))
                .otherwise(
                    F.col("nll_micro_nats") / F.col("n_tokens") / 1e6
                ),
                4,
            ).alias("mean_nll"),
            F.round(
                F.when(F.coalesce("n_tokens", F.lit(0)) == 0, F.lit(1.0))
                .otherwise(F.col("__seen") / F.col("n_tokens")),
                4,
            ).alias("seen_ratio"),
        )
    )


def _unigram_kernel_score(
    df: DataFrame, lq_map: dict, floor: int, text_col: str, id_col: str
) -> DataFrame:
    """One-map-pass unigram NLL scoring against a collected integer
    model (see `unigram_logprob_score` — literal path): the kernel
    receives the SQL-tokenized arrays, looks up each batch's UNIQUE
    tokens in the model dict, and accumulates exact int64 sums; ratio
    columns are the same SQL expressions as the relational form."""
    import numpy as np
    import pandas as pd

    toks_expr = F.coalesce(tokens(text_col), F.array())

    @F.pandas_udf(
        "struct<n_tokens:long, nll:long, seen:long>",
        F.PandasUDFType.SCALAR,
    )
    def _score(tokens_s):
        n = len(tokens_s)
        lists = [t if t is not None else [] for t in tokens_s]
        lens = np.array([len(t) for t in lists], dtype=np.int64)
        nll = np.zeros(n, dtype=np.int64)
        seen = np.zeros(n, dtype=np.int64)
        if lens.sum():
            flat = np.concatenate(
                [np.asarray(t, dtype=object) for t in lists if len(t)]
            )
            uniq, inv = np.unique(flat, return_inverse=True)
            u_lq = np.array(
                [lq_map.get(t, floor) for t in uniq], dtype=np.int64
            )
            u_seen = np.array(
                [1 if t in lq_map else 0 for t in uniq], dtype=np.int64
            )
            rows = np.repeat(np.arange(n), lens)
            np.add.at(nll, rows, -u_lq[inv])
            np.add.at(seen, rows, u_seen[inv])
        return pd.DataFrame(
            {"n_tokens": lens, "nll": nll, "seen": seen}
        )

    out = df.select(F.col(id_col), _score(toks_expr).alias("__lm"))
    nt = F.col("__lm")["n_tokens"]
    return out.select(
        id_col,
        nt.cast("long").alias("n_tokens"),
        F.col("__lm")["nll"].cast("long").alias("nll_micro_nats"),
        F.round(
            F.when(nt == 0, F.lit(0.0)).otherwise(
                F.col("__lm")["nll"] / nt / 1e6
            ),
            4,
        ).alias("mean_nll"),
        F.round(
            F.when(nt == 0, F.lit(1.0)).otherwise(F.col("__lm")["seen"] / nt),
            4,
        ).alias("seen_ratio"),
    )


def ppl_band_select(
    df: DataFrame,
    reference: DataFrame | None = None,
    lo_frac: float = 0.33,
    hi_frac: float = 0.67,
    nll_hi: float = 20.0,
    num_buckets: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet's perplexity-bucket split (Wenzek et al. 2020 §4.3): score
    every document with the relational LM (``unigram_logprob_score``),
    estimate the ``lo_frac``/``hi_frac`` mean-NLL quantile thresholds
    with the fixed-grid histogram sketch (``sketch.histogram_
    quantiles`` over [0, nll_hi) nats), and label each document
    ``head`` (< q_lo), ``middle`` (< q_hi) or ``tail`` — the standard
    pipeline keeps head+middle and drops the tail.

    Everything is the deterministic form of its family: integer
    micro-nat NLL sums, fixed-grid interpolated quantiles (never
    engine-private KLL), band edges compared on identically-rounded
    doubles — so the oracle reproduces the exact band of every doc.

    Scale: the LM pass is the token-grain shuffle analyzed in
    ``unigram_logprob_score``; the sketch collapses to
    O(num_buckets) rows; the two thresholds broadcast as one row. No
    sort, no window over the corpus.

    Returns (id_col, mean_nll, band).
    """
    from flechasdb_spark.operators.sketch import histogram_quantiles

    scored = unigram_logprob_score(
        df, reference, text_col=text_col, id_col=id_col
    )
    qs = histogram_quantiles(
        scored,
        "mean_nll",
        probs=[float(lo_frac), float(hi_frac)],
        lo=0.0,
        hi=float(nll_hi),
        num_buckets=num_buckets,
    )
    th = qs.agg(
        F.min(
            F.when(F.col("prob") == float(lo_frac), F.col("q_est"))
        ).alias("__qlo"),
        F.min(
            F.when(F.col("prob") == float(hi_frac), F.col("q_est"))
        ).alias("__qhi"),
    )
    return scored.crossJoin(F.broadcast(th)).select(
        id_col,
        "mean_nll",
        F.when(F.col("mean_nll") < F.col("__qlo"), F.lit("head"))
        .when(F.col("mean_nll") < F.col("__qhi"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("band"),
    )


def bigram_backoff_score(
    df: DataFrame,
    reference: DataFrame | None = None,
    alpha: float = 0.4,
    text_col: str = "text",
    id_col: str = "doc_id",
    impl: str = "auto",
) -> DataFrame:
    """Stupid-backoff BIGRAM language-model scoring (Brants et al.
    2007, "Large Language Models in Machine Translation" §4 — the
    score function built for distributed corpus-scale LMs precisely
    because it needs no normalization pass): per token position,

    - S(w | u) = c(u,w) / c(u)            when the bigram was seen,
    - S(w | u) = alpha * P1(w)            otherwise (backoff),
    - first token of a doc scores P1(w),

    where P1 is the add-one-smoothed unigram (c(w)+1)/(N+V) with floor
    1/(N+V) for unseen words — the sharper, context-aware sibling of
    ``unigram_logprob_score`` in the CCNet quality-scoring family.

    Determinism: every DISTINCT model value is quantized once to
    integer micro-nats — bigram entries round(1e6*ln(c_uv/c_u)),
    unigram entries round(1e6*ln((c+1)/(N+V))), and the backoff
    penalty round(1e6*ln(alpha)) computed driver-side — so per-doc
    scores are order-independent integer sums DuckDB reproduces
    exactly.

    Scale (100 TB): bigrams come from a lag window PARTITIONED BY
    DOCUMENT (bounded by doc length — one shuffle on the doc id,
    never a corpus-wide sort); reference counts collapse to O(V) and
    O(bigram-types) rows met by equi-joins on the token / token-pair
    key (AQE broadcasts while small, linear shuffle join beyond); the
    per-doc sum is map-side combinable.

    Returns (id_col, n_tokens, nll_micro_nats, mean_nll,
    bigram_hit_ratio); empty docs score 0 / 0.0 / 1.0.

    r13 (guide §2.4 + §4.2, VERDICT r12 #5): with the unigram table
    (O(V)) AND the bigram table (O(types)) inside the driver budget,
    both are collected once and scoring runs as ONE Arrow map pass of
    pure integer lookups/sums — every log/round is still the JVM's
    (collected lq values), the kernel computes no transcendental, so
    per-token addends and therefore every output are bit-identical to
    the lag-window + three-join shape, which stays as the over-budget
    fallback (``impl="relational"`` forces it). The SCORING side's lag
    window disappears (pairs are adjacent array elements inside the
    kernel); the reference-side window that trains the model is
    unchanged.
    """
    import math

    if impl not in ("auto", "literal", "relational"):
        raise ValueError(f"unknown impl: {impl!r}")
    lq_alpha = int(round(math.log(float(alpha)) * 1e6))
    ref = reference if reference is not None else df

    def _pairs(frame):
        t = frame.select(
            F.col(id_col), F.posexplode(tokens(text_col)).alias("__p", "__w")
        )
        prev = F.lag("__w").over(
            Window.partitionBy(id_col).orderBy("__p")
        )
        return t.select(id_col, "__p", "__w", prev.alias("__u"))

    rp = _pairs(ref)
    # unigram counts need no positions — a plain explode keeps this
    # branch window-free (Catalyst does not prune the unused lag)
    uni = (
        ref.select(F.explode(tokens(text_col)).alias("__w"))
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    totals = uni.agg(
        F.sum("__c").alias("__n"), F.count(F.lit(1)).alias("__v")
    )
    lp1 = uni.crossJoin(F.broadcast(totals)).select(
        F.col("__w").alias("w1"),
        F.round(
            (F.log(F.col("__c") + 1) - F.log(F.col("__n") + F.col("__v")))
            * 1e6
        )
        .cast("long")
        .alias("__lq1"),
    )
    floor1 = totals.select(
        F.round(-F.log(F.col("__n") + F.col("__v")) * 1e6)
        .cast("long")
        .alias("__floor")
    )
    big = (
        rp.where(F.col("__u").isNotNull())
        .groupBy("__u", "__w")
        .agg(F.count(F.lit(1)).alias("__cuv"))
    )
    # context totals as a window over the O(bigram-types) count table —
    # a groupBy + join would re-derive the token-stream lag window a
    # second time (Catalyst does not share the subtree), turning one
    # corpus pass into two
    cu = F.sum("__cuv").over(Window.partitionBy("__u"))
    lp2 = big.select(
        F.col("__u").alias("u2"),
        F.col("__w").alias("w2"),
        F.round((F.log("__cuv") - F.log(cu)) * 1e6)
        .cast("long")
        .alias("__lq2"),
    )
    if impl != "relational":
        budget = _lm_literal_budget()
        uni_rows = _collect_bounded(
            lp1.unionByName(
                floor1.select(
                    F.lit(None).cast("string").alias("w1"),
                    F.col("__floor").alias("__lq1"),
                )
            ),
            budget,
        )
        big_rows = (
            _collect_bounded(lp2, budget) if uni_rows is not None else None
        )
        if big_rows is None and impl == "literal":
            raise ValueError(
                "model exceeds SPARK_GRAFT_LM_LITERAL_MAX — use "
                "impl='relational' or 'auto'"
            )
        if big_rows is not None:
            floor = next(
                int(r["__lq1"]) for r in uni_rows if r["w1"] is None
            )
            lq1_map = {
                r["w1"]: int(r["__lq1"])
                for r in uni_rows
                if r["w1"] is not None
            }
            lq2_map = {
                (r["u2"], r["w2"]): int(r["__lq2"]) for r in big_rows
            }
            return _bigram_kernel_score(
                df, lq1_map, floor, lq2_map, lq_alpha, text_col, id_col
            )
    dp = _pairs(df)
    scored = (
        dp.join(lp1, dp["__w"] == lp1["w1"], "left")
        .join(
            lp2,
            (dp["__u"] == lp2["u2"]) & (dp["__w"] == lp2["w2"]),
            "left",
        )
        .crossJoin(F.broadcast(floor1))
        .select(
            F.col(id_col),
            F.when(
                F.col("__u").isNull(),
                F.coalesce(F.col("__lq1"), F.col("__floor")),
            )
            .when(F.col("__lq2").isNotNull(), F.col("__lq2"))
            .otherwise(
                F.lit(lq_alpha)
                + F.coalesce(F.col("__lq1"), F.col("__floor"))
            )
            .alias("__lq"),
            F.col("__lq2").isNotNull().cast("long").alias("__hit"),
            (F.col("__u").isNotNull()).cast("long").alias("__isbig"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (-F.sum("__lq")).alias("nll_micro_nats"),
            F.sum("__hit").alias("__nhit"),
            F.sum("__isbig").alias("__nbig"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("nll_micro_nats", F.lit(0))
            .cast("long")
            .alias("nll_micro_nats"),
            F.round(
                F.when(F.coalesce("n_tokens", F.lit(0)) == 0, F.lit(0.0))
                .otherwise(
                    F.col("nll_micro_nats") / F.col("n_tokens") / 1e6
                ),
                4,
            ).alias("mean_nll"),
            F.round(
                F.when(F.coalesce("__nbig", F.lit(0)) == 0, F.lit(1.0))
                .otherwise(F.col("__nhit") / F.col("__nbig")),
                4,
            ).alias("bigram_hit_ratio"),
        )
    )


def _bigram_kernel_score(
    df: DataFrame,
    lq1_map: dict,
    floor: int,
    lq2_map: dict,
    lq_alpha: int,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """One-map-pass stupid-backoff scoring against collected integer
    models (see `bigram_backoff_score` — literal path). Per position:
    first token -> lq1(w)|floor; seen bigram -> lq2(u,w); else
    lq_alpha + (lq1(w)|floor) — the identical integer addends, summed
    per doc in int64."""
    import numpy as np
    import pandas as pd

    toks_expr = F.coalesce(tokens(text_col), F.array())

    @F.pandas_udf(
        "struct<n_tokens:long, nll:long, nhit:long, nbig:long>",
        F.PandasUDFType.SCALAR,
    )
    def _score(tokens_s):
        n = len(tokens_s)
        lists = [
            list(t) if t is not None else [] for t in tokens_s
        ]
        lens = np.array([len(t) for t in lists], dtype=np.int64)
        nll = np.zeros(n, dtype=np.int64)
        nhit = np.zeros(n, dtype=np.int64)
        nbig = np.zeros(n, dtype=np.int64)
        total = int(lens.sum())
        if total:
            flat = np.concatenate(
                [np.asarray(t, dtype=object) for t in lists if len(t)]
            )
            uniq, inv = np.unique(flat, return_inverse=True)
            u_lq1 = np.array(
                [lq1_map.get(t, floor) for t in uniq], dtype=np.int64
            )
            # prev-token index per position; -1 marks doc starts
            prev = np.empty(total, dtype=np.int64)
            prev[0] = -1
            prev[1:] = inv[:-1]
            starts = np.zeros(total, dtype=bool)
            pos = 0
            for ln in lens:
                if ln:
                    starts[pos] = True
                    pos += ln
            prev[starts] = -1
            is_big = ~starts
            # unique (u, w) code pairs -> one dict lookup per distinct
            # pair in the batch
            k = len(uniq)
            codes = (prev + 1) * np.int64(k) + inv  # 0 when doc start
            ucodes, cinv = np.unique(codes, return_inverse=True)
            u_lq2 = np.full(len(ucodes), np.iinfo(np.int64).min,
                            dtype=np.int64)
            for i, c in enumerate(ucodes):
                ui = int(c) // k - 1
                if ui >= 0:
                    v = lq2_map.get((uniq[ui], uniq[int(c) % k]))
                    if v is not None:
                        u_lq2[i] = v
            lq2 = u_lq2[cinv]
            hit = is_big & (lq2 != np.iinfo(np.int64).min)
            backoff = np.int64(lq_alpha) + u_lq1[inv]
            lq = np.where(
                ~is_big, u_lq1[inv], np.where(hit, lq2, backoff)
            )
            rows = np.repeat(np.arange(n), lens)
            np.add.at(nll, rows, -lq)
            np.add.at(nhit, rows, hit.astype(np.int64))
            np.add.at(nbig, rows, is_big.astype(np.int64))
        return pd.DataFrame(
            {"n_tokens": lens, "nll": nll, "nhit": nhit, "nbig": nbig}
        )

    out = df.select(F.col(id_col), _score(toks_expr).alias("__lm"))
    nt = F.col("__lm")["n_tokens"]
    nb = F.col("__lm")["nbig"]
    return out.select(
        id_col,
        nt.cast("long").alias("n_tokens"),
        F.col("__lm")["nll"].cast("long").alias("nll_micro_nats"),
        F.round(
            F.when(nt == 0, F.lit(0.0)).otherwise(
                F.col("__lm")["nll"] / nt / 1e6
            ),
            4,
        ).alias("mean_nll"),
        F.round(
            F.when(nb == 0, F.lit(1.0)).otherwise(
                F.col("__lm")["nhit"] / nb
            ),
            4,
        ).alias("bigram_hit_ratio"),
    )


def kneser_ney_score(
    df: DataFrame,
    reference: DataFrame | None = None,
    discount: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Interpolated Kneser-Ney BIGRAM language-model scoring (Kneser &
    Ney 1995; Chen & Goodman 1999 §2.7) — the smoothing family CCNet's
    actual KenLM scorer belongs to, one step up in fidelity from
    ``bigram_backoff_score``'s stupid backoff:

    - seen context u:  P(w|u) = (max(c(u,w) - D, 0)
                                 + D * N1+(u,*) * Pc(w)) / c(u)
    - first token, or u unseen as a context:  P(w) = Pc(w)

    where ``Pc`` is the CONTINUATION probability — how many distinct
    contexts a word follows, not how often it occurs — add-one
    smoothed over the bigram-type table so unseen words keep a
    positive floor:

        Pc(w) = (N1+(*,w) + 1) / (N1+(*,*) + Vc + 1)
        floor = 1 / (N1+(*,*) + Vc + 1)

    with ``Vc`` the number of distinct continuation words. Training
    therefore needs ONLY the bigram-type table: no unigram pass at
    all (the classic KN insight — "Francisco" is frequent but follows
    only "San", so its continuation mass is tiny).

    Determinism: the probability for each token is one fixed-shape
    double expression over integer counts (D = 0.75 is exactly
    representable in binary), quantized per token to integer
    micro-nats ``round(1e6 * ln(p))`` — per-doc scores are
    order-independent integer sums DuckDB reproduces exactly with the
    identically-parenthesized expression.

    Scale (100 TB): ONE pass over the reference corpus — the lag
    window is partitioned by document (bounded by doc length, one
    shuffle on the doc id), collapsed to the O(bigram-type) model
    table and ``localCheckpoint``ed eagerly; context totals
    (c(u), N1+(u,*)), continuation counts (N1+(*,w)) and the two
    global scalars all derive from the checkpointed model table, so
    no downstream reference re-executes the corpus scan (the same
    materialize-the-model-once move a production LM makes by writing
    its count table to Parquet). Scoring is three equi-joins against
    model tables (AQE broadcasts them while small, linear shuffle
    join beyond) plus a map-side-combinable per-doc sum.

    Returns (id_col, n_tokens, nll_micro_nats, mean_nll,
    kn_hit_ratio); empty docs score 0 / 0.0 / 1.0.
    """
    if float(discount) != 0.75:
        # other discounts are fine for the Spark side, but the paired
        # DuckDB oracle hardcodes 0.75; keep the engine-exact contract
        # explicit rather than silently weaker
        raise ValueError("kneser_ney_score is pinned to discount=0.75")
    ref = reference if reference is not None else df

    def _pairs(frame):
        t = frame.select(
            F.col(id_col), F.posexplode(tokens(text_col)).alias("__p", "__w")
        )
        prev = F.lag("__w").over(Window.partitionBy(id_col).orderBy("__p"))
        return t.select(id_col, "__p", "__w", prev.alias("__u"))

    big = (
        _pairs(ref)
        .where(F.col("__u").isNotNull())
        .groupBy("__u", "__w")
        .agg(F.count(F.lit(1)).alias("__cuv"))
        .localCheckpoint()
    )
    ctx = big.groupBy("__u").agg(
        F.sum("__cuv").alias("__cu"), F.count(F.lit(1)).alias("__n1u")
    )
    cont = big.groupBy("__w").agg(F.count(F.lit(1)).alias("__n1w"))
    tot = cont.agg(
        F.coalesce(F.sum("__n1w"), F.lit(0)).alias("__npt"),
        F.count(F.lit(1)).alias("__vc"),
    )
    dp = _pairs(df)
    denom = F.col("__npt") + F.col("__vc") + 1
    pc = F.coalesce(
        (F.col("__n1w") + 1).cast("double") / denom, F.lit(1.0) / denom
    )
    p_seen = (
        F.greatest(
            F.coalesce(F.col("__cuv"), F.lit(0)) - F.lit(0.75), F.lit(0.0)
        )
        + (F.lit(0.75) * F.col("__n1u")) * pc
    ) / F.col("__cu")
    lq = F.when(
        F.col("__u").isNull() | F.col("__cu").isNull(),
        F.round(F.log(pc) * 1e6).cast("long"),
    ).otherwise(F.round(F.log(p_seen) * 1e6).cast("long"))
    scored = (
        dp.join(big, ["__u", "__w"], "left")
        .join(ctx, "__u", "left")
        .join(cont, "__w", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col(id_col),
            lq.alias("__lq"),
            F.col("__cuv").isNotNull().cast("long").alias("__hit"),
            F.col("__u").isNotNull().cast("long").alias("__isbig"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (-F.sum("__lq")).alias("nll_micro_nats"),
            F.sum("__hit").alias("__nhit"),
            F.sum("__isbig").alias("__nbig"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("nll_micro_nats", F.lit(0))
            .cast("long")
            .alias("nll_micro_nats"),
            F.round(
                F.when(F.coalesce("n_tokens", F.lit(0)) == 0, F.lit(0.0))
                .otherwise(
                    F.col("nll_micro_nats") / F.col("n_tokens") / 1e6
                ),
                4,
            ).alias("mean_nll"),
            F.round(
                F.when(F.coalesce("__nbig", F.lit(0)) == 0, F.lit(1.0))
                .otherwise(F.col("__nhit") / F.col("__nbig")),
                4,
            ).alias("kn_hit_ratio"),
        )
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-vote language ID over {en, de, fr, es}: the language with
    the most stopword occurrences wins (ties -> lexicographic, 'unknown'
    when no stopword matches at all)."""
    # SQL-parsed lambdas with per-language variable names: combining
    # several F.filter(..., lambda x: ...) closures that share the arg
    # name "x" under one greatest() miscompiles (lambda variables
    # cross-resolve and Spark casts tokens to the other list's type).
    d = df.select(id_col, tokens(text_col).alias("__toks"))
    counts = {}
    for lang, sw in STOPWORDS.items():
        inlist = ", ".join(f"'{w}'" for w in sw)
        counts[lang] = F.expr(
            f"size(filter(__toks, tk_{lang} -> tk_{lang} IN ({inlist})))"
        )
    best = F.greatest(*counts.values())
    pred = F.lit("unknown")
    # reverse-lexicographic chain => lexicographically-first wins ties
    for lang in sorted(counts, reverse=True):
        pred = F.when(counts[lang] == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best == 0, F.lit("unknown")).otherwise(pred)
    return d.select(
        id_col,
        pred.alias("pred_lang"),
        best.cast("long").alias("stopword_hits"),
    )


def doc_fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Order-sensitive rolling (Horner) hash of the token stream:
    h = fold(h * 31 + md5_long(token) mod P) mod P, init 0 — two docs
    with the same token sequence collide, reorderings don't."""
    t = tokens(text_col)
    hashed = F.transform(t, lambda x: md5_long(x) % MERSENNE_P)
    fp = F.aggregate(
        hashed,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % MERSENNE_P,
    )
    return df.select(id_col, fp.alias("fingerprint"))


# PII patterns chosen to behave identically under Java regex (Spark)
# and RE2 (DuckDB): no backreferences, no lookaround. Application order
# matters — URLs first so an address inside a URL never half-matches.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("url", r"https?://[^ ]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+\d{1,2}-\d{3}-\d{4}", "<PHONE>"),
]


def scrub_pii(col: Column | str) -> Column:
    """Redact URLs, emails, and phone numbers to typed placeholders —
    the standard pre-training scrub pass. Map-only regexp_replace chain
    (JVM regex under whole-stage codegen, no UDF)."""
    out = F.col(col) if isinstance(col, str) else col
    for _, pat, rep in PII_PATTERNS:
        out = F.regexp_replace(out, pat, rep)
    return out


def pii_counts(col: Column | str) -> list[Column]:
    """Per-kind match counts (``n_urls``, ``n_emails``, ``n_phones``) —
    audit columns for scrub coverage reports."""
    c = F.col(col) if isinstance(col, str) else col
    return [
        F.regexp_count(c, F.lit(pat)).cast("long").alias(f"n_{kind}s")
        for kind, pat, _ in PII_PATTERNS
    ]


def build_vocab(
    df: DataFrame,
    top_n: int = 1000,
    min_count: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Frequency-ranked token vocabulary (the wordcount shape every
    tokenizer-training pipeline starts from): explode tokens, count,
    drop rare tokens, keep the ``top_n`` by (count desc, token asc),
    and assign dense ``token_id`` in that order.

    Scale (100 TB): one shuffle with full map-side combine (counts
    partially aggregate), a TakeOrderedAndProject global top-N (each
    task forwards at most top_n rows), and the row_number window runs
    over the ALREADY-truncated top_n rows — the only single-partition
    stage is O(top_n), never O(corpus).

    Returns (token_id, token, n_docs_is_not_tracked -> count).
    """
    counts = (
        df.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("count"))
        .where(F.col("count") >= min_count)
        .orderBy(F.col("count").desc(), "token")
        .limit(top_n)
    )
    w = Window.orderBy(F.col("count").desc(), "token")
    return counts.select(
        (F.row_number().over(w) - 1).cast("long").alias("token_id"),
        "token",
        "count",
    )


def length_bucket_batches(
    df: DataFrame,
    batch_size: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "lenbatch",
    hash_prefix_len: int = 2,
) -> DataFrame:
    """Length-stratified micro-batching: bucket documents by
    power-of-two token count, then number ``batch_size`` docs at a time
    within each bucket. Training loaders batch this way so sequences in
    a batch have similar lengths and padding waste stays bounded by ~2x,
    instead of pad-to-global-max.

    Intra-bucket order is the deterministic salted-hash order
    ``(md5(salt:id), id)`` — the same order contract ``sequence_pack``
    uses. A hash order (rather than raw id order) is what makes the
    numbering distributable AND doubles as the shuffle training loaders
    want anyway: batches draw uniformly from the bucket instead of
    clustering by ingest order.

    Scale (100 TB): token counting is map-only. Per-bucket numbering is
    the salted two-level scheme (r3 VERDICT item — previously one
    window task per bucket, a single-task sort of the largest bucket):

    1. each row gets a sub-bucket ``__s`` = first ``hash_prefix_len``
       hex chars of its md5 — an ORDER-PRESERVING prefix of the sort
       key, so (``__s`` asc, hash asc) == global hash order;
    2. exact counts per (bucket, sub-bucket) — a partial aggregation,
       O(buckets * 16^prefix) rows to the driver — become exclusive
       within-bucket offsets, broadcast back;
    3. row_number runs per (bucket, sub-bucket): parallelism is
       buckets * 16^prefix tasks (~30 * 256 by default), each sorting
       ~1/256th of a bucket; offset + local rank = exact global rank.

    Output (doc_id, n_tokens, bucket, batch_id) with batch_id globally
    unique via (bucket << 32 | seq DIV batch_size).
    """
    spark = df.sparkSession
    key = F.concat(F.lit(salt), F.lit(":"), F.col(id_col).cast("string"))
    with_len = (
        df.select(
            F.col(id_col),
            F.size(tokens(text_col)).cast("long").alias("n_tokens"),
            F.md5(key).alias("__h"),
        )
        .where(F.col("n_tokens") > 0)
        .withColumn(
            "bucket", F.ceil(F.log2(F.col("n_tokens"))).cast("long")
        )
        .withColumn(
            "__s",
            F.conv(F.substring("__h", 1, hash_prefix_len), 16, 10).cast(
                "long"
            ),
        )
    )
    # NOTE two jobs read with_len (offset counts, then the numbering
    # pass), so tokenization runs twice. Callers batching huge corpora
    # should persist the tokenized projection around this call; the
    # operator itself stays cache-free so a lazily-returned plan never
    # pins executor memory (the r1 lesson). At bench scale the cost is
    # job-count overhead, not compute (SCALING.md §5).
    # exact exclusive offsets per (bucket, sub-bucket): counts are a
    # plain partial agg; only O(buckets * 16^prefix) rows hit the driver
    counts: dict[int, dict[int, int]] = {}
    for r in (
        with_len.groupBy("bucket", "__s")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    ):
        counts.setdefault(r["bucket"], {})[r["__s"]] = r["c"]
    offsets = []
    for b, subs in counts.items():
        acc = 0
        for s in sorted(subs):
            offsets.append((b, s, acc))
            acc += subs[s]
    off_df = F.broadcast(
        spark.createDataFrame(offsets, "bucket long, __s long, __off long")
    )
    w = Window.partitionBy("bucket", "__s").orderBy(
        F.col("__h").asc(), F.col(id_col).asc()
    )
    seq = F.col("__off") + F.row_number().over(w) - 1
    return (
        with_len.join(off_df, ["bucket", "__s"])
        .select(
            id_col,
            "n_tokens",
            "bucket",
            (
                F.shiftleft(F.col("bucket"), 32)
                + F.floor(seq / F.lit(float(batch_size))).cast("long")
            ).cast("long").alias("batch_id"),
        )
    )


def encode_token_ids(
    df: DataFrame,
    vocab: DataFrame,
    unk_id: int = -1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a ``build_vocab`` vocabulary to the corpus: each document
    becomes its token-id sequence (OOV tokens -> ``unk_id``), the step
    between vocabulary training and sequence packing in a training-data
    loader.

    Shape: explode tokens WITH their position, broadcast-join the
    vocabulary (top_n rows — always broadcastable), regroup per doc and
    rebuild the sequence in position order (array_sort on (pos, id)
    structs, so the order is deterministic regardless of shuffle
    arrival). One shuffle on the doc id; empty docs yield empty arrays.

    Returns (id_col, n_tokens, n_unk, token_ids array<bigint>).
    """
    toks = df.select(
        F.col(id_col),
        F.posexplode_outer(tokens(text_col)).alias("__pos", "token"),
    )
    mapped = toks.join(
        F.broadcast(vocab.select("token", "token_id")), "token", "left"
    ).select(
        id_col,
        "__pos",
        F.coalesce(F.col("token_id"), F.lit(int(unk_id))).alias("__tid"),
        F.col("token_id").isNull().cast("int").alias("__unk"),
    )
    agg = mapped.groupBy(id_col).agg(
        F.sum(F.when(F.col("__pos").isNotNull(), 1).otherwise(0)).alias(
            "n_tokens"
        ),
        F.sum(
            F.when(F.col("__pos").isNotNull(), F.col("__unk")).otherwise(0)
        ).alias("n_unk"),
        F.array_sort(
            F.collect_list(
                F.when(
                    F.col("__pos").isNotNull(),
                    F.struct(F.col("__pos"), F.col("__tid")),
                )
            )
        ).alias("__ps"),
    )
    return agg.select(
        F.col(id_col),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_unk").cast("long").alias("n_unk"),
        F.transform(F.col("__ps"), lambda s: s["__tid"].cast("bigint")).alias(
            "token_ids"
        ),
    )


# Gopher rule-set document filter (Rae et al. 2021, "Scaling Language
# Models: ... Gopher", Appendix A — the published heuristic filter
# suite most 100 TB-scale text pipelines start from).
GOPHER_REQUIRED_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_alpha_word_ratio: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher rule-set quality filter: per-document rule signals and the
    conjunctive keep decision (Rae et al. 2021 Appendix A):

    - word count in ``[min_words, max_words]``
    - mean word length in ``[min_mean_word_len, max_mean_word_len]``
    - symbol-to-word ratio (``#`` or ``...`` tokens) <= ``max_symbol_ratio``
    - fraction of lines starting with a bullet <= ``max_bullet_ratio``
    - fraction of lines ending in an ellipsis <= ``max_ellipsis_ratio``
    - fraction of words containing a letter >= ``min_alpha_word_ratio``
    - at least ``min_stop_hits`` distinct required stopwords present

    Pure Catalyst (split / higher-order functions / literal string ops
    only — no UDF, no shuffle): at 100 TB this is an embarrassingly
    parallel map over the corpus scan, composable with ``quality_score``
    and ``repetition_stats`` in one pass. Cross-engine determinism: every
    ratio is an exact-integer division (correctly rounded identically in
    any IEEE engine), and line/bullet/ellipsis tests are literal string
    ops, so the DuckDB oracle reproduces the keep decision bit-for-bit.

    Returns (id_col, n_words, mean_word_len, symbol_ratio, bullet_ratio,
    ellipsis_ratio, alpha_word_ratio, stop_hits, keep), ratios rounded
    to 4 decimals (the keep decision uses the UNROUNDED exact values).
    """
    t = tokens(text_col)
    n_words = F.size(t).cast("long")
    sum_len = F.aggregate(
        t, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    mean_wl = F.when(n_words == 0, F.lit(0.0)).otherwise(
        sum_len.cast("double") / n_words
    )
    n_sym = F.size(
        F.filter(t, lambda x: x.contains("#") | x.contains("..."))
    ).cast("long")
    sym_ratio = F.when(n_words == 0, F.lit(0.0)).otherwise(
        n_sym.cast("double") / n_words
    )
    lines = F.split(F.col(text_col), "\n")
    n_lines = F.size(lines).cast("long")
    bullet_first = F.filter(
        lines,
        lambda l: F.substring(F.ltrim(l), 1, 1).isin("-", "*", "•"),
    )
    ell_last = F.filter(
        lines, lambda l: F.rtrim(l).endswith("...")
    )
    bullet_ratio = F.size(bullet_first).cast("double") / n_lines
    ell_ratio = F.size(ell_last).cast("double") / n_lines
    n_alpha = F.size(F.filter(t, lambda x: x.rlike("[a-z]"))).cast("long")
    alpha_ratio = F.when(n_words == 0, F.lit(0.0)).otherwise(
        n_alpha.cast("double") / n_words
    )
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(t),
            F.array(*[F.lit(w) for w in GOPHER_REQUIRED_STOPWORDS]),
        )
    ).cast("long")
    keep = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len)
        & (sym_ratio <= max_symbol_ratio)
        & (bullet_ratio <= max_bullet_ratio)
        & (ell_ratio <= max_ellipsis_ratio)
        & (alpha_ratio >= min_alpha_word_ratio)
        & (stop_hits >= min_stop_hits)
    )
    return df.select(
        id_col,
        n_words.alias("n_words"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        F.round(sym_ratio, 4).alias("symbol_ratio"),
        F.round(bullet_ratio, 4).alias("bullet_ratio"),
        F.round(ell_ratio, 4).alias("ellipsis_ratio"),
        F.round(alpha_ratio, 4).alias("alpha_word_ratio"),
        stop_hits.alias("stop_hits"),
        keep.alias("keep"),
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document top-k keyword terms by tf-idf (Sparck Jones 1972)
    — the classic keyword extractor next to the corpus-level BM25
    ranker in ``operators/retrieval.py`` (same tf/df statistics, here
    consumed per document instead of per query).

    Determinism (the unigram-LM contract): each term's idf is
    quantized ONCE to integer micro-nats round(1e6 * ln(N / df_t)), so
    the score tf * idf_micro is an exact INTEGER everywhere and the
    ranking can never flip on float summation order; ties break on the
    term string.

    Scale (100 TB): one token-grain partial agg to (doc, term, tf)
    (map-side combinable), one O(V) df table met in a term equi-join
    (AQE broadcasts it while V is small, shuffle-join keyed on the
    term beyond that), and the per-doc top-k window runs over the
    doc's DISTINCT terms — bounded by document vocabulary, never the
    corpus. No driver state.
    """
    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    tf = tok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    ndocs = df.agg(F.count_distinct(F.col(id_col)).alias("__n"))
    idf = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("__df"))
        .crossJoin(F.broadcast(ndocs))
        .select(
            "term",
            F.round((F.log("__n") - F.log("__df")) * 1e6)
            .cast("long")
            .alias("idf_micro"),
        )
    )
    scored = tf.join(idf, "term").withColumn(
        "__sm", F.col("tf") * F.col("idf_micro")
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("__sm").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            id_col,
            "rank",
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.round(F.col("__sm") / 1e6, 4).alias("tfidf"),
        )
    )


def source_token_kl(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source token-distribution drift report: KL(P_s || P_corpus)
    in nats for every source s, where P_s is the source's unigram token
    distribution and P the whole-corpus one. The standard mix-auditing
    signal for a multi-source training corpus — a source whose KL jumps
    between snapshots changed its content mix (scraper drift, encoding
    breakage, template floods) even when row counts look stable.
    KL(P_s||P) = sum_t (c_st/n_s) * ln((c_st/n_s) / (c_t/n)) >= 0,
    zero iff the source matches the corpus distribution exactly; terms
    absent from a source contribute 0 (P_s(t) = 0).

    Determinism: the per-(source, term) log-ratio is quantized ONCE to
    integer micro-nats round(1e6 * (ln(c_st) - ln(n_s) - ln(c_t) +
    ln(n))); each source's sum Σ c_st * lr_micro is then an
    order-independent integer sum, divided exactly once at the end.

    Scale (100 TB): token-grain partial agg to O(S·V) (source, term)
    counts (map-side combinable); per-source totals are O(S) rows
    (broadcast); the O(V) corpus term table meets the counts in a term
    equi-join (AQE broadcast → shuffle fallback); the 1-row corpus
    total broadcasts. The final agg is O(S·V) → O(S). No windows, no
    driver state, no skew beyond natural token frequency (absorbed by
    the map-side combine).
    """
    tok = df.select(
        F.col(source_col).alias("source"),
        F.explode(tokens(text_col)).alias("term"),
    )
    st = tok.groupBy("source", "term").agg(F.count(F.lit(1)).alias("c_st"))
    s_tot = st.groupBy("source").agg(
        F.sum("c_st").alias("n_s"), F.count(F.lit(1)).alias("n_terms")
    )
    t_tot = st.groupBy("term").agg(F.sum("c_st").alias("c_t"))
    g_tot = t_tot.agg(F.sum("c_t").alias("n"))
    lr = (
        st.join(F.broadcast(s_tot.select("source", "n_s")), "source")
        .join(t_tot, "term")
        .crossJoin(F.broadcast(g_tot))
        .select(
            "source",
            "c_st",
            F.round(
                (
                    F.log("c_st")
                    - F.log("n_s")
                    - F.log("c_t")
                    + F.log("n")
                )
                * 1e6
            )
            .cast("long")
            .alias("lr_micro"),
        )
    )
    kl = lr.groupBy("source").agg(
        F.sum(F.col("c_st") * F.col("lr_micro")).alias("__klm")
    )
    return (
        s_tot.join(kl, "source")
        .select(
            "source",
            F.col("n_s").cast("long").alias("n_tokens"),
            F.col("n_terms").cast("long").alias("n_terms"),
            F.round(F.col("__klm") / F.col("n_s") / 1e6, 6).alias("kl_nats"),
        )
        .orderBy("source")
    )


def vocab_coverage(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Per-group tokenizer-vocabulary coverage: how much of each
    source's token stream a fixed vocabulary (``build_vocab`` output,
    or any table with a ``token`` column) fails to cover. The
    pre-training diagnostic that catches a source whose content the
    tokenizer was never trained on (high OOV ratio -> byte-fallback
    blowup in sequence length and degraded loss) BEFORE the tokens hit
    the trainer.

    Scale (100 TB): one token explode (map-only), a broadcast join
    against the O(top_n)-bounded vocabulary, and a map-side-combinable
    per-group agg — no corpus-sized shuffle beyond the group keys.

    Returns (group_col, n_tokens, n_oov, n_oov_types, oov_ratio).
    """
    tok = df.select(
        F.col(group_col), F.explode(tokens(text_col)).alias("token")
    )
    j = tok.join(
        F.broadcast(vocab.select("token", F.lit(1).alias("__in"))),
        "token",
        "left",
    )
    return (
        j.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("__in").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
            F.count_distinct(
                F.when(F.col("__in").isNull(), F.col("token"))
            )
            .cast("long")
            .alias("n_oov_types"),
        )
        .select(
            group_col,
            F.col("n_tokens").cast("long").alias("n_tokens"),
            "n_oov",
            "n_oov_types",
            F.round(F.col("n_oov") / F.col("n_tokens"), 6).alias(
                "oov_ratio"
            ),
        )
        .orderBy(group_col)
    )


def unigram_lm_tables(
    reference: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, int]:
    """Frozen add-one unigram LM as broadcastable tables: the O(V)
    (token, lq_micro) log-prob table (integer micro-nats,
    round(1e6 * ln((c+1)/(N+V))) — the unigram_logprob_score contract)
    plus the unseen-token floor round(1e6 * ln(1/(N+V))). The
    offline-trained reference model for streaming drift monitoring
    (streaming/pipeline.py::stream_token_drift)."""
    rtok = reference.select(F.explode(tokens(text_col)).alias("token"))
    counts = rtok.groupBy("token").agg(F.count(F.lit(1)).alias("__c"))
    tot = counts.agg(
        F.sum("__c").alias("n"), F.count(F.lit(1)).alias("v")
    ).first()
    denom = float(tot["n"] + tot["v"])
    lp = counts.select(
        "token",
        F.round((F.log(F.col("__c") + 1) - F.log(F.lit(denom))) * 1e6)
        .cast("long")
        .alias("lq_micro"),
    )
    import math

    floor_micro = int(round(-math.log(denom) * 1e6))
    return lp, floor_micro


def batch_source_kl(
    batch: DataFrame,
    lp: DataFrame,
    floor_micro: int,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source KL(P_batch_source || Q_reference) in nats against a
    FROZEN smoothed reference LM (`unigram_lm_tables`) — the drift
    score `source_token_kl` computes corpus-internally, here against an
    external reference so it works on a micro-batch. Tokens unseen in
    the reference take the smoothing floor (so KL stays finite and a
    flood of novel tokens shows up as a large, not infinite, jump).

    Determinism: per-(source, term) log-ratio quantized once to
    integer micro-nats; per-source sums are exact integer sums.
    Scale: token partial agg + broadcast O(V) model join per batch.
    """
    tok = batch.select(
        F.col(source_col).alias("source"),
        F.explode(tokens(text_col)).alias("token"),
    )
    st = tok.groupBy("source", "token").agg(F.count(F.lit(1)).alias("c_st"))
    s_tot = st.groupBy("source").agg(F.sum("c_st").alias("n_s"))
    lr = (
        st.join(F.broadcast(s_tot), "source")
        .join(F.broadcast(lp), "token", "left")
        .select(
            "source",
            "c_st",
            (
                F.round((F.log("c_st") - F.log("n_s")) * 1e6).cast("long")
                - F.coalesce(F.col("lq_micro"), F.lit(floor_micro))
            ).alias("lr_micro"),
        )
    )
    kl = lr.groupBy("source").agg(
        F.sum(F.col("c_st") * F.col("lr_micro")).alias("__klm")
    )
    return (
        s_tot.join(kl, "source")
        .select(
            "source",
            F.col("n_s").cast("long").alias("n_tokens"),
            F.round(F.col("__klm") / F.col("n_s") / 1e6, 6).alias("kl_nats"),
        )
        .orderBy("source")
    )


def pmi_collocations(
    df: DataFrame,
    k: int = 50,
    min_count: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k adjacent-bigram collocations by pointwise mutual
    information (Church & Hanks 1990): PMI(u, w) = ln(c_uv * N /
    (c_u * c_w)) over the corpus token stream — the corpus-analysis
    signal for multiword expressions (and, inversely, for template
    boilerplate: a near-deterministic bigram repeated across documents
    scores at the PMI ceiling). ``min_count`` drops unstable rare
    bigrams (classic PMI's low-frequency pathology).

    Determinism: PMI quantized once to integer micro-nats; ranking on
    the integer with (u, w) tie-breaks.

    Scale (100 TB): bigrams from a per-doc lag window (bounded by doc
    length — the bigram_backoff_score machinery), one partial agg to
    O(bigram-types), two O(V) unigram equi-joins (AQE broadcast), and
    the global top-k compiles to TakeOrderedAndProject.
    """
    pt = df.select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("__p", "__w")
    )
    w = Window.partitionBy(id_col).orderBy("__p")
    pp = pt.withColumn("__u", F.lag("__w").over(w)).where(
        F.col("__u").isNotNull()
    )
    big = (
        pp.groupBy(F.col("__u").alias("u"), F.col("__w").alias("w"))
        .agg(F.count(F.lit(1)).alias("c_uv"))
        .where(F.col("c_uv") >= min_count)
    )
    uni = pt.groupBy(F.col("__w").alias("tok")).agg(
        F.count(F.lit(1)).alias("c_tok")
    )
    n_tot = pt.agg(F.count(F.lit(1)).alias("__n"))
    scored = (
        big.join(uni.select(F.col("tok").alias("u"), F.col("c_tok").alias("cu")), "u")
        .join(uni.select(F.col("tok").alias("w"), F.col("c_tok").alias("cw")), "w")
        .crossJoin(F.broadcast(n_tot))
        .select(
            "u",
            "w",
            F.col("c_uv").cast("long").alias("c_uv"),
            F.round(
                (
                    F.log("c_uv")
                    + F.log("__n")
                    - F.log("cu")
                    - F.log("cw")
                )
                * 1e6
            )
            .cast("long")
            .alias("__pm"),
        )
    )
    return (
        scored.orderBy(F.col("__pm").desc(), "u", "w")
        .limit(k)
        .select("u", "w", "c_uv", F.round(F.col("__pm") / 1e6, 6).alias("pmi"))
    )


def decode_token_ids(
    df: DataFrame,
    vocab: DataFrame,
    unk_token: str = "<unk>",
    ids_col: str = "token_ids",
    out_col: str = "decoded_text",
    max_literal_vocab: int = 100_000,
) -> DataFrame:
    """Inverse of `encode_token_ids` (r10): token-id sequences back to
    space-joined text against the same vocabulary, OOV ids (anything
    absent from the vocab, e.g. the encoder's unk_id) rendered as
    ``unk_token`` — the inspection/export step of a loader (spot-check
    what the model actually sees, ship detokenized samples).

    Shape: the vocabulary is O(top_n) rows BY CONSTRUCTION
    (build_vocab caps it), so it collects once and the decode is a
    pure map-only `transform` over a map literal — no join, no
    shuffle, whole-stage codegen. Past ``max_literal_vocab`` entries
    the plan AUTO-SWITCHES (VERDICT r10 #7 — the bound used to be a
    docstring note, past which the literal plan itself blew up) to an
    Arrow `pandas_udf` over an `sc.broadcast` id->token dict — the
    same literal-vs-broadcast switch the ANN `auto` scorer makes at
    table size 100k. Both paths are map-only (no join, no shuffle)
    and value-identical (pytest-gated equality). Roundtrip contract
    (pytest + oracle row `token_id_decode`): decode(encode(doc))
    equals the normalized original with every OOV token replaced by
    ``unk_token``."""
    rows = vocab.select("token_id", "token").collect()
    if len(rows) <= int(max_literal_vocab):
        m = F.create_map(
            *[
                x
                for r in rows
                for x in (
                    F.lit(int(r["token_id"])).cast("long"),
                    F.lit(r["token"]),
                )
            ]
        )
        toks = F.transform(
            F.col(ids_col),
            lambda t: F.coalesce(
                F.element_at(m, t.cast("long")), F.lit(unk_token)
            ),
        )
        return df.withColumn(out_col, F.array_join(toks, " "))

    bc = df.sparkSession.sparkContext.broadcast(
        {int(r["token_id"]): r["token"] for r in rows}
    )
    unk = str(unk_token)

    @F.pandas_udf("string", F.PandasUDFType.SCALAR)
    def _decode(ids):
        v = bc.value
        return ids.map(
            lambda seq: " ".join(v.get(int(t), unk) for t in seq)
        )

    return df.withColumn(out_col, _decode(F.col(ids_col)))
