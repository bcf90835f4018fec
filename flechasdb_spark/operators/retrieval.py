"""Keyword retrieval (BM25) and rank fusion (RRF) — the lexical half
of the hybrid-search stack (BM25 candidates + vector kNN candidates →
reciprocal-rank fusion), which is the standard retrieval layout around
a vector index like the reference's. No reference counterpart (vectors
only); extension surface.

Scale shape: BM25 is an inverted-index equi-join on the term key —
per-term document postings meet the query terms in one hash join; term
statistics (df, idf) are a small broadcast table; scoring is a partial
aggregation per (query, doc); per-query top-k runs as WindowGroupLimit.
Nothing is quadratic and nothing leaves the executors except the final
k rows per query. RRF is a union + partial-agg sum over O(Q * k * lists)
rows — negligible.

Determinism: scores use ln/double arithmetic that can differ in the
last ulp across engines, so (as everywhere in this repo) the RANKING
key is the score rounded to 4 decimals with id tie-break, and outputs
expose the rounded score.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flechasdb_spark.operators.text import tokens

__all__ = ["bm25_topk", "rrf_fuse", "hard_negatives", "hard_negatives_ann", "phrase_topk"]


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    term_col: str = "term",
) -> DataFrame:
    """Batch BM25 top-k: ``queries`` is long-form (query_id, term);
    returns (query_id, doc_id, score, rank) with Okapi BM25 scoring

        score(q, d) = sum_t idf(t) * tf * (k1+1) /
                      (tf + k1 * (1 - b + b * |d| / avgdl))
        idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))

    over whitespace-lowercase tokens (the repo's shared tokenizer, so
    the DuckDB oracle reproduces it). Duplicate query terms contribute
    once (terms are distinct-ed) — the common bag-of-words=set choice.

    Plan: the query-term set (distinct terms across the batch — small)
    is BROADCAST against the exploded token stream BEFORE any
    aggregation, so the only corpus-wide work is one map pass + a
    partial-agged count over the surviving postings; doc length is a
    map-only ``size(tokens(...))`` (no explode shuffle); df/idf and
    avgdl are tiny broadcast aggregates; per-(query, doc) scoring
    partial-aggs; top-k per query is a row_number window Spark runs as
    WindowGroupLimit. Assumes the query batch's term set broadcasts
    (thousands of queries x a few terms — far under any broadcast
    limit)."""
    # doc length rides ON the exploded rows (tokens() computed twice
    # per row — map-only, cheaper than a corpus-wide doclen join later)
    toks = docs.select(
        F.col(id_col),
        F.size(tokens(text_col)).alias("__dl"),
        F.explode(tokens(text_col)).alias(term_col),
    )
    qterms = queries.select(query_id_col, term_col).distinct()
    # prune FIRST: only tokens matching some query term survive the
    # scan; tf then partial-aggs over the pruned postings only
    matched = toks.join(
        F.broadcast(qterms.select(term_col).distinct()), term_col
    )
    tf = matched.groupBy(id_col, term_col).agg(
        F.count(F.lit(1)).alias("__tf"), F.first("__dl").alias("__dl")
    )
    stats = docs.agg(F.count(F.lit(1)).alias("__n")).crossJoin(
        docs.select(F.size(tokens(text_col)).alias("__l"))
        .agg(F.avg("__l").alias("__avgdl"))
    )

    hits = tf.join(F.broadcast(qterms), term_col)
    df_counts = (
        hits.select(term_col, id_col)
        .distinct()
        .groupBy(term_col)
        .agg(F.count(F.lit(1)).alias("__df"))
    )
    scored = (
        hits.join(F.broadcast(df_counts), term_col)
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "__idf",
            F.log(
                F.lit(1.0)
                + (F.col("__n") - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
            ),
        )
        .withColumn(
            "__s",
            F.col("__idf")
            * (F.col("__tf") * (1.0 + k1))
            / (
                F.col("__tf")
                + k1 * (1.0 - b + b * F.col("__dl") / F.col("__avgdl"))
            ),
        )
        .groupBy(query_id_col, id_col)
        .agg(F.round(F.sum("__s"), 4).alias("score"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "score", "rank")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 10,
    c: int = 60,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion of any number of (query_id, id, rank)
    result lists: fused(q, d) = sum over lists of 1 / (c + rank). The
    standard score-free combiner for hybrid lexical+vector retrieval
    (c=60 per the original RRF paper's recommendation).

    The fused score of L small top-k lists is a union + partial-agg
    sum; ranking ties break by id. Scores are rounded to 6 decimals for
    cross-engine rank stability (1/(c+rank) values are well separated
    at top ranks)."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    parts = [
        r.select(
            F.col(query_id_col),
            F.col(id_col),
            (1.0 / (F.lit(float(c)) + F.col(rank_col))).alias("__rr"),
        )
        for r in rankings
    ]
    allr = parts[0]
    for p in parts[1:]:
        allr = allr.unionByName(p)
    fused = allr.groupBy(query_id_col, id_col).agg(
        F.round(F.sum("__rr"), 6).alias("score")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "score", "rank")
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    qrels: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "qvector",
    round_to: int | None = None,
) -> DataFrame:
    """Hard-negative mining for contrastive retrieval training
    (Karpukhin et al. 2020 DPR; Xiong et al. 2021 ANCE): per query,
    the top-``k`` most-SIMILAR corpus items that are NOT relevant —
    the negatives that actually move a bi-encoder, as opposed to
    random negatives the model already separates.

    ``qrels`` is the (query_id_col, id_col) relevance table; relevant
    items (including the query's own vector, if the caller lists it)
    are excluded BEFORE ranking, so the output always holds k true
    negatives per query when the corpus allows.

    This is the exact brute-force baseline (the recall oracle, like
    ``cosine_topk``): one broadcast of the query side, the relevance
    anti-join ALSO broadcast (qrels is O(queries x few) rows), and
    WindowGroupLimit keeps per-partition partial top-k before the one
    shuffle on the query key. The 100 TB serving path composes the
    same anti-join + refill around ``ann_query`` (mine from the
    nprobe-pruned candidate set with rerank_factor headroom) — this
    form is the ground truth that path is measured against.

    Returns (query_id_col, id_col, cos, neg_rank).
    """
    from flechasdb_spark.functions.linalg import cosine_similarity

    pairs = corpus.join(F.broadcast(queries)).join(
        F.broadcast(qrels.select(query_id_col, id_col)),
        [query_id_col, id_col],
        "left_anti",
    )
    cos = cosine_similarity(F.col(vec_col), F.col(query_vec_col))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("__cos").desc(), F.col(id_col).asc()
    )
    out_cos = (
        F.round(F.col("__cos"), round_to)
        if round_to is not None
        else F.col("__cos")
    )
    return (
        pairs.select(query_id_col, id_col, cos.alias("__cos"))
        .withColumn("neg_rank", F.row_number().over(w))
        .where(F.col("neg_rank") <= k)
        .select(
            query_id_col,
            id_col,
            out_cos.alias("cos"),
            F.col("neg_rank").cast("long").alias("neg_rank"),
        )
    )


def hard_negatives_ann(
    model,
    queries,
    qrels: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    factor: int = 4,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    **ann_kwargs,
) -> DataFrame:
    """The SERVING-path hard-negative miner ``hard_negatives``
    documents: candidates come from the nprobe-pruned ``ann_query``
    top ``k * factor`` (partition-pruned scan, broadcast ADC — the
    100 TB path), relevants are anti-joined out, and the survivors
    re-rank to top-``k`` per query. ``factor`` is the refill headroom:
    if a query's relevants crowd its candidate list, up to
    ``k * factor - |relevants∩candidates|`` negatives remain — size it
    to the qrels density like ``rerank_factor`` on the recall path.

    ``queries`` is the ``ann_query`` batch shape ([(query_id, vector),
    ...]); ``qrels`` is (query_id_col, id_col). Ranking follows the
    index's distance (squared L2, ascending, id tie-break) — on
    normalized embeddings this is the same order cosine gives the
    exact miner. Returns (query_id_col, id_col, squared_distance,
    neg_rank).
    """
    from flechasdb_spark.plans.ivf import ann_query

    cand = ann_query(
        model, queries, k=int(k) * int(factor), nprobe=nprobe,
        **ann_kwargs,
    )
    neg = cand.join(
        F.broadcast(
            qrels.select(
                F.col(query_id_col).alias("query_id"),
                F.col(id_col).alias("vector_id"),
            )
        ),
        ["query_id", "vector_id"],
        "left_anti",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("squared_distance").asc(), F.col("vector_id").asc()
    )
    return (
        neg.withColumn("neg_rank", F.row_number().over(w))
        .where(F.col("neg_rank") <= int(k))
        .select(
            F.col("query_id").alias(query_id_col),
            F.col("vector_id").alias(id_col),
            "squared_distance",
            F.col("neg_rank").cast("long").alias("neg_rank"),
        )
    )


def phrase_topk(
    docs: DataFrame,
    phrases: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    phrase_col: str = "phrase",
) -> DataFrame:
    """Positional phrase search: rank documents by the number of EXACT
    consecutive occurrences of each query phrase — the positional-
    index query BM25's bag-of-words scoring cannot answer ("merge part
    window" as a phrase, not three independent terms).

    Returns (query_id, doc_id, n_occ, rank), rank by occurrences
    descending with id tie-break, top-``k`` per query.

    Plan: ONE join + one aggregation, no per-word self-join chain —
    the phrase terms (query_id, j, term) are a tiny BROADCAST against
    the corpus position stream (doc_id, p, term); a surviving row
    means position p holds term j of the phrase, so grouping by the
    implied anchor p0 = p - j and requiring count(DISTINCT j) ==
    phrase length detects a full consecutive match (repeated words in
    a phrase need distinct j's AT DISTINCT positions, which the
    anchor-grouping enforces for free). Corpus-side work is a single
    map pass + a partial-aggregable count keyed on (query, doc,
    anchor); per-query top-k is a WindowGroupLimit. Postings volume is
    bounded by the df of the phrase's terms — the standard inverted-
    index bound — and nothing is ever quadratic in the corpus."""
    from flechasdb_spark.operators.text import tokens

    terms = phrases.select(
        query_id_col,
        F.posexplode(tokens(phrase_col)).alias("j", "term"),
    )
    plen = terms.groupBy(query_id_col).agg(
        F.count_distinct("j").alias("__plen")
    )
    pos = docs.select(
        id_col, F.posexplode(tokens(text_col)).alias("p", "term")
    )
    hits = pos.join(F.broadcast(terms), "term").select(
        query_id_col, id_col, (F.col("p") - F.col("j")).alias("__p0"), "j"
    )
    occ = (
        hits.groupBy(query_id_col, id_col, "__p0")
        .agg(F.count_distinct("j").alias("__nj"))
        .join(F.broadcast(plen), query_id_col)
        .where(F.col("__nj") == F.col("__plen"))
        .groupBy(query_id_col, id_col)
        .agg(F.count(F.lit(1)).alias("n_occ"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("n_occ").desc(), F.col(id_col).asc()
    )
    return (
        occ.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            query_id_col, id_col, "n_occ", F.col("rank").cast("long").alias("rank")
        )
    )
