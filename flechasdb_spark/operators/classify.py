"""Hashed-bucket multinomial Naive Bayes text classification — the
relational, engine-exact member of the linear-classifier family that
LLM data pipelines use for quality and domain filtering (fastText
supervised models in CCNet/LLaMA-style curation, logistic quality
scorers in DataComp; Joulin et al. 2017 "Bag of Tricks for Efficient
Text Classification" is the published shape: hashed bag-of-words
features -> linear scores -> argmax).

Reference anchor: flechasdb has no classifier (it is a vector DB —
src/lib.rs), so this module is pure extension surface; it follows the
same determinism contract as the DSIR and unigram-LM operators
(operators/sampling.py, operators/text.py): every model weight is
quantized ONCE to integer micro-nats so per-document scores are
order-independent INTEGER sums that DuckDB reproduces bit-for-bit.

Scale (100 TB): training is one token-grain partial-agg pass
collapsing to O(L x B) rows (labels x buckets — thousands, not
corpus-sized); the model broadcasts; scoring is one explode + one
broadcast join + a map-side-combinable sum per (doc, label). The only
O(docs x L) intermediate is the per-label score table, with L the
(small) label count. No windows, no skew beyond token frequency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from flechasdb_spark.functions.texthash import md5_long
from flechasdb_spark.operators.text import tokens

__all__ = ["nb_train", "nb_score", "nb_score_margin"]


def nb_train(
    df: DataFrame,
    label_col: str = "source",
    text_col: str = "text",
    n_buckets: int = 256,
) -> tuple[DataFrame, DataFrame]:
    """Train a multinomial NB model over hashed token buckets.

    Features are md5-hashed token buckets (the fastText hashing trick:
    fixed feature space, no vocabulary state). Add-one smoothing over
    the B buckets; weights in integer micro-nats:

    - priors:  (label, prior_lq)   prior_lq = round(1e6 * ln(d_l / d))
    - loglik:  (label, bucket, loglik_lq) DENSE over all B buckets,
      loglik_lq = round(1e6 * ln((c_lb + 1) / (n_l + B)))

    The dense grid means every scored token hits exactly one row per
    label — no unseen-feature special case at score time. A label
    whose documents contain no tokens still gets a full smoothing-floor
    row set (n_l = 0).

    One shuffle (token-grain partial agg, map-side combined), then
    O(L x B) arithmetic. Returns (priors, loglik) MATERIALIZED
    (localCheckpoint): both tables are O(L) / O(L x B) rows, but every
    downstream broadcast site (nb_score joins loglik once and priors
    twice; report rows join again) would otherwise re-derive the full
    training scan per exchange (r12, guide §2.4 — measured: the
    report row spent 25 of its 33 Spark jobs re-running the train
    chain under broadcast materializations). Values are unchanged —
    the checkpoint just pins them.
    """
    B = int(n_buckets)
    ndocs = df.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("__d")
    )
    tot = ndocs.agg(F.sum("__d").alias("__t"))
    priors = ndocs.crossJoin(F.broadcast(tot)).select(
        "label",
        F.round((F.log("__d") - F.log("__t")) * 1e6)
        .cast("long")
        .alias("prior_lq"),
    )
    tok = df.select(
        F.col(label_col).alias("label"),
        F.explode(tokens(text_col)).alias("__tok"),
    )
    cnt = tok.select(
        "label", (md5_long(F.col("__tok")) % B).alias("__b")
    ).groupBy("label", "__b").agg(F.count(F.lit(1)).alias("__c"))
    n_l = cnt.groupBy("label").agg(F.sum("__c").alias("__n"))
    # dense grid from the PRIOR label set (not from cnt — a label with
    # only empty documents must still score), buckets 0..B-1
    grid = (
        ndocs.select("label")
        .join(n_l, "label", "left")
        .select(
            "label", F.coalesce("__n", F.lit(0)).alias("__n"),
            F.explode(F.sequence(F.lit(0), F.lit(B - 1))).alias("__b"),
        )
    )
    loglik = (
        grid.join(cnt, ["label", "__b"], "left")
        .select(
            "label",
            F.col("__b").alias("bucket"),
            F.round(
                (
                    F.log(F.coalesce("__c", F.lit(0)) + 1)
                    - F.log(F.col("__n") + B)
                )
                * 1e6
            )
            .cast("long")
            .alias("loglik_lq"),
        )
    )
    return (
        priors.localCheckpoint(eager=True),
        loglik.localCheckpoint(eager=True),
    )


def _nb_model_literal(priors: DataFrame, loglik: DataFrame, B: int):
    """(labels, priors_lit, ll_lit) plan literals of the trained model,
    or None when the model exceeds the literal budget / is not the
    dense L x B grid. The model is O(L x B) integers — the same rows
    the former plan broadcast — so collecting it once and scoring
    map-only costs nothing new at any corpus size."""
    if B <= 0 or B * 8 > 65536:
        return None
    p_rows = priors.collect()
    if not p_rows or len(p_rows) * B > 65536:
        return None
    labels = sorted(str(r["label"]) for r in p_rows)
    prior_by = {str(r["label"]): int(r["prior_lq"]) for r in p_rows}
    ll: dict[str, list] = {lab: [None] * B for lab in labels}
    for r in loglik.collect():
        lab, b = str(r["label"]), int(r["bucket"])
        if lab not in ll or not 0 <= b < B:
            return None
        ll[lab][b] = int(r["loglik_lq"])
    if any(v is None for lab in labels for v in ll[lab]):
        return None  # not the dense grid nb_train produces
    labels_lit = F.lit(labels)
    priors_lit = F.lit([prior_by[lab] for lab in labels]).cast("array<long>")
    ll_lit = F.lit([ll[lab] for lab in labels]).cast("array<array<long>>")
    return labels, labels_lit, priors_lit, ll_lit


def _nb_scored_structs(
    df: DataFrame, lits, text_col: str, id_col: str, B: int
):
    """df plus ``__sc``: the per-doc array of struct(ns, label) with
    ns = -score(doc, label) — ONE map-only codegen projection (r12,
    guide §2.4/§4): token buckets via a higher-order transform (no
    explode, no shuffle), per-label integer fold over the literal
    loglik row, priors added outside the fold. Integer addition is
    associative, so the fold total equals the former
    count-times-loglik aggregate bit-for-bit, and struct(ns, label)
    ordering reproduces the (score desc, label asc) tie-break."""
    from flechasdb_spark.plans.ivf import _let

    _, labels_lit, priors_lit, ll_lit = lits
    bs = F.transform(
        F.coalesce(tokens(text_col), F.array()),
        lambda t: (md5_long(t) % B).cast("int"),
    )

    def _per_label(bsv):
        def _one(row, i):
            fold = F.aggregate(
                bsv,
                F.lit(0).cast("long"),
                lambda acc, b: acc + F.element_at(row, b + 1),
            )
            return F.struct(
                (-(F.element_at(priors_lit, i + 1) + fold)).alias("ns"),
                F.element_at(labels_lit, i + 1).alias("label"),
            )

        return _one

    # let-bind the bucket array so tokenization + hashing run ONCE per
    # row, not once per label (a single-use alias would be inlined into
    # the per-label lambda by project collapse)
    sc = _let(bs, lambda bsv: F.transform(ll_lit, _per_label(bsv)))
    return df.select(F.col(id_col), sc.alias("__sc"))


def nb_score(
    df: DataFrame,
    priors: DataFrame,
    loglik: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
) -> DataFrame:
    """Score every document against every label and keep the argmax.

    ``n_buckets`` must match the train call (same contract as the
    Bloom probe sizing). score(doc, l) = prior_lq[l] +
    sum_b c_db * loglik_lq[l, b] — an integer sum, so the argmax (and
    its deterministic tie-break: highest score, then smallest label
    string) is engine-exact. Empty documents score priors only, i.e.
    predict the majority training label.

    Plan (r12, guide §2.4): the trained model is O(L x B) integers, so
    it rides as a plan literal and the whole scoring pass is ONE
    map-only codegen projection — token buckets via a higher-order
    transform (no explode), one integer fold per label, argmax =
    ``array_min`` over struct(-score, label). No token-grain shuffle,
    no broadcast joins, no docs-spine rejoin; empty documents fold
    nothing and naturally take the prior-only argmax. Values are
    identical to the former explode + partial-agg + broadcast-join
    shape (integer sums in any order), which remains as the fallback
    for a model past the literal budget.

    Returns (id_col, predicted, score_micro_nats).
    """
    B = int(n_buckets)
    lits = _nb_model_literal(priors, loglik, B)
    if lits is not None:
        best = F.array_min(F.col("__sc"))
        return _nb_scored_structs(df, lits, text_col, id_col, B).select(
            id_col,
            best["label"].alias("predicted"),
            (-best["ns"]).alias("score_micro_nats"),
        )
    dtok = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("__tok")
    )
    dbc = dtok.select(
        id_col, (md5_long(F.col("__tok")) % B).alias("__b")
    ).groupBy(id_col, "__b").agg(F.count(F.lit(1)).alias("__c"))
    argmax = F.min(
        F.struct((-F.col("__score")).alias("ns"), F.col("label"))
    ).alias("__m")
    best = (
        dbc.join(F.broadcast(loglik), dbc["__b"] == loglik["bucket"])
        .groupBy(id_col, "label")
        .agg(F.sum(F.col("__c") * F.col("loglik_lq")).alias("__s"))
        .join(F.broadcast(priors), "label")
        .select(
            id_col, "label",
            (F.col("prior_lq") + F.col("__s")).alias("__score"),
        )
        .groupBy(id_col)
        .agg(argmax)
    )
    default = priors.select(
        F.col("prior_lq").alias("__score"), "label"
    ).agg(argmax)
    return (
        df.select(id_col)
        .join(best, id_col, "left")
        .crossJoin(F.broadcast(default.select(F.col("__m").alias("__d"))))
        .select(
            id_col,
            F.coalesce(F.col("__m.label"), F.col("__d.label")).alias(
                "predicted"
            ),
            F.coalesce(-F.col("__m.ns"), -F.col("__d.ns")).alias(
                "score_micro_nats"
            ),
        )
    )


def nb_score_margin(
    df: DataFrame,
    priors: DataFrame,
    loglik: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
) -> DataFrame:
    """Score with the top-2 label margin — the classifier's native
    confidence signal. NB micro-nat scores are not probabilities (a
    softmax over them would reintroduce order-dependent float sums),
    but the GAP between the best and second-best label IS an exact
    integer, and empirical accuracy binned by that gap is the
    calibration evidence a curation pipeline needs before thresholding
    a quality/domain classifier at corpus scale (the fastText-filter
    practice of keeping only confident predictions).

    Plan: the same one-shuffle per-(doc, bucket) count table as
    ``nb_score``, broadcast-joined to the dense O(L x B) loglik; the
    full docs x L score table is then a broadcast cross join of the
    O(L) priors against the doc spine (BroadcastNestedLoopJoin — map
    side, no shuffle) left-joined to the per-(doc, label) sums, so
    documents with no tokens score priors-only without a special case.
    Top-2 per doc via ``row_number() <= 2`` (WindowGroupLimit pushes
    the limit into the sort — never a full per-doc sort spill).

    margin_micro_nats = score(top1) - score(top2); a single-label
    model has no runner-up and reports margin 0 (fully ambiguous
    would also be 0 — callers with L = 1 have no decision to audit).

    Returns (id_col, predicted, score_micro_nats, margin_micro_nats).
    """
    from pyspark.sql import Window

    B = int(n_buckets)
    lits = _nb_model_literal(priors, loglik, B)
    if lits is not None:
        # map-only top-2 (r12): array_sort over struct(ns, label) IS
        # the (score desc, label asc) rank order, so element 1/2 are
        # exactly the window's rn = 1/2 rows
        labels = lits[0]
        srt = F.array_sort(F.col("__sc"))
        s1 = -F.element_at(srt, 1)["ns"]
        s2 = (
            -F.element_at(srt, 2)["ns"]
            if len(labels) >= 2
            else F.lit(None).cast("long")
        )
        return _nb_scored_structs(df, lits, text_col, id_col, B).select(
            F.col(id_col),
            F.element_at(srt, 1)["label"].alias("predicted"),
            s1.cast("long").alias("score_micro_nats"),
            (s1 - F.coalesce(s2, s1)).cast("long").alias(
                "margin_micro_nats"
            ),
        )
    dtok = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("__tok")
    )
    dbc = dtok.select(
        id_col, (md5_long(F.col("__tok")) % B).alias("__b")
    ).groupBy(id_col, "__b").agg(F.count(F.lit(1)).alias("__c"))
    sums = (
        dbc.join(F.broadcast(loglik), dbc["__b"] == loglik["bucket"])
        .groupBy(id_col, "label")
        .agg(F.sum(F.col("__c") * F.col("loglik_lq")).alias("__s"))
    )
    base = (
        df.select(id_col)
        .crossJoin(F.broadcast(priors))
        .join(sums, [id_col, "label"], "left")
        .select(
            id_col,
            "label",
            (F.col("prior_lq") + F.coalesce(F.col("__s"), F.lit(0)))
            .cast("long")
            .alias("__score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("__score").desc(), F.col("label").asc()
    )
    ranked = base.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= 2
    )
    return (
        ranked.groupBy(id_col)
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("label"))).alias(
                "predicted"
            ),
            F.max(F.when(F.col("rn") == 1, F.col("__score"))).alias("__s1"),
            F.max(F.when(F.col("rn") == 2, F.col("__score"))).alias("__s2"),
        )
        .select(
            id_col,
            "predicted",
            F.col("__s1").cast("long").alias("score_micro_nats"),
            (F.col("__s1") - F.coalesce(F.col("__s2"), F.col("__s1")))
            .cast("long")
            .alias("margin_micro_nats"),
        )
    )
