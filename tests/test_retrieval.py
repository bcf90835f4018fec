"""BM25 + RRF (operators/retrieval.py): scoring semantics on a
hand-computable fixture, plan shape, and fusion arithmetic."""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from flechasdb_spark.operators.retrieval import bm25_topk, rrf_fuse

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture()
def tiny(spark):
    docs = spark.createDataFrame(
        [
            (0, "apple apple banana"),
            (1, "apple cherry cherry cherry"),
            (2, "banana banana banana durian"),
            (3, "cherry durian"),
        ],
        "doc_id long, text string",
    )
    qs = spark.createDataFrame([(0, "apple"), (1, "banana")], "query_id long, term string")
    return docs, qs


def test_bm25_matches_hand_formula(spark, tiny):
    docs, qs = tiny
    out = {
        (r.query_id, r.doc_id): r.score
        for r in bm25_topk(docs, qs, k=10).collect()
    }
    # corpus stats: N=4, doclens 3,4,4,2 -> avgdl=3.25
    n, avgdl, k1, b = 4, 3.25, 1.2, 0.75

    def bm25(tf, df, dl):
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    # 'apple': df=2 (docs 0,1); 'banana': df=2 (docs 0,2)
    assert out[(0, 0)] == pytest.approx(round(bm25(2, 2, 3), 4), abs=1e-9)
    assert out[(0, 1)] == pytest.approx(round(bm25(1, 2, 4), 4), abs=1e-9)
    assert out[(1, 2)] == pytest.approx(round(bm25(3, 2, 4), 4), abs=1e-9)
    assert out[(1, 0)] == pytest.approx(round(bm25(1, 2, 3), 4), abs=1e-9)
    # docs without the term never appear
    assert (0, 2) not in out and (0, 3) not in out
    # higher-tf doc outranks lower-tf doc of similar length
    ranks = {
        (r.query_id, r.doc_id): r.rank
        for r in bm25_topk(docs, qs, k=10).collect()
    }
    assert ranks[(1, 2)] < ranks[(1, 0)]


def test_bm25_plan_uses_window_group_limit(spark, sf_dir, tiny):
    _, qs = tiny
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        bm25_topk(docs, qs, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_rrf_fusion_arithmetic(spark):
    r1 = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2)], "query_id long, doc_id long, rank long"
    )
    r2 = spark.createDataFrame(
        [(0, 11, 1), (0, 12, 2)], "query_id long, doc_id long, rank long"
    )
    out = {r.doc_id: (r.score, r.rank) for r in rrf_fuse([r1, r2], k=10).collect()}
    # doc 11 appears in both lists -> highest fused score
    assert out[11][0] == pytest.approx(round(1 / 62 + 1 / 61, 6))
    assert out[10][0] == pytest.approx(round(1 / 61, 6))
    assert out[12][0] == pytest.approx(round(1 / 62, 6))
    assert out[11][1] == 1
    with pytest.raises(ValueError):
        rrf_fuse([])


def test_rank_metrics_hand_computed(spark):
    import math

    from flechasdb_spark.operators.eval import rank_metrics

    ranked = spark.createDataFrame(
        [(0, d, r) for r, d in enumerate([10, 11, 12, 13], 1)]
        + [(1, d, r) for r, d in enumerate([20, 21, 22], 1)]
        + [(2, d, r) for r, d in enumerate([30, 31], 1)],
        "query_id long, doc_id long, rank long",
    )
    truth = spark.createDataFrame(
        # q0: perfect (both rels at top); q1: rel at rank 3 of 1 ideal;
        # q2: nothing relevant retrieved (rel doc 99 absent)
        [(0, 10), (0, 11), (1, 22), (2, 99)],
        "query_id long, doc_id long",
    )
    got = {r.query_id: r for r in rank_metrics(ranked, truth, k=3).collect()}
    assert got[0].rr == 1.0 and got[0].ndcg == 1.0 and got[0].n_hits == 2
    g = lambda r: round(1e6 / math.log2(r + 1))
    exp1 = round(g(3) / g(1), 4)
    assert got[1].first_rel_rank == 3 and abs(got[1].rr - 0.3333) < 1e-9
    assert abs(got[1].ndcg - exp1) < 1e-9
    assert got[2].rr == 0.0 and got[2].ndcg == 0.0 and got[2].n_hits == 0


def test_rank_metrics_zero_relevant_query_not_dropped(spark):
    """A query present in the ranking but with NO relevant docs at all
    must still appear as a row with n_rel = 0 and all-zero scores (r4
    ADVICE: the truth-keyed output silently dropped it, biasing any
    downstream mean); a truth-only query (never ranked) also appears."""
    from flechasdb_spark.operators.eval import rank_metrics

    ranked = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (5, 50, 1)],
        "query_id long, doc_id long, rank long",
    )
    truth = spark.createDataFrame(
        [(0, 10), (7, 70)], "query_id long, doc_id long"
    )
    got = {r.query_id: r for r in rank_metrics(ranked, truth, k=3).collect()}
    assert set(got) == {0, 5, 7}
    assert got[5].n_rel == 0 and got[5].rr == 0.0 and got[5].ndcg == 0.0
    assert got[5].n_hits == 0 and got[5].first_rel_rank == 0
    assert got[7].n_rel == 1 and got[7].n_hits == 0 and got[7].ndcg == 0.0
    assert got[0].n_rel == 1 and got[0].rr == 1.0


def test_hard_negatives_exclude_relevants_and_rank_correctly(spark):
    """Every mined negative must be absent from qrels (true negative),
    ranked by descending cosine, and k per query when available; a
    query whose qrels cover the whole corpus yields zero rows."""
    from flechasdb_spark.operators.retrieval import hard_negatives

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qs = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvector"),
    )
    # relevant = same label as the query vector
    lab = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    qrels = spark.createDataFrame(
        [
            (q, v)
            for q in (0, 1, 2)
            for v, l in lab.items()
            if l == lab[q]
        ],
        "query_id long, vec_id long",
    )
    out = hard_negatives(emb, qs, qrels, k=7, round_to=4).collect()
    rel = {(r.query_id, r.vec_id) for r in qrels.collect()}
    by_q: dict = {}
    for r in out:
        assert (r.query_id, r.vec_id) not in rel
        assert lab[r.vec_id] != lab[r.query_id]
        by_q.setdefault(r.query_id, []).append((r.neg_rank, r.cos))
    for q, rows in by_q.items():
        rows.sort()
        assert [x[0] for x in rows] == list(range(1, len(rows) + 1))
        coss = [x[1] for x in rows]
        assert coss == sorted(coss, reverse=True)
        assert len(rows) == 7
    # all-relevant corpus -> no negatives
    allrel = spark.createDataFrame(
        [(0, v) for v in lab], "query_id long, vec_id long"
    )
    none = hard_negatives(
        emb, qs.where("query_id = 0"), allrel, k=7
    ).count()
    assert none == 0


def test_hard_negatives_ann_matches_exact_at_full_probe(spark):
    """With nprobe = P (no pruning) and ample factor, the ANN miner's
    negatives must equal the exact squared-L2 miner's; with pruning it
    still returns k true negatives per query at decent recall."""
    from flechasdb_spark.operators.build import IndexConfig, build_index
    from flechasdb_spark.operators.retrieval import hard_negatives_ann

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cfg = IndexConfig(
        num_partitions=4, num_divisions=4, num_codes=8, seed=9,
        keep_vectors=True,
    )
    model = build_index(emb, cfg)
    qs = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in emb.where(F.col("vec_id") < 3).collect()
    ]
    lab = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    qrels = spark.createDataFrame(
        [(q, v) for q, _ in qs for v, l in lab.items() if l == lab[q]],
        "query_id long, vec_id long",
    )
    rel = {(r.query_id, r.vec_id) for r in qrels.collect()}
    # exact ground truth: ADC-free squared L2 over all pairs
    import numpy as np

    vecs = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in emb.collect()
    }
    want = {}
    for q, qv in qs:
        qa = np.asarray(qv, dtype=np.float64)
        cand = sorted(
            (float(((v - qa) ** 2).sum()), vid)
            for vid, v in vecs.items()
            if (q, vid) not in rel
        )
        want[q] = [vid for _, vid in cand[:5]]
    # full probe + exact re-rank against stored vectors -> exact match
    out = hard_negatives_ann(
        model, qs, qrels, k=5, nprobe=4, factor=8,
        rerank="stored", rerank_factor=8,
    )
    got = {}
    for r in out.collect():
        assert (r.query_id, r.vec_id) not in rel
        got.setdefault(r.query_id, []).append((r.neg_rank, r.vec_id))
    for q, _ in qs:
        ids = [v for _, v in sorted(got[q])]
        assert ids == want[q], (q, ids, want[q])
    # pruned probe: still k true negatives, recall >= 0.5 vs exact
    pruned = hard_negatives_ann(model, qs, qrels, k=5, nprobe=2, factor=4)
    pg = {}
    for r in pruned.collect():
        assert (r.query_id, r.vec_id) not in rel
        pg.setdefault(r.query_id, []).append(r.vec_id)
    for q, _ in qs:
        assert len(pg[q]) == 5


def test_mmr_rerank_properties(spark):
    """Greedy invariants on a crafted 2-cluster corpus: rank-1 is the
    top-rel candidate; with lam=0.5 the second pick escapes the first
    pick's near-duplicate cluster; ranks are unique selections."""
    import pyspark.sql.functions as F
    from flechasdb_spark.operators.similarity import mmr_rerank

    # cluster A: ids 10, 11 (near-identical, sim(10,11) rounds to 1);
    # cluster B: id 20 -- lower rel but diverse. The query must NOT
    # equal a corpus vector (then sim-to-selected == rel and every
    # score ties at 0); (1, 0.1, 0) makes 11 the top hit, after which
    # 10 is penalized by its twin and 20 jumps it.
    emb = spark.createDataFrame(
        [
            (10, [1.0, 0.0, 0.0]),
            (11, [0.999, 0.01, 0.0]),
            (20, [0.8, 0.59, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    qs = spark.createDataFrame(
        [(0, [1.0, 0.1, 0.0])], "query_id long, qvector array<double>"
    )
    out = mmr_rerank(emb, qs, k=3, n_candidates=3, lam=0.5).orderBy(
        "mmr_rank"
    )
    rows = out.collect()
    assert [r.vec_id for r in rows] == [11, 20, 10]
    assert [r.mmr_rank for r in rows] == [1, 2, 3]
    assert rows[0].mmr_score == round(0.5 * rows[0].rel, 5)
    # penalties only ever subtract: scores are non-increasing in the
    # sense that every later score <= 0.5 * its own rel
    for r in rows[1:]:
        assert r.mmr_score <= 0.5 * r.rel + 1e-12

    # single-candidate group survives (self-pair keeps the row)
    one = mmr_rerank(
        emb.where(F.col("vec_id") == 20), qs, k=2, n_candidates=2, lam=0.5
    ).collect()
    assert len(one) == 1 and one[0].vec_id == 20 and one[0].mmr_rank == 1

    # parameter validation
    import pytest as _pt

    with _pt.raises(ValueError):
        mmr_rerank(emb, qs, k=5, n_candidates=3)


def test_phrase_topk_consecutive_and_repeated_words(spark):
    """The anchor-grouping must require each phrase position j to hold
    its term at p0+j: scattered terms don't match, overlapping
    occurrences of a repeated-word phrase count per anchor, and a
    phrase absent from the corpus yields no rows."""
    from flechasdb_spark.operators.retrieval import phrase_topk

    docs = spark.createDataFrame(
        [
            (1, "the quick fox jumps"),        # "quick fox": 1 occurrence
            (2, "quick then fox"),             # scattered -> no match
            (3, "quick fox quick fox"),        # 2 occurrences
            (4, "go go go"),                   # "go go" anchors at 0,1 -> 2
        ],
        "doc_id long, text string",
    )
    ph = spark.createDataFrame(
        [(0, "quick fox"), (1, "go go"), (2, "missing phrase")],
        "query_id long, phrase string",
    )
    got = {
        (r.query_id, r.doc_id): (r.n_occ, r.rank)
        for r in phrase_topk(docs, ph, k=10).collect()
    }
    assert got[(0, 3)] == (2, 1)
    assert got[(0, 1)] == (1, 2)
    assert (0, 2) not in got           # non-consecutive never matches
    assert got[(1, 4)] == (2, 1)       # overlapping anchors both count
    assert not any(q == 2 for q, _ in got)
    assert len(got) == 3


def test_mmr_rerank_accepts_external_candidates(spark):
    """An ANN/filtered candidate list can replace the built-in exact
    scan: the greedy must select only from the provided candidates
    and still diversify among them; a missing rel column raises."""
    import pyspark.sql.functions as F
    from flechasdb_spark.operators.similarity import mmr_rerank

    emb = spark.createDataFrame(
        [
            (10, [1.0, 0.0, 0.0]),
            (11, [0.999, 0.01, 0.0]),
            (20, [0.8, 0.59, 0.0]),
            (30, [0.0, 1.0, 0.0]),   # best rel but NOT a candidate
        ],
        "vec_id long, embedding array<double>",
    )
    qs = spark.createDataFrame(
        [(0, [1.0, 0.1, 0.0])], "query_id long, qvector array<double>"
    )
    cands = spark.createDataFrame(
        [(0, 10, 0.995), (0, 11, 0.996), (0, 20, 0.8599)],
        "query_id long, vec_id long, rel double",
    )
    rows = (
        mmr_rerank(emb, qs, k=3, n_candidates=3, candidates=cands)
        .orderBy("mmr_rank")
        .collect()
    )
    assert [r.vec_id for r in rows] == [11, 20, 10]
    assert 30 not in {r.vec_id for r in rows}

    import pytest as _pt

    with _pt.raises(ValueError):
        mmr_rerank(
            emb, qs, k=2, n_candidates=2,
            candidates=cands.drop("rel"),
        )


def test_mmr_rerank_string_ids_and_custom_id_col(spark):
    """ADVICE r6: the applyInPandas output schema was hardcoded to
    '... long' and the literal name 'vec_id'; string ids or a renamed
    id column crashed or mislabeled the output. Both must now flow
    through from the input dtypes."""
    from flechasdb_spark.operators.similarity import mmr_rerank

    emb = spark.createDataFrame(
        [
            ("a", [1.0, 0.0]),
            ("b", [0.9, 0.1]),
            ("c", [0.0, 1.0]),
        ],
        "doc long string, embedding array<double>".replace("doc long", "doc"),
    )
    qs = spark.createDataFrame(
        [("q1", [1.0, 0.0])], "qid string, qvector array<double>"
    )
    out = mmr_rerank(
        emb,
        qs,
        k=2,
        n_candidates=3,
        id_col="doc",
        query_id_col="qid",
    )
    assert out.columns == ["qid", "doc", "mmr_rank", "rel", "mmr_score"]
    rows = out.orderBy("mmr_rank").collect()
    # a first (rel=1); then b vs c tie at score 0 -> ascending id -> b
    assert [r.doc for r in rows] == ["a", "b"]
    assert rows[0].qid == "q1"
