"""Temperature sampling — rebalancing direction, determinism, and the
driver-row oracle parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from flechasdb_spark.operators.sampling import temperature_sample
from flechasdb_spark.queries import ORACLES, REGISTRY
from tests.oracle_harness import compare, duck_con


def test_temperature_sample_matches_oracle(spark, sf_dir):
    con = duck_con(sf_dir)
    sdf = REGISTRY["temperature_sample"](spark, sf_dir)
    odf = con.execute(ORACLES["temperature_sample"]).df()
    assert compare(sdf, odf) == []


def test_temperature_flattens_skewed_mixture(spark):
    """With a 900/100 mixture, alpha=0.5 gives the small group a larger
    share than its 10% proportional share; alpha=1 stays proportional."""
    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")

    def share(alpha):
        got = temperature_sample(df, total=100, alpha=alpha).collect()
        small = sum(1 for r in got if r.source == "small")
        return small, len(got)

    small_flat, n_flat = share(0.5)
    small_prop, n_prop = share(1.0)
    assert small_prop <= 11  # ~10 of 100
    assert small_flat > small_prop  # upsampled by temperature
    assert abs(n_flat - 100) <= 2 and abs(n_prop - 100) <= 2

    a = sorted(map(tuple, temperature_sample(df, total=100).collect()))
    b = sorted(map(tuple, temperature_sample(df, total=100).collect()))
    assert a == b  # deterministic across runs


def test_token_budget_select_matches_sequential_greedy(spark):
    """The distributed boundary-group decomposition equals the
    sequential greedy scan in (score desc, md5 asc, id asc) order:
    keep iff inclusive running total <= budget."""
    import hashlib

    from flechasdb_spark.operators.sampling import token_budget_select

    rows = [(i, 10 + (i * 7) % 30, round(0.1 * ((i * 3) % 5), 4)) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long, quality double")

    def reference(budget):
        order = sorted(
            rows,
            key=lambda r: (
                -r[2],
                hashlib.md5(f"tb:{r[0]}".encode()).hexdigest(),
                r[0],
            ),
        )
        kept, acc = set(), 0
        for i, t, _ in order:
            acc += t  # prefix semantics: skipped docs still consume cum
            if acc <= budget:
                kept.add(i)
        return kept

    for budget in (0, 5, 137, 500, 10**6):
        got = {
            r.doc_id
            for r in token_budget_select(df, budget_tokens=budget).collect()
        }
        assert got == reference(budget), budget
    # full-fit path returns everything
    assert len(token_budget_select(df, budget_tokens=10**6).collect()) == 60
    # deterministic across invocations
    a = sorted(map(tuple, token_budget_select(df, budget_tokens=137).collect()))
    b = sorted(map(tuple, token_budget_select(df, budget_tokens=137).collect()))
    assert a == b


def test_token_temperature_mix_matches_sequential(spark):
    """Per-group greedy fill equals the sequential reference: targets
    from quantized sqrt weights, hash order within group, prefix
    semantics (no partial docs)."""
    import hashlib
    import math

    from flechasdb_spark.operators.sampling import token_temperature_mix

    rows = [
        (i, f"s{i % 3}", 5 + (i * 11) % 40) for i in range(90)
    ]  # 3 skewed-ish groups
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")

    def reference(total):
        tt = {}
        for _, g, t in rows:
            tt[g] = tt.get(g, 0) + t
        wq = {g: round(math.sqrt(v) * 1e6) for g, v in tt.items()}
        wtot = sum(wq.values())
        tgt = {g: (total * w) // wtot for g, w in wq.items()}
        kept = set()
        for g in tt:
            acc = 0
            for i, gg, t in sorted(
                (r for r in rows if r[1] == g),
                key=lambda r: (hashlib.md5(f"ttm:{r[0]}".encode()).hexdigest(), r[0]),
            ):
                acc += t
                if acc <= tgt[g]:
                    kept.add(i)
        return kept

    for total in (0, 300, 1000, 10**6):
        got = {
            r.doc_id
            for r in token_temperature_mix(df, total_tokens=total).collect()
        }
        assert got == reference(total), total
    out = token_temperature_mix(df, total_tokens=1000)
    assert out.columns == ["doc_id", "source", "n_tokens"]
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, token_temperature_mix(df, total_tokens=1000).collect()))
    assert a == b


def test_dsir_ranks_target_like_docs_higher(spark):
    """Documents made of target-domain vocabulary must outscore
    documents made of raw-domain vocabulary, and a mixed doc lands
    between them."""
    from flechasdb_spark.operators.sampling import dsir_importance

    tgt_text = "alpha beta gamma delta " * 5
    raw_text = "omega sigma tau rho " * 5
    rows = (
        [(i, tgt_text, "target") for i in range(10)]
        + [(100 + i, raw_text, "web") for i in range(30)]
        # probes living in the raw pool:
        + [(900, tgt_text, "web"), (901, raw_text + "x", "web"),
           (902, tgt_text + raw_text, "web")]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        r.doc_id: r.score
        for r in dsir_importance(df, target_source="target").collect()
    }
    assert got[900] > got[902] > got[901]


def test_dsir_empty_doc_scores_zero(spark):
    from flechasdb_spark.operators.sampling import dsir_importance

    df = spark.createDataFrame(
        [(1, "a b c", "t"), (2, "", "w"), (3, "a b", "w")],
        "doc_id long, text string, source string",
    )
    got = {r.doc_id: r.score for r in dsir_importance(df, "t").collect()}
    assert got[2] == 0 and len(got) == 3


def test_dsir_select_deterministic_topk(spark):
    """Same inputs -> identical selection on repeated runs (integer
    scores, id tie-break)."""
    from flechasdb_spark.operators.sampling import dsir_select

    rows = [(i, f"tok{i % 7} tok{i % 3} filler{i % 11}",
             "t" if i % 5 == 0 else "w") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    a = [(r.doc_id, r.score) for r in dsir_select(df, 20, "t").collect()]
    b = [(r.doc_id, r.score) for r in dsir_select(df, 20, "t").collect()]
    assert a == b and len(a) == 20
    scores = [s for _, s in a]
    assert scores == sorted(scores, reverse=True)


def test_source_mix_report_arithmetic(spark):
    from flechasdb_spark.operators.sampling import source_mix_report

    df = spark.createDataFrame(
        [
            (1, "a b c", "s1"), (2, "a b c", "s1"), (3, "d e", "s1"),
            (4, "x y z w", "s2"),
        ],
        "doc_id long, text string, source string",
    )
    got = {r.source: r for r in source_mix_report(df).collect()}
    s1, s2 = got["s1"], got["s2"]
    assert s1.n_docs == 3 and s1.n_tokens == 8 and s1.n_unique_texts == 2
    assert abs(s1.dup_rate - round(1 - 2 / 3, 4)) < 1e-12
    assert abs(s1.token_share - round(8 / 12, 4)) < 1e-12
    assert s2.n_docs == 1 and s2.n_tokens == 4 and s2.dup_rate == 0.0


def _py_dsir(rows, target_source, B=64):
    """Pure-Python DSIR reference (same md5 bucketing and micro-nat
    quantization). Per-bucket ln routes through C libm vs the JVM's —
    each <= 1 ulp — so per-doc scores are compared with a +-n_tokens
    micro-nat envelope rather than exact equality."""
    import hashlib
    import math

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % B

    toks = {
        did: [t for t in text.lower().strip().split() if t]
        for did, text, _ in rows
    }
    ct: dict[int, int] = {}
    cr: dict[int, int] = {}
    for did, text, src in rows:
        for t in toks[did]:
            b = bucket(t)
            (ct if src == target_source else cr).setdefault(b, 0)
            if src == target_source:
                ct[b] += 1
            else:
                cr[b] += 1
    nt, nr = sum(ct.values()), sum(cr.values())

    def half_up(x):
        return math.floor(abs(x) + 0.5) * (1 if x >= 0 else -1)

    def lq(b):
        lam = (
            math.log(ct.get(b, 0) + 1)
            - math.log(nt + B)
            - math.log(cr.get(b, 0) + 1)
            + math.log(nr + B)
        )
        return half_up(lam * 1e6)

    return {
        did: sum(lq(bucket(t)) for t in toks[did]) for did, text, _ in rows
    }


def test_dsir_matches_python_reference(spark):
    import random

    from flechasdb_spark.operators.sampling import dsir_importance

    vocab = [f"w{i}" for i in range(40)]
    for seed in (0, 1, 2):
        rng = random.Random(seed)
        rows = [
            (
                i,
                " ".join(rng.choices(vocab, k=rng.randint(0, 30))),
                "t" if rng.random() < 0.3 else "w",
            )
            for i in range(60)
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        )
        got = {
            r.doc_id: r.score
            for r in dsir_importance(df, "t", n_buckets=64).collect()
        }
        ref = _py_dsir(rows, "t", B=64)
        assert set(got) == set(ref)
        for did in got:
            n_tok = len(rows[did][1].split()) if rows[did][1].strip() else 0
            assert abs(got[did] - ref[did]) <= max(1, n_tok), (
                seed, did, got[did], ref[did]
            )


def test_leakage_safe_split_clusters_never_straddle(spark):
    """Every doc in a near-dup cluster (transitively, including chains)
    lands in the SAME split; singletons hash on their own id exactly
    like hash_split would."""
    from flechasdb_spark.operators.sampling import (
        hash_split,
        leakage_safe_split,
    )

    docs = spark.createDataFrame(
        [(i,) for i in range(200)], "doc_id long"
    )
    # chain 0-1-2-3 (one cluster via transitivity), pair 10-11, rest singletons
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    out = leakage_safe_split(
        docs, pairs, {"train": 0.6, "val": 0.2, "test": 0.2}
    ).collect()
    by_id = {r.doc_id: r for r in out}
    assert len(by_id) == 200
    chain = [by_id[i] for i in range(4)]
    assert {r.rep for r in chain} == {0}
    assert len({r.split for r in chain}) == 1
    assert by_id[10].split == by_id[11].split and by_id[10].rep == 10
    # singletons: identical assignment to a plain hash split on the id
    plain = {
        r.doc_id: r.split
        for r in hash_split(
            docs, {"train": 0.6, "val": 0.2, "test": 0.2}
        ).collect()
    }
    for i in range(20, 200):
        assert by_id[i].rep == i and by_id[i].split == plain[i]


def test_weighted_sample_proportional_inclusion(spark):
    """Efraimidis-Spirakis contract: with k=1 the win probability of a
    row is weight/total. Count wins across 300 independent salts for
    weights (1, 4, 16): empirical shares must track 1/21, 4/21, 16/21
    well within binomial noise."""
    from flechasdb_spark.operators.sampling import weighted_sample_topk

    from concurrent.futures import ThreadPoolExecutor

    df = spark.createDataFrame(
        [(0, 1.0), (1, 4.0), (2, 16.0)], "doc_id long, weight double"
    )
    # same 300 independent operator calls and salts as ever, but the
    # tiny one-row jobs are submitted from a thread pool so their
    # scheduling latencies overlap (sequentially this test alone was
    # ~2 min of the suite's wall clock; nothing about any single draw
    # changes — Spark schedules concurrent jobs independently)
    def _win(s: int) -> int:
        return weighted_sample_topk(
            df, k=1, weight_col="weight", salt=f"t{s}"
        ).first()["doc_id"]

    wins = {0: 0, 1: 0, 2: 0}
    with ThreadPoolExecutor(max_workers=8) as pool:
        for doc_id in pool.map(_win, range(300)):
            wins[doc_id] += 1
    # expected 14.3 / 57.1 / 228.6; 3-sigma binomial bands are wide
    assert 2 <= wins[0] <= 34, wins
    assert 30 <= wins[1] <= 90, wins
    assert 190 <= wins[2] <= 262, wins


def test_weighted_sample_without_replacement_and_guards(spark):
    from flechasdb_spark.operators.sampling import weighted_sample_topk
    import pytest as _pytest

    df = spark.createDataFrame(
        [(i, float(1 + i % 3)) for i in range(50)] + [(99, 0.0), (98, None)],
        "doc_id long, weight double",
    )
    out = weighted_sample_topk(df, k=10, weight_col="weight").collect()
    ids = [r["doc_id"] for r in out]
    assert len(ids) == len(set(ids)) == 10  # no replacement
    assert 99 not in ids and 98 not in ids  # zero/NULL weights excluded
    # determinism across calls
    again = [
        r["doc_id"]
        for r in weighted_sample_topk(df, k=10, weight_col="weight").collect()
    ]
    assert ids == again
    with _pytest.raises(ValueError):
        weighted_sample_topk(df, k=0, weight_col="weight")


def test_weighted_sample_plan_is_topk(spark):
    from flechasdb_spark.operators.sampling import weighted_sample_topk

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        weighted_sample_topk(docs, k=10, weight_col="n_chars")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Join" not in plan


def test_kfold_assign_matches_oracle_and_balances(spark):
    from flechasdb_spark.operators.sampling import kfold_assign

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = kfold_assign(docs, n_folds=5).toPandas()
    assert set(out["fold"].unique()) <= set(range(5))
    assert (out["rep"] == out["doc_id"]).all()
    # deterministic across calls
    again = kfold_assign(docs, n_folds=5).toPandas()
    assert out.sort_values("doc_id")["fold"].tolist() == again.sort_values(
        "doc_id"
    )["fold"].tolist()
    # every fold is a ~1/k sample (loose bound for the fixture size)
    counts = out.groupby("fold").size()
    assert counts.min() > 0.5 * len(out) / 5
    assert counts.max() < 1.6 * len(out) / 5


def test_kfold_assign_cluster_aware_never_splits_a_cluster(spark):
    """The leakage invariant: with a dup-pair edge list, every member
    of a connected component gets the SAME fold (a crawl copy of a
    validation doc must not train the model in the other folds)."""
    from pyspark.sql import functions as F

    from flechasdb_spark.operators.sampling import kfold_assign

    docs = spark.range(200).select(F.col("id").alias("doc_id"))
    # chains 0-1-2, 10-11, 20-21-22-23; rest singletons
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11), (20, 21), (21, 22), (22, 23)],
        "id_a long, id_b long",
    )
    out = kfold_assign(docs, n_folds=4, pairs=pairs).toPandas()
    byid = dict(zip(out["doc_id"], out["fold"]))
    rep = dict(zip(out["doc_id"], out["rep"]))
    for cluster in ([0, 1, 2], [10, 11], [20, 21, 22, 23]):
        assert len({byid[i] for i in cluster}) == 1, cluster
        assert {rep[i] for i in cluster} == {min(cluster)}, cluster
    # singletons keep themselves as rep
    assert rep[99] == 99
    # and the assignment is identical to hashing the rep directly
    direct = kfold_assign(
        docs.select(F.col("doc_id")), n_folds=4
    ).toPandas()
    d = dict(zip(direct["doc_id"], direct["fold"]))
    assert byid[0] == byid[1] == byid[2] == d[0]
    assert byid[99] == d[99]
