"""Edge-case semantics pinned by SURVEY.md §2.4: truncate when k exceeds
candidates, empty inputs, dimension mismatches, missing attributes."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from flechasdb_spark.operators.build import IndexConfig, build_index
from flechasdb_spark.operators.knn import flat_knn, knn_join
from flechasdb_spark.plans.ivf import ann_query

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_flat_knn_k_exceeds_m_truncates(spark, emb):
    """k > M returns M rows (truncate semantics,
    /root/reference/src/db/build.rs:337)."""
    small = emb.limit(5)
    qv = [0.0] * 64
    assert flat_knn(small, qv, k=100).count() == 5


def test_ann_query_k_exceeds_candidates_truncates(spark, emb):
    cfg = IndexConfig(num_partitions=8, num_divisions=4, num_codes=8, seed=21)
    model = build_index(emb, cfg)
    qv = [float(x) for x in emb.first().embedding]
    # nprobe=1 restricts candidates to one partition; k huge
    out = ann_query(model, [(0, qv)], k=10_000, nprobe=1).collect()
    assert 0 < len(out) < 10_000
    # all results from a single partition
    assert len({r.partition_id for r in out}) == 1


def test_build_empty_dataframe_rejected(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="empty"):
        build_index(empty, IndexConfig(num_partitions=2, num_divisions=2))


def test_build_indivisible_dimension_rejected(spark, emb):
    # vector_size 64 % num_divisions 7 != 0 (src/vector.rs:162-168)
    with pytest.raises(ValueError, match="divisible"):
        build_index(emb, IndexConfig(num_partitions=4, num_divisions=7))


def test_query_wrong_width_rejected(spark, emb):
    cfg = IndexConfig(num_partitions=4, num_divisions=4, num_codes=8, seed=2)
    model = build_index(emb.limit(50), cfg)
    with pytest.raises(ValueError, match="width"):
        ann_query(model, [(0, [0.0] * 32)], k=5, nprobe=2)


def test_knn_join_empty_query_side(spark, emb):
    qs = spark.createDataFrame([], "query_id long, qvector array<float>")
    assert knn_join(qs, emb, k=5).count() == 0


def test_dedup_empty_text_tokens(spark):
    """Empty/whitespace-only docs: zero tokens, zero stats, no crash
    (reference chunk accepts empty input, src/vector.rs:196-203)."""
    from flechasdb_spark.operators.text import token_stats

    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "one token here")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.n_tokens for r in token_stats(docs).collect()}
    assert out == {1: 0, 2: 0, 3: 3}


def test_lsh_on_single_row_corpus(spark, emb):
    from flechasdb_spark.operators.similarity import lsh_neardup_pairs

    one = emb.limit(1)
    assert lsh_neardup_pairs(one, threshold=0.5, dim=64, bits=4).count() == 0


def test_get_attributes_unknown_id_errors(spark, emb):
    """Reference parity: get_attribute on an unknown vector id is an
    ERROR, not an empty result (src/db/stored.rs:621-639); a known id
    with a missing attribute name is NULL (covered by the
    attr_map_fetch oracle row)."""
    from flechasdb_spark.operators.attributes import get_attributes, to_attr_maps

    attrs = to_attr_maps(emb, u64_cols=["label"])
    bad = spark.createDataFrame(
        [(10_000_000, "label")], "vec_id long, name string"
    )
    with pytest.raises(KeyError, match="unknown"):
        get_attributes(attrs, bad)
    # validate_ids=False skips the check: unknown ids silently drop
    assert get_attributes(attrs, bad, validate_ids=False).count() == 0


def test_salted_join_equals_plain_join(spark):
    """Salting redistributes rows, never changes the result — including
    a pathological hot key."""
    from flechasdb_spark.operators.skew import salted_join

    left = spark.createDataFrame(
        [(i, 1 if i < 90 else i, float(i)) for i in range(100)],
        "row_id long, k long, v double",
    )
    right = spark.createDataFrame(
        [(1, "hot"), (95, "cold"), (96, "cold2")], "k long, tag string"
    )
    plain = {
        (r.row_id, r.k, r.tag)
        for r in left.join(right, "k").select("row_id", "k", "tag").collect()
    }
    salted = {
        (r.row_id, r.k, r.tag)
        for r in salted_join(left, right, on="k", salt=4, row_col="row_id")
        .select("row_id", "k", "tag")
        .collect()
    }
    assert plain == salted and len(plain) == 92
    with pytest.raises(ValueError, match="salt"):
        salted_join(left, right, on="k", salt=0)


def test_kmv_estimate_accuracy_and_exact_small_groups(spark):
    """KMV: exact when distinct < k; within ~3/sqrt(k) of truth when
    sketching; k < 3 rejected."""
    from flechasdb_spark.operators.sketch import kmv_distinct

    df = spark.range(5000).select(
        (F.col("id") % 2).alias("g"), (F.col("id") % 1500).alias("v")
    )
    # g=0: distinct v = 750+ ... both groups have 750 distinct values
    out = {r.g: r for r in kmv_distinct(df, "v", ["g"], k=128).collect()}
    for g in (0, 1):
        est = out[g].kmv_estimate
        assert abs(est - 750) / 750 < 3 / (128 ** 0.5), (g, est)
    small = spark.range(50).select(F.lit(0).alias("g"), F.col("id").alias("v"))
    r = kmv_distinct(small, "v", ["g"], k=128).first()
    assert r.n_kept == 50 and r.kmv_estimate == 50.0
    with pytest.raises(ValueError, match="k must be"):
        kmv_distinct(small, "v", ["g"], k=2)


def test_hll_branches_and_accuracy(spark):
    """HLL: harmonic branch engages at high cardinality (V hits 0 or
    raw > 2.5m) with ~2*1.04/sqrt(m) relative error; linear-counting
    branch engages at low cardinality and is near-exact; a pure-Python
    register replay reproduces the Spark estimate bit for bit; p
    bounds rejected."""
    import hashlib

    import pytest

    from flechasdb_spark.operators.sketch import hll_distinct

    df = spark.range(60_000).select(
        (F.col("id") % 2).alias("g"), (F.col("id") % 20_000).alias("v")
    )
    out = {r.g: r for r in hll_distinct(df, "v", ["g"], p=6).collect()}
    for g in (0, 1):
        r = out[g]
        assert r.used_linear == 0, r
        assert abs(r.hll_estimate - 10_000) / 10_000 < 2 * 1.04 / (64**0.5), r
    small = spark.range(40).select(F.lit(0).alias("g"), F.col("id").alias("v"))
    rs = hll_distinct(small, "v", ["g"], p=6).first()
    assert rs.used_linear == 1 and rs.v_zero > 0
    assert abs(rs.hll_estimate - 40) / 40 < 0.35, rs

    # register replay: same md5 -> index/rank -> integer harmonic sum
    m, w, mr = 64, 54, 55
    regs = {}
    for vv in range(0, 20_000, 2):  # g=0 holds the even residues
        h = int(hashlib.md5(str(vv).encode()).hexdigest()[:15], 16)
        idx, rest = h >> w, h & ((1 << w) - 1)
        rank = mr if rest == 0 else mr - rest.bit_length()
        regs[idx] = max(regs.get(idx, 0), rank)
    s_int = sum(1 << (mr - mm) for mm in regs.values()) + (m - len(regs)) * (
        1 << mr
    )
    raw = 0.709 * m * m * float(1 << mr) / float(s_int)
    assert round(raw, 4) == out[0].hll_estimate

    with pytest.raises(ValueError, match="p must be"):
        hll_distinct(small, "v", ["g"], p=1)


def test_chunk_text_udtf_windows_and_edges(spark):
    """Context-window UDTF: overlap carry-over, short-doc single chunk,
    empty doc -> zero rows, bad config rejected."""
    import pytest
    from pyspark.sql import functions as F

    from flechasdb_spark.operators.text import chunk_text_udtf

    chunk = chunk_text_udtf(chunk_size=4, overlap=1)
    docs = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x y"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    rows = sorted(
        (r.doc_id, r.chunk_idx, r.chunk)
        for r in docs.lateralJoin(chunk(F.col("text").outer())).collect()
    )
    # stride = 3: windows [a..d], [d..g], [g]
    assert rows == [
        (1, 1, "a b c d"),
        (1, 2, "d e f g"),
        (1, 3, "g"),
        (2, 1, "x y"),
    ]
    with pytest.raises(ValueError, match="overlap"):
        chunk_text_udtf(chunk_size=4, overlap=4)


def test_histogram_quantiles_accuracy_and_validation(spark):
    """Sketch quantiles land within one bucket width of the exact
    percentile; invalid probs/bounds rejected."""
    import pytest
    from pyspark.sql import functions as F

    from flechasdb_spark.operators.sketch import histogram_quantiles

    df = spark.range(10_000).select(
        (F.col("id") % 7).alias("g"), (F.col("id") % 1000).cast("double").alias("v")
    )
    lo, hi, buckets = 0.0, 1000.0, 200
    width = (hi - lo) / buckets
    got = {
        (r.g, r.prob): r.q_est
        for r in histogram_quantiles(
            df, "v", probs=[0.5, 0.9], lo=lo, hi=hi,
            num_buckets=buckets, group_cols=["g"],
        ).collect()
    }
    exact = {
        (r.g, p): r[f"p{int(p*100)}"]
        for r in df.groupBy("g").agg(
            F.expr("percentile(v, 0.5D)").alias("p50"),
            F.expr("percentile(v, 0.9D)").alias("p90"),
        ).collect()
        for p in (0.5, 0.9)
    }
    assert len(got) == 14
    for key, est in got.items():
        assert abs(est - exact[key]) <= width + 1e-9, (key, est, exact[key])

    with pytest.raises(ValueError, match="probs"):
        histogram_quantiles(df, "v", probs=[0.0], lo=lo, hi=hi)
    with pytest.raises(ValueError, match="hi > lo"):
        histogram_quantiles(df, "v", probs=[0.5], lo=1.0, hi=1.0)


def test_cms_overestimates_never_under(spark):
    """Count-min property: est >= exact for every queried value; exact
    when the sketch is wide enough that no collisions occur."""
    from pyspark.sql import functions as F

    from flechasdb_spark.operators.sketch import cms_build, cms_estimate

    df = spark.createDataFrame(
        [(i % 7,) for i in range(700)] + [(99,)] * 3, "v long"
    )
    exact = {r.v: r.c for r in df.groupBy("v").agg(F.count(F.lit(1)).alias("c")).collect()}
    vals = df.select("v").distinct()
    # narrow sketch: collisions likely, but never an underestimate
    narrow = cms_build(df, "v", width=4, depth=2)
    for r in cms_estimate(narrow, vals, "v", width=4, depth=2).collect():
        assert r.est >= exact[r.v]
    # wide sketch: 8 distinct values vs 4096 buckets -> exact w.h.p.
    wide = cms_build(df, "v", width=4096, depth=4)
    for r in cms_estimate(wide, vals, "v", width=4096, depth=4).collect():
        assert r.est == exact[r.v]
    # unseen value estimates 0 on the wide sketch
    unseen = spark.createDataFrame([(123456,)], "v long")
    r = cms_estimate(wide, unseen, "v", width=4096, depth=4).first()
    assert r.est == 0


def test_gopher_filter_line_and_word_rules(spark):
    """Exercise the line-based Gopher rules the single-line corpus
    can't: bullets, ellipsis endings, symbol tokens, non-alpha words,
    and the empty document."""
    from flechasdb_spark.operators.text import gopher_quality_filter

    good = ("the quick brown fox jumps over the lazy dog and that have "
            "with be to of " * 5)
    bullets = "- item one\n- item two\n- item three\nthe end of that have"
    ells = "the first line...\nthe second line...\nthe third have of"
    symbols = "the # of # and # that # have # be # to # with # # # # #"
    nonalpha = "the 123 456 789 012 345 678 901 234 567 890 of and that have"
    df = spark.createDataFrame(
        [(1, good), (2, bullets), (3, ells), (4, symbols), (5, nonalpha),
         (6, "")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r
        for r in gopher_quality_filter(
            df, min_words=5, min_stop_hits=2, min_mean_word_len=2.0
        ).collect()
    }
    assert got[1].keep is True
    # 3 of 4 lines start with '-': bullet_ratio 0.75 <= 0.9 passes, but
    # tighten the threshold and it fails
    assert abs(got[2].bullet_ratio - 0.75) < 1e-12
    r2 = {
        r.doc_id: r
        for r in gopher_quality_filter(
            df, min_words=5, min_stop_hits=2, min_mean_word_len=2.0,
            max_bullet_ratio=0.5,
        ).collect()
    }
    assert r2[2].keep is False
    # 2 of 3 lines end with '...'
    assert abs(got[3].ellipsis_ratio - round(2 / 3, 4)) < 1e-3
    assert got[3].keep is False
    assert got[4].keep is False and got[4].symbol_ratio > 0.1
    assert got[5].keep is False and got[5].alpha_word_ratio < 0.8
    assert got[6].keep is False and got[6].n_words == 0


def _py_gopher_keep(text, min_words=5, max_words=100000, min_mwl=2.0,
                    max_mwl=10.0, max_sym=0.1, max_bullet=0.9,
                    max_ell=0.3, min_alpha=0.8, min_stop=1):
    """Pure-Python keep decision (exact-integer divisions only, so it
    must agree with both engines bit-for-bit)."""
    import re

    from flechasdb_spark.operators.text import GOPHER_REQUIRED_STOPWORDS

    toks = [t for t in text.lower().strip().split() if t]
    n = len(toks)
    lines = text.split("\n")
    if n == 0:
        return False
    mean_wl = sum(len(t) for t in toks) / n
    sym = sum(1 for t in toks if "#" in t or "..." in t) / n
    bullet = sum(
        1 for l in lines if l.lstrip()[:1] in ("-", "*", "•")
    ) / len(lines)
    ell = sum(1 for l in lines if l.rstrip().endswith("...")) / len(lines)
    alpha = sum(1 for t in toks if re.search("[a-z]", t)) / n
    stop = len(set(toks) & set(GOPHER_REQUIRED_STOPWORDS))
    return (min_words <= n <= max_words and min_mwl <= mean_wl <= max_mwl
            and sym <= max_sym and bullet <= max_bullet and ell <= max_ell
            and alpha >= min_alpha and stop >= min_stop)


def test_gopher_matches_python_reference(spark):
    """Randomized corpora with newlines/bullets/symbols: the Spark keep
    decision equals the pure-Python reference on every doc."""
    import random

    from flechasdb_spark.operators.text import gopher_quality_filter

    words = ["the", "of", "and", "value", "x1", "##", "...", "a", "-",
             "table", "123", "zz"]
    for seed in (7, 8):
        rng = random.Random(seed)

        def line(rng=rng):
            pre = rng.choice(["", "- ", "* ", "  "])
            suf = rng.choice(["", "...", "."])
            return pre + " ".join(
                rng.choices(words, k=rng.randint(0, 12))
            ) + suf

        rows = [
            (i, "\n".join(line() for _ in range(rng.randint(1, 5))))
            for i in range(80)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.doc_id: r.keep
            for r in gopher_quality_filter(
                df, min_words=5, min_stop_hits=1, min_mean_word_len=2.0
            ).collect()
        }
        for did, text in rows:
            assert got[did] == _py_gopher_keep(text), (seed, did, text)


def test_bloom_one_sided_error(spark):
    """Members are ALWAYS maybe=true (no false negatives); non-members
    are mostly false at the sized FP rate."""
    from flechasdb_spark.operators.sketch import (
        bloom_build,
        bloom_maybe_contains,
    )

    members = [(f"m{i}",) for i in range(500)]
    others = [(f"x{i}",) for i in range(500)]
    ref = spark.createDataFrame(members, "v string")
    bloom = bloom_build(ref, "v", n_words=256, k=4)
    probe = spark.createDataFrame(members + others, "v string")
    got = {r.v: r.maybe for r in bloom_maybe_contains(
        probe, bloom, "v", n_words=256, k=4).collect()}
    assert all(got[f"m{i}"] for i in range(500)), "false negative!"
    fp = sum(1 for i in range(500) if got[f"x{i}"]) / 500
    assert fp < 0.05, f"fp rate {fp} way above sizing (~0.24% at 500/16k)"


def test_bloom_probe_nwords_mismatch_raises_both_directions(spark):
    """The sizing guard is TWO-sided (r5 ADVICE): an undersized probe
    n_words reads out-of-range word indexes, an OVERSIZED one silently
    probed with a different modulus m and produced false negatives —
    both must raise, in both impls."""
    import pytest
    from py4j.protocol import Py4JJavaError

    from flechasdb_spark.operators.sketch import (
        bloom_build,
        bloom_maybe_contains,
    )

    ref = spark.createDataFrame([(f"m{i}",) for i in range(300)], "v string")
    bloom = bloom_build(ref, "v", n_words=128, k=4)
    probe = spark.createDataFrame([("m0",), ("zz",)], "v string")
    for bad_n in (64, 256):
        for impl in ("map", "relational"):
            with pytest.raises((Py4JJavaError, Exception)) as ei:
                bloom_maybe_contains(
                    probe, bloom, "v", n_words=bad_n, k=4, impl=impl
                ).collect()
            assert "n_words" in str(ei.value)


def test_bloom_map_probe_is_shuffle_free_and_matches_relational(spark):
    """The product probe (impl='map', literal word array) must produce
    the same booleans as the relational explode+join+regroup form, add
    no Exchange to the probe plan (the r4 ADVICE hazard: the regroup
    exchanged the full probe side), and preserve duplicate rows that
    the relational regroup would collapse."""
    from pyspark.sql import functions as F

    from flechasdb_spark.operators.sketch import (
        bloom_build,
        bloom_maybe_contains,
    )

    ref = spark.createDataFrame([(f"m{i}",) for i in range(300)], "v string")
    bloom = bloom_build(ref, "v", n_words=128, k=4)
    probe = spark.createDataFrame(
        [(f"m{i}",) for i in range(300)] + [(f"x{i}",) for i in range(300)],
        "v string",
    )
    got_map = {
        r.v: r.maybe
        for r in bloom_maybe_contains(
            probe, bloom, "v", n_words=128, k=4, impl="map"
        ).collect()
    }
    got_rel = {
        r.v: r.maybe
        for r in bloom_maybe_contains(
            probe, bloom, "v", n_words=128, k=4, impl="relational"
        ).collect()
    }
    assert got_map == got_rel
    # wide-row probe: no shuffle of the probe side regardless of column
    # count. Materialize the filter first so the plan under test holds
    # ONLY the probe (the embedded bloom BUILD legitimately shuffles
    # its <= n_words rows).
    bloom_local = spark.createDataFrame(
        bloom.collect(), "word_idx long, word long, n_words long"
    )
    wide = probe.select(
        "v", *[F.lit(f"pad{i}").alias(f"w{i}") for i in range(12)]
    )
    plan = (
        bloom_maybe_contains(wide, bloom_local, "v", n_words=128, k=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the one-row word-array broadcast is the ONLY exchange allowed;
    # the probe side itself must never repartition
    assert "hashpartitioning" not in plan and "rangepartitioning" not in plan, (
        "map probe must not shuffle the probe side"
    )
    # duplicates pass through 1:1 (the relational form collapses them)
    dup = spark.createDataFrame([("m0",), ("m0",), ("zz",)], "v string")
    rows = bloom_maybe_contains(dup, bloom, "v", n_words=128, k=4).collect()
    assert sorted((r.v, r.maybe) for r in rows)[:2] == [
        ("m0", True),
        ("m0", True),
    ]


def test_bloom_relational_probe_guards_reserved_names(spark):
    import pytest

    from flechasdb_spark.operators.sketch import (
        bloom_build,
        bloom_maybe_contains,
    )

    ref = spark.createDataFrame([("a",)], "v string")
    bloom = bloom_build(ref, "v", n_words=8, k=2)
    clash = spark.createDataFrame([("a", 1)], "v string, word long")
    with pytest.raises(ValueError, match="reserves column names"):
        bloom_maybe_contains(
            clash, bloom, "v", n_words=8, k=2, impl="relational"
        )
    with pytest.raises(ValueError, match="must be 'map' or 'relational'"):
        bloom_maybe_contains(clash, bloom, "v", impl="nope")
    # mismatched n_words raises at evaluation time (the map probe's
    # per-row broadcast-constant guard), not a silent false-negative
    many = spark.createDataFrame([(f"v{i}",) for i in range(64)], "v string")
    wide_bloom = bloom_build(many, "v", n_words=8, k=4)  # fills all 8 words
    with pytest.raises(Exception, match="n_words"):
        bloom_maybe_contains(many, wide_bloom, "v", n_words=4, k=4).collect()


def test_bloom_words_stay_positive(spark):
    """63-bit packing: no word ever uses the sign bit (portability
    contract with the BIGINT oracle)."""
    from flechasdb_spark.operators.sketch import bloom_build
    from pyspark.sql import functions as F

    ref = spark.createDataFrame([(f"v{i}",) for i in range(2000)], "v string")
    bloom = bloom_build(ref, "v", n_words=8, k=4)  # saturate the words
    row = bloom.agg(F.min("word").alias("mn"), F.count("*").alias("n")).first()
    assert row.mn > 0 and row.n <= 8


def test_unigram_logprob_hand_computed(spark):
    """Tiny corpus vs exact Python arithmetic: seen tokens use
    round(1e6*ln((c+1)/(N+V))), unseen take the smoothing floor, empty
    docs score 0 with seen_ratio 1.0 by convention."""
    import math

    from flechasdb_spark.operators.text import unigram_logprob_score

    ref = spark.createDataFrame(
        [(0, "a a b"), (1, "a c")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [(10, "a b"), (11, "z"), (12, "")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in unigram_logprob_score(docs, ref).collect()}
    N, V = 5, 3  # tokens a:3 b:1 c:1 -> N=5, V=3
    lq = lambda c: round(1e6 * (math.log(c + 1) - math.log(N + V)))
    floor = round(1e6 * (-math.log(N + V)))
    assert out[10].nll_micro_nats == -(lq(3) + lq(1))
    assert out[10].n_tokens == 2 and out[10].seen_ratio == 1.0
    assert out[11].nll_micro_nats == -floor and out[11].seen_ratio == 0.0
    assert out[12].n_tokens == 0 and out[12].nll_micro_nats == 0
    assert out[12].mean_nll == 0.0 and out[12].seen_ratio == 1.0
    assert out[10].mean_nll == round(out[10].nll_micro_nats / 2 / 1e6, 4)
    # ordering property: in-distribution text scores lower NLL than
    # out-of-vocabulary text
    assert out[10].mean_nll < out[11].mean_nll


def test_ppl_band_select_thirds_and_monotone(spark):
    """Bands partition the corpus into contiguous NLL ranges: every
    head doc scores below every middle doc, every middle below every
    tail, and with well-spread scores the split is near terciles."""
    from flechasdb_spark.operators.text import ppl_band_select

    ref = spark.createDataFrame(
        [(i, "common words " * 5 + f"rare{i}") for i in range(60)],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        # graded OOV fraction -> graded mean NLL
        [
            (i, " ".join(
                ["common" if j < i % 10 else f"oov{i}_{j}" for j in range(10)]
            ))
            for i in range(90)
        ],
        "doc_id long, text string",
    )
    rows = ppl_band_select(docs, ref).collect()
    by_band: dict[str, list[float]] = {}
    for r in rows:
        by_band.setdefault(r.band, []).append(r.mean_nll)
    assert set(by_band) <= {"head", "middle", "tail"}
    assert len(rows) == 90
    if "head" in by_band and "middle" in by_band:
        assert max(by_band["head"]) <= min(by_band["middle"])
    if "middle" in by_band and "tail" in by_band:
        assert max(by_band["middle"]) <= min(by_band["tail"])
    # near-terciles (quantization tolerance: one histogram bucket can
    # hold many docs of identical score)
    assert all(len(v) >= 9 for v in by_band.values()), {
        k: len(v) for k, v in by_band.items()
    }


def test_nb_classifier_separates_disjoint_vocab(spark):
    """Multinomial NB over hashed buckets: disjoint-vocabulary labels
    must classify perfectly; an empty doc falls back to priors with
    the deterministic smallest-label tie-break."""
    from flechasdb_spark.operators.classify import nb_score, nb_train

    train = spark.createDataFrame(
        [
            (1, "cat", "meow purr whiskers feline meow"),
            (2, "cat", "purr meow kitten feline"),
            (3, "dog", "woof bark fetch canine woof"),
            (4, "dog", "bark woof puppy canine"),
        ],
        "doc_id long, source string, text string",
    )
    ev = spark.createDataFrame(
        [(10, "meow purr kitten"), (11, "bark fetch puppy"), (12, "")],
        "doc_id long, text string",
    )
    priors, loglik = nb_train(train)
    # the loglik grid is DENSE: every (label, bucket) pair present
    assert loglik.count() == 2 * 256
    got = {r.doc_id: r.predicted for r in nb_score(ev, priors, loglik).collect()}
    assert got == {10: "cat", 11: "dog", 12: "cat"}


def test_nb_score_is_integer_exact_sum(spark):
    """score(doc, l) must equal prior + sum(c_b * loglik_b) computed
    independently in Python from the model tables."""
    from flechasdb_spark.operators.classify import nb_score, nb_train
    from flechasdb_spark.functions.texthash import md5_long
    import hashlib

    train = spark.createDataFrame(
        [(1, "a", "x y z x"), (2, "b", "p q r p q")],
        "doc_id long, source string, text string",
    )
    ev = spark.createDataFrame([(9, "x p q")], "doc_id long, text string")
    priors, loglik = nb_train(train, n_buckets=64)
    pr = {r.label: r.prior_lq for r in priors.collect()}
    ll = {(r.label, r.bucket): r.loglik_lq for r in loglik.collect()}

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % 64

    scores = {
        lab: pr[lab] + sum(ll[(lab, bucket(t))] for t in "x p q".split())
        for lab in pr
    }
    want_label = max(sorted(scores), key=lambda l: (scores[l], ))
    row = nb_score(ev, priors, loglik, n_buckets=64).collect()[0]
    assert row.predicted == want_label
    assert row.score_micro_nats == scores[want_label]


def test_bigram_backoff_prefers_in_domain_order(spark):
    """A doc whose bigrams were all seen in training must score a
    lower mean NLL and a higher bigram hit ratio than the same words
    in an unseen order; empty docs take the 0/0.0/1.0 convention."""
    from flechasdb_spark.operators.text import bigram_backoff_score

    ref = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(5)],
        "doc_id long, text string",
    )
    df = spark.createDataFrame(
        [
            (100, "the quick brown fox"),       # all bigrams seen
            (101, "fox brown quick the"),       # words seen, order not
            (102, ""),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in bigram_backoff_score(df, ref).collect()}
    assert rows[100].bigram_hit_ratio == 1.0
    assert rows[101].bigram_hit_ratio == 0.0
    assert rows[100].mean_nll < rows[101].mean_nll
    assert rows[102].n_tokens == 0
    assert rows[102].nll_micro_nats == 0
    assert rows[102].mean_nll == 0.0
    assert rows[102].bigram_hit_ratio == 1.0


def test_kneser_ney_continuation_beats_raw_frequency(spark):
    """The defining KN property: a word's model mass comes from how
    many DISTINCT contexts it follows, not raw frequency. 'francisco'
    appears 10x (always after 'san'); 'b' appears 3x after 3 distinct
    contexts — after an unseen context, 'b' must score better. Seen
    bigrams beat unseen orderings, and empty docs keep the
    0/0.0/1.0 convention."""
    from flechasdb_spark.operators.text import kneser_ney_score

    ref_rows = [(i, "san francisco") for i in range(10)]
    ref_rows += [(20, "a b"), (21, "c b"), (22, "d b")]
    ref = spark.createDataFrame(ref_rows, "doc_id long, text string")
    df = spark.createDataFrame(
        [
            (100, "zz francisco"),  # unseen context -> continuation prob
            (101, "zz b"),
            (102, "san francisco"),  # fully in-model bigram
            (103, "francisco san"),  # same words, unseen order
            (104, ""),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in kneser_ney_score(df, ref).collect()}
    # continuation: n1w(b)=3 > n1w(francisco)=1 despite 10x frequency
    assert rows[101].nll_micro_nats < rows[100].nll_micro_nats
    assert rows[102].kn_hit_ratio == 1.0
    assert rows[103].kn_hit_ratio == 0.0
    assert rows[102].mean_nll < rows[103].mean_nll
    assert rows[104].n_tokens == 0
    assert rows[104].nll_micro_nats == 0
    assert rows[104].mean_nll == 0.0
    assert rows[104].kn_hit_ratio == 1.0


def test_kneser_ney_matches_python_replica(spark):
    """Exact integer micro-nat parity between the distributed operator
    and a pure-Python replica of the per-token rule on a mixed corpus
    (seen pairs, unseen pairs under seen contexts, unseen contexts,
    unseen words)."""
    import math
    from collections import Counter

    from flechasdb_spark.operators.text import kneser_ney_score

    ref_texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick red fox sleeps",
        "a lazy dog sleeps",
    ]
    eval_texts = [
        "the quick brown fox",
        "fox the sleeps quick",
        "unseenword the dog",
        "the",
    ]
    ref = spark.createDataFrame(
        list(enumerate(ref_texts)), "doc_id long, text string"
    )
    df = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(eval_texts)],
        "doc_id long, text string",
    )
    toks = [t.split() for t in ref_texts]
    big = Counter((t[i - 1], t[i]) for t in toks for i in range(1, len(t)))
    cu, n1u, n1w = Counter(), Counter(), Counter()
    for (u, w), c in big.items():
        cu[u] += c
        n1u[u] += 1
        n1w[w] += 1
    npt, vc = sum(n1w.values()), len(n1w)

    def pc(w):
        if w in n1w:
            return (n1w[w] + 1) / (npt + vc + 1)
        return 1.0 / (npt + vc + 1)

    def lq(u, w):
        if u is None or u not in cu:
            return round(1e6 * math.log(pc(w)))
        p = (
            max(big.get((u, w), 0) - 0.75, 0.0) + (0.75 * n1u[u]) * pc(w)
        ) / cu[u]
        return round(1e6 * math.log(p))

    rows = {r.doc_id: r for r in kneser_ney_score(df, ref).collect()}
    for i, t in enumerate(eval_texts):
        ws = t.split()
        want = -sum(
            lq(ws[j - 1] if j else None, ws[j]) for j in range(len(ws))
        )
        assert rows[100 + i].nll_micro_nats == want, (i, t)


def test_nb_score_plan_single_docwide_join(spark):
    """The dense loglik grid means every tokened doc scores all labels
    inside ONE partial-agg chain; the only corpus-sized join allowed
    is the final per-doc attach (empty-doc default). No docs x labels
    outer join, no cartesian."""
    from flechasdb_spark.operators.classify import nb_score, nb_train

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    priors, loglik = nb_train(docs)
    plan = (
        nb_score(docs, priors, loglik)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert plan.count("SortMergeJoin") <= 1, (
        "only the per-doc attach may shuffle-join"
    )
    # r12: with the literal-model scorer the whole pass is map-only —
    # no exchange at all between the doc scan and the output
    assert "Exchange" not in plan, "literal NB scoring must be map-only"


def test_nb_literal_scorer_matches_relational(spark, monkeypatch):
    """r12: nb_score / nb_score_margin over the literal plan-embedded
    model must return row-identical results to the former
    explode + broadcast-join shape (integer micro-nat sums commute, so
    any summation order gives the same total; tie-breaks are the same
    struct ordering). Includes empty and null texts (prior-only path)."""
    import flechasdb_spark.operators.classify as C

    docs = spark.createDataFrame(
        [
            (0, "alpha beta beta", "web"),
            (1, "gamma alpha", "book"),
            (2, "", "web"),
            (3, None, "book"),
            (4, "beta beta gamma gamma delta", "web"),
        ],
        "doc_id long, text string, source string",
    )
    priors, loglik = C.nb_train(docs, n_buckets=32)
    lit_s = C.nb_score(docs, priors, loglik, n_buckets=32).collect()
    lit_m = C.nb_score_margin(docs, priors, loglik, n_buckets=32).collect()
    monkeypatch.setattr(C, "_nb_model_literal", lambda *a, **k: None)
    rel_s = C.nb_score(docs, priors, loglik, n_buckets=32).collect()
    rel_m = C.nb_score_margin(docs, priors, loglik, n_buckets=32).collect()
    assert sorted(map(tuple, lit_s)) == sorted(map(tuple, rel_s))
    assert sorted(map(tuple, lit_m)) == sorted(map(tuple, rel_m))


def test_tfidf_empty_and_uniform_docs(spark):
    """Empty docs emit no keyword rows but still count in N (classic
    tf-idf: N is the corpus size); a term present in every NON-empty
    doc therefore keeps a small positive idf here, and a term in every
    doc of an all-tokenized corpus scores exactly 0."""
    from flechasdb_spark.operators.text import tfidf_top_terms

    df = spark.createDataFrame(
        [(0, "common alpha"), (1, "common beta"), (2, "")],
        "doc_id long, text string",
    )
    rows = tfidf_top_terms(df, k=5).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["term"]] = r
    assert 2 not in by_doc  # empty doc: no rows
    for d in (0, 1):
        # ln(3/2): the empty doc counts in N
        assert by_doc[d]["common"]["tfidf"] == 0.4055
        # the distinctive term outranks the near-universal one
        assert by_doc[d]["common"]["rank"] > min(
            r["rank"] for r in by_doc[d].values()
        )
    # no empty doc -> the universal term's idf is exactly 0
    df2 = spark.createDataFrame(
        [(0, "common alpha"), (1, "common beta")], "doc_id long, text string"
    )
    rows = {
        (r["doc_id"], r["term"]): r["tfidf"]
        for r in tfidf_top_terms(df2, k=5).collect()
    }
    assert rows[(0, "common")] == 0.0 and rows[(1, "common")] == 0.0


def test_source_token_kl_identical_sources_zero(spark):
    """Two sources with identical token streams both sit at KL ~ 0
    (exactly 0 up to micro-nat quantization)."""
    from flechasdb_spark.operators.text import source_token_kl

    df = spark.createDataFrame(
        [(0, "a b c", "s1"), (1, "a b c", "s2")],
        "doc_id long, text string, source string",
    )
    for r in source_token_kl(df).collect():
        assert abs(r["kl_nats"]) < 1e-4, r


def test_source_token_kl_nonnegative_on_fixture(spark):
    from flechasdb_spark.operators.text import source_token_kl

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    for r in source_token_kl(docs).collect():
        # Gibbs: KL >= 0 (micro-nat rounding can dip a hair below)
        assert r["kl_nats"] >= -1e-5, r


def test_vocab_coverage_full_and_empty_vocab(spark):
    from flechasdb_spark.operators.text import build_vocab, vocab_coverage

    docs = spark.createDataFrame(
        [(0, "x y", "s1"), (1, "x z", "s1")],
        "doc_id long, text string, source string",
    )
    full = build_vocab(docs, top_n=10, min_count=1)
    out = vocab_coverage(docs, full).collect()
    assert out[0]["n_oov"] == 0 and out[0]["oov_ratio"] == 0.0
    empty = full.where("token = '__nope__'")
    out = vocab_coverage(docs, empty).collect()
    assert out[0]["n_oov"] == out[0]["n_tokens"] == 4
    assert out[0]["n_oov_types"] == 3
    assert out[0]["oov_ratio"] == 1.0


def test_corpus_diff_identical_and_disjoint(spark):
    from flechasdb_spark.operators.diff import corpus_diff, corpus_diff_summary

    a = spark.createDataFrame(
        [(0, "t0"), (1, "t1")], "doc_id long, text string"
    )
    same = {r["status"] for r in corpus_diff(a, a).collect()}
    assert same == {"unchanged"}
    b = spark.createDataFrame(
        [(2, "t2"), (3, "t3")], "doc_id long, text string"
    )
    st = {r["doc_id"]: r["status"] for r in corpus_diff(a, b).collect()}
    assert st == {0: "removed", 1: "removed", 2: "added", 3: "added"}
    summ = {
        r["status"]: (r["n_docs"], r["pct"])
        for r in corpus_diff_summary(a, b).collect()
    }
    assert summ == {"added": (2, 0.5), "removed": (2, 0.5)}


def test_cluster_balanced_sample_small_clusters_keep_all(spark):
    """A cluster with fewer than per_cluster members keeps them all;
    assignment ties break to the lowest cluster id."""
    from flechasdb_spark.operators.sampling import cluster_balanced_sample

    vecs = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [0.1, 0.0]), (2, [10.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(5, [0.0, 0.0]), (7, [10.0, 0.0])],
        "cluster long, centroid array<double>",
    )
    out = cluster_balanced_sample(vecs, cents, per_cluster=10).collect()
    got = {(r["vec_id"], r["cluster"]) for r in out}
    assert got == {(0, 5), (1, 5), (2, 7)}
    # equidistant vector: lowest cluster id wins
    mid = spark.createDataFrame(
        [(9, [5.0, 0.0])], "vec_id long, embedding array<double>"
    )
    out = cluster_balanced_sample(mid, cents, per_cluster=1).collect()
    assert out[0]["cluster"] == 5


def test_kmv_set_ops_exact_when_sets_fit(spark):
    """With k larger than every set, the merged sketch is complete, so
    union/intersection/Jaccard estimates equal the EXACT values; and
    disjoint sets report zero overlap."""
    import pyspark.sql.functions as F
    from flechasdb_spark.operators.sketch import kmv_set_ops

    rows = (
        [("a", f"u{i}") for i in range(30)]
        + [("b", f"u{i}") for i in range(10, 40)]   # |a&b|=20 |aUb|=40
        + [("c", f"x{i}") for i in range(15)]        # disjoint from a, b
    )
    df = spark.createDataFrame(rows, "g string, v string")
    out = {
        (r.group_a, r.group_b): r
        for r in kmv_set_ops(df, "v", "g", k=256).collect()
    }
    ab = out[("a", "b")]
    assert ab.n_kept == 40 and ab.union_est == 40.0
    assert ab.jaccard_est == 0.5 and ab.inter_est == 20.0
    for pair in [("a", "c"), ("b", "c")]:
        r = out[pair]
        assert r.jaccard_est == 0.0 and r.inter_est == 0.0
        assert r.union_est == r.n_kept  # exact union below k

    # k must bound the merge: undersized k keeps exactly k rows
    small = {
        (r.group_a, r.group_b): r
        for r in kmv_set_ops(df, "v", "g", k=8).collect()
    }
    assert all(r.n_kept == 8 for r in small.values())

    import pytest as _pt

    with _pt.raises(ValueError):
        kmv_set_ops(df, "v", "g", k=2)


def test_psi_report_ungrouped_default(spark):
    """ADVICE r6: psi_report's default group_cols=None crashed (the
    spine was a zero-column select and the totals joined on an empty
    key list). The ungrouped path must return ONE row whose psi equals
    the grouped computation collapsed onto a constant group, and be
    exactly 0 when cur == ref."""
    from flechasdb_spark.operators.eval import psi_report
    import pyspark.sql.functions as F

    cur = spark.range(200).select((F.col("id") % 50).cast("double").alias("value"))
    ref = spark.range(200).select(((F.col("id") * 7) % 100).cast("double").alias("value"))

    out = psi_report(cur, ref, lo=0.0, hi=100.0, n_bins=8).collect()
    assert len(out) == 1
    row = out[0]
    assert row.n_cur == 200 and row.n_ref == 200
    assert row.psi > 0.0

    # identical distributions -> psi exactly 0
    same = psi_report(cur, cur, lo=0.0, hi=100.0, n_bins=8).collect()[0]
    assert same.psi == 0.0

    # equals the grouped path collapsed to one constant group
    g = (
        psi_report(
            cur.withColumn("g", F.lit("all")),
            ref.withColumn("g", F.lit("all")),
            group_cols=["g"],
            lo=0.0,
            hi=100.0,
            n_bins=8,
        )
        .collect()[0]
    )
    assert g.psi == row.psi and g.n_cur == row.n_cur


def test_lm_literal_scorer_matches_relational(spark):
    """r13 literal LM scorers: the collected-model Arrow kernel must
    be row-identical to the explode/lag + join + aggregate relational
    form — including empty docs, OOV-only docs, single-token docs and
    a disjoint reference (every addend is a JVM-computed integer, so
    equality is exact, not approximate)."""
    from flechasdb_spark.operators.text import (
        bigram_backoff_score,
        unigram_logprob_score,
    )

    ref = spark.createDataFrame(
        [(0, "a a b c"), (1, "b c d"), (2, "")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [(10, "a b"), (11, "z z q"), (12, ""), (13, "c"), (14, "a c d e")],
        "doc_id long, text string",
    )
    for fn in (unigram_logprob_score, bigram_backoff_score):
        lit = sorted(
            map(tuple, fn(docs, ref, impl="literal").collect())
        )
        rel = sorted(
            map(tuple, fn(docs, ref, impl="relational").collect())
        )
        assert lit == rel, f"{fn.__name__}: literal != relational"


def test_lm_literal_budget_fallback(spark, monkeypatch):
    """A vocabulary past SPARK_GRAFT_LM_LITERAL_MAX must fall back to
    the relational form under impl='auto' and raise under
    impl='literal'."""
    import pytest as _pytest

    from flechasdb_spark.operators.text import unigram_logprob_score

    docs = spark.createDataFrame(
        [(0, "a b c d e f")], "doc_id long, text string"
    )
    monkeypatch.setenv("SPARK_GRAFT_LM_LITERAL_MAX", "2")
    out = unigram_logprob_score(docs).collect()  # auto -> relational
    assert out[0].n_tokens == 6
    with _pytest.raises(ValueError, match="LM_LITERAL_MAX"):
        unigram_logprob_score(docs, impl="literal")
