"""repeated_ngram_spans: ExactSubstr-at-word-granularity span
detection (Lee et al., arXiv:2107.06499). Gates:

1. hand-built corpus with planted duplicates at NON-aligned offsets —
   exact span boundaries, island merges, same-doc repeats, and the
   too-short guard;
2. hash key_mode == text key_mode on the fixture corpus (the
   production xxhash64 path must agree with the collision-free oracle
   form the registry pins);
3. a brute-force python oracle over every L-window on the sf fixture.
"""

from __future__ import annotations

import os
from collections import Counter

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _spans(df):
    return sorted(
        (r.doc_id, r.span_start, r.span_end_excl, r.span_words, r.n_windows)
        for r in df.collect()
    )


def test_planted_duplicate_any_alignment(spark):
    from flechasdb_spark.operators.dedup import repeated_ngram_spans

    dup = " ".join(f"d{i}" for i in range(5))  # 5-word duplicated run
    a_words = [f"a{i}" for i in range(7)] + dup.split() + ["a7", "a8"]
    # same run at a DIFFERENT word offset (3) in doc 2 — a segment grid
    # of width 5 would never align these
    b_words = [f"b{i}" for i in range(3)] + dup.split() + [
        f"b{i}" for i in range(3, 9)
    ]
    df = _mk(spark, [(1, " ".join(a_words)), (2, " ".join(b_words))])
    got = _spans(repeated_ngram_spans(df, window_words=5, key_mode="text"))
    # exactly one 5-word window (the run itself) is duplicated per doc
    assert got == [(1, 7, 12, 5, 1), (2, 3, 8, 5, 1)]


def test_island_merge_and_same_doc_repeat(spark):
    from flechasdb_spark.operators.dedup import repeated_ngram_spans

    run = [f"r{i}" for i in range(8)]  # 8-word duplicated run, L=5
    # doc 1 contains the run twice (same-doc repetition counts);
    # doc 2 once. With L=5 an 8-word duplicated run covers windows at
    # offsets 0..3 inside the run -> ONE merged span of 8 words.
    d1 = ["x0", "x1"] + run + ["x2", "x3", "x4", "x5", "x6"] + run + ["x7"]
    d2 = ["y0"] + run + ["y1", "y2", "y3", "y4", "y5"]
    df = _mk(spark, [(1, " ".join(d1)), (2, " ".join(d2))])
    got = _spans(repeated_ngram_spans(df, window_words=5, key_mode="text"))
    assert got == [
        (1, 2, 10, 8, 4),
        (1, 15, 23, 8, 4),
        (2, 1, 9, 8, 4),
    ]


def test_short_docs_emit_nothing(spark):
    from flechasdb_spark.operators.dedup import repeated_ngram_spans

    df = _mk(spark, [(1, "a b c"), (2, "a b c")])  # 3 words < L=5
    assert repeated_ngram_spans(df, window_words=5).count() == 0


def test_bad_key_mode_raises(spark):
    from flechasdb_spark.operators.dedup import repeated_ngram_spans

    with pytest.raises(ValueError):
        repeated_ngram_spans(_mk(spark, [(1, "a")]), key_mode="xx")


def test_hash_mode_equals_text_mode_on_fixture(spark, sf_dir):
    from flechasdb_spark.operators.dedup import repeated_ngram_spans

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    t = _spans(repeated_ngram_spans(docs, window_words=15, key_mode="text"))
    h = _spans(repeated_ngram_spans(docs, window_words=15, key_mode="hash"))
    assert len(t) > 0  # the fixture corpus contains planted duplicates
    assert t == h


def test_matches_bruteforce_python_oracle(spark, sf_dir):
    from flechasdb_spark.operators.dedup import repeated_ngram_spans

    L = 15
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    rows = docs.select("doc_id", "text").collect()
    counts: Counter = Counter()
    per_doc: dict[int, list[int]] = {}
    for r in rows:
        ws = r.text.split(" ")
        ps = []
        for i in range(len(ws) - L + 1):
            w = " ".join(ws[i : i + L])
            counts[w] += 1
            ps.append((i, w))
        per_doc[r.doc_id] = ps
    want = []
    for doc_id, ps in per_doc.items():
        dup = [i for i, w in ps if counts[w] > 1]
        if not dup:
            continue
        start = prev = dup[0]
        n = 1
        for p in dup[1:]:
            if p > prev + L:
                want.append((doc_id, start, prev + L, prev + L - start, n))
                start, n = p, 0
            prev = p
            n += 1
        want.append((doc_id, start, prev + L, prev + L - start, n))
    got = _spans(repeated_ngram_spans(docs, window_words=L, key_mode="hash"))
    assert got == sorted(want)


# --- repeated_span_removal (the removal half of ExactSubstr) ---


def test_removal_keeps_first_occurrence(spark):
    from flechasdb_spark.operators.dedup import repeated_span_removal

    run = [f"r{i}" for i in range(5)]
    d1 = ["a0", "a1"] + run + ["a2"]            # first occurrence (doc 1)
    d2 = ["b0"] + run + ["b1", "b2", "b3"]      # later copy -> removed
    df = _mk(spark, [(1, " ".join(d1)), (2, " ".join(d2))])
    got = {
        r.doc_id: (r.n_words, r.removed_words, r.n_spans, r.clean_text)
        for r in repeated_span_removal(
            df, window_words=5, key_mode="text"
        ).collect()
    }
    assert got[1] == (8, 0, 0, " ".join(d1))          # survives intact
    assert got[2] == (9, 5, 1, "b0 b1 b2 b3")         # run cut out


def test_removal_same_doc_repeat_and_full_removal(spark):
    from flechasdb_spark.operators.dedup import repeated_span_removal

    run = [f"r{i}" for i in range(5)]
    # doc 1 repeats the run back-to-back: the first copy survives, the
    # second is removed; doc 2 is EXACTLY the run -> fully removed
    d1 = run + run + ["x0"]
    df = _mk(spark, [(1, " ".join(d1)), (2, " ".join(run))])
    got = {
        r.doc_id: (r.n_words, r.removed_words, r.n_spans, r.clean_text)
        for r in repeated_span_removal(
            df, window_words=5, key_mode="text"
        ).collect()
    }
    assert got[1] == (11, 5, 1, " ".join(run) + " x0")
    assert got[2] == (5, 5, 1, "")


def test_removal_short_docs_pass_through(spark):
    from flechasdb_spark.operators.dedup import repeated_span_removal

    df = _mk(spark, [(1, "a b"), (2, "a b")])
    got = {r.doc_id: (r.removed_words, r.clean_text)
           for r in repeated_span_removal(df, window_words=5).collect()}
    assert got == {1: (0, "a b"), 2: (0, "a b")}


def test_removal_hash_equals_text_on_fixture(spark, sf_dir):
    from flechasdb_spark.operators.dedup import repeated_span_removal

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    t = sorted(
        (r.doc_id, r.n_words, r.removed_words, r.n_spans, r.clean_text)
        for r in repeated_span_removal(docs, key_mode="text").collect()
    )
    h = sorted(
        (r.doc_id, r.n_words, r.removed_words, r.n_spans, r.clean_text)
        for r in repeated_span_removal(docs, key_mode="hash").collect()
    )
    assert t == h
    assert any(row[2] > 0 for row in t)  # fixture contains removals


def test_removal_consistent_with_span_detection(spark, sf_dir):
    """Removal spans are a subset of detection spans (first occurrences
    are detected but not removed), and the surviving word count checks
    out per document."""
    from flechasdb_spark.operators.dedup import (
        repeated_ngram_spans,
        repeated_span_removal,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    det: dict[int, list[tuple[int, int]]] = {}
    for r in repeated_ngram_spans(docs, key_mode="hash").collect():
        det.setdefault(r.doc_id, []).append((r.span_start, r.span_end_excl))
    for r in repeated_span_removal(docs, key_mode="hash").collect():
        n_clean = len(r.clean_text.split(" ")) if r.clean_text else 0
        assert n_clean == r.n_words - r.removed_words
        if r.n_spans > 0:
            assert r.doc_id in det  # removed spans imply detected spans


# --- cross_source_span_matrix (window-level copy provenance) ---


def test_span_matrix_attributes_to_first_source(spark):
    from flechasdb_spark.operators.dedup import cross_source_span_matrix

    run = " ".join(f"r{i}" for i in range(5))
    df = spark.createDataFrame(
        [
            (1, "x0 " + run + " x1", "wiki"),     # first occurrence
            (2, "y0 y1 " + run, "web"),           # copier 1
            (3, run + " z0 z1 z2", "forum"),      # copier 2
            (4, "clean text with no shared spans at all", "web"),
        ],
        "doc_id long, text string, source string",
    )
    got = sorted(
        (r.src_first, r.src_later, r.n_windows, r.n_docs)
        for r in cross_source_span_matrix(
            df, window_words=5, key_mode="text"
        ).collect()
    )
    assert got == [("wiki", "forum", 1, 1), ("wiki", "web", 1, 1)]


def test_span_matrix_hash_equals_text_and_counts_align(spark, sf_dir):
    """hash==text on the fixture, and the matrix's total later-window
    count equals the number of duplicated windows minus their first
    occurrences (one first per distinct duplicated window)."""
    from flechasdb_spark.operators.dedup import (
        cross_source_span_matrix,
        window_keys,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    t = sorted(
        (r.src_first, r.src_later, r.n_windows, r.n_docs)
        for r in cross_source_span_matrix(docs, key_mode="text").collect()
    )
    h = sorted(
        (r.src_first, r.src_later, r.n_windows, r.n_docs)
        for r in cross_source_span_matrix(docs, key_mode="hash").collect()
    )
    assert t == h and len(t) > 0
    # independent count check from the raw window-key table
    from pyspark.sql import functions as F

    keys = window_keys(docs, 15, "doc_id", "text", "hash")
    per_key = keys.groupBy("__k").count().where(F.col("count") > 1)
    later_total = per_key.select(
        F.sum(F.col("count") - 1)
    ).first()[0]
    assert sum(r[2] for r in t) == later_total


def test_hash_mode_shuffle_carries_only_narrow_schema(spark, sf_dir):
    """The 100 TB contract of hash key_mode: the window-key Exchange
    moves (doc_id, pos, __k) — never the L-word window string. Gate it
    in the physical plan: the first Exchange's input schema must not
    contain the `win` column, and xxhash64 must be projected below it."""
    from flechasdb_spark.operators.dedup import repeated_ngram_spans

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    plan = (
        repeated_ngram_spans(docs, key_mode="hash")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "xxhash64" in plan
    # every Exchange line lists its output columns; none may carry win
    exchanges = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    assert exchanges, "expected shuffle exchanges in the plan"
    assert all("win#" not in ln for ln in plan.splitlines() if "Exchange" in ln)


def test_flag_modes_are_equivalent(spark, sf_dir):
    """window (1-shuffle, default) and join (skew-safe) flag plans are
    semantics-identical across all three span operators."""
    from flechasdb_spark.operators.dedup import (
        cross_source_span_matrix,
        repeated_ngram_spans,
        repeated_span_removal,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    a = _spans(repeated_ngram_spans(docs, flag_mode="window"))
    b = _spans(repeated_ngram_spans(docs, flag_mode="join"))
    assert a == b and len(a) > 0
    ra = sorted(
        (r.doc_id, r.removed_words, r.clean_text)
        for r in repeated_span_removal(docs, flag_mode="window").collect()
    )
    rb = sorted(
        (r.doc_id, r.removed_words, r.clean_text)
        for r in repeated_span_removal(docs, flag_mode="join").collect()
    )
    assert ra == rb
    ma = sorted(
        (r.src_first, r.src_later, r.n_windows, r.n_docs)
        for r in cross_source_span_matrix(docs, flag_mode="window").collect()
    )
    mb = sorted(
        (r.src_first, r.src_later, r.n_windows, r.n_docs)
        for r in cross_source_span_matrix(docs, flag_mode="join").collect()
    )
    assert ma == mb

    import pytest as _pytest

    with _pytest.raises(ValueError):
        repeated_ngram_spans(docs, flag_mode="bogus").collect()


def _py_spans(texts: dict[int, str], L: int):
    """Pure-python reference for repeated_ngram_spans (shared by the
    fixture brute-force test and the randomized corpora below)."""
    counts: Counter = Counter()
    per_doc: dict[int, list[int]] = {}
    for doc_id, text in texts.items():
        ws = text.split(" ")
        ps = []
        for i in range(len(ws) - L + 1):
            w = " ".join(ws[i : i + L])
            counts[w] += 1
            ps.append((i, w))
        per_doc[doc_id] = ps
    want = []
    for doc_id, ps in per_doc.items():
        dup = [i for i, w in ps if counts[w] > 1]
        if not dup:
            continue
        start = prev = dup[0]
        n = 1
        for p in dup[1:]:
            if p > prev + L:
                want.append((doc_id, start, prev + L, prev + L - start, n))
                start, n = p, 0
            prev = p
            n += 1
        want.append((doc_id, start, prev + L, prev + L - start, n))
    return sorted(want)


def test_adversarial_shapes_match_python_oracle(spark):
    """Degenerate inputs: a single repeated word (every window of the
    doc identical — one whole-doc span), multi-space runs (empty
    tokens), exact-L docs, and a doc duplicated verbatim."""
    from flechasdb_spark.operators.dedup import repeated_ngram_spans

    L = 5
    texts = {
        1: " ".join(["a"] * 30),            # all windows identical
        2: " ".join(["a"] * 30),            # verbatim duplicate of 1
        3: "x  y   z " + " ".join(f"w{i}" for i in range(8)),  # empty toks
        4: "p0 p1 p2 p3 p4",                # exactly L words
        5: "p0 p1 p2 p3 p4",                # its duplicate
        6: "solo words that repeat nowhere else at all",
    }
    df = _mk(spark, list(texts.items()))
    got = _spans(repeated_ngram_spans(df, window_words=L, key_mode="text"))
    assert got == _py_spans(texts, L)
    # doc 1/2: one maximal whole-doc span each; doc 4/5 one span each
    by_doc = {}
    for r in got:
        by_doc.setdefault(r[0], []).append(r)
    assert by_doc[1] == [(1, 0, 30, 30, 26)]
    assert by_doc[4] == [(4, 0, 5, 5, 1)]


def test_randomized_corpora_match_python_oracle(spark):
    """Seeded random corpora with planted duplication at random
    offsets, random doc lengths (including < L), and a shared
    boilerplate sentence — Spark (hash mode) vs the python oracle."""
    import numpy as np

    from flechasdb_spark.operators.dedup import repeated_ngram_spans

    rng = np.random.default_rng(17)
    L = 6
    boiler = " ".join(f"b{i}" for i in range(L + 2))
    texts: dict[int, str] = {}
    doc_id = 0
    for _ in range(40):
        n = int(rng.integers(1, 60))
        words = [f"t{int(rng.integers(0, 300))}" for _ in range(n)]
        if rng.random() < 0.3 and n > L:
            pos = int(rng.integers(0, n - L))
            words[pos : pos + L + 2] = boiler.split(" ")
        texts[doc_id] = " ".join(words)
        doc_id += 1
        if rng.random() < 0.15:  # verbatim duplicate at a new id
            texts[doc_id] = texts[doc_id - 1]
            doc_id += 1
    df = _mk(spark, list(texts.items()))
    got = _spans(repeated_ngram_spans(df, window_words=L, key_mode="hash"))
    assert got == _py_spans(texts, L)


# ---------------------------------------------------------------------------
# token granularity (VERDICT r7 #5): caller-supplied tokenization
# ---------------------------------------------------------------------------


def test_token_mode_dedups_no_space_text(spark):
    """CJK/code boundary: text with NO spaces is one 'word' to the
    space tokenizer — word granularity is structurally blind to a
    duplicated run inside it. Character tokens (caller-supplied) catch
    it at the exact boundaries, and the removal re-stitch keeps the
    first occurrence token-for-token."""
    from flechasdb_spark.operators.dedup import (
        repeated_ngram_spans,
        repeated_span_removal,
    )

    run = "甲乙丙丁戊己"  # 6-char duplicated run
    t1 = "一二三" + run + "四五"  # run at char offset 3
    t2 = "六七" + run + "八九十拾"  # run at char offset 2
    df = spark.createDataFrame(
        [(1, t1, list(t1)), (2, t2, list(t2))],
        "doc_id long, text string, toks array<string>",
    )
    # word granularity: each doc is a single token -> nothing found
    assert repeated_ngram_spans(df, window_words=6, key_mode="text").count() == 0
    for km in ("text", "hash"):
        got = _spans(
            repeated_ngram_spans(
                df, window_words=6, key_mode=km, token_col="toks"
            )
        )
        assert got == [(1, 3, 9, 6, 1), (2, 2, 8, 6, 1)], (km, got)
    # removal: first occurrence is (doc 1, pos 3) -> doc 1 intact,
    # doc 2 loses exactly the run's chars
    out = {
        r.doc_id: (r.n_tokens, r.removed_tokens, r.n_spans, list(r.clean_tokens))
        for r in repeated_span_removal(
            df, window_words=6, key_mode="text", token_col="toks"
        ).collect()
    }
    assert out[1] == (11, 0, 0, list(t1))
    assert out[2] == (12, 6, 1, ["六", "七", "八", "九", "十", "拾"])


def test_token_mode_matches_word_mode_on_space_tokenized_text(spark, sf_dir):
    """Consistency gate: feeding the span family its OWN tokenization
    (split on space) through token_col must reproduce word mode
    exactly — spans, counts, and the re-stitched text."""
    import os as _os

    from pyspark.sql import functions as F

    from flechasdb_spark.operators.dedup import (
        repeated_ngram_spans,
        repeated_span_removal,
    )

    docs = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))
    toked = docs.select(
        "doc_id", "text", F.split(F.col("text"), " ").alias("toks")
    )
    sw = _spans(repeated_ngram_spans(docs, key_mode="hash"))
    st = _spans(
        repeated_ngram_spans(toked, key_mode="hash", token_col="toks")
    )
    assert sw == st and len(sw) > 0
    rw = {
        r.doc_id: (r.n_words, r.removed_words, r.n_spans, r.clean_text)
        for r in repeated_span_removal(docs).collect()
    }
    rt = {
        r.doc_id: (
            r.n_tokens,
            r.removed_tokens,
            r.n_spans,
            " ".join(r.clean_tokens),
        )
        for r in repeated_span_removal(toked, token_col="toks").collect()
    }
    assert rw == rt


# ---------------------------------------------------------------------------
# flag_mode skew gate (VERDICT r7 #8): the window-vs-join trade, pinned
# on a hot-key fixture instead of narrated
# ---------------------------------------------------------------------------


def test_flag_mode_join_is_skew_safe_on_hot_key(spark):
    """A boilerplate window repeated across thousands of documents is
    the span family's 100x skew hazard. Pin both halves of the trade:

    - results are identical under both plans on the hot fixture;
    - the "window" plan physically contains a Window over __k, and a
      hash exchange on __k provably serializes EVERY copy of the hot
      key into one partition (the single-task straggler);
    - the "join" plan contains NO Window; its duplicate-key table is
      collapsed by a map-side-combined partial aggregate to ONE row
      per duplicated window (O(distinct keys), never O(copies)), so
      the join back is AQE-splittable / broadcastable.
    """
    from pyspark.sql import functions as F

    from flechasdb_spark.operators.dedup import (
        _flag_dup,
        repeated_ngram_spans,
        window_keys,
    )

    hot = " ".join(f"h{i}" for i in range(5))  # the million-copy stand-in
    n_hot, n_uniq = 3000, 300
    rows = [
        (i, f"u{i}a u{i}b {hot} u{i}c u{i}d") for i in range(n_hot)
    ] + [
        (n_hot + j, " ".join(f"q{j}w{k}" for k in range(9)))
        for j in range(n_uniq)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = _spans(repeated_ngram_spans(docs, window_words=5, flag_mode="window"))
    b = _spans(repeated_ngram_spans(docs, window_words=5, flag_mode="join"))
    assert a == b and len(a) == n_hot  # one hot span per hot doc

    keyed = window_keys(docs, 5, "doc_id", "text", "hash")
    win_plan = (
        _flag_dup(keyed, "window")._jdf.queryExecution().executedPlan().toString()
    )
    join_plan = (
        _flag_dup(keyed, "join")._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" in win_plan
    assert "Window" not in join_plan
    # join mode's count is map-side combined (partial_count below the
    # exchange), so the hot key ships <= one row per map task
    assert "partial_count" in join_plan
    # the window plan's exchange puts ALL copies of the hot key in one
    # partition: simulate it with the same hashpartitioning(__k)
    sp = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    per_part = (
        keyed.repartition(sp, "__k")
        .select(F.spark_partition_id().alias("p"))
        .groupBy("p")
        .count()
    )
    max_rows = per_part.agg(F.max("count")).first()[0]
    # each hot doc contributes exactly one copy of the hot window; all
    # land in one partition (plus whatever else hashes there)
    assert max_rows >= n_hot
    # join mode's dup-key table is O(distinct duplicated windows):
    # the hot key collapses to ONE row before the join back
    dup_keys = (
        keyed.groupBy("__k")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") > 1)
    )
    assert dup_keys.count() == 1  # only the hot window is duplicated
