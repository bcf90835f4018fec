"""BPE tokenizer: the classic Sennrich et al. (2016) merge sequence,
greedy-encode parity between the driver function and the distributed
path, and the concatenation-roundtrip property."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from flechasdb_spark.operators.bpe import (
    END_OF_WORD,
    bpe_apply_word,
    bpe_encode,
    bpe_train,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_bpe_train_classic_example(spark):
    """The worked example from the BPE paper: corpus counts
    low:5 lower:2 newest:6 widest:3 must produce the canonical first
    merges (e,s) -> (es,t) -> (est,</w>) -> (l,o) -> (lo,w)."""
    rows = (
        [("low",)] * 5 + [("lower",)] * 2 + [("newest",)] * 6 + [("widest",)] * 3
    )
    df = spark.createDataFrame(rows, "text string")
    merges = bpe_train(df, n_merges=5)
    assert merges == [
        ("e", "s"),
        ("es", "t"),
        ("est", END_OF_WORD),
        ("l", "o"),
        ("lo", "w"),
    ]
    ranks = {p: i for i, p in enumerate(merges)}
    assert bpe_apply_word("newest", ranks) == ["n", "e", "w", "est</w>"]
    assert bpe_apply_word("lowest", ranks) == ["low", "est</w>"]
    # unseen word degrades to characters + marker, never fails
    assert bpe_apply_word("zz", ranks) == ["z", "z", END_OF_WORD]


def test_bpe_encode_distributed_matches_driver(spark):
    """The distinct-word pandas_udf + join path must equal applying
    bpe_apply_word per word on the driver, in document order."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(40)
    merges = bpe_train(docs, n_merges=50)
    ranks = {p: i for i, p in enumerate(merges)}
    got = {
        r.doc_id: (list(r.pieces), r.n_pieces)
        for r in bpe_encode(docs, merges).collect()
    }
    for row in docs.select("doc_id", "text").collect():
        words = row.text.lower().strip().split()
        want = [p for w in words for p in bpe_apply_word(w, ranks)]
        assert got[row.doc_id][0] == want, row.doc_id
        assert got[row.doc_id][1] == len(want)


def test_bpe_roundtrip_and_compression(spark):
    """Concatenating a word's pieces (minus the marker) restores the
    word; more merges never increase the piece count; n_merges=0 is
    character granularity."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(60)
    words = [
        r["__w"]
        for r in docs.select(
            F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("__w")
        )
        .distinct()
        .collect()
        if r["__w"]
    ]
    m200 = bpe_train(docs, n_merges=200)
    r0: dict = {}
    r200 = {p: i for i, p in enumerate(m200)}
    for w in words:
        chars = bpe_apply_word(w, r0)
        assert chars == list(w) + [END_OF_WORD]
        pieces = bpe_apply_word(w, r200)
        joined = "".join(pieces)
        assert joined == w + END_OF_WORD
        assert len(pieces) <= len(chars)
    # the corpus actually compresses under 200 merges
    enc = bpe_encode(docs, m200)
    n_pieces = enc.agg(F.sum("n_pieces")).collect()[0][0]
    n_chars = docs.select(
        F.sum(F.length(F.regexp_replace(F.lower(F.trim("text")), r"\s+", "")))
    ).collect()[0][0]
    n_words = docs.select(
        F.sum(F.size(F.split(F.lower(F.trim("text")), r"\s+")))
    ).collect()[0][0]
    assert n_words <= n_pieces <= n_chars + n_words


def test_bpe_empty_and_stopping(spark):
    """Empty docs encode to zero pieces; training stops early when no
    pair reaches min_pair_count instead of looping."""
    df = spark.createDataFrame([(1, ""), (2, "ab")], "doc_id long, text string")
    merges = bpe_train(df, n_merges=100, min_pair_count=2)
    # 'ab</w>' appears once; no pair reaches count 2 -> no merges
    assert merges == []
    out = {r.doc_id: r for r in bpe_encode(df, merges).collect()}
    assert out[1].n_pieces == 0 and list(out[1].pieces) == []
    assert list(out[2].pieces) == ["a", "b", END_OF_WORD]


def test_decode_token_ids_roundtrip(spark):
    """r10 detokenization: decode(encode(doc)) equals the normalized
    original with OOV tokens masked as <unk>, for every document."""
    import os

    from pyspark.sql import functions as F

    from flechasdb_spark.operators.text import (
        build_vocab,
        decode_token_ids,
        encode_token_ids,
        tokens,
    )

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    # tiny top_n so the synthetic corpus (only ~31 distinct tokens at
    # sf0.001) actually has OOV tokens and the <unk> branch is exercised
    vocab = build_vocab(docs, top_n=10, min_count=2)
    known = {r.token for r in vocab.select("token").collect()}
    enc = encode_token_ids(docs, vocab)
    dec = {r.doc_id: r.decoded_text for r in decode_token_ids(enc, vocab).collect()}
    orig = {
        r.doc_id: [t for t in r.ts]
        for r in docs.select("doc_id", tokens("text").alias("ts")).collect()
    }
    assert dec.keys() == orig.keys()
    n_unk_docs = 0
    for did, ts in orig.items():
        want = " ".join(t if t in known else "<unk>" for t in ts)
        assert dec[did] == want, did
        if any(t not in known for t in ts):
            n_unk_docs += 1
    assert n_unk_docs > 0  # the mask branch is actually exercised


def test_decode_token_ids_broadcast_fallback_equals_literal(spark):
    """VERDICT r10 #7: past max_literal_vocab the decode auto-switches
    from the create_map literal to an Arrow pandas_udf over an
    sc.broadcast dict (the literal plan itself blows up at huge V).
    Equality gate: both paths produce identical decoded text; the
    fallback plan carries no map literal (it is an ArrowEvalPython
    map step, still join- and shuffle-free)."""
    import os

    from flechasdb_spark.operators.text import (
        build_vocab,
        decode_token_ids,
        encode_token_ids,
    )

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    vocab = build_vocab(docs, top_n=10, min_count=2)
    enc = encode_token_ids(docs, vocab)
    lit = decode_token_ids(enc, vocab)
    fb = decode_token_ids(enc, vocab, max_literal_vocab=1)
    got_lit = {r.doc_id: r.decoded_text for r in lit.collect()}
    got_fb = {r.doc_id: r.decoded_text for r in fb.collect()}
    assert got_lit == got_fb
    lit_plan = lit._jdf.queryExecution().executedPlan().toString()
    fb_plan = fb._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in lit_plan  # literal path stays codegen
    assert "ArrowEvalPython" in fb_plan  # fallback is the Arrow kernel
    # the decode step adds NO shuffle: every Exchange in the fallback
    # plan is the upstream encoder's (same count as the literal plan)
    assert fb_plan.count("Exchange") == lit_plan.count("Exchange")
