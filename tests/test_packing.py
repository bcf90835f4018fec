"""Sequence packing — prefix-sum integrity, pack-assignment law, and
oracle parity of the driver row."""

from __future__ import annotations

from pyspark.sql import functions as F

from flechasdb_spark.operators.packing import sequence_pack
from flechasdb_spark.operators.text import tokens
from flechasdb_spark.queries import ORACLES, REGISTRY
from tests.oracle_harness import compare, duck_con

CTX = 64


def test_sequence_pack_matches_oracle(spark, sf_dir):
    con = duck_con(sf_dir)
    sdf = REGISTRY["sequence_pack"](spark, sf_dir)
    odf = con.execute(ORACLES["sequence_pack"]).df()
    assert compare(sdf, odf) == []


def test_sequence_pack_prefix_sum_integrity(spark, sf_dir):
    """start_offsets tile the concatenated token stream exactly: sorted
    starts are the exclusive prefix sums of the doc lengths in pack
    order, and pack_id = start DIV ctx for every document."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.size(tokens("text")).alias("n_tokens")
    )
    rows = sequence_pack(docs, ctx_tokens=CTX).collect()
    assert len(rows) == docs.count()
    by_start = sorted(rows, key=lambda r: r.start_offset)
    acc = 0
    for r in by_start:
        assert r.start_offset == acc, "starts must tile with no gap/overlap"
        assert r.pack_id == r.start_offset // CTX
        acc += r.n_tokens
    total = sum(r.n_tokens for r in rows)
    assert acc == total

    again = sorted(
        map(tuple, sequence_pack(docs, ctx_tokens=CTX).collect())
    )
    assert again == sorted(map(tuple, rows))  # deterministic re-run


def test_build_vocab_rank_and_mincount(spark):
    from flechasdb_spark.operators.text import build_vocab

    df = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "a b d")], "doc_id long, text string"
    )
    out = build_vocab(df, top_n=2, min_count=2).collect()
    assert [(r.token_id, r.token, r["count"]) for r in out] == [
        (0, "a", 4),
        (1, "b", 3),
    ]  # c,d cut by min_count / top_n


def test_length_bucket_batches_groups_similar_lengths(spark):
    from flechasdb_spark.operators.text import length_bucket_batches

    rows = [(i, "w " * n) for i, n in enumerate([1, 2, 2, 3, 4, 9, 16, 17])]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in length_bucket_batches(df, batch_size=2).collect()}
    # doc 0 (1 token) -> bucket 0; docs 1,2 (2) -> bucket 1; 3,4 -> 2;
    # 5,6 (9,16) -> 4; 7 (17) -> 5
    assert out[1].bucket == 1 and out[2].bucket == 1
    assert out[1].batch_id == out[2].batch_id  # same bucket, same pair
    assert out[3].bucket == 2 and out[4].bucket == 2
    assert out[5].bucket == 4 and out[6].bucket == 4
    assert out[0].batch_id != out[1].batch_id  # bucket-disjoint ids


def test_shard_shuffle_balanced_and_dense(spark):
    from flechasdb_spark.operators.packing import shard_shuffle

    df = spark.createDataFrame(
        [(i,) for i in range(101)], "doc_id long"
    )
    got = shard_shuffle(df, n_shards=8).collect()
    assert len(got) == 101
    by_shard: dict[int, list[int]] = {}
    for r in got:
        by_shard.setdefault(r.shard, []).append(r.pos)
    sizes = [len(v) for v in by_shard.values()]
    assert max(sizes) - min(sizes) <= 1          # round-robin balance
    for poss in by_shard.values():               # dense 0..k-1 per shard
        assert sorted(poss) == list(range(len(poss)))
    # determinism + epoch salt changes the permutation
    again = shard_shuffle(df, n_shards=8).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))
    other = shard_shuffle(df, n_shards=8, salt="epoch1").collect()
    assert sorted(map(tuple, got)) != sorted(map(tuple, other))


def test_shard_shuffle_matches_oracle(spark, sf_dir):
    from flechasdb_spark.queries import ORACLES, REGISTRY
    from tests.oracle_harness import compare, duck_con

    con = duck_con(sf_dir)
    sdf = REGISTRY["corpus_shard_shuffle"](spark, sf_dir)
    odf = con.execute(ORACLES["corpus_shard_shuffle"]).df()
    assert compare(sdf, odf) == []


def test_pack_fragments_invariants(spark):
    """Fragments reassemble exactly: per-doc token sums match, frag_idx
    is dense from 0, and every fragment fits its window."""
    from flechasdb_spark.operators.packing import (
        sequence_pack,
        sequence_pack_fragments,
    )

    docs = spark.createDataFrame(
        [(i, 10 + (i * 37) % 300) for i in range(200)] + [(999, 0)],
        "doc_id long, n_tokens long",
    )
    packed = sequence_pack(docs, ctx_tokens=128)
    frags = sequence_pack_fragments(packed, ctx_tokens=128).collect()
    per_doc: dict[int, list] = {}
    for r in frags:
        per_doc.setdefault(r.doc_id, []).append(r)
    n_by_id = {r.doc_id: r.n_tokens for r in docs.collect()}
    assert 999 not in per_doc                      # zero-token doc drops
    for did, rows in per_doc.items():
        rows.sort(key=lambda r: r.pack_id)
        assert sum(r.frag_tokens for r in rows) == n_by_id[did]
        assert [r.frag_idx for r in rows] == list(range(len(rows)))
        assert all(1 <= r.frag_tokens <= 128 for r in rows)
        # covered packs are contiguous
        assert rows[-1].pack_id - rows[0].pack_id == len(rows) - 1
    assert len(per_doc) == 200


def test_pack_ids_exact_past_double_precision(spark):
    """pack_id / shard pos use integral `div`, not floor(x / double)
    (r4 ADVICE: the double path can exceed the true floor past ~2^52).
    Token counts near 2^60 must still yield pack_id == start_offset
    // ctx exactly."""
    from flechasdb_spark.operators.packing import (
        sequence_pack,
        sequence_pack_fragments,
    )

    huge = 1 << 59
    docs = spark.createDataFrame(
        [(i, huge + (i * 13) % 97) for i in range(8)],
        "doc_id long, n_tokens long",
    )
    rows = sequence_pack(docs, ctx_tokens=7).collect()
    for r in rows:
        assert r.pack_id == r.start_offset // 7, (
            r.doc_id,
            r.start_offset,
            r.pack_id,
        )
    # fragment window arithmetic at the same magnitude — one doc (an
    # explode would be 2^56 rows; p0/p1 exactness is what's under test)
    one = spark.createDataFrame(
        [(0, huge + 3, huge + 1, 0)],
        "doc_id long, n_tokens long, start_offset long, pack_id long",
    )
    fr = sequence_pack_fragments(one, ctx_tokens=huge).collect()
    assert [(r.pack_id, r.frag_idx, r.frag_tokens) for r in sorted(
        fr, key=lambda r: r.pack_id
    )] == [(1, 0, huge - 1), (2, 1, 4)]
