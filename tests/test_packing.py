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
