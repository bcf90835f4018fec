"""ExactSubstr dedup lifecycle (Lee et al., arXiv:2107.06499) over the
documents table: detect any-alignment duplicated spans -> remove all
but the first occurrence -> build the cleaned corpus's window-key table
-> gate a simulated ingest stream against it — detection, removal, and
the ongoing protection of the cleaned corpus in one composed job.

Usage:
    python examples/exactsubstr_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flechasdb_spark.operators.dedup import (
    window_keys,
    repeated_ngram_spans,
    repeated_span_removal,
)
from flechasdb_spark.session import get_spark
from flechasdb_spark.streaming.pipeline import (
    run_available_now,
    stream_span_decontam,
)

L = 15


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="example_exactsubstr")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 1. Diagnose: where does the corpus repeat itself (any offset)?
    spans = repeated_ngram_spans(docs, window_words=L).cache()
    n_spans = spans.count()
    dup_words = spans.agg(F.sum("span_words")).first()[0] or 0
    print(f"docs={n0} duplicated_spans={n_spans} dup_words={dup_words}")

    # 1b. Attribute: whose content is being repeated? (window-level
    # copy provenance — the diagonal is self-repetition within a source)
    from flechasdb_spark.operators.dedup import cross_source_span_matrix

    matrix = cross_source_span_matrix(docs, window_words=L)
    top = matrix.orderBy(F.col("n_windows").desc()).limit(3).collect()
    for r in top:
        print(
            f"provenance: {r.src_first} -> {r.src_later} "
            f"({r.n_windows} windows, {r.n_docs} docs)"
        )

    # 2. Remove: keep each duplicated window's first occurrence, cut
    # the rest, re-stitch.
    cleaned = repeated_span_removal(docs, window_words=L).cache()
    removed = cleaned.agg(F.sum("removed_words")).first()[0] or 0
    survivors = cleaned.where(F.col("clean_text") != "")
    print(f"removed_words={removed} surviving_docs={survivors.count()}")

    # 3. Protect: reduce the CLEANED corpus to its window-key table
    # (8-byte hashes) and gate an incoming stream against it, so new
    # near-copies of kept content never re-enter.
    ref_keys = (
        window_keys(
            survivors.select("doc_id", F.col("clean_text").alias("text")),
            L, "doc_id", "text", "hash",
        )
        .select("__k")
        .distinct()
        .cache()
    )
    print(f"reference_windows={ref_keys.count()}")

    tmp = tempfile.mkdtemp(prefix="exactsubstr_demo_")
    try:
        # simulated ingest: a batch of the ORIGINAL (pre-removal) docs —
        # anything sharing a span with kept content must be quarantined
        incoming = docs.select("doc_id", "text").limit(200)
        src = f"{tmp}/src"
        incoming.coalesce(1).write.parquet(src)
        stream = spark.readStream.schema(incoming.schema).parquet(src)
        q = stream_span_decontam(
            stream, ref_keys, f"{tmp}/kept", window_words=L
        )
        run_available_now(q)
        kept = spark.read.parquet(f"{tmp}/kept").count()
        print(f"ingest_batch=200 passed_gate={kept} quarantined={200 - kept}")

        # 4. Or build the deduped corpus ONLINE from scratch: the
        # kept-window store grows per batch, so the output never holds
        # two docs sharing an L-word span (stream_span_dedup).
        from flechasdb_spark.streaming.pipeline import stream_span_dedup

        stream2 = spark.readStream.schema(incoming.schema).parquet(src)
        q2 = stream_span_dedup(
            stream2, f"{tmp}/store", f"{tmp}/corpus", window_words=L
        )
        run_available_now(q2)
        n_corpus = spark.read.parquet(f"{tmp}/corpus").count()
        print(f"online_dedup: 200 in -> {n_corpus} span-unique kept")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
