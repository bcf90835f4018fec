"""Structured Streaming surface: bounded-input streams drained with
availableNow must reproduce the batch operators' results exactly."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from flechasdb_spark.streaming.pipeline import (
    incremental_encode,
    read_event_stream,
    run_available_now,
    stream_static_knn,
    windowed_event_agg,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


def _drain_complete(sdf, spark, name):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    run_available_now(q)
    return spark.table(name)


def test_windowed_agg_matches_batch(spark, tmp_path):
    # the file stream source requires a directory
    import shutil

    src_dir = tmp_path / "events_src"
    src_dir.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", src_dir / "events.parquet")
    stream = read_event_stream(spark, str(src_dir))
    result = _drain_complete(
        windowed_event_agg(stream), spark, "windowed_agg_out"
    ).toPandas()

    from flechasdb_spark.queries import REGISTRY

    batch = REGISTRY["events_tumbling_agg"](spark, SF_DIR).toPandas()
    r = result.sort_values(["window_start", "event_type"]).reset_index(drop=True)
    b = batch.sort_values(["window_start", "event_type"]).reset_index(drop=True)
    assert r[["window_start", "event_type", "n_events", "sum_value"]].equals(
        b[["window_start", "event_type", "n_events", "sum_value"]]
    )


def test_incremental_encode_appends_to_index(spark, tmp_path):
    from flechasdb_spark.operators.build import IndexConfig, build_index
    from flechasdb_spark.sources.manifest import load_index, save_index

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    base = emb.where(F.col("vec_id") < 40)
    arriving = emb.where(F.col("vec_id") >= 40)
    n_base, n_new = base.count(), arriving.count()

    cfg = IndexConfig(num_partitions=4, num_divisions=4, num_codes=8, seed=11)
    model = build_index(base, cfg)
    index_path = str(tmp_path / "idx")
    save_index(model, index_path)

    stream_src = str(tmp_path / "arrivals")
    arriving.select("vec_id", "embedding").write.parquet(stream_src)
    vec_stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .parquet(stream_src)
    )
    q = incremental_encode(
        model, vec_stream, index_path, str(tmp_path / "ckpt")
    )
    run_available_now(q)

    reloaded = load_index(spark, index_path)
    total = reloaded.encoded.count()
    assert total == n_base + n_new
    # appended rows carry valid partition ids and D codes each
    appended = reloaded.encoded.where(F.col("vec_id") >= 40)
    assert appended.count() == n_new
    bad = appended.where(
        (F.col("partition_id") < 0)
        | (F.col("partition_id") >= cfg.num_partitions)
        | (F.size("codes") != cfg.num_divisions)
    ).count()
    assert bad == 0


def test_watermark_drops_late_data(spark, tmp_path):
    """Late-data semantics: the watermark commits with a one-batch lag
    (Spark's documented best-effort dropping), so a late event arriving
    two batches after the recent data is filtered by the watermark
    (numRowsDroppedByWatermark) and its window never appears."""
    import glob
    import os
    import shutil
    import time as _time

    import pandas as pd

    src_dir = tmp_path / "late_src"
    src_dir.mkdir()
    base_us = 1_700_000_000_000_000  # fixed epoch micros
    hour = 3_600 * 1_000_000

    def _write(name, rows, mtime):
        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
        )
        pdf["ts"] = pdf["ts"] * 1000  # ns, matching EVENTS_SCHEMA long
        spark.createDataFrame(pdf).coalesce(1).write.parquet(
            str(tmp_path / name)
        )
        part = glob.glob(str(tmp_path / name / "part-*.parquet"))[0]
        dst = src_dir / f"{name}.parquet"
        shutil.copy(part, dst)
        # the file source processes oldest-mtime first: pin the order
        os.utime(dst, (mtime, mtime))

    now = _time.time()
    # batch 0: recent events at t0+10h -> next watermark t0+8h
    _write("a", [(1, base_us + 10 * hour, 1, "x", 1.0, "{}")], now - 180)
    # batch 1: filler event; the t0+8h watermark becomes committed
    _write("b", [(2, base_us + 10 * hour + 1000, 1, "x", 1.0, "{}")], now - 120)
    # batch 2: a LATE event at t0 — 10h below the committed watermark
    _write("c", [(3, base_us, 1, "x", 1.0, "{}")], now - 60)

    stream = read_event_stream(spark, str(src_dir), max_files_per_trigger=1)
    out = (
        windowed_event_agg(stream, window="1 hour", watermark="2 hours")
        .writeStream.format("memory")
        .queryName("late_data_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    run_available_now(out)
    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in out.recentProgress
        if p["stateOperators"]
    )
    assert dropped == 1, "the late event was not dropped by the watermark"
    got = spark.table("late_data_out").toPandas()
    late_window_start = base_us // 1_000_000 // 3600 * 3600
    assert late_window_start not in set(got["window_start"])


def test_stateful_session_count_matches_batch(spark, tmp_path):
    import shutil

    from flechasdb_spark.queries import REGISTRY
    from flechasdb_spark.streaming.pipeline import stateful_session_count

    src_dir = tmp_path / "events_src"
    src_dir.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", src_dir / "events.parquet")
    stream = read_event_stream(spark, str(src_dir))
    q = (
        stateful_session_count(stream)
        .writeStream.format("memory")
        .queryName("session_counts_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    run_available_now(q)
    got = (
        spark.table("session_counts_out")
        .groupBy("user_id")
        .agg(
            F.max("n_sessions").alias("n_sessions"),
            F.max("n_events").alias("n_events"),
        )
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )

    batch = (
        REGISTRY["events_sessionize"](spark, SF_DIR)
        .groupBy("user_id")
        .agg(
            F.max("session_id").alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
        )
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert got.equals(batch)


def test_stream_static_knn_matches_batch(spark, tmp_path):
    from flechasdb_spark.operators.knn import knn_join

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvector")
    )
    qsrc = str(tmp_path / "queries")
    queries.write.parquet(qsrc)
    qstream = spark.readStream.schema(
        "query_id long, qvector array<float>"
    ).parquet(qsrc)

    out_path = str(tmp_path / "out")
    q = stream_static_knn(
        qstream, emb, k=3, output_path=out_path,
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    run_available_now(q)

    got = (
        spark.read.parquet(out_path)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    want = (
        knn_join(queries, emb, k=3)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert got[["query_id", "vec_id", "rank"]].equals(
        want[["query_id", "vec_id", "rank"]]
    )
    assert (got["squared_distance"] - want["squared_distance"]).abs().max() < 1e-9


def test_stream_dedup_drops_duplicates(spark, tmp_path):
    """Duplicated events (same event_id) across micro-batches within the
    watermark are emitted once."""
    import shutil

    from flechasdb_spark.streaming.pipeline import stream_dedup

    src_dir = tmp_path / "dup_src"
    src_dir.mkdir()
    # two copies of the same file = every event duplicated across batches
    shutil.copy(f"{SF_DIR}/events.parquet", src_dir / "a.parquet")
    shutil.copy(f"{SF_DIR}/events.parquet", src_dir / "b.parquet")
    stream = read_event_stream(spark, str(src_dir), max_files_per_trigger=1)
    q = (
        stream_dedup(stream, ["event_id"], watermark="365 days")
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    run_available_now(q)
    got = spark.table("dedup_out")
    n_unique = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert got.count() == n_unique
    assert got.select("event_id").distinct().count() == n_unique


def test_stream_asof_enrich_matches_batch(spark, tmp_path):
    """Drained stream-side as-of enrichment equals the batch as-of join
    over the same events."""
    import shutil

    from flechasdb_spark.operators.temporal import asof_join
    from flechasdb_spark.streaming.pipeline import stream_asof_enrich

    from flechasdb_spark.session import normalize_event_ts

    ev = normalize_event_ts(
        spark.read.parquet(f"{SF_DIR}/events.parquet")
    ).withColumn("ts_us", F.expr("ts div 1000"))
    right = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts_us").alias("p_us"))
        .agg(F.max("value").alias("p_value"))
    )
    left_batch = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts_us"
    )

    src_dir = tmp_path / "asof_src"
    src_dir.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", src_dir / "events.parquet")
    stream = read_event_stream(spark, str(src_dir))
    left_stream = stream.where(F.col("event_type") == "click").select(
        "event_id", "user_id", F.expr("ts div 1000").alias("ts_us")
    )

    out_path = str(tmp_path / "enriched")
    q = stream_asof_enrich(
        left_stream, right, on="ts_us", by="user_id",
        right_on="p_us", value_cols=["p_value"],
        output_path=out_path, checkpoint_path=str(tmp_path / "ckpt"),
    )
    run_available_now(q)

    got = (
        spark.read.parquet(out_path)
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = (
        asof_join(
            left_batch, right, on="ts_us", by="user_id",
            right_on="p_us", value_cols=["p_value"],
        )
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    assert got["p_value"].fillna(-1).equals(want["p_value"].fillna(-1))


def test_stateful_sessions_with_idle_ttl(spark, tmp_path):
    """The TTL variant must produce the same final totals on a bounded
    drain (no state times out mid-replay) while registering a
    ProcessingTimeTimeout so idle users' state is dropped at scale."""
    import shutil

    from flechasdb_spark.streaming.pipeline import (
        read_event_stream,
        run_available_now,
        stateful_session_count,
    )

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", src_dir / "events.parquet")
    stream = read_event_stream(spark, str(src_dir))
    out = stateful_session_count(stream, idle_ttl_sec=3600)
    q = (
        out.writeStream.format("memory")
        .queryName("ttl_sessions")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    run_available_now(q)
    import pyspark.sql.functions as F

    got = (
        spark.table("ttl_sessions")
        .groupBy("user_id")
        .agg(F.max("n_sessions").alias("n_sessions"))
    )
    from flechasdb_spark.session import normalize_event_ts

    normalize_event_ts(
        spark.read.parquet(f"{SF_DIR}/events.parquet")
    ).createOrReplaceTempView("ttl_base_events")
    want = {
        r.user_id: r.n_sessions
        for r in spark.sql(
            """
            WITH o AS (
              SELECT user_id,
                     lag(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev, ts
              FROM ttl_base_events)
            SELECT user_id,
                   sum(CASE WHEN prev IS NULL
                            OR ts - prev > 1800000000000 THEN 1
                       ELSE 0 END) AS n_sessions
            FROM o GROUP BY user_id
            """
        ).collect()
    }
    assert {r.user_id: r.n_sessions for r in got.collect()} == want


def test_stream_minhash_dedup_matches_component_reference(spark, tmp_path):
    """Drained multi-batch stream must keep exactly what the batch-
    sequential reference keeps: per batch, drop store-collisions,
    cluster transitive band collisions, keep each cluster's lowest id
    (arrival order == id order by construction: two files of ascending
    doc_id ranges)."""
    import pyspark.sql.functions as F

    from flechasdb_spark.operators.dedup import minhash_band_keys
    from flechasdb_spark.streaming.pipeline import (
        run_available_now,
        stream_minhash_dedup,
    )

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .limit(200)
        .cache()
    )
    src = tmp_path / "docs_src"
    src.mkdir()
    docs.where(F.col("doc_id") < 100).coalesce(1).write.parquet(
        str(src / "f0.parquet")
    )
    docs.where(F.col("doc_id") >= 100).coalesce(1).write.parquet(
        str(src / "f1.parquet")
    )
    schema = docs.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    out_path = str(tmp_path / "kept")
    store_path = str(tmp_path / "bands")
    q = stream_minhash_dedup(stream, store_path, out_path)
    run_available_now(q)
    kept = {
        r.doc_id for r in spark.read.parquet(out_path).select("doc_id").collect()
    }

    # reference: batch-sequential — per batch, drop docs colliding with
    # the store, cluster the rest by transitive band collisions (union-
    # find), keep each cluster's lowest id, then add kept keys to store
    rows = minhash_band_keys(docs).collect()
    per_doc: dict[int, set] = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, set()).add((r.band, r.band_key))
    store: set = set()
    want: set = set()
    for batch_ids in ([d for d in sorted(per_doc) if d < 100],
                      [d for d in sorted(per_doc) if d >= 100]):
        novel = [d for d in batch_ids if not (per_doc[d] & store)]
        parent = {d: d for d in novel}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        by_key: dict = {}
        for d in novel:
            for k in per_doc[d]:
                by_key.setdefault(k, []).append(d)
        for ds in by_key.values():
            for other in ds[1:]:
                ra, rb = find(ds[0]), find(other)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
        for d in novel:
            if find(d) == d:
                want.add(d)
                store |= per_doc[d]
    assert kept == want
    assert 0 < len(kept) < 200  # fixture must exercise both outcomes


def test_stream_minhash_dedup_arrival_permutations(spark, tmp_path):
    """Cross-batch policy pin (r3 VERDICT #8): survivors are
    FIRST-ARRIVAL-WINS across micro-batches. For clique-shaped
    duplicate clusters (exact copies — every member shares all band
    keys) the kept COUNT is invariant under arrival order: exactly one
    member per cluster plus every unique doc; WHICH member survives is
    the one in the earliest-arriving batch."""
    import itertools
    import os as _os
    import random
    import time as _time

    from flechasdb_spark.streaming.pipeline import (
        run_available_now,
        stream_minhash_dedup,
    )

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(5000)]
    # 5 clusters x 3 exact copies (ids i, 100+i, 200+i -> one per file)
    # + 15 unique long random docs (5 per file)
    rows = []
    for c in range(5):
        text = " ".join(rng.choice(vocab) for _ in range(120))
        for f in range(3):
            rows.append((100 * f + c, text, f))
    for u in range(15):
        rows.append(
            (100 * (u % 3) + 50 + u, " ".join(rng.choice(vocab) for _ in range(120)), u % 3)
        )
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in rows], "doc_id long, text string"
    ).cache()
    by_file = {f: [i for i, _, ff in rows if ff == f] for f in range(3)}

    src = tmp_path / "perm_src"
    src.mkdir()
    for f in range(3):
        df.where(F.col("doc_id").isin(by_file[f])).coalesce(1).write.parquet(
            str(src / f"f{f}")
        )

    kept_counts = []
    for run, perm in enumerate(
        [(0, 1, 2), (2, 1, 0), (1, 2, 0)]
    ):
        now = _time.time()
        for pos, f in enumerate(perm):
            for pf in (src / f"f{f}").glob("*.parquet"):
                _os.utime(pf, (now + 10 * pos, now + 10 * pos))
        out = str(tmp_path / f"kept{run}")
        store = str(tmp_path / f"bands{run}")
        stream = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = stream_minhash_dedup(stream, store, out)
        run_available_now(q)
        kept = {
            r.doc_id
            for r in spark.read.parquet(out).select("doc_id").collect()
        }
        kept_counts.append(len(kept))
        # every unique doc survives; exactly one member per cluster,
        # and it is the member from the earliest-arriving file
        assert all(u in kept for i, _, f in rows for u in [i] if i % 100 >= 50)
        first_file = perm[0]
        for c in range(5):
            members = {100 * f + c for f in range(3)}
            assert len(kept & members) == 1
            assert (100 * first_file + c) in kept
    assert kept_counts == [20, 20, 20]


def test_stream_minhash_dedup_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: replaying the same batches (same
    source, fresh checkpoint, same sinks) must rewrite identical
    ingest_batch subdirectories, not append duplicates — the committed
    band-store marker skips completed batches wholesale."""
    import shutil

    from flechasdb_spark.streaming.pipeline import (
        run_available_now,
        stream_minhash_dedup,
    )

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .limit(60)
        .cache()
    )
    src = tmp_path / "re_src"
    src.mkdir()
    docs.coalesce(1).write.parquet(str(src / "f0"))
    out = str(tmp_path / "re_kept")
    store = str(tmp_path / "re_bands")

    def drain():
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = stream_minhash_dedup(stream, store, out)
        run_available_now(q)
        return sorted(
            r.doc_id
            for r in spark.read.parquet(out).select("doc_id").collect()
        )

    first = drain()
    assert first  # fixture keeps something
    shutil.rmtree(f"{out}__checkpoint")  # simulate a replay from zero
    second = drain()
    assert second == first  # no appended duplicates, bit-identical set


def test_read_event_stream_empty_source_falls_back_to_schema(spark, tmp_path):
    """A source directory that is empty at stream start must not fail
    the static schema probe: the reader falls back to EVENTS_SCHEMA
    (long-ns ts) so a stream can start before data arrives."""
    from flechasdb_spark.streaming.pipeline import EVENTS_SCHEMA, read_event_stream

    empty = tmp_path / "not_yet"
    empty.mkdir()
    df = read_event_stream(spark, str(empty))
    assert df.isStreaming
    assert df.schema == EVENTS_SCHEMA


def test_incremental_encode_auto_compaction(spark, tmp_path):
    """compact_every=1: after draining a multi-file stream (one batch
    per file via maxFilesPerTrigger), the index holds one file per
    partition dir instead of one per (batch, partition), and the
    encoded rows are exactly the append-only result."""
    import glob

    from flechasdb_spark.operators.build import IndexConfig, build_index
    from flechasdb_spark.sources.manifest import load_index, save_index

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    base = emb.where(F.col("vec_id") < 40)
    arriving = emb.where(F.col("vec_id") >= 40).select("vec_id", "embedding")
    n_total = base.count() + arriving.count()

    cfg = IndexConfig(num_partitions=4, num_divisions=4, num_codes=8, seed=11)
    model = build_index(base, cfg)
    index_path = str(tmp_path / "idx")
    save_index(model, index_path)

    stream_src = str(tmp_path / "arrivals")
    arriving.repartition(4).write.parquet(stream_src)  # >= 4 data files
    vec_stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_src)
    )
    q = incremental_encode(
        model,
        vec_stream,
        index_path,
        str(tmp_path / "ckpt"),
        compact_every=1,
    )
    run_available_now(q)

    files = glob.glob(f"{index_path}/index/partition_id=*/*.parquet")
    pids = {f.split("partition_id=")[1].split("/")[0] for f in files}
    assert len(files) == len(pids)  # exactly one file per partition dir
    reloaded = load_index(spark, index_path)
    assert reloaded.encoded.count() == n_total
    assert reloaded.encoded.select("vec_id").distinct().count() == n_total


def test_stream_quality_filter_matches_batch_classifier(spark, tmp_path):
    """Drained multi-batch stream must keep exactly the docs the batch
    nb_score keeps; a replayed committed batch is a no-op (no
    duplicate rows)."""
    import pyspark.sql.functions as F

    from flechasdb_spark.operators.classify import nb_score, nb_train
    from flechasdb_spark.streaming.pipeline import (
        run_available_now,
        stream_quality_filter,
    )

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text", "source")
        .limit(200)
        .cache()
    )
    priors, loglik = nb_train(docs, n_buckets=64)
    keep = [r.label for r in priors.orderBy("label").limit(3).collect()]
    src = tmp_path / "docs_src"
    src.mkdir()
    stream_docs = docs.select("doc_id", "text")
    stream_docs.where(F.col("doc_id") < 100).coalesce(1).write.parquet(
        str(src / "f0.parquet")
    )
    stream_docs.where(F.col("doc_id") >= 100).coalesce(1).write.parquet(
        str(src / "f1.parquet")
    )
    stream = (
        spark.readStream.schema(stream_docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    out = str(tmp_path / "kept")
    run_available_now(
        stream_quality_filter(
            stream, priors, loglik, out, keep, n_buckets=64
        )
    )
    got = sorted(
        r.doc_id for r in spark.read.parquet(out).select("doc_id").collect()
    )
    want = sorted(
        r.doc_id
        for r in nb_score(stream_docs, priors, loglik, n_buckets=64)
        .where(F.col("predicted").isin(keep))
        .collect()
    )
    assert got == want and len(got) > 0
    # replay the whole stream with a fresh checkpointless query: every
    # batch directory is already committed -> identical contents
    stream2 = (
        spark.readStream.schema(stream_docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    run_available_now(
        stream_quality_filter(
            stream2, priors, loglik, out, keep, n_buckets=64
        )
    )
    again = sorted(
        r.doc_id for r in spark.read.parquet(out).select("doc_id").collect()
    )
    assert again == got


def test_stream_media_ingest_incremental_exactly_once(spark, tmp_path):
    """Files -> binaryFile file stream -> payload contract -> real
    decoders -> parquet sink. Second run after adding one file must
    process ONLY the new file (source checkpoint = exactly-once per
    file), and features must equal the batch decode of the same dir."""
    import numpy as np

    from flechasdb_spark.operators.multimodal import decode_image
    from flechasdb_spark.sources.media import read_media_dir
    from flechasdb_spark.streaming.pipeline import (
        run_available_now,
        stream_media_ingest,
    )
    from tests.test_multimodal import _bmp_bytes, _wav_bytes

    media = tmp_path / "in"
    media.mkdir()
    rng = np.random.RandomState(11)
    for i in range(3):
        px = rng.randint(0, 256, size=(34 + i, 30, 3)).astype("uint8")
        (media / f"img{i}.bmp").write_bytes(_bmp_bytes(px))
    # a non-image file must be filtered JVM-side, not crash the decoder
    (media / "noise.wav").write_bytes(
        _wav_bytes(np.sin(np.linspace(0, 20, 200)))
    )
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = stream_media_ingest(spark, str(media), out, ckpt, fake=False)
    run_available_now(q)
    got1 = spark.read.parquet(out)
    assert got1.count() == 3
    # add one more file; restart from the same checkpoint
    px = rng.randint(0, 256, size=(50, 44, 3)).astype("uint8")
    (media / "late.bmp").write_bytes(_bmp_bytes(px))
    q = stream_media_ingest(spark, str(media), out, ckpt, fake=False)
    run_available_now(q)
    got2 = spark.read.parquet(out).toPandas()
    assert len(got2) == 4  # +1, nothing reprocessed
    assert (
        got2.sort_values("doc_id")["width"].tolist()
        == [30, 30, 30, 44]
        or sorted(got2["width"].tolist()) == [30, 30, 30, 44]
    )
    # streamed features == batch decode of the same directory
    batch = (
        decode_image(
            read_media_dir(spark, str(media), glob="*.bmp").select(
                "doc_id", "payload"
            ),
            fake=False,
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got2 = got2.sort_values("doc_id").reset_index(drop=True)
    assert batch["doc_id"].tolist() == got2["doc_id"].tolist()
    for a, b in zip(batch["features"], got2["features"]):
        assert np.allclose(np.array(a), np.array(b))


def test_stream_hll_users_equals_batch_sketch(spark, tmp_path):
    """Streamed windowed register-maxes, estimated batch-side, must
    equal hll_distinct computed directly over the same events grouped
    by the same event-time window."""
    from flechasdb_spark.operators.sketch import (
        hll_distinct,
        hll_estimate_from_registers,
    )
    from flechasdb_spark.session import normalize_event_ts
    from flechasdb_spark.streaming.pipeline import (
        run_available_now,
        stream_hll_users,
    )

    src = str(tmp_path / "events")
    events = normalize_event_ts(
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    )
    # event-time timestamps for the streaming window
    with_ts = events.withColumn(
        "event_time", F.expr("timestamp_micros(ts div 1000)")
    ).select("event_time", "user_id")
    with_ts.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        "event_time timestamp, user_id long"
    ).parquet(src)
    out = str(tmp_path / "regs")
    q = stream_hll_users(
        stream,
        out,
        str(tmp_path / "ckpt"),
        window_duration="1 hour",
        watermark="0 seconds",
        ts_col="event_time",
    )
    run_available_now(q)
    regs = spark.read.parquet(out)
    got = (
        hll_estimate_from_registers(regs, ["window_start"], p=6)
        .toPandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    want = (
        hll_distinct(
            with_ts.withColumn(
                "window_start",
                F.window("event_time", "1 hour")["start"],
            ),
            "user_id",
            group_cols=["window_start"],
        )
        .toPandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    # availableNow + watermark 0: every window finalizes except possibly
    # the last open one; compare the common prefix (must be non-trivial)
    n = len(got)
    assert n >= max(1, len(want) - 1)
    assert got["window_start"].tolist() == want["window_start"].tolist()[:n]
    assert got["hll_estimate"].tolist() == want["hll_estimate"].tolist()[:n]
    assert got["v_zero"].tolist() == want["v_zero"].tolist()[:n]


def test_stream_span_decontam_matches_batch_and_replays(spark, tmp_path):
    """The streaming ExactSubstr gate equals the batch computation
    (stateless per batch), respects max_hit_windows, and a replay of a
    committed batch is an exact no-op."""
    from flechasdb_spark.operators.dedup import window_keys
    from flechasdb_spark.streaming.pipeline import (
        run_available_now,
        stream_span_decontam,
    )

    run = " ".join(f"p{i}" for i in range(6))     # protected 6-word span
    ref = spark.createDataFrame(
        [(100, "guard " + run + " tail words here")],
        "doc_id long, text string",
    )
    ref_keys = (
        window_keys(ref, 5, "doc_id", "text", "hash")
        .select("__k").distinct()
    )
    docs = spark.createDataFrame(
        [
            (1, "clean words only nothing shared at all"),   # kept
            (2, "prefix " + run + " suffix"),                # 2 hits -> drop
            (3, "short doc"),                                # < L -> kept
        ],
        "doc_id long, text string",
    )
    src = str(tmp_path / "src")
    docs.coalesce(1).write.parquet(src)
    out = str(tmp_path / "kept")

    def drain():
        stream = spark.readStream.schema(docs.schema).parquet(src)
        q = stream_span_decontam(
            stream, ref_keys, out, window_words=5, max_hit_windows=0
        )
        run_available_now(q)

    drain()
    kept = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert kept == [1, 3]
    # replay from a fresh checkpoint (each drain starts one): committed
    # batch dirs are _SUCCESS no-ops, output unchanged
    drain()
    kept2 = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert kept2 == [1, 3]
    # a permissive threshold lets the contaminated doc through: doc 2
    # shares exactly 2 five-word windows with the reference run
    out2 = str(tmp_path / "kept2")
    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = stream_span_decontam(
        stream, ref_keys, out2, window_words=5, max_hit_windows=2
    )
    run_available_now(q)
    kept3 = sorted(r.doc_id for r in spark.read.parquet(out2).collect())
    assert kept3 == [1, 2, 3]


def test_stream_span_decontam_rejects_mode_mismatch(spark, tmp_path):
    """A text-keyed reference against a hash-mode gate would silently
    admit everything; the dtype guard fails loudly instead."""
    from flechasdb_spark.operators.dedup import window_keys
    from flechasdb_spark.streaming.pipeline import stream_span_decontam

    ref = spark.createDataFrame(
        [(1, "a b c d e f g")], "doc_id long, text string"
    )
    text_keys = (
        window_keys(ref, 5, "doc_id", "text", "text")
        .select("__k").distinct()
    )
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(tmp_path)
    )
    with pytest.raises(ValueError, match="key_mode"):
        stream_span_decontam(
            stream, text_keys, str(tmp_path / "out"), window_words=5,
            key_mode="hash",
        )


def test_stream_span_dedup_policy_and_replay(spark, tmp_path):
    """Online ExactSubstr dedup: in-batch origin rule, cross-batch
    store, short-doc passthrough, and replay idempotence."""
    from flechasdb_spark.streaming.pipeline import (
        run_available_now,
        stream_span_dedup,
    )

    run = " ".join(f"r{i}" for i in range(5))
    b0 = spark.createDataFrame(
        [
            (1, "a0 " + run + " a1"),   # origin of the run -> kept
            (2, "b0 b1 " + run),        # in-batch later copy -> dropped
            (3, "tiny"),                # < L words -> kept
        ],
        "doc_id long, text string",
    )
    b1 = spark.createDataFrame(
        [
            (10, run + " c0 c1"),                        # store hit -> dropped
            (11, "fresh unique words nothing shared"),    # kept
        ],
        "doc_id long, text string",
    )
    src = str(tmp_path / "src")
    import glob
    import os as _os
    import time as _time

    b0.coalesce(1).write.parquet(f"{src}/b0")
    b1.coalesce(1).write.parquet(f"{src}/b1")
    now = _time.time()
    for i, d in enumerate(("b0", "b1")):
        for f in glob.glob(f"{src}/{d}/*.parquet"):
            _os.utime(f, (now + 10 * i, now + 10 * i))

    store, out = str(tmp_path / "store"), str(tmp_path / "kept")

    def drain():
        stream = (
            spark.readStream.schema(b0.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        q = stream_span_dedup(stream, store, out, window_words=5)
        run_available_now(q)

    drain()
    kept = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert kept == [1, 3, 11]
    # replay (fresh checkpoint): committed batches are no-ops
    import shutil

    shutil.rmtree(out + "__checkpoint")
    drain()
    assert sorted(
        r.doc_id for r in spark.read.parquet(out).collect()
    ) == [1, 3, 11]
    # the store holds only survivors' window keys (doc 3 is shorter
    # than L and emits none; dropped docs 2/10 must not appear)
    sk = spark.read.parquet(store)
    assert sorted(
        r.doc_id for r in sk.select("doc_id").distinct().collect()
    ) == [1, 11]


def test_stream_ivfsq_encode_matches_batch_and_serves(spark, tmp_path):
    """The SQ sibling of incremental_encode (r8): streaming vectors
    through a FROZEN per-cell IVF+SQ model appends exactly the codes
    the batch build produces (frozen bounds make codes batch-order
    independent), and the streamed layout serves queries identically
    to the in-memory model."""
    import os
    import shutil

    from flechasdb_spark.plans.ivfsq import (
        IVFSQModel,
        build_ivfsq,
        ivfsq_query,
    )
    from flechasdb_spark.streaming.pipeline import (
        run_available_now,
        stream_ivfsq_encode,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cent = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("partition_id"),
        F.col("embedding").alias("centroid"),
    )
    model = build_ivfsq(emb, cent, bounds="per_cell")

    src = str(tmp_path / "in")
    os.makedirs(src)
    shutil.copy(f"{SF_DIR}/embeddings.parquet", f"{src}/embeddings.parquet")
    stream = spark.readStream.schema(
        "vec_id long, embedding array<float>, label int"
    ).parquet(src)
    q = stream_ivfsq_encode(
        model,
        stream,
        index_path=str(tmp_path / "idx"),
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    run_available_now(q)

    streamed = spark.read.parquet(str(tmp_path / "idx" / "index"))
    batch = {
        (r.vec_id): (r.partition_id, list(r.codes))
        for r in model.encoded.collect()
    }
    got = {
        (r.vec_id): (r.partition_id, list(r.codes))
        for r in streamed.collect()
    }
    assert got == batch

    served = IVFSQModel(
        centroids=model.centroids,
        lo=None,
        hi=None,
        encoded=streamed,
        cell_bounds=model.cell_bounds,
    )
    qv = [float(x) for x in emb.where(F.col("vec_id") == 5).first()["embedding"]]
    a = [(r.vec_id, r.squared_distance)
         for r in ivfsq_query(model, qv, k=10, nprobe=3, round_to=6).collect()]
    b = [(r.vec_id, r.squared_distance)
         for r in ivfsq_query(served, qv, k=10, nprobe=3, round_to=6).collect()]
    assert a == b


def test_stream_ivfsq_encode_auto_compaction(spark, tmp_path):
    """The SQ sibling of incremental_encode's compaction contract:
    compact_every=1 over a multi-file stream leaves one file per
    partition directory, and the compacted layout still holds exactly
    the batch-encode rows."""
    import glob

    from flechasdb_spark.plans.ivfsq import build_ivfsq
    from flechasdb_spark.streaming.pipeline import (
        run_available_now,
        stream_ivfsq_encode,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cent = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").cast("int").alias("partition_id"),
        F.col("embedding").alias("centroid"),
    )
    model = build_ivfsq(emb, cent)
    arriving = emb.select("vec_id", "embedding")
    stream_src = str(tmp_path / "arrivals")
    arriving.repartition(4).write.parquet(stream_src)
    vec_stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_src)
    )
    index_path = str(tmp_path / "idx")
    q = stream_ivfsq_encode(
        model,
        vec_stream,
        index_path,
        str(tmp_path / "ckpt"),
        compact_every=1,
    )
    run_available_now(q)

    # folded layout: all but the most recent batches live under the
    # reserved ingest_batch=-1 directory, one file per cell dir
    files = glob.glob(
        f"{index_path}/index/ingest_batch=-1/partition_id=*/*.parquet"
    )
    pids = {f.split("partition_id=")[1].split("/")[0] for f in files}
    assert len(files) == len(pids) > 0  # one file per partition dir
    # directory creep is bounded: -1 plus at most the last two batches
    batch_dirs = glob.glob(f"{index_path}/index/ingest_batch=*")
    assert len(batch_dirs) <= 3
    streamed = spark.read.parquet(f"{index_path}/index")
    batch = {
        r.vec_id: (r.partition_id, list(r.codes))
        for r in model.encoded.collect()
    }
    got = {
        r.vec_id: (r.partition_id, list(r.codes))
        for r in streamed.collect()
    }
    assert got == batch


def test_stream_span_dedup_store_compaction_replay(spark, tmp_path):
    """VERDICT r8 #4: folding older ingest_batch= store subdirectories
    into the reserved ingest_batch=-1 (compact_every) changes NOTHING
    observable: store content equals the uncompacted run's, folded
    keys still drop later duplicates, a fresh-checkpoint replay of
    folded batches is a no-op (the ledger carries the committed claim
    after their _SUCCESS markers are folded away), and a replayed
    LAST batch still excludes its own keys post-compaction."""
    import glob
    import os as _os
    import shutil
    import time as _time

    from flechasdb_spark.streaming.pipeline import (
        run_available_now,
        stream_span_dedup,
    )

    runA = " ".join(f"a{i}" for i in range(5))
    runB = " ".join(f"b{i}" for i in range(5))
    runC = " ".join(f"c{i}" for i in range(5))
    batches = [
        [(1, "x0 " + runA + " x1"), (2, "y0 y1 " + runA)],  # 2 in-batch dup
        [(10, runA + " q0 q1"), (11, runB + " kept here")],  # 10 store hit
        [(20, runB + " later copy"), (21, runC + " novel run")],
        # 30 duplicates runA whose keys were FOLDED into -1 by now
        [(30, "z0 " + runA + " z9"), (31, "wholly fresh unique words")],
    ]
    src = str(tmp_path / "src")
    now = _time.time()
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        df.coalesce(1).write.parquet(f"{src}/b{i}")
        for f in glob.glob(f"{src}/b{i}/*.parquet"):
            _os.utime(f, (now + 10 * i, now + 10 * i))

    def drain(store, out, compact_every):
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        q = stream_span_dedup(
            stream, store, out, window_words=5, compact_every=compact_every
        )
        run_available_now(q)

    store, out = str(tmp_path / "store"), str(tmp_path / "kept")
    drain(store, out, compact_every=1)
    ref_store, ref_out = str(tmp_path / "store2"), str(tmp_path / "kept2")
    drain(ref_store, ref_out, compact_every=None)

    kept = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert kept == [1, 11, 21, 31]
    assert kept == sorted(
        r.doc_id for r in spark.read.parquet(ref_out).collect()
    )
    # store CONTENT equality across compaction (ingest_batch values
    # legitimately differ: folded rows read back as -1)
    got_keys = {
        (r["doc_id"], r["__k"])
        for r in spark.read.parquet(store).select("doc_id", "__k").collect()
    }
    ref_keys = {
        (r["doc_id"], r["__k"])
        for r in spark.read.parquet(ref_store)
        .select("doc_id", "__k")
        .collect()
    }
    assert got_keys == ref_keys
    # directories actually folded: -1 plus at most the last two batches
    dirs = {
        _os.path.basename(p)
        for p in glob.glob(f"{store}/ingest_batch=*")
    }
    assert "ingest_batch=-1" in dirs and len(dirs) <= 3

    # fresh-checkpoint replay: every batch no-ops (folded batches via
    # the ledger, recent ones via their _SUCCESS marker)
    shutil.rmtree(out + "__checkpoint")
    drain(store, out, compact_every=1)
    assert sorted(
        r.doc_id for r in spark.read.parquet(out).collect()
    ) == [1, 11, 21, 31]
    assert {
        (r["doc_id"], r["__k"])
        for r in spark.read.parquet(store).select("doc_id", "__k").collect()
    } == got_keys

    # partial-write replay of the LAST batch post-compaction: fresh
    # checkpoint + its store _SUCCESS marker removed (the committer-v2
    # crash shape: task-committed files exist, no job marker) — the
    # re-run must not see its own surviving keys as store hits (doc 31
    # survives again) while the folded keys still drop 30
    shutil.rmtree(out + "__checkpoint")
    _os.remove(f"{store}/ingest_batch=3/_SUCCESS")
    drain(store, out, compact_every=1)
    assert sorted(
        r.doc_id for r in spark.read.parquet(out).collect()
    ) == [1, 11, 21, 31]
    assert {
        (r["doc_id"], r["__k"])
        for r in spark.read.parquet(store).select("doc_id", "__k").collect()
    } == got_keys


def test_incremental_encode_replay_no_duplicates(spark, tmp_path):
    """r9: a replay of committed batches (fresh checkpoint, same file
    order => same batch ids) is a no-op via the per-batch marker —
    the PQ sibling of stream_ivfsq_encode's replay guard; without it
    every replayed batch appended duplicate codes."""
    from flechasdb_spark.operators.build import IndexConfig, build_index
    from flechasdb_spark.sources.manifest import load_index, save_index

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    base = emb.where(F.col("vec_id") < 40)
    arriving = emb.where(F.col("vec_id") >= 40)
    cfg = IndexConfig(num_partitions=4, num_divisions=4, num_codes=8, seed=11)
    model = build_index(base, cfg)
    index_path = str(tmp_path / "idx")
    save_index(model, index_path)
    stream_src = str(tmp_path / "arrivals")
    arriving.select("vec_id", "embedding").repartition(2).write.parquet(
        stream_src
    )

    def drain(ckpt):
        vec_stream = (
            spark.readStream.schema("vec_id long, embedding array<float>")
            .option("maxFilesPerTrigger", 1)
            .parquet(stream_src)
        )
        q = incremental_encode(model, vec_stream, index_path, ckpt)
        run_available_now(q)

    drain(str(tmp_path / "ckpt1"))
    want = emb.count()
    assert load_index(spark, index_path).encoded.count() == want
    # fresh checkpoint: same files, same batch ids -> markers no-op
    drain(str(tmp_path / "ckpt2"))
    got = load_index(spark, index_path).encoded
    assert got.count() == want
    assert got.groupBy("vec_id").count().where("count > 1").count() == 0


def test_stream_minhash_dedup_compaction(spark, tmp_path):
    """r9: compact_every on the minhash band store folds older
    ingest_batch= dirs into -1 with identical store content and
    unchanged survivors (the shared compact_ingest_store machinery,
    wired per-sink)."""
    import glob
    import os as _os
    import time as _time

    from flechasdb_spark.streaming.pipeline import stream_minhash_dedup

    text_a = "alpha beta gamma delta epsilon zeta eta theta " * 4
    batches = [
        [(1, text_a), (2, "unrelated words entirely different content here")],
        [(10, text_a + " tail")],   # near-dup of 1 -> dropped
        [(20, "third batch fresh novel content nothing shared at all")],
        [(30, text_a + " tick")],   # still dropped after folding
    ]
    src = str(tmp_path / "src")
    now = _time.time()
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        df.coalesce(1).write.parquet(f"{src}/b{i}")
        for f in glob.glob(f"{src}/b{i}/*.parquet"):
            _os.utime(f, (now + 10 * i, now + 10 * i))

    def drain(store, out, ce):
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        q = stream_minhash_dedup(
            stream, store, out, num_hashes=16, bands=4, compact_every=ce
        )
        run_available_now(q)

    store, out = str(tmp_path / "bands"), str(tmp_path / "kept")
    drain(store, out, 1)
    ref_s, ref_o = str(tmp_path / "bands2"), str(tmp_path / "kept2")
    drain(ref_s, ref_o, None)

    kept = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert kept == [1, 2, 20]
    assert kept == sorted(
        r.doc_id for r in spark.read.parquet(ref_o).collect()
    )
    keyset = lambda p: {
        (r["doc_id"], r["band"], r["band_key"])
        for r in spark.read.parquet(p)
        .select("doc_id", "band", "band_key")
        .collect()
    }
    assert keyset(store) == keyset(ref_s)
    dirs = {
        _os.path.basename(p) for p in glob.glob(f"{store}/ingest_batch=*")
    }
    assert "ingest_batch=-1" in dirs and len(dirs) <= 3


def test_stream_ivfsq_encode_refuses_flat_layout(spark, tmp_path):
    """ADVICE r9 #1: streaming into an index root that already holds a
    flat save_ivfsq partition_id= layout would create sibling trees
    with conflicting partition structures ('Conflicting directory
    structures' on every later read). The sink must detect the mix at
    stream start and fail fast with a migration hint, leaving the flat
    index untouched."""
    import os
    import shutil

    from pyspark.errors.exceptions.captured import StreamingQueryException

    from flechasdb_spark.plans.ivfsq import build_ivfsq, save_ivfsq
    from flechasdb_spark.streaming.pipeline import stream_ivfsq_encode

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cent = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").cast("int").alias("partition_id"),
        F.col("embedding").alias("centroid"),
    )
    model = build_ivfsq(emb, cent)
    idx = str(tmp_path / "idx")
    save_ivfsq(model, idx)  # flat partition_id= layout at <idx>/index
    before = sorted(os.listdir(f"{idx}/index"))

    src = str(tmp_path / "in")
    os.makedirs(src)
    shutil.copy(f"{SF_DIR}/embeddings.parquet", f"{src}/embeddings.parquet")
    stream = spark.readStream.schema(
        "vec_id long, embedding array<float>, label int"
    ).parquet(src)
    q = stream_ivfsq_encode(
        model, stream, index_path=idx, checkpoint_path=str(tmp_path / "ckpt")
    )
    with pytest.raises(StreamingQueryException, match="flat save_ivfsq"):
        q.awaitTermination(120)
    # the existing flat index was not touched
    assert sorted(os.listdir(f"{idx}/index")) == before


def test_stream_semantic_decontam_matches_batch_and_replays(spark, tmp_path):
    """r10 semantic decontamination: the drained streamed output equals
    the batch filter (every kept doc's min squared distance to the
    benchmark exceeds the radius), quarantined docs are really within
    it, and a committed batch's replay is a no-op."""
    import glob
    import os
    import time

    from flechasdb_spark.functions.linalg import squared_l2
    from flechasdb_spark.streaming.pipeline import (
        run_available_now,
        stream_semantic_decontam,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    bench = emb.where((F.col("vec_id") >= 100) & (F.col("vec_id") < 150))
    arriving = emb.select("vec_id", "embedding").where(F.col("vec_id") < 100)

    src = str(tmp_path / "src")
    arriving.where(F.col("vec_id") < 50).coalesce(1).write.parquet(f"{src}/b0")
    arriving.where(F.col("vec_id") >= 50).coalesce(1).write.parquet(f"{src}/b1")
    now = time.time()
    for i, d in enumerate(("b0", "b1")):
        for f in glob.glob(f"{src}/{d}/*.parquet"):
            os.utime(f, (now + 10 * i, now + 10 * i))
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    out = str(tmp_path / "kept")
    q = stream_semantic_decontam(
        stream, bench, radius=1.3, output_path=out,
        id_col="vec_id", round_to=4,
    )
    run_available_now(q)

    kept = {r.vec_id for r in spark.read.parquet(out).collect()}
    # batch recompute of the same gate
    d = F.round(
        squared_l2(
            F.col("embedding").cast("array<double>"), F.col("__bv")
        ),
        4,
    )
    bad = {
        r.vec_id
        for r in arriving.join(
            F.broadcast(
                bench.select(
                    F.col("embedding").cast("array<double>").alias("__bv")
                )
            )
        )
        .where(d <= 1.3)
        .select("vec_id")
        .distinct()
        .collect()
    }
    want = {r.vec_id for r in arriving.collect()} - bad
    assert kept == want
    assert bad  # the fixture radius actually quarantines something

    # replay with a fresh checkpoint: committed subdirs are no-ops
    before = sorted(glob.glob(f"{out}/ingest_batch=*/*.parquet"))
    stream2 = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q2 = stream_semantic_decontam(
        stream2, bench, radius=1.3, output_path=out,
        id_col="vec_id", round_to=4,
    )
    run_available_now(q2)
    assert sorted(glob.glob(f"{out}/ingest_batch=*/*.parquet")) == before
    assert {r.vec_id for r in spark.read.parquet(out).collect()} == want


def test_stream_ivfbq_encode_matches_batch_and_serves(spark, tmp_path):
    """The BQ sibling (r11): streaming vectors through a FROZEN IVF+BQ
    model writes exactly the packed words the batch build produces
    (frozen thresholds make codes batch-order independent), replay of
    a committed batch is a no-op, and the streamed layout serves
    queries identically to the in-memory model."""
    import os
    import shutil

    from flechasdb_spark.plans.ivfbq import (
        IVFBQModel,
        build_ivfbq,
        ivfbq_query,
    )
    from flechasdb_spark.streaming.pipeline import (
        run_available_now,
        stream_ivfbq_encode,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cent = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("partition_id"),
        F.col("embedding").alias("centroid"),
    )
    model = build_ivfbq(emb, cent, dim=64)

    src = str(tmp_path / "in")
    os.makedirs(src)
    shutil.copy(f"{SF_DIR}/embeddings.parquet", f"{src}/embeddings.parquet")
    stream = spark.readStream.schema(
        "vec_id long, embedding array<float>, label int"
    ).parquet(src)
    q = stream_ivfbq_encode(
        model,
        stream,
        index_path=str(tmp_path / "idx"),
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    run_available_now(q)

    streamed = spark.read.parquet(str(tmp_path / "idx" / "index"))
    batch = {
        r.vec_id: (r.partition_id, list(r.words))
        for r in model.encoded.collect()
    }
    got = {
        r.vec_id: (r.partition_id, list(r.words))
        for r in streamed.collect()
    }
    assert got == batch

    # replay with a fresh checkpoint: committed batch is an exact no-op
    q2 = stream_ivfbq_encode(
        model,
        spark.readStream.schema(
            "vec_id long, embedding array<float>, label int"
        ).parquet(src),
        index_path=str(tmp_path / "idx"),
        checkpoint_path=str(tmp_path / "ckpt2"),
    )
    run_available_now(q2)
    assert spark.read.parquet(str(tmp_path / "idx" / "index")).count() == len(
        batch
    )

    # the streamed layout serves identically to the in-memory model
    served = IVFBQModel(
        centroids=model.centroids,
        encoded=streamed.drop("ingest_batch"),
        dim=64,
    )
    qv = [float(x) for x in emb.where(F.col("vec_id") == 5).first()["embedding"]]
    want = ivfbq_query(model, qv, k=10, nprobe=8).collect()
    got_q = ivfbq_query(served, qv, k=10, nprobe=8).collect()
    assert [(r.vec_id, r.hamming_distance) for r in got_q] == [
        (r.vec_id, r.hamming_distance) for r in want
    ]


def test_stream_itq_encode_matches_batch_and_serves(spark, tmp_path):
    """The ITQ sibling (r12 — incremental encode across all four
    servable encode families): streaming vectors through a FROZEN
    rotation composition writes exactly the single packed word the
    batch build produces (a frozen rotation makes codes batch-order
    independent), replay of a committed batch is a no-op, and the
    streamed layout serves queries identically to the in-memory
    composition."""
    import os
    import shutil

    from flechasdb_spark.operators.itq import itq_train
    from flechasdb_spark.plans.ivfbq import (
        ITQIVFBQModel,
        build_itq_ivfbq,
        itq_ivfbq_query,
    )
    from flechasdb_spark.streaming.pipeline import (
        run_available_now,
        stream_itq_encode,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    itq = itq_train(emb, bits=16, iters=6, sample_n=10_000)
    cent = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("partition_id"),
        F.col("embedding").alias("centroid"),
    )
    model = build_itq_ivfbq(emb, cent, itq)

    src = str(tmp_path / "in")
    os.makedirs(src)
    shutil.copy(f"{SF_DIR}/embeddings.parquet", f"{src}/embeddings.parquet")
    stream = spark.readStream.schema(
        "vec_id long, embedding array<float>, label int"
    ).parquet(src)
    q = stream_itq_encode(
        model,
        stream,
        index_path=str(tmp_path / "idx"),
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    run_available_now(q)

    streamed = spark.read.parquet(str(tmp_path / "idx" / "index"))
    batch = {
        r.vec_id: (r.partition_id, list(r.words))
        for r in model.encoded.collect()
    }
    got = {
        r.vec_id: (r.partition_id, list(r.words))
        for r in streamed.collect()
    }
    assert got == batch

    # replay with a fresh checkpoint: committed batch is an exact no-op
    q2 = stream_itq_encode(
        model,
        spark.readStream.schema(
            "vec_id long, embedding array<float>, label int"
        ).parquet(src),
        index_path=str(tmp_path / "idx"),
        checkpoint_path=str(tmp_path / "ckpt2"),
    )
    run_available_now(q2)
    assert spark.read.parquet(str(tmp_path / "idx" / "index")).count() == len(
        batch
    )

    # the streamed layout serves identically to the in-memory composition
    served = ITQIVFBQModel(
        centroids=model.centroids,
        encoded=streamed.drop("ingest_batch"),
        itq=itq,
    )
    qv = [float(x) for x in emb.where(F.col("vec_id") == 5).first()["embedding"]]
    want = itq_ivfbq_query(model, qv, k=10, nprobe=8).collect()
    got_q = itq_ivfbq_query(served, qv, k=10, nprobe=8).collect()
    assert [(r.vec_id, r.hamming_distance) for r in got_q] == [
        (r.vec_id, r.hamming_distance) for r in want
    ]
