"""Structured Streaming surface (SURVEY.md §2.3 streaming, §7 step 6).

The reference has no streaming ("no dedicated server continuously
running" — /root/reference/README.md:37-38; updates unimplemented,
README.md:73). This module is the Spark-native extension: continuous
ingest + incremental index maintenance + continuous queries, built from
Structured Streaming primitives:

- ``windowed_event_agg``: watermarked tumbling-window aggregation —
  late rows beyond the watermark are dropped, state is bounded by
  (watermark / window) windows per key.
- ``incremental_encode``: ``foreachBatch`` append of newly arriving
  vectors into an existing IVF+PQ index using the FROZEN build-time
  models (coarse centroids + codebooks) — the standard online-serving
  shape: train offline, encode online. Appends go to the same
  ``partition_id=`` directory layout, so batch queries see new vectors
  on the next read and partition pruning still applies.
- ``stream_static_knn``: continuous kNN of a query stream against a
  static corpus via per-micro-batch brute-force join (foreachBatch —
  top-k-per-query needs a rank, which plain stream-static join can't
  express in one streaming agg).

Scale: each micro-batch is an ordinary Spark job — the batch operators'
scale properties (broadcast, pruning, partial top-k) carry over
unchanged. State stores only hold window aggregates (bounded), never
vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from flechasdb_spark.operators.build import IndexModel

__all__ = [
    "EVENTS_SCHEMA",
    "read_event_stream",
    "windowed_event_agg",
    "incremental_encode",
    "stream_ivfsq_encode",
    "stream_itq_encode",
    "stream_ivfbq_encode",
    "stream_static_knn",
    "stream_asof_enrich",
    "stream_dedup",
    "stream_minhash_dedup",
    "stream_quality_filter",
    "stream_span_decontam",
    "stream_semantic_decontam",
    "stream_span_dedup",
    "stream_token_drift",
    "stream_rate_anomaly",
    "stream_stream_join",
    "stateful_session_count",
    "stream_media_ingest",
    "stream_hll_users",
    "run_available_now",
]

# Downstream operators assume ts as long nanoseconds; the driver's
# events.parquet has carried TIMESTAMP(NANOS) (-> long ns via the
# legacy nanosAsLong conf) or TIMESTAMP(MICROS) depending on round, so
# the stream reader takes the file's actual schema and normalizes
# (session.normalize_event_ts). EVENTS_SCHEMA documents the canonical
# post-normalization shape.
EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over an events parquet directory/file,
    with ts normalized to long nanoseconds (EVENTS_SCHEMA)."""
    from pyspark.errors.exceptions.captured import AnalysisException

    from flechasdb_spark.session import normalize_event_ts

    # file streams need an explicit schema: take the files' own (cheap
    # footer-only static read), then normalize the time encoding. A
    # source directory that is empty / not yet created at stream start
    # (a real file-stream deployment shape) falls back to the canonical
    # EVENTS_SCHEMA (long-ns ts) instead of failing the probe.
    try:
        file_schema = spark.read.parquet(path).schema
    except AnalysisException:
        file_schema = EVENTS_SCHEMA
    reader = spark.readStream.schema(file_schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return normalize_event_ts(reader.parquet(path))


def windowed_event_agg(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window count/sum per event_type. On a
    bounded input drained with availableNow + complete output this
    equals the batch ``events_tumbling_agg`` query (tested)."""
    with_ts = events.withColumn(
        "event_time", F.expr("timestamp_micros(ts div 1000)")
    ).withWatermark("event_time", watermark)
    return (
        with_ts.groupBy(F.window("event_time", window), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def incremental_encode(
    model: IndexModel,
    vectors: DataFrame,
    index_path: str,
    checkpoint_path: str,
    compact_every: int | None = None,
):
    """Continuously PQ-encode arriving vectors with the frozen model and
    append them to ``<index_path>/index`` (same partition_id layout the
    batch loader reads — sources/manifest.py). Returns the streaming
    query handle.

    ``compact_every``: rewrite the index with
    ``maintenance.compact_index`` after every N non-empty batches —
    each append adds >= 1 file per touched partition, and at streaming
    cadence the small files otherwise accumulate until query-time scan
    throughput collapses (one task + footer read per file). Compaction
    runs inside foreachBatch, i.e. between batches of the single
    writer, so no concurrent-writer hazard; it is a full index rewrite,
    so pick N to amortize (e.g. hundreds of batches). Compaction is
    idempotent under foreachBatch's at-least-once replay (a no-op
    rewrite).

    Replay (r9, the `stream_ivfsq_encode` hazard's PQ sibling): a
    replay of a FULLY COMMITTED batch is a no-op via a per-batch
    marker file written after the append — without it, a crash
    between the append's job commit and the checkpoint commit (or a
    fresh-checkpoint reprocess) duplicated the batch's codes. This
    layout appends into the shared single-level ``partition_id=``
    tree (the one save_index / upsert / compact_index maintain), so
    the per-batch-subdirectory overwrite pattern the SQ sibling uses
    is not available; the residual window — a crash between the
    append job commit and the marker write — can still duplicate ONE
    batch, and `maintenance.compact_index` + an id-keyed dedup (or a
    table format) is the recovery there (documented trade)."""
    from flechasdb_spark.operators.build import pq_encoder_udf
    from flechasdb_spark.operators.maintenance import compact_index
    from flechasdb_spark.sources.manifest import _fs_path

    cfg = model.config
    centroids = model.centroids_np()
    codebooks = model.codebooks
    dim_perm = model.dim_perm
    state = {"appends": 0}

    def encode_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        marker, fs = _fs_path(
            spark, f"{index_path}/ingest_markers/batch-{int(batch_id)}"
        )
        if fs.exists(marker):
            return  # replay of a fully committed batch: exact no-op
        encode = pq_encoder_udf(
            batch.sparkSession, centroids, codebooks, dim_perm=dim_perm
        )
        (
            batch.select(
                cfg.id_col, encode(F.col(cfg.vec_col)).alias("enc")
            )
            .select(cfg.id_col, "enc.partition_id", "enc.codes")
            .write.mode("append")
            .partitionBy("partition_id")
            .parquet(f"{index_path}/index")
        )
        fs.create(marker, True).close()  # commit the replay no-op claim
        state["appends"] += 1
        if compact_every and state["appends"] % compact_every == 0:
            compact_index(batch.sparkSession, index_path)

    return (
        vectors.writeStream.foreachBatch(encode_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def stream_ivfsq_encode(
    model,
    vectors: DataFrame,
    index_path: str,
    checkpoint_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    compact_every: int | None = None,
    missing_cell: str = "error",
):
    """The IVF+SQ8 sibling of `incremental_encode`: continuously
    assign + scalar-quantize arriving vectors against a FROZEN
    `plans.ivfsq.IVFSQModel` (centroids + residual bounds trained
    offline — global or per-cell) into a
    ``<index_path>/index/ingest_batch=<id>/partition_id=<p>`` layout
    `load_ivfsq` reads (the extra ``ingest_batch`` partition column is
    inert to queries; ``partition_id`` still lands in the Parquet
    PartitionFilters at any directory level). Returns the streaming
    query handle.

    Per batch this is the batch build's map-only encode: one
    broadcast-join argmin for assignment, one broadcast join to
    subtract the winning centroid (plus one more for per-cell bounds),
    zero shuffles beyond the partitioned write. Frozen bounds make
    the codes batch-order independent — streamed == batch encode is
    the pytest/oracle gate.

    Delivery (ADVICE r8 #2 — the former plain append duplicated codes
    under a foreachBatch replay): each batch writes its own
    ``ingest_batch=<id>`` subdirectory in OVERWRITE mode; a replay of
    a committed batch is an exact no-op
    (`maintenance.ingest_batch_committed`: the subdir's ``_SUCCESS``
    marker, or the compaction ledger once the subdir was folded), and
    a replay of a PARTIALLY written batch overwrites its own
    directory with identical rows instead of appending beside them.

    ``missing_cell`` (ADVICE r8 #1): a vector assigned to a cell
    absent from frozen per-cell bounds errors loudly by default
    ("zero" degrades to centroid-only codes) — see
    `plans.ivfsq.encode_frozen_residuals`.

    ``compact_every``: every N processed batches, fold the committed
    older ``ingest_batch=`` directories into one reserved
    ``ingest_batch=-1`` (one file per cell directory), bounding the
    directory creep of a long-running ingest
    (`maintenance.compact_ingest_store` — atomic swap, replay guard
    preserved)."""
    from flechasdb_spark.operators.maintenance import (
        compact_ingest_store,
        ingest_batch_committed,
        repair_ingest_store,
    )
    from flechasdb_spark.plans.ivfsq import (
        encode_frozen_residuals,
        ivfsq_residuals,
    )

    state = {"appends": 0, "layout_checked": False}
    root = f"{index_path}/index"

    def _require_ingest_layout(spark) -> None:
        # A flat save_ivfsq layout (partition_id= directly under root)
        # mixed with this sink's ingest_batch=/partition_id= tree makes
        # spark.read.parquet(root) / load_ivfsq fail with 'Conflicting
        # directory structures' (ADVICE r9 #1) — the mirror of
        # maintenance._require_flat_ivfsq_layout. Fail fast at stream
        # start with a migration hint instead of corrupting the store.
        from flechasdb_spark.sources.manifest import _fs_path

        rootp, fs = _fs_path(spark, root)
        if not fs.exists(rootp):
            return
        for st in fs.listStatus(rootp):
            if st.getPath().getName().startswith("partition_id="):
                raise ValueError(
                    "stream_ivfsq_encode writes an ingest_batch=/"
                    "partition_id= tree, but this index root already "
                    "holds a flat save_ivfsq partition_id= layout — "
                    "mixing them breaks every reader. Stream into a "
                    "fresh path, or fold the existing index into the "
                    "streaming layout first (rewrite its rows under "
                    "ingest_batch=-1, e.g. read + write.partitionBy "
                    "into <root>/ingest_batch=-1)"
                )

    def encode_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        if not state["layout_checked"]:
            _require_ingest_layout(spark)
            state["layout_checked"] = True
        repair_ingest_store(spark, root)
        if ingest_batch_committed(spark, root, batch_id):
            return  # replay of a fully committed batch: exact no-op
        resid = ivfsq_residuals(batch, model.centroids, id_col, vec_col)
        enc = encode_frozen_residuals(resid, model, id_col, missing_cell)
        (
            enc.write.mode("overwrite")
            .partitionBy("partition_id")
            .parquet(f"{root}/ingest_batch={batch_id}")
        )
        state["appends"] += 1
        if compact_every and state["appends"] % compact_every == 0:
            compact_ingest_store(
                spark,
                root,
                exclude_batch_ids={int(batch_id)},
                inner_partition_cols=["partition_id"],
            )

    return (
        vectors.writeStream.foreachBatch(encode_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def stream_ivfbq_encode(
    model,
    vectors: DataFrame,
    index_path: str,
    checkpoint_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    compact_every: int | None = None,
):
    """The IVF+BQ sibling of `stream_ivfsq_encode` (r11): continuously
    assign + sign-pack arriving vectors against a FROZEN
    `plans.ivfbq.IVFBQModel` (centroids + optional thresholds trained
    offline) into the same
    ``<index_path>/index/ingest_batch=<id>/partition_id=<p>`` layout.
    Returns the streaming query handle.

    Per batch: one broadcast-join argmin for assignment + the map-only
    codegen bit pack — zero shuffles beyond the partitioned write, and
    NO trained bounds to join at all (BQ's frozen state is just the
    thresholds literal), so this is the lightest incremental encode in
    the repo. Frozen thresholds make the codes batch-order independent
    — streamed == batch encode is the pytest gate.

    Delivery contract identical to `stream_ivfsq_encode` (per-batch
    ``ingest_batch=<id>`` overwrite; committed-batch replay is an
    exact no-op via `maintenance.ingest_batch_committed`; the flat-
    layout mix guard fails fast; ``compact_every`` folds committed
    older batches through `maintenance.compact_ingest_store`)."""
    from flechasdb_spark.operators.bq import _packed_words
    from flechasdb_spark.operators.maintenance import (
        compact_ingest_store,
        ingest_batch_committed,
        repair_ingest_store,
    )
    from flechasdb_spark.plans.ivf import ivf_assign

    state = {"appends": 0, "layout_checked": False}
    root = f"{index_path}/index"

    def _require_ingest_layout(spark) -> None:
        from flechasdb_spark.sources.manifest import _fs_path

        rootp, fs = _fs_path(spark, root)
        if not fs.exists(rootp):
            return
        for st in fs.listStatus(rootp):
            if st.getPath().getName().startswith("partition_id="):
                raise ValueError(
                    "stream_ivfbq_encode writes an ingest_batch=/"
                    "partition_id= tree, but this index root already "
                    "holds a flat save_ivfbq partition_id= layout — "
                    "mixing them breaks every reader. Stream "
                    "into a fresh path, or fold the existing index "
                    "under ingest_batch=-1 first"
                )

    def encode_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        if not state["layout_checked"]:
            _require_ingest_layout(spark)
            state["layout_checked"] = True
        repair_ingest_store(spark, root)
        if ingest_batch_committed(spark, root, batch_id):
            return  # replay of a fully committed batch: exact no-op
        assigned = ivf_assign(
            batch, model.centroids, id_col=id_col, vec_col=vec_col
        )
        enc = assigned.select(
            id_col,
            "partition_id",
            _packed_words(vec_col, model.dim, model.thresholds).alias(
                "words"
            ),
        )
        (
            enc.write.mode("overwrite")
            .partitionBy("partition_id")
            .parquet(f"{root}/ingest_batch={batch_id}")
        )
        state["appends"] += 1
        if compact_every and state["appends"] % compact_every == 0:
            compact_ingest_store(
                spark,
                root,
                exclude_batch_ids={int(batch_id)},
                inner_partition_cols=["partition_id"],
            )

    return (
        vectors.writeStream.foreachBatch(encode_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def stream_itq_encode(
    model,
    vectors: DataFrame,
    index_path: str,
    checkpoint_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    compact_every: int | None = None,
):
    """The ITQ-composition sibling of `stream_ivfbq_encode` (r12) —
    incremental encode now covers every servable encode family
    (PQ / SQ / BQ / ITQ): continuously assign + rotate-and-binarize
    arriving vectors against a FROZEN `plans.ivfbq.ITQIVFBQModel`
    (rotation trained offline) into the same
    ``<index_path>/index/ingest_batch=<id>/partition_id=<p>`` layout.
    Returns the streaming query handle.

    Per batch: one broadcast-join argmin for assignment + the single
    map-only `itq_code_expr` codegen word (the rotation rides as plan
    literals — no model join at all, as light as the sign-bit path).
    A frozen rotation makes codes batch-order independent — streamed
    == batch encode is the pytest gate. Delivery contract identical
    to the SQ/BQ siblings (per-batch ``ingest_batch=<id>`` overwrite;
    committed-batch replay is an exact no-op via
    `maintenance.ingest_batch_committed`; the flat-layout mix guard
    fails fast; ``compact_every`` folds committed older batches)."""
    from flechasdb_spark.operators.itq import itq_code_expr
    from flechasdb_spark.operators.maintenance import (
        compact_ingest_store,
        ingest_batch_committed,
        repair_ingest_store,
    )
    from flechasdb_spark.plans.ivf import ivf_assign

    state = {"appends": 0, "layout_checked": False}
    root = f"{index_path}/index"

    def _require_ingest_layout(spark) -> None:
        from flechasdb_spark.sources.manifest import _fs_path

        rootp, fs = _fs_path(spark, root)
        if not fs.exists(rootp):
            return
        for st in fs.listStatus(rootp):
            if st.getPath().getName().startswith("partition_id="):
                raise ValueError(
                    "stream_itq_encode writes an ingest_batch=/"
                    "partition_id= tree, but this index root already "
                    "holds a flat save_itq_ivfbq partition_id= layout "
                    "— mixing them breaks every reader. Stream into a "
                    "fresh path, or fold the existing index under "
                    "ingest_batch=-1 first"
                )

    def encode_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        if not state["layout_checked"]:
            _require_ingest_layout(spark)
            state["layout_checked"] = True
        repair_ingest_store(spark, root)
        if ingest_batch_committed(spark, root, batch_id):
            return  # replay of a fully committed batch: exact no-op
        assigned = ivf_assign(
            batch, model.centroids, id_col=id_col, vec_col=vec_col
        )
        enc = assigned.select(
            id_col,
            "partition_id",
            F.array(itq_code_expr(vec_col, model.itq)).alias("words"),
        )
        (
            enc.write.mode("overwrite")
            .partitionBy("partition_id")
            .parquet(f"{root}/ingest_batch={batch_id}")
        )
        state["appends"] += 1
        if compact_every and state["appends"] % compact_every == 0:
            compact_ingest_store(
                spark,
                root,
                exclude_batch_ids={int(batch_id)},
                inner_partition_cols=["partition_id"],
            )

    return (
        vectors.writeStream.foreachBatch(encode_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def stream_static_knn(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    output_path: str,
    checkpoint_path: str,
    query_id_col: str = "query_id",
    query_vec_col: str = "qvector",
):
    """Continuous batch-kNN: each micro-batch of query vectors is joined
    against the static corpus with the batch knn_join operator and the
    results appended to a parquet sink (swap for Kafka/Delta in
    production). Returns the streaming query handle."""
    from flechasdb_spark.operators.knn import knn_join

    def knn_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        out = knn_join(
            batch,
            corpus,
            k=k,
            query_id_col=query_id_col,
            query_vec_col=query_vec_col,
        )
        out.write.mode("append").parquet(output_path)

    return (
        queries.writeStream.foreachBatch(knn_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def stream_asof_enrich(
    stream: DataFrame,
    static_right: DataFrame,
    on: str,
    by: list[str] | str,
    output_path: str,
    checkpoint_path: str,
    right_on: str | None = None,
    value_cols: list[str] | None = None,
):
    """Continuous point-in-time enrichment: each micro-batch of events
    is as-of joined (backward inclusive — operators/temporal.py)
    against a STATIC feature/state table and appended to the sink. The
    feature-store serving shape: per batch, the union-window as-of join
    shuffles only |batch| + |right| rows on the ``by`` keys. The static
    side is persisted here (r4 — previously each batch re-scanned its
    source), materialized by the first batch and served from executor
    cache after; unpersist it after draining the query (the handle is
    returned so the caller owns the lifetime). Returns the streaming
    query handle.

    For a right side that itself updates, drop the persist and
    snapshot per batch (foreachBatch re-reads lazily) or move to Delta
    and time-travel — the join semantics here are point-in-time within
    the ROW time columns, not table versions."""
    from flechasdb_spark.operators.temporal import asof_join

    static_right = static_right.persist()

    def enrich(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        asof_join(
            batch,
            static_right,
            on=on,
            by=by,
            right_on=right_on,
            value_cols=value_cols,
        ).write.mode("append").parquet(output_path)

    return (
        stream.writeStream.foreachBatch(enrich)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def stream_dedup(
    events: DataFrame,
    key_cols: list[str],
    watermark: str = "2 hours",
    time_col_ns: str = "ts",
) -> DataFrame:
    """Streaming exact dedup: keep the first occurrence of each key,
    with state bounded by the watermark (``dropDuplicatesWithinWatermark``
    — duplicates separated by more than the watermark MAY both survive;
    that is the bounded-state contract at scale: state holds one row
    per key per watermark horizon, not forever)."""
    with_ts = events.withColumn(
        "__event_time", F.expr(f"timestamp_micros({time_col_ns} div 1000)")
    ).withWatermark("__event_time", watermark)
    return with_ts.dropDuplicatesWithinWatermark(key_cols).drop("__event_time")


def stream_rate_anomaly(
    events: DataFrame,
    stats: DataFrame,
    output_path: str,
    type_col: str = "event_type",
    ts_col: str = "ts",
    bucket_seconds: int = 3600,
):
    """Streaming event-rate anomaly monitor: per micro-batch, score
    every (type, bucket) count that arrived against a FROZEN
    ``operators.temporal.rate_stats`` reference trained offline on the
    historical gap-filled series, and append (event_type, bucket_epoch,
    cnt, zscore) rows — the ingest-time alarm wire for traffic spikes /
    collector outages / replay floods, caught per batch instead of in
    the next batch-mode ``rate_zscores`` run.

    Stateless per batch (the reference never updates in-stream), so the
    delivery contract is stream_quality_filter's: each batch writes
    under ``ingest_batch=<id>`` in overwrite mode, committed replays
    are exact no-ops (_SUCCESS check). Per batch: one partial agg to
    O(types * buckets_present) rows + the broadcast O(types) reference
    join. Only buckets present in the batch are scored (an ingest
    monitor cannot see data that has not arrived); batch-mode
    ``rate_zscores`` owns quiet-hour detection over the full grid.
    """
    from flechasdb_spark.operators.temporal import batch_rate_zscores
    from flechasdb_spark.sources.manifest import _fs_path

    def process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        out_dir = f"{output_path}/ingest_batch={batch_id}"
        spark = batch.sparkSession
        marker, fs = _fs_path(spark, f"{out_dir}/_SUCCESS")
        if fs.exists(marker):
            return  # replay of a committed batch: exact no-op
        batch_rate_zscores(
            batch, stats,
            type_col=type_col, ts_col=ts_col,
            bucket_seconds=bucket_seconds,
        ).write.mode("overwrite").parquet(out_dir)

    return (
        events.writeStream.outputMode("append")
        .foreachBatch(process)
        .trigger(availableNow=True)
        .start()
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    within: str = "1 hour",
    watermark: str = "2 hours",
    time_col_ns: str = "ts",
) -> DataFrame:
    """Watermarked stream-stream interval join: pair each left event
    with right events of the SAME key that occur within ``within``
    AFTER it. Both sides carry watermarks, so the state store only
    buffers ``watermark + within`` of data per side — the bounded-state
    contract that makes stream-stream joins viable at scale (an
    unwatermarked join buffers both streams forever).

    On a bounded input drained with availableNow the inner-join output
    equals the batch interval join (tested + oracle row)."""
    l2 = (
        left.withColumn(
            "__lt", F.expr(f"timestamp_micros({time_col_ns} div 1000)")
        )
        .withWatermark("__lt", watermark)
        .select(
            F.col(key).alias("__lk"),
            F.col("event_id").alias("left_event_id"),
            F.col("value").alias("left_value"),
            "__lt",
        )
    )
    r2 = (
        right.withColumn(
            "__rt", F.expr(f"timestamp_micros({time_col_ns} div 1000)")
        )
        .withWatermark("__rt", watermark)
        .select(
            F.col(key).alias("__rk"),
            F.col("event_id").alias("right_event_id"),
            "__rt",
        )
    )
    return l2.join(
        r2,
        F.expr(
            f"__lk = __rk AND __rt > __lt AND __rt <= __lt + interval {within}"
        ),
    ).select(
        F.col("__lk").alias(key),
        "left_event_id",
        "right_event_id",
        "left_value",
    )


def stateful_session_count(
    events: DataFrame, gap_sec: int = 1800, idle_ttl_sec: int | None = None
) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-user session counting with a gap rule (new session when the gap
    to the previous event exceeds ``gap_sec``). State per user is three
    longs (last event time, session count, event count) — bounded, no
    event buffering; each micro-batch folds its (sorted) events into
    the state and emits the updated totals.

    ``idle_ttl_sec``: state TTL. O(three longs) per user is small but
    still O(distinct users) over an unbounded stream; with a TTL, a
    user idle for that long has their state dropped (their counts were
    already emitted in update mode — a later return starts fresh, which
    is also what the gap rule would conclude whenever
    idle_ttl_sec >= gap_sec). Default None keeps state forever —
    only appropriate for bounded replays like the oracle drain.

    Output rows: (user_id, n_sessions, n_events) in update mode — on a
    bounded input the final emission per user equals the batch
    sessionizer's totals (tested against events_sessionize)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    output_schema = "user_id long, n_sessions long, n_events long"
    state_schema = "last_ts long, n_sessions long, n_events long"
    gap_us = gap_sec * 1_000_000

    def fold(key, pdfs, state):
        (user_id,) = key
        if idle_ttl_sec is not None and state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            last_ts, n_sessions, n_events = state.get
        else:
            last_ts, n_sessions, n_events = -1, 0, 0
        for pdf in pdfs:
            if pdf.empty:
                continue
            ts_us = (pdf["ts"].to_numpy() // 1000).copy()
            ts_us.sort()
            prev = ts_us[:-1]
            gaps_over = (ts_us[1:] - prev) > gap_us
            first_is_break = last_ts < 0 or (ts_us[0] - last_ts) > gap_us
            n_sessions += int(first_is_break) + int(gaps_over.sum())
            n_events += len(ts_us)
            last_ts = int(ts_us[-1])
        state.update((last_ts, n_sessions, n_events))
        if idle_ttl_sec is not None:
            state.setTimeoutDuration(idle_ttl_sec * 1000)
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_sessions": [n_sessions],
                "n_events": [n_events],
            }
        )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_ttl_sec is not None
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        fold,
        output_schema,
        state_schema,
        "update",
        timeout,
    )


def run_available_now(query, timeout_sec: int = 300, poll_sec: float = 0.5) -> None:
    """Drain a bounded stream: wait for the availableNow trigger to
    process everything, then stop.

    A query whose stateful operator registered ProcessingTimeTimeout
    timers (e.g. stateful_session_count with idle_ttl_sec) never
    self-terminates after an availableNow drain — once the source is
    exhausted it loops "no new data but cleaning up state" batches
    (~2/s) forever to service future timers — so waiting on
    termination alone burns the full timeout. Every such housekeeping
    batch commits with numInputRows == 0, and a zero-input batch can
    only run AFTER every data batch has committed (the availableNow
    source plans data batches until its end offsets are reached), so
    three distinct committed empty batches prove the drain is done:
    all data outputs (and any watermark-flush emissions — those happen
    IN the first empty batch) are already in the sink. Queries without
    timers still terminate on their own and return via
    awaitTermination before the empty-batch count is reached.
    timeout_sec stays the hard ceiling."""
    import time

    deadline = time.monotonic() + timeout_sec
    empty_batches: set[int] = set()
    while query.isActive and time.monotonic() < deadline:
        if query.awaitTermination(poll_sec):
            return
        progress = query.lastProgress
        if progress is not None and progress.get("numInputRows", 0) == 0:
            empty_batches.add(progress.get("batchId", -1))
            if len(empty_batches) >= 3:
                break
    if query.isActive:
        query.stop()


def stream_minhash_dedup(
    docs: DataFrame,
    band_store_path: str,
    output_path: str,
    num_hashes: int = 16,
    bands: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    compact_every: int | None = None,
):
    """Online near-dup filtering: each micro-batch keeps only documents
    that are NOVEL — no LSH band key in common with any previously-kept
    document (band store) nor with a lower-id novel doc of the same
    batch — then appends the survivors to ``output_path`` and their
    band keys to the store. The foreachBatch composition of the batch
    MinHash banding (operators/dedup.py minhash_band_keys), i.e. the
    ingest-time dedup a crawl pipeline runs so duplicates never reach
    the corpus.

    Candidate-level (conservative): a band collision drops the doc
    without a Jaccard verify — the standard online trade, since the
    kept docs' tokens are no longer at hand. Intra-batch semantics
    match the repo's batch clustering policy (neardup_components):
    store-novel docs are clustered by transitive band collisions and
    the LOWEST id of each cluster survives. ACROSS micro-batches the
    policy is FIRST-ARRIVAL-WINS: a doc colliding with an
    earlier-batch survivor is dropped regardless of id, so an
    out-of-order arrival can flip WHICH member of a duplicate cluster
    survives (for clique-shaped clusters — mutual near-dups, the
    common case — exactly one member survives under any arrival
    order; only chain-shaped collision graphs can change the kept
    COUNT). This matches the reference-free online contract: the
    corpus never holds two docs that collided at ingest time.

    Delivery: foreachBatch is at-least-once, so each batch writes
    under an ``ingest_batch=<id>`` subdirectory of both sinks, in
    overwrite mode, and the batch is skipped wholesale when its band
    store subdirectory is already committed (_SUCCESS) — a replay
    therefore rewrites the identical rows instead of appending
    duplicates. Readers of ``output_path`` see one extra
    ``ingest_batch`` partition column (drop it to recover the input
    schema). Store absence is distinguished from read FAILURE via a
    Hadoop-FS existence check: a transient FS error propagates and
    fails the batch (and the retry re-runs it) instead of silently
    disabling the duplicate check.

    Scale: per batch, one equi-join of the batch's band keys against
    the store (shuffle keyed on band_key — the store side prunes to
    matching keys; at rest the store is just parquet, O(bands) rows per
    kept doc) plus the intra-batch component pass (O(cluster diameter)
    rounds over only the batch's colliding docs). ``compact_every``
    (VERDICT r8 #4): every N processed batches, fold the committed
    older ``ingest_batch=`` store subdirectories into one reserved
    ``ingest_batch=-1`` so a long-running ingest's store listing stays
    O(recent batches) — `maintenance.compact_ingest_store` preserves
    both the ``ingest_batch`` column (folded rows read back as -1,
    never equal to a replaying batch's id) and the committed-batch
    claim (ledger inside the folded dir, atomic with the swap).
    Returns the streaming query handle (caller drains/stops).
    """
    from flechasdb_spark.operators.dedup import (
        connected_components,
        minhash_band_keys,
    )
    from flechasdb_spark.operators.maintenance import (
        compact_ingest_store,
        ingest_batch_committed,
        repair_ingest_store,
    )
    from flechasdb_spark.sources.manifest import _fs_path

    state = {"batches": 0}

    def process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        if batch.isEmpty():
            return
        store_batch_dir = f"{band_store_path}/ingest_batch={batch_id}"
        repair_ingest_store(spark, band_store_path)
        if ingest_batch_committed(spark, band_store_path, batch_id):
            return  # replay of a fully committed batch: exact no-op
        keys = minhash_band_keys(
            batch, num_hashes, bands, text_col, id_col
        ).persist()
        try:
            # absence vs failure: a genuinely missing store (or a root
            # left schema-less by a crashed first write — only
            # _temporary inside) skips the check; any OTHER read error
            # (transient FS/S3 fault, corrupt files) propagates and
            # fails the batch so the retry re-runs it, instead of
            # silently disabling the duplicate check
            from pyspark.errors.exceptions.captured import (
                AnalysisException,
            )

            root, rfs = _fs_path(spark, band_store_path)
            store = None
            if rfs.exists(root):
                try:
                    # exclude THIS batch's own subdir: a replay of a
                    # batch whose prior store write failed after some
                    # task-committed files landed (no _SUCCESS, e.g.
                    # committer v2) must not see its own keys and mark
                    # its docs as duplicates of themselves
                    store = spark.read.parquet(band_store_path).where(
                        F.col("ingest_batch").cast("long")
                        != F.lit(int(batch_id))
                    )
                except AnalysisException:
                    store = None  # exists but holds no committed data
            fresh = keys
            if store is not None:
                dup_ids = (
                    keys.join(store, ["band", "band_key"], "left_semi")
                    .select(id_col)
                    .distinct()
                )
                fresh = keys.join(dup_ids, id_col, "left_anti")
            # intra-batch: cluster transitive band collisions, keep the
            # lowest id per component (isolated docs have no edges and
            # survive untouched)
            a = fresh.select(F.col(id_col).alias("id_a"), "band", "band_key")
            b = fresh.select(F.col(id_col).alias("id_b"), "band", "band_key")
            edges = (
                a.join(b, ["band", "band_key"])
                .where(F.col("id_a") < F.col("id_b"))
                .select("id_a", "id_b")
                .distinct()
            )
            comp = connected_components(edges)
            beaten = comp.where(F.col("node") != F.col("component")).select(
                F.col("node").alias(id_col)
            )
            kept_keys = fresh.join(beaten, id_col, "left_anti").persist()
            kept_ids = kept_keys.select(id_col).distinct()
            # survivors first, band keys (the commit marker) last:
            # a crash between the two leaves no marker, so the retry
            # overwrites both subdirectories with identical content
            (
                batch.join(kept_ids, id_col, "left_semi")
                .write.mode("overwrite")
                .parquet(f"{output_path}/ingest_batch={batch_id}")
            )
            kept_keys.select(id_col, "band", "band_key").write.mode(
                "overwrite"
            ).parquet(store_batch_dir)
            kept_keys.unpersist()
            state["batches"] += 1
            if compact_every and state["batches"] % compact_every == 0:
                compact_ingest_store(
                    spark,
                    band_store_path,
                    exclude_batch_ids={int(batch_id)},
                )
        finally:
            keys.unpersist()

    return (
        docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", f"{output_path}__checkpoint")
        .trigger(availableNow=True)
        .start()
    )


def stream_quality_filter(
    docs: DataFrame,
    priors: DataFrame,
    loglik: DataFrame,
    output_path: str,
    keep_labels: list[str],
    n_buckets: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Ingest-time quality/domain gate: score each micro-batch of a
    document stream with a FROZEN hashed-NB classifier
    (``classify.nb_train`` offline, model broadcast) and keep only
    documents whose predicted label is in ``keep_labels`` — the
    streaming form of the fastText-style filter step curation
    pipelines run before anything expensive touches a document.

    Stateless per batch (the model never updates in-stream), so the
    delivery contract is the simple half of ``stream_minhash_dedup``'s:
    each batch writes under ``ingest_batch=<id>`` in overwrite mode and
    a fully-committed batch replay is a no-op (_SUCCESS check) — no
    cross-batch store at all. Per batch: one token-grain partial agg +
    O(L x B) broadcast join (``classify.nb_score``) + one append.
    Returns the streaming query handle (caller drains/stops).
    """
    from flechasdb_spark.operators.classify import nb_score
    from flechasdb_spark.sources.manifest import _fs_path

    def process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        out_dir = f"{output_path}/ingest_batch={batch_id}"
        spark = batch.sparkSession
        marker, fs = _fs_path(spark, f"{out_dir}/_SUCCESS")
        if fs.exists(marker):
            return  # replay of a committed batch: exact no-op
        scored = nb_score(
            batch, priors, loglik,
            text_col=text_col, id_col=id_col, n_buckets=n_buckets,
        )
        kept = batch.join(
            scored.where(F.col("predicted").isin(list(keep_labels)))
            .select(id_col),
            id_col,
            "left_semi",
        )
        kept.write.mode("overwrite").parquet(out_dir)

    return (
        docs.writeStream.outputMode("append")
        .foreachBatch(process)
        .trigger(availableNow=True)
        .start()
    )


def stream_span_decontam(
    docs: DataFrame,
    reference_keys: DataFrame,
    output_path: str,
    window_words: int = 15,
    max_hit_windows: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
    key_mode: str = "hash",
):
    """Ingest-time ExactSubstr decontamination: drop (quarantine)
    documents of a stream that share any ``window_words``-word span
    with a FROZEN reference corpus — the streaming composition of
    `repeated_ngram_spans`' window machinery, and the exact-match
    sibling of `bloom_decontam_prefilter` (hash equi-join against the
    reference's window-key table instead of a probabilistic membership
    test, so there are no false positives at the gate).

    ``reference_keys`` is the offline-built DISTINCT window-key table
    of the protected corpus (eval benchmarks, held-out splits):
    ``dedup.window_keys(ref, L, ...).select("__k").distinct()`` —
    O(ref windows) rows of 8-byte hashes, persisted once and reused
    across batches. It MUST be built with the same ``key_mode`` (and
    window length) passed here: a text-keyed reference joined against
    hashed batch keys matches nothing and the gate silently admits
    everything. A doc survives iff at most ``max_hit_windows`` of
    its windows hit the reference (0 = any shared span kills).

    Stateless per batch (the reference never updates in-stream), so
    delivery is `stream_quality_filter`'s simple contract: each batch
    writes under ``ingest_batch=<id>`` in overwrite mode; a committed
    batch's replay is an exact no-op (_SUCCESS check).

    Scale: per batch ONE map-only window expansion (hash keys, ~24
    bytes/row shuffled) + one equi-join against the reference keys
    (broadcastable while the protected set is small; shuffle-join
    keyed on the 8-byte hash beyond that) + a per-doc count. The
    reference side never rescans its corpus — it is pre-reduced to
    keys.
    Returns the streaming query handle (caller drains/stops).
    """
    from flechasdb_spark.operators.dedup import window_keys
    from flechasdb_spark.sources.manifest import _fs_path

    # a mode mismatch between the reference table and this gate would
    # match nothing and silently admit everything — the key dtype
    # reveals how the reference was built, so fail loudly instead
    want = "bigint" if key_mode == "hash" else "string"
    got = dict(reference_keys.dtypes).get("__k")
    if got != want:
        raise ValueError(
            f"reference_keys.__k is {got!r} but key_mode={key_mode!r} "
            f"expects {want!r} — build the reference with the same "
            "key_mode (dedup.window_keys)"
        )

    def process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        out_dir = f"{output_path}/ingest_batch={batch_id}"
        spark = batch.sparkSession
        marker, fs = _fs_path(spark, f"{out_dir}/_SUCCESS")
        if fs.exists(marker):
            return  # replay of a committed batch: exact no-op
        keys = window_keys(
            batch, window_words, id_col, text_col, key_mode
        )
        hits = (
            keys.join(reference_keys, "__k", "left_semi")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("__hits"))
            .where(F.col("__hits") > max_hit_windows)
            .select(id_col)
        )
        kept = batch.join(hits, id_col, "left_anti")
        kept.write.mode("overwrite").parquet(out_dir)

    return (
        docs.writeStream.outputMode("append")
        .foreachBatch(process)
        .trigger(availableNow=True)
        .start()
    )


def stream_span_dedup(
    docs: DataFrame,
    store_path: str,
    output_path: str,
    window_words: int = 15,
    id_col: str = "doc_id",
    text_col: str = "text",
    key_mode: str = "hash",
    compact_every: int | None = None,
):
    """Online ExactSubstr corpus construction — the exact-span sibling
    of `stream_minhash_dedup`: the output corpus never holds two
    documents sharing a ``window_words``-word span, enforced at ingest
    with NO false positives (window-key equality, not sketch
    collision). Per micro-batch a document survives iff every
    duplicated window it contains FIRST OCCURS WITHIN ITSELF — i.e.
    none of its windows hit the store (content kept in an earlier
    batch) and none first-occur in a lower-(doc, pos) document of the
    same batch. Survivors are appended to ``output_path`` and their
    window keys to the store. The origin-rule is deliberately
    one-pass-decidable (min(struct(doc, pos)) per key), unlike a
    transitive-component policy — so both the streaming job and the
    SQL oracle compute it without iteration/recursion.

    Delivery matches `stream_minhash_dedup`: both sinks write under
    ``ingest_batch=<id>`` in overwrite mode, survivors first, store
    keys (the commit marker) last; a replay of a committed batch is an
    exact no-op (_SUCCESS check on the store subdir). Store absence is
    distinguished from read failure (AnalysisException on an
    uncommitted root -> no store yet; other errors propagate and fail
    the batch).

    Scale: per batch ONE map-only window expansion (~24 B/row keys in
    hash mode) + one agg for in-batch first occurrences + one
    equi-join against the store keys (the store is O(kept windows) —
    8-byte rows at rest, pruned to matching keys by the join).
    ``compact_every`` (VERDICT r8 #4): every N processed batches, fold
    the committed older ``ingest_batch=`` store subdirectories into
    one reserved ``ingest_batch=-1``
    (`maintenance.compact_ingest_store`), bounding a long-running
    ingest's store-listing creep while preserving the replay guard
    (the ``ingest_batch`` column and the committed-batch claim both
    survive the fold).
    Returns the streaming query handle (caller drains/stops)."""
    from pyspark.errors.exceptions.captured import AnalysisException

    from flechasdb_spark.operators.dedup import window_keys
    from flechasdb_spark.operators.maintenance import (
        compact_ingest_store,
        ingest_batch_committed,
        repair_ingest_store,
    )
    from flechasdb_spark.sources.manifest import _fs_path

    state = {"batches": 0}

    def process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        if batch.isEmpty():
            return
        store_batch_dir = f"{store_path}/ingest_batch={batch_id}"
        repair_ingest_store(spark, store_path)
        if ingest_batch_committed(spark, store_path, batch_id):
            return  # replay of a fully committed batch: exact no-op
        keys = window_keys(
            batch, window_words, id_col, text_col, key_mode
        ).persist()
        try:
            okey = F.struct(
                F.col(id_col).alias("d"), F.col("pos").alias("p")
            )
            # in-batch: docs containing a duplicated window that first
            # occurs in ANOTHER doc
            bad_batch = (
                keys.select(id_col, "pos", "__k")
                .join(
                    keys.groupBy("__k").agg(
                        F.count(F.lit(1)).alias("__c"),
                        F.min(okey).alias("__first"),
                    ),
                    "__k",
                )
                .where(
                    (F.col("__c") > 1)
                    & (F.col("__first.d") != F.col(id_col))
                )
                .select(id_col)
                .distinct()
            )
            # store: any hit means the content was kept earlier
            root, rfs = _fs_path(spark, store_path)
            store = None
            if rfs.exists(root):
                try:
                    # exclude THIS batch's own subdir: a replay after a
                    # partial (no-_SUCCESS) store write must not see the
                    # batch's own keys as store hits and drop first
                    # occurrences (ADVICE r7)
                    store = spark.read.parquet(store_path).where(
                        F.col("ingest_batch").cast("long")
                        != F.lit(int(batch_id))
                    )
                except AnalysisException:
                    store = None  # exists but holds no committed data
            bad = bad_batch
            if store is not None:
                hit = (
                    keys.join(
                        store.select("__k"), "__k", "left_semi"
                    )
                    .select(id_col)
                    .distinct()
                )
                bad = bad.unionByName(hit).distinct()
            kept = batch.join(bad, id_col, "left_anti")
            kept.write.mode("overwrite").parquet(
                f"{output_path}/ingest_batch={batch_id}"
            )
            keys.join(bad, id_col, "left_anti").select(
                id_col, "__k"
            ).write.mode("overwrite").parquet(store_batch_dir)
            state["batches"] += 1
            if compact_every and state["batches"] % compact_every == 0:
                compact_ingest_store(
                    spark,
                    store_path,
                    exclude_batch_ids={int(batch_id)},
                )
        finally:
            keys.unpersist()

    return (
        docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", f"{output_path}__checkpoint")
        .trigger(availableNow=True)
        .start()
    )


def stream_token_drift(
    docs: DataFrame,
    lp: DataFrame,
    floor_micro: int,
    output_path: str,
    text_col: str = "text",
    source_col: str = "source",
):
    """Streaming distribution-drift monitor: per micro-batch, score
    every source's token distribution against a FROZEN reference
    unigram LM (text.unigram_lm_tables trained offline) and append
    (source, n_tokens, kl_nats) rows — the alarm wire for scraper
    drift / encoding breakage / template floods, caught at ingest time
    instead of after a 100 TB curation run (the streaming form of the
    batch `source_token_kl` report, scored against an external
    reference so a single batch suffices).

    Stateless per batch (the reference never updates in-stream), so
    the delivery contract is stream_quality_filter's: each batch
    writes under ``ingest_batch=<id>`` in overwrite mode, committed
    replays are exact no-ops (_SUCCESS check). Per batch: one
    token-grain partial agg + broadcast O(V) model join.
    """
    from flechasdb_spark.operators.text import batch_source_kl
    from flechasdb_spark.sources.manifest import _fs_path

    def process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        out_dir = f"{output_path}/ingest_batch={batch_id}"
        spark = batch.sparkSession
        marker, fs = _fs_path(spark, f"{out_dir}/_SUCCESS")
        if fs.exists(marker):
            return  # replay of a committed batch: exact no-op
        batch_source_kl(
            batch, lp, floor_micro,
            text_col=text_col, source_col=source_col,
        ).write.mode("overwrite").parquet(out_dir)

    return (
        docs.writeStream.outputMode("append")
        .foreachBatch(process)
        .trigger(availableNow=True)
        .start()
    )


def stream_media_ingest(
    spark,
    media_dir: str,
    output_path: str,
    checkpoint_path: str,
    glob: str | None = None,
    fake: bool = False,
):
    """Incremental media-file ingest: watch a directory with the
    binaryFile FILE STREAM source, reshape each newly-arrived file into
    the payload contract (content-addressed id, magic-sniffed format),
    decode image payloads, and append (doc_id, width, height,
    features) to ``output_path``. Returns the streaming query handle
    (availableNow trigger — drain what exists, then stop; production
    would run processingTime).

    Exactly-once per FILE: the file stream source commits seen file
    paths to the checkpoint, so a restart re-lists the directory but
    reprocesses nothing already committed — the media sibling of
    ``incremental_encode``'s contract, with the source itself (not a
    foreachBatch dedup) providing the idempotence. Non-image payloads
    are filtered out JVM-side before any Python decode runs; the
    decode is the same Arrow-batched ``mapInPandas`` kernel the batch
    path uses (``fake=False`` -> real BMP/PPM decoders).

    Scale: each micro-batch pays one list + bin-packed read of only
    the NEW files; decode rides the scan map-only (plan-gated for the
    batch kernel in test_plans.py); the parquet sink appends without
    touching history.
    """
    from flechasdb_spark.operators.multimodal import decode_image
    from flechasdb_spark.sources.media import (
        BINARY_FILE_SCHEMA,
        payload_projection,
    )

    reader = spark.readStream.format("binaryFile").schema(
        BINARY_FILE_SCHEMA
    )
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    media = payload_projection(reader.load(media_dir))
    imgs = media.where(
        F.col("media_meta.format").startswith("image/")
    )
    # decode_image's kernel carries (id, payload) only; provenance
    # stays recoverable from the content-addressed id (re-list with
    # read_media_dir), so the feature sink stays narrow
    feats = decode_image(imgs.select("doc_id", "payload"), fake=fake)
    return (
        feats.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_hll_users(
    events: DataFrame,
    output_path: str,
    checkpoint_path: str,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    value_col: str = "user_id",
    ts_col: str = "ts",
    p: int = 6,
):
    """Streaming distinct-user HLL per event-time window: each event
    contributes one (window, register, rank) row via the SAME
    register arithmetic the batch/oracle ``hll_distinct`` uses
    (``sketch.hll_register_exprs``); the windowed ``max(rank)`` per
    register is the entire streaming state — O(windows * 2^p) rows,
    bounded by the watermark, regardless of event volume. Append mode
    emits each window's finalized registers to ``output_path`` once
    the watermark passes; ``sketch.hll_estimate_from_registers`` then
    turns the materialized registers into estimates batch-side (and
    because register maxes are mergeable, a later backfill merges by
    just re-maxing the same rows).

    This is the streaming member of the sketch family: exact distinct
    per window would hold every user id in state; the HLL holds 2^p
    longs per window and is engine-exact, unlike
    ``approx_count_distinct_duration``'s private HLL++.

    Returns the streaming query handle (availableNow — drain what
    exists, then stop)."""
    from flechasdb_spark.operators.sketch import hll_register_exprs

    idx, rank = hll_register_exprs(value_col, p)
    regs = (
        events.withWatermark(ts_col, watermark)
        # group by the window STRUCT itself — projecting win.start
        # before the agg severs the watermark linkage and append mode
        # rejects the aggregation
        .groupBy(
            F.window(F.col(ts_col), window_duration).alias("win"),
            idx.alias("__idx"),
        )
        .agg(F.max(rank).alias("__m"))
        .select(
            F.col("win.start").alias("window_start"), "__idx", "__m"
        )
    )
    return (
        regs.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_semantic_decontam(
    docs: DataFrame,
    benchmark: DataFrame,
    radius: float,
    output_path: str,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    bench_vec_col: str = "embedding",
    round_to: int | None = None,
):
    """Ingest-time SEMANTIC decontamination (r10) — the embedding-space
    sibling of `stream_span_decontam`: quarantine every arriving
    document whose embedding lies within squared-L2 ``radius`` of ANY
    vector of a FROZEN benchmark set (eval questions, held-out
    prompts). Exact-substring gates miss paraphrases; this is the
    standard second line — the radius comes from a sampled
    distance histogram of known-contaminated pairs (the
    `knn.range_search` sizing note applies).

    ``round_to`` applies the gate to the ROUNDED distance (the range
    family's boundary-stability convention). The gate is stateless
    per batch (the benchmark never updates in-stream), so delivery is
    `stream_span_decontam`'s contract: each batch writes its
    survivors under ``ingest_batch=<id>`` in overwrite mode; a
    committed batch's replay is an exact no-op (_SUCCESS check).

    Scale: per batch one broadcast nested-loop expansion batch x B
    (B = |benchmark| — eval sets are small by construction; the
    radius filter is codegen, so only hits reach the distinct) + one
    anti-join. Past broadcastable B, pre-index the benchmark with
    IVF+SQ and gate through `ivfsq_range_query_batch` instead — same
    contract, pruned scan.
    Returns the streaming query handle (caller drains/stops)."""
    from flechasdb_spark.functions.linalg import squared_l2
    from flechasdb_spark.sources.manifest import _fs_path

    bench = F.broadcast(
        benchmark.select(
            F.col(bench_vec_col).cast("array<double>").alias("__bv")
        )
    )

    def process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        out_dir = f"{output_path}/ingest_batch={batch_id}"
        spark = batch.sparkSession
        marker, fs = _fs_path(spark, f"{out_dir}/_SUCCESS")
        if fs.exists(marker):
            return  # replay of a committed batch: exact no-op
        d = squared_l2(F.col(vec_col).cast("array<double>"), F.col("__bv"))
        if round_to is not None:
            d = F.round(d, round_to)
        contaminated = (
            batch.select(id_col, vec_col)
            .join(bench)
            .where(d <= float(radius))
            .select(id_col)
            .distinct()
        )
        kept = batch.join(contaminated, id_col, "left_anti")
        kept.write.mode("overwrite").parquet(out_dir)

    return (
        docs.writeStream.outputMode("append")
        .foreachBatch(process)
        .trigger(availableNow=True)
        .start()
    )
