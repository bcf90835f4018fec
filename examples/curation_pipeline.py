"""End-to-end training-data curation over the documents table:
dedup (exact + MinHash near-dup) -> quality/language filter -> token
accounting -> context-window chunking — the LLM-pipeline extension
surface in one composed job.

Usage:
    python examples/curation_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flechasdb_spark.operators.dedup import dedup_exact, minhash_dedup
from flechasdb_spark.operators.text import lang_id, quality_score, token_stats
from flechasdb_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="example_curation")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # corpus composition + rule-set gate before anything expensive:
    # both are single map/agg passes over the first scan
    from flechasdb_spark.operators.sampling import source_mix_report
    from flechasdb_spark.operators.text import gopher_quality_filter

    mix = source_mix_report(docs)
    worst = mix.orderBy(F.col("dup_rate").desc()).first()
    print(f"sources:      {mix.count()} "
          f"(max dup_rate {worst.dup_rate} in {worst.source})")
    gopher_keep = (
        gopher_quality_filter(docs, min_stop_hits=1)
        .where(F.col("keep"))
        .select("doc_id")
    )

    exact_keep = dedup_exact(docs).where(F.col("keep")).select("doc_id")
    near_keep = minhash_dedup(docs, threshold=0.8).where(F.col("keep")).select("doc_id")
    quality = quality_score(docs).select("doc_id", "quality")
    lang = lang_id(docs).select("doc_id", "pred_lang")
    toks = token_stats(docs).select("doc_id", "n_tokens")

    curated = (
        docs.select("doc_id", "source")
        .join(gopher_keep, "doc_id", "left_semi")
        .join(exact_keep, "doc_id", "left_semi")
        .join(near_keep, "doc_id", "left_semi")
        .join(quality, "doc_id")
        .join(lang, "doc_id")
        .join(toks, "doc_id")
        .where((F.col("quality") >= 0.5) & (F.col("pred_lang") == "en"))
    )
    stats = curated.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.avg("quality"), 4).alias("avg_quality"),
    ).first()
    print(f"input docs:   {n0}")
    print(f"curated docs: {stats.n_docs} ({100 * stats.n_docs / n0:.1f}%)")
    print(f"total tokens: {stats.total_tokens}")
    print(f"avg quality:  {stats.avg_quality}")

    # pack the surviving docs into model-context-sized training rows
    from flechasdb_spark.operators.text import chunk_text_udtf

    chunk = chunk_text_udtf(chunk_size=32, overlap=8)
    chunks = (
        docs.join(curated.select("doc_id"), "doc_id", "left_semi")
        .select("doc_id", "text")
        .lateralJoin(chunk(F.col("text").outer()))
    )
    cstats = chunks.agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.round(F.avg("n_tokens"), 2).alias("avg_chunk_tokens"),
    ).first()
    print(f"chunks:       {cstats.n_chunks} (avg {cstats.avg_chunk_tokens} tokens)")

    # loader-side artifacts: frequency vocabulary + length-bucketed
    # batches over the curated docs
    from flechasdb_spark.operators.text import build_vocab, length_bucket_batches

    curated_docs = docs.join(curated.select("doc_id"), "doc_id", "left_semi")
    vocab = build_vocab(curated_docs, top_n=1000, min_count=2)
    batches = length_bucket_batches(curated_docs, batch_size=16)
    vstats = vocab.agg(
        F.count(F.lit(1)).alias("n"), F.sum("count").alias("covered")
    ).first()
    bstats = batches.agg(
        F.countDistinct("batch_id").alias("n_batches"),
        F.countDistinct("bucket").alias("n_buckets"),
    ).first()
    print(f"vocab:        {vstats.n} tokens covering {vstats.covered} occurrences")
    print(f"batches:      {bstats.n_batches} across {bstats.n_buckets} length buckets")

    # r4 stages: keep each source's best half by quality, score novelty
    # of the survivors against the already-ingested half, and emit the
    # final token-id sequences the trainer consumes
    from flechasdb_spark.operators.dedup import doc_novelty
    from flechasdb_spark.operators.sampling import quality_stratified_sample
    from flechasdb_spark.operators.text import encode_token_ids

    scored = curated.select("source", "doc_id", "quality")
    kept = quality_stratified_sample(
        scored, fraction=0.5, score_col="quality"
    ).select("doc_id")
    kept_docs = docs.join(kept, "doc_id", "left_semi")
    nov = doc_novelty(
        kept_docs.where(F.col("doc_id") % 2 == 1),
        kept_docs.where(F.col("doc_id") % 2 == 0),
    )
    nstats = nov.agg(F.round(F.avg("novelty"), 4).alias("avg_novelty")).first()
    ids = encode_token_ids(kept_docs, vocab)
    istats = ids.agg(
        F.sum("n_tokens").alias("toks"), F.sum("n_unk").alias("unk")
    ).first()
    print(f"stratified:   {kept_docs.count()} docs (top half per source)")
    print(f"novelty:      avg {nstats.avg_novelty} vs ingested half")
    print(
        f"token ids:    {istats.toks} tokens, "
        f"{100 * istats.unk / max(istats.toks, 1):.1f}% OOV"
    )

    # late-r4 stages: hold out an eval split and strip contaminated
    # training docs, then assemble the final mix two ways — best-first
    # under a global token budget, and temperature-balanced across
    # sources under the same budget
    from flechasdb_spark.operators.dedup import (
        decontaminate,
        minhash_verified_pairs,
    )
    from flechasdb_spark.operators.sampling import (
        leakage_safe_split,
        token_budget_select,
        token_temperature_mix,
    )

    # r5: split by near-dup-cluster representative — any duplicates the
    # earlier dedup threshold let through can no longer straddle
    # train/eval (the decontaminate pass below then only has to catch
    # partial n-gram overlap, not whole near-copies)
    residual_pairs = minhash_verified_pairs(kept_docs, threshold=0.5)
    split = kept_docs.join(
        leakage_safe_split(
            kept_docs, residual_pairs, {"train": 0.9, "eval": 0.1}
        ).select("doc_id", "split"),
        "doc_id",
    )
    train = split.where(F.col("split") == "train").select("doc_id", "text")
    evals = split.where(F.col("split") == "eval").select("doc_id", "text")
    clean = decontaminate(train, evals, n=3, min_shared=3)
    print(
        f"decontam:     {clean.count()} of {train.count()} train docs survive"
        " vs eval 3-gram overlap"
    )
    pool = (
        clean.select("doc_id")
        .join(toks, "doc_id")
        .join(quality, "doc_id")
        .join(docs.select("doc_id", "source"), "doc_id")
    )
    budget = int(istats.toks * 0.5)
    best = token_budget_select(pool, budget_tokens=budget)
    mix = token_temperature_mix(pool, total_tokens=budget, alpha=0.5)
    bq = best.agg(
        F.sum("n_tokens").alias("t"), F.round(F.avg("quality"), 4).alias("q")
    ).first()
    mq = mix.join(quality, "doc_id").agg(
        F.sum("n_tokens").alias("t"), F.round(F.avg("quality"), 4).alias("q")
    ).first()
    print(f"budget mix:   best-first {bq.t} tokens (avg q {bq.q}) vs "
          f"temperature-balanced {mq.t} tokens (avg q {mq.q}) at {budget}")

    # DSIR alternative to the quality mixes: tilt the clean pool toward
    # a target domain (src0 as the stand-in) by hashed importance score
    from flechasdb_spark.operators.sampling import dsir_select

    clean_docs = docs.join(clean.select("doc_id"), "doc_id", "left_semi")
    tilted = dsir_select(
        clean_docs, total=min(100, clean.count()), target_source="src0"
    )
    tstats = tilted.agg(
        F.round(F.avg("score") / 1e6, 4).alias("nats"),
        F.sum((F.col("source") == "src0").cast("int")).alias("n_tgt"),
    ).first()
    print(f"dsir tilt:    top-{tilted.count()} avg {tstats.nats} nats, "
          f"{tstats.n_tgt} from the target source")

    # r5: CCNet-style perplexity banding — score the pool against an
    # LM of the already-curated half and report the band mix (a real
    # pipeline drops the tail band here)
    from flechasdb_spark.operators.text import ppl_band_select

    bands = ppl_band_select(clean_docs, reference=clean_docs)
    bmix = {
        r.band: r.n
        for r in bands.groupBy("band").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    print(f"ppl bands:    {bmix}")

    # r6: the context-aware scorer (stupid-backoff bigram LM) and the
    # hashed-NB domain classifier over the same clean pool — the
    # fastText-family filter step real pipelines run before mixing
    from flechasdb_spark.operators.classify import nb_score, nb_train
    from flechasdb_spark.operators.text import bigram_backoff_score

    blm = bigram_backoff_score(clean_docs, reference=clean_docs)
    bstat = blm.agg(
        F.round(F.avg("mean_nll"), 4).alias("nll"),
        F.round(F.avg("bigram_hit_ratio"), 4).alias("hit"),
    ).first()
    print(f"bigram LM:    avg mean_nll {bstat.nll}, hit ratio {bstat.hit}")
    priors, loglik = nb_train(clean_docs.where(F.col("doc_id") % 4 <= 1))
    preds = nb_score(clean_docs.where(F.col("doc_id") % 4 >= 2), priors, loglik)
    acc = (
        preds.join(docs.select("doc_id", "source"), "doc_id")
        .agg(F.round(F.avg((F.col("predicted") == F.col("source")).cast("int")), 4))
        .first()[0]
    )
    print(f"nb classify:  {preds.count()} docs scored, source acc {acc}")

    # final r6: before USING the classifier to route documents, audit
    # it — per-label precision/recall/F1 (which classes it can route)
    # and margin calibration (what confidence threshold earns trust)
    from flechasdb_spark.operators.classify import nb_score_margin
    from flechasdb_spark.operators.eval import (
        classification_report,
        margin_calibration,
    )

    ev = clean_docs.where(F.col("doc_id") % 4 >= 2)
    rep = classification_report(
        nb_score(ev, priors, loglik).join(
            docs.select("doc_id", F.col("source").alias("actual")), "doc_id"
        )
    )
    worst = rep.orderBy("f1").first()
    print(
        f"nb report:    {rep.count()} labels, worst f1 {worst.f1}"
        f" ({worst.label})"
    )
    cal = margin_calibration(
        nb_score_margin(ev, priors, loglik)
        .join(docs.select("doc_id", "source"), "doc_id")
        .withColumn("correct", F.col("predicted") == F.col("source"))
    ).collect()
    trusted = [r.margin_lo for r in cal if r.accuracy >= 0.9]
    print(
        "nb calibration: "
        + " ".join(f"bin{r.bin}:{r.accuracy}" for r in cal)
        + (
            f" -> margin >= {min(trusted)} micro-nats clears 0.9"
            if trusted
            else " -> no bin clears 0.9; do not threshold-filter"
        )
    )

    # r6: offset-robust CDC chunk dedup on the final pool (catches
    # shifted duplicate passages fixed segments cannot), and a real
    # BPE vocabulary for the trainer
    from flechasdb_spark.operators.bpe import bpe_encode, bpe_train
    from flechasdb_spark.operators.dedup import cdc_chunk_dedup

    cdc = cdc_chunk_dedup(clean_docs)
    cstat = cdc.agg(
        F.sum("n_chunks").alias("n"), F.sum("n_kept").alias("k")
    ).first()
    print(f"cdc dedup:    {cstat.n - cstat.k} of {cstat.n} chunks removed")
    merges = bpe_train(clean_docs, n_merges=100)
    bpe = bpe_encode(clean_docs, merges)
    pstat = bpe.agg(F.sum("n_pieces").alias("p")).first()
    print(f"bpe:          {len(merges)} merges -> {pstat.p} pieces")

    # materialize the final pool as per-worker training shards in a
    # reproducible pseudorandom order (re-shuffle per epoch via salt):
    # the sink writes shards/shard=K directories + a manifest, and the
    # loader-side read prunes to one shard's directory
    import tempfile

    from flechasdb_spark.sources.shards import (
        read_training_shards,
        write_training_shards,
    )

    shard_dir = tempfile.mkdtemp(prefix="curation_shards_")
    man = write_training_shards(
        clean_docs, shard_dir, n_shards=4, salt="epoch0"
    )
    s0 = read_training_shards(spark, shard_dir, shard=0).count()
    print(
        "shards:       "
        + ", ".join(f"s{k}={v}" for k, v in man["shard_counts"].items())
        + f" (read back shard 0: {s0} docs)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
