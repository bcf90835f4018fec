"""IVF+BQ composition (VERDICT r10 #3 — the FAISS IndexBinaryIVF
analogue, the last cell of the quantizer x IVF grid): coarse k-means
routing + per-cell packed threshold bits + probe-pruned Hamming scan.
Integer-exact end to end; the registry rows ivfbq_knn /
ivfbq_hamming_range carry the full DuckDB oracles."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from flechasdb_spark.operators.bq import bq_encode, hamming_knn, pack_bits_py
from flechasdb_spark.plans.ivfbq import (
    build_ivfbq,
    ivfbq_query,
    ivfbq_query_batch,
    ivfbq_range_query,
    load_ivfbq,
    save_ivfbq,
    train_ivfbq,
)

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
DIM = 64
P = 8


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def model(spark, emb):
    cent = emb.where(F.col("vec_id") < P).select(
        F.col("vec_id").cast("int").alias("partition_id"),
        F.col("embedding").alias("centroid"),
    )
    return build_ivfbq(emb, cent, dim=DIM)


def test_full_probe_equals_flat_hamming(spark, emb, model):
    """nprobe=P (every cell probed) must equal the flat Hamming top-k:
    IVF only routes, the codes are identical to bq_encode's."""
    qv = [float(x) for x in emb.where(F.col("vec_id") == 5).first()["embedding"]]
    flat = hamming_knn(bq_encode(emb, dim=DIM), pack_bits_py(qv), k=15).collect()
    ivf = ivfbq_query(model, qv, k=15, nprobe=P).collect()
    assert [(r.vec_id, r.hamming_distance) for r in ivf] == [
        (r.vec_id, r.hamming_distance) for r in flat
    ]


def test_partial_probe_subset_and_monotone(spark, emb, model):
    """Partial probing returns only probed-cell members, and recall is
    monotone in nprobe on the fixture (standard IVF contract)."""
    qv = [float(x) for x in emb.where(F.col("vec_id") == 5).first()["embedding"]]
    exact = {r.vec_id for r in ivfbq_query(model, qv, k=10, nprobe=P).collect()}
    prev = 0.0
    for np_ in (1, 3, P):
        got = {r.vec_id for r in ivfbq_query(model, qv, k=10, nprobe=np_).collect()}
        rec = len(got & exact) / len(exact)
        assert rec >= prev - 1e-9
        prev = rec
    assert prev == 1.0


def test_range_full_probe_equals_filterall(spark, emb, model):
    """Full-probe radius equals the flat scan filtered at the radius;
    partial probe is a subset."""
    qv = [float(x) for x in emb.where(F.col("vec_id") == 5).first()["embedding"]]
    enc = bq_encode(emb, dim=DIM)
    qw = pack_bits_py(qv)
    full = hamming_knn(enc, qw, k=emb.count()).collect()
    r = sorted(x.hamming_distance for x in full)[12]
    want = sorted((x.hamming_distance, x.vec_id) for x in full if x.hamming_distance <= r)
    got = ivfbq_range_query(model, qv, radius=r, nprobe=P).collect()
    assert [(x.hamming_distance, x.vec_id) for x in got] == want
    part = ivfbq_range_query(model, qv, radius=r, nprobe=2).collect()
    assert set((x.hamming_distance, x.vec_id) for x in part) <= set(want)
    lim = ivfbq_range_query(model, qv, radius=r, nprobe=P, limit=4).collect()
    assert [(x.hamming_distance, x.vec_id) for x in lim] == want[:4]


def test_batch_matches_solo(spark, emb, model):
    """Batched serving returns each query's solo result."""
    qs = [
        [float(x) for x in r.embedding]
        for r in emb.where(F.col("vec_id").isin(2, 9, 17)).orderBy("vec_id").collect()
    ]
    batch = ivfbq_query_batch(model, qs, k=5, nprobe=3, query_ids=[2, 9, 17])
    got = {
        (r.query_id, r.rank): (r.vec_id, r.hamming_distance)
        for r in batch.collect()
    }
    for qid, qv in zip([2, 9, 17], qs):
        solo = ivfbq_query(model, qv, k=5, nprobe=3).collect()
        for i, s in enumerate(solo, start=1):
            assert got[(qid, i)] == (s.vec_id, s.hamming_distance), (qid, i)


def test_save_load_roundtrip_and_pruning(spark, emb, model, tmp_path):
    """Persisted index serves identically, and the probe filter lands
    as a static Parquet PartitionFilter on the at-rest layout (the
    literal-isin plan gate, same contract as the SQ/PQ indexes)."""
    path = str(tmp_path / "bividx")
    save_ivfbq(model, path)
    loaded = load_ivfbq(spark, path)
    assert loaded.dim == DIM and loaded.thresholds is None
    qv = [float(x) for x in emb.where(F.col("vec_id") == 5).first()["embedding"]]
    want = ivfbq_query(model, qv, k=10, nprobe=3).collect()
    got = ivfbq_query(loaded, qv, k=10, nprobe=3).collect()
    assert [(r.vec_id, r.hamming_distance) for r in got] == [
        (r.vec_id, r.hamming_distance) for r in want
    ]
    plan = (
        ivfbq_query(loaded, qv, k=10, nprobe=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [partition_id" in plan.replace("\n", " ") or (
        "partition_id IN" in plan
    ), plan[:2000]
    # attributes directory layout: only cell dirs exist
    dirs = sorted(
        d for d in os.listdir(os.path.join(path, "index")) if d.startswith("partition_id=")
    )
    assert len(dirs) == P


def test_where_filter_and_attrs(spark, emb):
    """attr_cols persist onto encoded rows; `where` gates before
    scoring on both topk and radius paths."""
    cent = emb.where(F.col("vec_id") < P).select(
        F.col("vec_id").cast("int").alias("partition_id"),
        F.col("embedding").alias("centroid"),
    )
    m = build_ivfbq(emb, cent, dim=DIM, attr_cols=("label",))
    qv = [float(x) for x in emb.where(F.col("vec_id") == 5).first()["embedding"]]
    out = ivfbq_query(m, qv, k=8, nprobe=P, where=F.col("label") == 1)
    labels = {
        r.label
        for r in m.encoded.join(
            out.select("vec_id"), "vec_id"
        ).select("label").collect()
    }
    assert labels == {1}
    rng = ivfbq_range_query(m, qv, radius=DIM, nprobe=P, where="label = 1")
    assert rng.count() == m.encoded.where("label = 1").count()


def test_train_ivfbq_end_to_end(spark, emb):
    """Trained path (sampled k-means + optional mean thresholds):
    full-probe recall vs flat Hamming is 1.0 by construction; mean
    thresholds change the code geometry but keep the contract."""
    m = train_ivfbq(emb, dim=DIM, num_partitions=5, seed=3)
    qv = [float(x) for x in emb.where(F.col("vec_id") == 11).first()["embedding"]]
    flat = hamming_knn(bq_encode(emb, dim=DIM), pack_bits_py(qv), k=10).collect()
    got = ivfbq_query(m, qv, k=10, nprobe=5).collect()
    assert [(r.vec_id, r.hamming_distance) for r in got] == [
        (r.vec_id, r.hamming_distance) for r in flat
    ]
    mt = train_ivfbq(emb, dim=DIM, num_partitions=5, seed=3, thresholds="mean")
    assert len(mt.thresholds) == DIM
    assert ivfbq_query(mt, qv, k=10, nprobe=5).count() == 10


def test_plan_is_pure_codegen(spark, emb, model):
    """No Python evaluation anywhere in the serving plan."""
    qv = [float(x) for x in emb.where(F.col("vec_id") == 5).first()["embedding"]]
    plan = (
        ivfbq_query(model, qv, k=10, nprobe=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_itq_composition_full_probe_matches_flat_itq(spark, emb):
    """ITQ+IVF+BQ (learned-rotation bits at index cost): full probe
    equals the flat ITQ Hamming top-k (`itq_encode` + single-word
    hamming), the trained-model policy's structural gate; radius form
    filters the same distances; the query's driver-packed word matches
    the engine's own encode of the query vector bit-for-bit."""
    from flechasdb_spark.operators.itq import itq_encode, itq_train
    from flechasdb_spark.plans.ivfbq import (
        _itq_query_word,
        build_itq_ivfbq,
        itq_ivfbq_query,
        itq_ivfbq_range_query,
    )

    itq = itq_train(emb, bits=16, iters=8, sample_n=10_000)
    cent = emb.where(F.col("vec_id") < P).select(
        F.col("vec_id").cast("int").alias("partition_id"),
        F.col("embedding").alias("centroid"),
    )
    m = build_itq_ivfbq(emb, cent, itq)
    qrow = emb.where(F.col("vec_id") == 5).first()
    qv = [float(x) for x in qrow["embedding"]]

    # query packing parity: driver word == engine's encode of the query
    eng = itq_encode(
        emb.where(F.col("vec_id") == 5), itq
    ).first()["code"]
    assert _itq_query_word(itq, qv) == eng

    flat = itq_encode(emb, itq).select(
        "vec_id", F.array("code").alias("words")
    )
    from flechasdb_spark.operators.bq import hamming_knn

    want = hamming_knn(flat, [eng], k=12).collect()
    got = itq_ivfbq_query(m, qv, k=12, nprobe=P).collect()
    assert [(r.vec_id, r.hamming_distance) for r in got] == [
        (r.vec_id, r.hamming_distance) for r in want
    ]
    # radius: equals the filtered full-rank list at full probe
    r = want[7].hamming_distance
    rng = itq_ivfbq_range_query(m, qv, radius=r, nprobe=P).collect()
    full = hamming_knn(flat, [eng], k=emb.count()).collect()
    assert [(x.hamming_distance, x.vec_id) for x in rng] == sorted(
        (x.hamming_distance, x.vec_id) for x in full if x.hamming_distance <= r
    )
    # partial probe returns a subset
    part = itq_ivfbq_query(m, qv, k=12, nprobe=2).collect()
    assert {x.vec_id for x in part} <= {x.vec_id for x in full}


def test_itq_composition_save_load_roundtrip(spark, emb, tmp_path):
    """Persisted ITQ composition serves identically (the ITQ model —
    mean, components, losses — round-trips through the manifest) and
    the probe filter still prunes the at-rest layout."""
    from flechasdb_spark.operators.itq import itq_train
    from flechasdb_spark.plans.ivfbq import (
        build_itq_ivfbq,
        itq_ivfbq_query,
        load_itq_ivfbq,
        save_itq_ivfbq,
    )

    itq = itq_train(emb, bits=16, iters=8, sample_n=10_000)
    cent = emb.where(F.col("vec_id") < P).select(
        F.col("vec_id").cast("int").alias("partition_id"),
        F.col("embedding").alias("centroid"),
    )
    m = build_itq_ivfbq(emb, cent, itq)
    path = str(tmp_path / "itqidx")
    save_itq_ivfbq(m, path)
    loaded = load_itq_ivfbq(spark, path)
    assert loaded.itq == itq  # frozen dataclass equality: exact floats
    qv = [float(x) for x in emb.where(F.col("vec_id") == 5).first()["embedding"]]
    want = itq_ivfbq_query(m, qv, k=10, nprobe=3).collect()
    got = itq_ivfbq_query(loaded, qv, k=10, nprobe=3).collect()
    assert [(r.vec_id, r.hamming_distance) for r in got] == [
        (r.vec_id, r.hamming_distance) for r in want
    ]
    plan = (
        itq_ivfbq_query(loaded, qv, k=10, nprobe=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [partition_id" in plan.replace("\n", " ")


def test_auto_nprobe_is_family_agnostic_on_bq(spark, emb, model):
    """The tuning loop (eval.auto_nprobe) wraps ANY search_fn — here
    the binary family's batch path — and still early-stops at the
    smallest sufficient nprobe. Exact baseline = full-probe Hamming
    (recall 1.0 at nprobe=P by construction), so the returned knob is
    always <= P and the curve is monotone on this fixture."""
    from flechasdb_spark.operators.eval import auto_nprobe
    from flechasdb_spark.plans.ivfbq import ivfbq_query_batch

    qids = [2, 9, 17]
    qs = [
        [float(x) for x in r.embedding]
        for r in emb.where(F.col("vec_id").isin(qids)).orderBy("vec_id").collect()
    ]
    exact = ivfbq_query_batch(
        model, qs, k=5, nprobe=P, query_ids=qids
    ).select("query_id", "vec_id")

    def search(np_):
        return ivfbq_query_batch(
            model, qs, k=5, nprobe=np_, query_ids=qids
        ).select("query_id", "vec_id")

    best, curve = auto_nprobe(exact, search, [1, 2, P], 0.99)
    assert best is not None and best <= P
    recs = [r for _, r in curve]
    assert recs == sorted(recs)  # monotone on the fixture
    assert recs[-1] >= 0.99


def test_asymmetric_composition_full_probe_matches_flat(spark, emb, model):
    """ivfbq_asymmetric_query at nprobe=P equals the flat asymmetric
    scan; partial probe is a subset of the probed cells' members."""
    from flechasdb_spark.operators.bq import hamming_asymmetric_knn
    from flechasdb_spark.plans.ivfbq import ivfbq_asymmetric_query

    qv = [float(x) for x in emb.where(F.col("vec_id") == 5).first()["embedding"]]
    flat = hamming_asymmetric_knn(bq_encode(emb, dim=DIM), qv, k=10).collect()
    got = ivfbq_asymmetric_query(model, qv, k=10, nprobe=P).collect()
    assert [(r.vec_id, r.asym_micro) for r in got] == [
        (r.vec_id, r.asym_micro) for r in flat
    ]
    part = ivfbq_asymmetric_query(model, qv, k=10, nprobe=2).collect()
    assert {r.vec_id for r in part} <= {
        r.vec_id
        for r in model.encoded.join(
            ivfbq_asymmetric_query(model, qv, k=emb.count(), nprobe=2)
            .select("vec_id"),
            "vec_id",
        ).collect()
    }


def test_ivfbq_upsert_and_generic_deletes(spark, emb, model, tmp_path):
    """r11 maintenance parity for the binary family: ivfbq_upsert
    replaces/inserts through the crash-consistent cell rewrite, and
    the schema-driven delete paths (ivfsq_delete, delete_where) work
    on an ivfbq store as-is."""
    from flechasdb_spark.operators.maintenance import (
        delete_where,
        ivfbq_upsert,
        ivfsq_delete,
    )

    cent = emb.where(F.col("vec_id") < P).select(
        F.col("vec_id").cast("int").alias("partition_id"),
        F.col("embedding").alias("centroid"),
    )
    m = build_ivfbq(emb, cent, dim=DIM, attr_cols=("label",))
    path = str(tmp_path / "bq_maint")
    save_ivfbq(m, path)
    n0 = spark.read.parquet(f"{path}/index").count()

    # upsert: 3 fresh ids + replace id 10 with vector 11's embedding
    fresh = emb.where(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 900000).alias("vec_id"), "embedding", "label"
    )
    rep = emb.where(F.col("vec_id") == 11).select(
        F.lit(10).cast("long").alias("vec_id"), "embedding", "label"
    )
    touched = ivfbq_upsert(
        spark, m, path, fresh.unionAll(rep), attr_cols=("label",)
    )
    assert touched
    after = spark.read.parquet(f"{path}/index")
    assert after.count() == n0 + 3
    got10 = after.where("vec_id = 10").first()
    want11 = m.encoded.where("vec_id = 11").first()
    assert list(got10.words) == list(want11.words)  # replaced with 11's code

    # generic id delete
    ivfsq_delete(spark, path, [900000, 900001])
    assert spark.read.parquet(f"{path}/index").where(
        "vec_id >= 900000"
    ).count() == 1

    # generic predicate delete over the attribute column
    k1 = spark.read.parquet(f"{path}/index").where("label = 1").count()
    assert k1 > 0
    delete_where(spark, path, "label = 1")
    left = spark.read.parquet(f"{path}/index")
    assert left.where("label = 1").count() == 0
    # the store still serves
    from flechasdb_spark.plans.ivfbq import load_ivfbq

    loaded = load_ivfbq(spark, path)
    qv = [float(x) for x in emb.where(F.col("vec_id") == 5).first()["embedding"]]
    assert ivfbq_query(loaded, qv, k=5, nprobe=P).count() == 5
