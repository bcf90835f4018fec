"""Binary quantization (operators/bq.py): NumPy parity, mean-threshold
variant, Hamming arithmetic, pure-codegen plan."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from flechasdb_spark.operators.bq import (
    bq_encode,
    bq_thresholds,
    hamming_knn,
    pack_bits_py,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _np_words(x: np.ndarray, thr: np.ndarray) -> np.ndarray:
    bits = (x > thr[None, :]).astype(np.int64)
    out = np.zeros((x.shape[0], (x.shape[1] + 31) // 32), dtype=np.int64)
    for pos in range(x.shape[1]):
        out[:, pos // 32] |= bits[:, pos] << (pos % 32)
    return out


def test_bq_encode_matches_numpy_zero_and_mean(spark, emb):
    sub = emb.where(F.col("vec_id") < 128)
    x = np.array(
        [np.asarray(r.embedding, dtype=np.float64) for r in sub.orderBy("vec_id").collect()]
    )
    got0 = {
        r.vec_id: list(r.words) for r in bq_encode(sub, dim=64).collect()
    }
    want0 = _np_words(x, np.zeros(64))
    for i in range(x.shape[0]):
        assert got0[i] == list(want0[i])

    thr = bq_thresholds(sub)
    gotm = {
        r.vec_id: list(r.words)
        for r in bq_encode(sub, dim=64, thresholds=thr).collect()
    }
    wantm = _np_words(x, np.array(thr))
    for i in range(x.shape[0]):
        assert gotm[i] == list(wantm[i])
    # mean-centered bits should differ from zero-threshold for some doc
    assert any(gotm[i] != got0[i] for i in range(x.shape[0]))


def test_hamming_knn_exact_and_self_nearest(spark, emb):
    sub = emb.where(F.col("vec_id") < 256)
    x = np.array(
        [np.asarray(r.embedding, dtype=np.float64) for r in sub.orderBy("vec_id").collect()]
    )
    qv = [float(v) for v in x[7]]
    enc = bq_encode(sub, dim=64)
    out = hamming_knn(enc, pack_bits_py(qv), k=5).collect()
    assert out[0].vec_id == 7 and out[0].hamming_distance == 0
    # distances match NumPy popcount
    words = _np_words(x, np.zeros(64))
    qw = np.array(pack_bits_py(qv))
    dist = np.array(
        [sum(bin(int(w ^ q)).count("1") for w, q in zip(row, qw)) for row in words]
    )
    for r in out:
        assert r.hamming_distance == dist[r.vec_id]


def test_bq_plan_is_pure_codegen(spark, emb):
    plan = (
        bq_encode(emb, dim=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_hamming_range_semantics(spark):
    """r10 Hamming radius: equals the full-ranked list filtered at the
    radius; ordered limit keeps the nearest; integer-exact boundary."""
    import os

    from pyspark.sql import functions as F

    from flechasdb_spark.operators.bq import bq_encode, hamming_knn, hamming_range, pack_bits_py

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    qv = [float(x) for x in emb.where(F.col("vec_id") == 7).first()["embedding"]]
    enc = bq_encode(emb, dim=64)
    full = hamming_knn(enc, pack_bits_py(qv), k=emb.count()).collect()
    r = sorted(x.hamming_distance for x in full)[15]
    got = hamming_range(enc, pack_bits_py(qv), radius=r).collect()
    want = sorted(
        (x.hamming_distance, x.vec_id) for x in full if x.hamming_distance <= r
    )
    assert [(x.hamming_distance, x.vec_id) for x in got] == want
    lim = hamming_range(enc, pack_bits_py(qv), radius=r, limit=5).collect()
    assert [(x.hamming_distance, x.vec_id) for x in lim] == want[:5]


def test_hamming_width_mismatch_raises(spark):
    """ADVICE r10: a query whose word count differs from the encoded
    width must raise (zip_with null-pads, bit_count(NULL) poisons the
    fold, and the radius filter silently dropped every row before the
    guard)."""
    import os

    import pytest
    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException

    from flechasdb_spark.operators.bq import (
        bq_encode,
        hamming_knn,
        hamming_range,
        pack_bits_py,
    )

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    qv = [float(x) for x in emb.where(F.col("vec_id") == 7).first()["embedding"]]
    enc = bq_encode(emb, dim=64)
    short_query = pack_bits_py(qv)[:-1]  # 1 word instead of 2
    with pytest.raises(Exception, match="width mismatch"):
        hamming_range(enc, short_query, radius=64).collect()
    with pytest.raises(Exception, match="width mismatch"):
        hamming_knn(enc, short_query, k=3).collect()
    # well-formed queries still work through the guarded expression
    assert hamming_range(enc, pack_bits_py(qv), radius=0).count() >= 1


def test_asymmetric_knn_matches_numpy_and_beats_or_ties_symmetric(spark):
    """r11 asymmetric scoring: (a) the engine score equals a NumPy
    recompute of sum(margin_micro over disagreeing dims) for every
    returned row; (b) the plan stays pure codegen; (c) on the fixture,
    recall@10 vs exact L2 is at least symmetric Hamming's (the point
    of keeping the query un-quantized — measured, not assumed)."""
    import math
    import os

    import numpy as np
    from pyspark.sql import functions as F

    from flechasdb_spark.operators.bq import (
        bq_encode,
        hamming_asymmetric_knn,
        hamming_knn,
        pack_bits_py,
    )
    from flechasdb_spark.operators.knn import flat_knn

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    rows = emb.select("vec_id", "embedding").collect()
    vecs = {r.vec_id: np.array([float(x) for x in r.embedding]) for r in rows}
    qv = vecs[7]
    enc = bq_encode(emb, dim=64)

    got = hamming_asymmetric_knn(enc, list(qv), k=10).collect()
    w = np.array([math.floor(abs(v) * 1e6) for v in qv], dtype=np.int64)
    qbits = qv > 0.0

    def asym(v):
        return int(w[(v > 0.0) != qbits].sum())

    want = sorted((asym(v), i) for i, v in vecs.items())[:10]
    assert [(r.asym_micro, r.vec_id) for r in got] == want

    plan = (
        hamming_asymmetric_knn(enc, list(qv), k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    exact = {
        r.vec_id for r in flat_knn(emb, list(qv), k=10).collect()
    }
    sym = {r.vec_id for r in hamming_knn(enc, pack_bits_py(list(qv)), k=10).collect()}
    asy = {r.vec_id for r in got}
    assert len(asy & exact) >= len(sym & exact)
