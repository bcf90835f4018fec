"""Property-based tests (hypothesis) for the driver-side numeric
kernels — fast, no Spark session needed."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from flechasdb_spark.operators.kmeans_np import kmeans_fit

_finite = st.floats(
    min_value=-1e3, max_value=1e3, allow_nan=False, allow_infinity=False
)


@st.composite
def _matrix(draw, min_rows=8, max_rows=40, min_cols=2, max_cols=8):
    rows = draw(st.integers(min_rows, max_rows))
    cols = draw(st.integers(min_cols, max_cols))
    return draw(
        arrays(np.float64, (rows, cols), elements=_finite)
    )


@settings(max_examples=25, deadline=None)
@given(x=_matrix(), k=st.integers(2, 8), seed=st.integers(0, 2**16))
def test_kmeans_invariants(x, k, seed):
    if x.shape[0] < k:
        return
    centers, labels = kmeans_fit(x, k, seed=seed)
    # shapes
    assert centers.shape == (k, x.shape[1])
    assert labels.shape == (x.shape[0],)
    # labels in range
    assert (labels >= 0).all() and (labels < k).all()
    # every label is the nearest center (fixed point of Lloyd's)
    d2 = ((x[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
    best = d2[np.arange(len(x)), labels]
    assert np.all(best <= d2.min(axis=1) + 1e-9)
    # determinism
    c2, l2 = kmeans_fit(x, k, seed=seed)
    assert np.array_equal(centers, c2) and np.array_equal(labels, l2)


@settings(max_examples=25, deadline=None)
@given(x=_matrix(min_rows=10, max_rows=30))
def test_kmeans_objective_not_worse_than_single_cluster(x):
    """k>=2 clustering never has higher within-cluster SSE than k=1."""
    centers, labels = kmeans_fit(x, 2, seed=1)
    sse_k = ((x - centers[labels]) ** 2).sum()
    sse_1 = ((x - x.mean(axis=0)) ** 2).sum()
    assert sse_k <= sse_1 + 1e-6 * max(1.0, abs(sse_1))


@settings(max_examples=50, deadline=None)
@given(
    p=st.integers(0, 63),
    dim=st.integers(1, 128),
)
def test_hyperplane_values_exact_rationals(p, dim):
    """similarity.hyperplane emits k/512 rationals in [-1, 1) — exactly
    representable in binary, the cross-engine determinism guarantee."""
    from flechasdb_spark.operators.similarity import hyperplane

    h = hyperplane(p, dim)
    assert len(h) == dim
    for v in h:
        assert -1.0 <= v < 1.0
        assert v * 512.0 == round(v * 512.0)  # exact k/512


@settings(max_examples=50, deadline=None)
@given(st.integers(0, 2**60), st.integers(0, 31))
def test_minhash_perm_range(h, j):
    """The j-th permutation maps into [0, P) and is deterministic."""
    from flechasdb_spark.functions.texthash import MERSENNE_P

    a, b = 2 * j + 1, j * j + 7
    v = (a * (h % MERSENNE_P) + b) % MERSENNE_P
    assert 0 <= v < MERSENNE_P
    # no BIGINT overflow in the worst case (the documented bound)
    assert a * (MERSENNE_P - 1) + b < 2**63


@settings(max_examples=30, deadline=None)
@given(_matrix(min_rows=4, max_rows=16, min_cols=4, max_cols=8))
def test_fake_decode_deterministic(x):
    """multimodal._fake_decode: same bytes -> same features, dims in
    the documented [32, 256) range."""
    from flechasdb_spark.operators.multimodal import FEATURE_DIM, _fake_decode

    payload = x.tobytes()
    w1, h1, f1 = _fake_decode(payload)
    w2, h2, f2 = _fake_decode(payload)
    assert (w1, h1, f1) == (w2, h2, f2)
    assert 32 <= w1 < 256 and 32 <= h1 < 256
    assert len(f1) == FEATURE_DIM
    assert all(0.0 <= v <= 1.0 for v in f1)


def test_build_vocab_matches_pandas_reference(spark):
    """Randomized (seeded) corpora: vocab must equal the pandas
    groupby/count/sort reference for rank, id, and counts."""
    import numpy as np
    import pandas as pd

    from flechasdb_spark.operators.text import build_vocab

    rng = np.random.RandomState(11)
    words = [f"w{i}" for i in range(40)]
    docs = [
        (i, " ".join(rng.choice(words, size=rng.randint(0, 30))))
        for i in range(120)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = build_vocab(df, top_n=25, min_count=2).toPandas()

    toks = pd.Series(
        [t for _, text in docs for t in text.lower().split() if t]
    )
    counts = toks.value_counts()
    counts = counts[counts >= 2]
    ref = (
        counts.rename_axis("token")
        .reset_index(name="count")
        .sort_values(["count", "token"], ascending=[False, True],
                     kind="mergesort")
        .head(25)
        .reset_index(drop=True)
    )
    assert list(got["token"]) == list(ref["token"])
    assert list(got["count"]) == list(ref["count"])
    assert list(got["token_id"]) == list(range(len(ref)))


def test_length_bucket_batches_invariants(spark):
    """Every batch holds <= batch_size docs, all of one bucket, and
    numbering follows the salted-hash order (md5('lenbatch:'||id), id)
    inside each bucket — the distributed two-level numbering must equal
    the sequential single-window reference exactly."""
    import hashlib

    import numpy as np

    from flechasdb_spark.operators.text import length_bucket_batches

    rng = np.random.RandomState(5)
    docs = [
        (i, " ".join("x" for _ in range(rng.randint(1, 200))))
        for i in range(300)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = length_bucket_batches(df, batch_size=7).toPandas()
    assert len(out) == 300  # every doc with tokens appears once
    for bid, grp in out.groupby("batch_id"):
        assert len(grp) <= 7
        assert grp["bucket"].nunique() == 1
    # exact equality with the sequential reference numbering
    out["h"] = out["doc_id"].map(
        lambda i: hashlib.md5(f"lenbatch:{i}".encode()).hexdigest()
    )
    for b, grp in out.groupby("bucket"):
        grp = grp.sort_values(["h", "doc_id"])
        expect = [
            (int(b) << 32) + (i // 7) for i in range(len(grp))
        ]
        assert list(grp["batch_id"]) == expect


def test_length_bucket_batches_skewed_bucket_parallel(spark):
    """One bucket holding >50% of docs must NOT funnel through a single
    window task: the window partitions on (bucket, sub-bucket), and the
    skewed bucket's rows really occupy many sub-buckets. Numbering still
    exactly matches the sequential reference (r3 VERDICT scale item)."""
    import hashlib

    from flechasdb_spark.operators.text import length_bucket_batches

    # 700 of 1000 docs land in bucket 5 (17-32 tokens)
    docs = [(i, "x " * 20) for i in range(700)] + [
        (700 + i, "x " * (2 + i % 3)) for i in range(300)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    res = length_bucket_batches(df, batch_size=8)
    # plan gate: the window partition spec carries the sub-bucket key
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition(bucket" in plan and "__s" in plan, plan
    out = res.toPandas()
    big = out[out["bucket"] == 5]
    assert len(big) == 700
    # the skewed bucket genuinely spreads over many parallel sub-sorts
    n_subs = (
        big["doc_id"]
        .map(
            lambda i: hashlib.md5(f"lenbatch:{i}".encode()).hexdigest()[:2]
        )
        .nunique()
    )
    assert n_subs > 100
    # and the two-level numbering equals the one-window reference
    big = big.copy()
    big["h"] = big["doc_id"].map(
        lambda i: hashlib.md5(f"lenbatch:{i}".encode()).hexdigest()
    )
    big = big.sort_values(["h", "doc_id"])
    assert list(big["batch_id"]) == [
        (5 << 32) + (i // 8) for i in range(len(big))
    ]


def test_encode_token_ids_roundtrip_and_oov(spark):
    """Token-id encoding: in-vocab tokens map to their vocab ids in
    position order, OOV tokens become unk_id and are counted, and an
    empty doc yields an empty sequence with zero counts."""
    from pyspark.sql import functions as F

    from flechasdb_spark.operators.text import build_vocab, encode_token_ids

    docs = spark.createDataFrame(
        [
            (0, "aa bb aa cc"),
            (1, "bb zz bb"),
            (2, ""),
        ],
        "doc_id long, text string",
    )
    vocab = build_vocab(docs, top_n=10, min_count=2)
    vmap = {r.token: r.token_id for r in vocab.collect()}
    # 'cc' and 'zz' appear once -> below min_count, OOV
    assert set(vmap) == {"aa", "bb"}
    out = {r.doc_id: r for r in encode_token_ids(docs, vocab).collect()}
    assert list(out[0].token_ids) == [vmap["aa"], vmap["bb"], vmap["aa"], -1]
    assert out[0].n_tokens == 4 and out[0].n_unk == 1
    assert list(out[1].token_ids) == [vmap["bb"], -1, vmap["bb"]]
    assert out[1].n_unk == 1
    assert out[2].n_tokens == 0 and list(out[2].token_ids) == []


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    top_down=st.booleans(),
    seed=st.integers(0, 2**16),
)
def test_bmp_ppm_decode_roundtrip_property(h, w, top_down, seed):
    """Any pixel array survives encode->decode exactly for both
    uncompressed formats, at every width (exercising all 4 BMP row-pad
    cases) and both BMP row orders."""
    import numpy as np

    from flechasdb_spark.operators.multimodal import _decode_bmp, _decode_ppm
    from tests.test_multimodal import _bmp_bytes, _ppm_bytes

    px = np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )
    assert np.array_equal(_decode_bmp(_bmp_bytes(px, top_down=top_down)), px)
    assert np.array_equal(_decode_ppm(_ppm_bytes(px)), px)


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(1, 400),
    n_ch=st.integers(1, 3),
    rate=st.sampled_from([8000, 16000, 44100]),
    bits=st.sampled_from([8, 16]),
    extra=st.booleans(),
    seed=st.integers(0, 2**16),
)
def test_wav_decode_roundtrip_property(n, n_ch, rate, bits, extra, seed):
    """WAV decode recovers sample count, rate, channels, and the mono
    downmix within quantization error for arbitrary PCM payloads."""
    import numpy as np

    from flechasdb_spark.operators.multimodal import _decode_wav
    from tests.test_multimodal import _wav_bytes

    x = np.random.default_rng(seed).uniform(-1, 1, size=n * n_ch)
    got_rate, got_ch, mono = _decode_wav(
        _wav_bytes(x, rate=rate, n_ch=n_ch, bits=bits, extra_chunk=extra)
    )
    assert (got_rate, got_ch) == (rate, n_ch)
    assert mono.shape[0] == n
    expected = x.reshape(-1, n_ch).mean(axis=1)
    # 2 LSB: 1 for the encoder's truncation + ~1 for its 127-vs-128
    # scale (the fixture builder scales by 2^b-1, the PCM decode by 2^b)
    tol = 2.0 / 127 if bits == 8 else 2.0 / 32767
    assert np.abs(mono - expected).max() <= tol + 1e-12


@settings(max_examples=40, deadline=None)
@given(
    words=st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=6),
        min_size=1,
        max_size=30,
    ),
    n_merges=st.integers(0, 40),
)
def test_bpe_roundtrip_property(words, n_merges):
    """For ANY corpus and merge budget: applying the trained merges to
    any training word reconstructs word + marker on concatenation, and
    piece count never exceeds character count + 1."""
    from collections import Counter

    from flechasdb_spark.operators.bpe import (
        END_OF_WORD,
        _merge_vocab,
        _pair_counts,
        bpe_apply_word,
    )

    # driver-side training replica over exact counts (no Spark in a
    # hypothesis inner loop)
    counts = Counter(words)
    vocab = {tuple(list(w) + [END_OF_WORD]): c for w, c in counts.items()}
    merges = []
    for _ in range(n_merges):
        pc = _pair_counts(vocab)
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pc[best] < 2:
            break
        merges.append(best)
        vocab = _merge_vocab(vocab, best)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in counts:
        pieces = bpe_apply_word(w, ranks)
        assert "".join(pieces) == w + END_OF_WORD
        assert 1 <= len(pieces) <= len(w) + 1


@settings(max_examples=40, deadline=None)
@given(
    text=st.lists(
        st.text(alphabet="xyz", min_size=1, max_size=4),
        min_size=0,
        max_size=40,
    ).map(" ".join),
    divisor=st.integers(2, 32),
)
def test_cdc_boundaries_are_content_local(text, divisor):
    """CDC cut-points depend only on each word's own hash, so chunking
    PREFIX + text re-aligns with chunking text after at most one
    straddling chunk: every chunk of the suffix past the first
    boundary appears verbatim among the original's chunks."""
    import hashlib

    def cut(w):
        return (
            int(hashlib.md5(w.encode()).hexdigest()[:15], 16) % divisor
            == 0
        )

    def chunks(s):
        out, cur = [], []
        for w in s.split(" "):
            cur.append(w)
            if cut(w):
                out.append(" ".join(cur))
                cur = []
        if cur:
            out.append(" ".join(cur))
        return out

    base = chunks(text)
    shifted = chunks("prefixword " + text)
    # after the chunk containing the injected prefix, everything
    # re-aligns: the shifted list's tail is a suffix of base's chunks
    # (both end at the same content); compare from the first boundary
    if len(base) >= 2:
        assert shifted[-(len(base) - 1):] == base[1:]


@settings(max_examples=30, deadline=None)
@given(
    docs=st.lists(
        st.text(alphabet="pq ", min_size=0, max_size=20),
        min_size=1,
        max_size=8,
    ),
    alpha=st.floats(0.1, 0.9),
)
def test_stupid_backoff_scores_bounded(docs, alpha):
    """Per-token micro-nat scores are always <= 0 (log-probabilities
    and the backoff penalty are negative), so every document's NLL is
    >= 0 — a pure-Python replica of the operator's per-token rule."""
    import math
    from collections import Counter

    toks = [d.split() for d in (s.strip().lower() for s in docs)]
    toks = [[w for w in t if w] for t in toks]
    uni = Counter(w for t in toks for w in t)
    n, v = sum(uni.values()), len(uni)
    if n == 0:
        return
    big = Counter(
        (t[i - 1], t[i]) for t in toks for i in range(1, len(t))
    )
    ctx = Counter()
    for (u, w), c in big.items():
        ctx[u] += c
    lq1 = {w: round(1e6 * (math.log(c + 1) - math.log(n + v))) for w, c in uni.items()}
    floor = round(1e6 * -math.log(n + v))
    lq_alpha = round(1e6 * math.log(alpha))
    for t in toks:
        nll = 0
        for i, w in enumerate(t):
            if i == 0:
                s = lq1.get(w, floor)
            elif (t[i - 1], w) in big:
                s = round(
                    1e6
                    * (
                        math.log(big[(t[i - 1], w)])
                        - math.log(ctx[t[i - 1]])
                    )
                )
            else:
                s = lq_alpha + lq1.get(w, floor)
            assert s <= 0
            nll -= s
        assert nll >= 0


@settings(max_examples=30, deadline=None)
@given(
    docs=st.lists(
        st.text(alphabet="pqr ", min_size=0, max_size=24),
        min_size=1,
        max_size=8,
    )
)
def test_kneser_ney_is_a_subdistribution(docs):
    """Interpolated KN with the add-one continuation floor is a proper
    sub-distribution over the support {seen continuation words} plus
    ONE unseen representative (the floor is per-word, so an unbounded
    unseen vocabulary holds unbounded total floor mass — the same
    caveat as the add-one unigram floor in the other LM ops): for
    every seen context u, sum_w P(w|u) over that support is <= 1, and
    every individual P(w|u) is in (0, 1] — so per-token micro-nat
    scores are <= 0 and document NLLs are >= 0. Pure-Python replica of
    the operator's rule (text.py kneser_ney_score)."""
    from collections import Counter

    toks = [d.split() for d in (s.strip().lower() for s in docs)]
    toks = [[w for w in t if w] for t in toks]
    big = Counter((t[i - 1], t[i]) for t in toks for i in range(1, len(t)))
    if not big:
        return
    cu, n1u, n1w = Counter(), Counter(), Counter()
    for (u, w), c in big.items():
        cu[u] += c
        n1u[u] += 1
        n1w[w] += 1
    npt, vc = sum(n1w.values()), len(n1w)
    floor = 1.0 / (npt + vc + 1)

    def pc(w):
        return (n1w[w] + 1) / (npt + vc + 1) if w in n1w else floor

    vocab = set(n1w) | {"__unseen__"}
    # continuation distribution sums to exactly 1 over this support
    assert abs(sum(pc(w) for w in vocab) - 1.0) <= 1e-12
    for u in cu:
        total = 0.0
        for w in vocab:
            p = (
                max(big.get((u, w), 0) - 0.75, 0.0) + (0.75 * n1u[u]) * pc(w)
            ) / cu[u]
            assert 0.0 < p <= 1.0 + 1e-12
            total += p
        assert total <= 1.0 + 1e-9


def _ensemble_reference(vals: np.ndarray, higher: list[bool], B=256):
    """Pure-NumPy reference for quality_ensemble: exact integer
    arithmetic, same bucket/percentile/blend definitions."""
    n, k = vals.shape
    pcts = np.zeros((n, k), dtype=np.int64)
    for j in range(k):
        x = vals[:, j].astype(object)  # python ints: no int64 overflow
        mn, mx = min(x), max(x)
        span = mx - mn + 1
        b = np.array([((v - mn) * B) // span for v in x], dtype=np.int64)
        for i in range(n):
            at = int((b == b[i]).sum())
            below = int((b < b[i]).sum())
            worse = below if higher[j] else n - below - at
            pcts[i, j] = (worse * 10000) // n
    blend = np.array(
        [int(pcts[i].sum()) // k for i in range(n)], dtype=np.int64
    )
    return pcts, blend


@settings(max_examples=10, deadline=None)
@given(
    vals=arrays(
        np.int64,
        (17, 3),
        elements=st.integers(-(10**7), 10**7),
    ),
    higher=st.tuples(st.booleans(), st.booleans(), st.booleans()),
)
def test_quality_ensemble_matches_reference(spark, vals, higher):
    import pandas as pd

    from flechasdb_spark.operators.sampling import quality_ensemble

    cols = ["s0", "s1", "s2"]
    pdf = pd.DataFrame(vals, columns=cols)
    pdf.insert(0, "doc_id", range(len(pdf)))
    df = spark.createDataFrame(pdf)
    got = (
        quality_ensemble(df, list(zip(cols, higher)))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pcts, blend = _ensemble_reference(vals, list(higher))
    for j, c in enumerate(cols):
        assert got[f"{c}_pct"].tolist() == pcts[:, j].tolist(), c
    assert got["blend_bp"].tolist() == blend.tolist()
    # invariants: bounded basis points; better raw value never ranks
    # strictly worse on its own signal
    assert got["blend_bp"].between(0, 10000).all()
    for j, c in enumerate(cols):
        order = np.argsort(vals[:, j], kind="stable")
        p = got[f"{c}_pct"].to_numpy()[order]
        if not higher[j]:
            p = p[::-1]
        assert (np.diff(p) >= 0).all(), f"{c}: pct not monotone in value"
