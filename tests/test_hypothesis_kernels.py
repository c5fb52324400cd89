"""Property-based kernel tests (hypothesis): the Spark expressions must
agree with an independent numpy model of the reference semantics on
arbitrary inputs — including adversarial ones (zeros, tiny/huge values,
exact quantization boundaries)."""

import math

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

DIM = 8  # small dim keeps each example cheap; semantics don't depend on dim


def _np_normalize(v: np.ndarray) -> np.ndarray:
    """Reference K2 model: L2 normalize, zero rows stay zero."""
    n = math.sqrt(float((v.astype(np.float64) ** 2).sum()))
    if n < 1e-10:
        return np.zeros_like(v, dtype=np.float64)
    return v.astype(np.float64) / n


def _np_quantize(v: np.ndarray) -> list[int]:
    """Reference K3 model: clamp(x*127) truncated toward zero."""
    out = []
    for x in _np_normalize(v):
        val = max(-128.0, min(127.0, x * 127.0))
        out.append(int(val))  # python int() truncates toward zero
    return out


finite_floats = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False, width=32
)
vectors = st.lists(finite_floats, min_size=DIM, max_size=DIM)


@settings(max_examples=20, deadline=None)
@given(vec=vectors)
def test_quantize_matches_numpy_model(spark, vec):
    from pyspark.sql import functions as F

    from pythonvectordb_spark.functions.vector import l2_normalize, quantize

    df = spark.createDataFrame([(vec,)], f"v array<float>")
    got = df.select(quantize(l2_normalize(F.col("v"))).alias("q")).first().q
    want = _np_quantize(np.array(vec, dtype=np.float32))
    assert list(got) == want


@settings(max_examples=15, deadline=None)
@given(vec=vectors, qvec=st.lists(st.integers(-128, 127), min_size=DIM, max_size=DIM))
def test_int8_cosine_matches_numpy_model(spark, vec, qvec):
    from pyspark.sql import functions as F

    from pythonvectordb_spark.functions.vector import cosine_similarity_int8

    df = spark.createDataFrame([(qvec,)], "qv array<tinyint>")
    qcol = F.array(*[F.lit(float(np.float32(x))) for x in vec])
    got = df.select(cosine_similarity_int8(qcol, F.col("qv")).alias("s")).first().s

    q = np.array([float(np.float32(x)) for x in vec], dtype=np.float64)
    v = np.array(qvec, dtype=np.float64)
    qn = math.sqrt(float((q * q).sum()))
    vn = math.sqrt(float((v * v).sum()))
    if qn < 1e-10 or vn == 0.0:
        want = 0.0
    else:
        want = float(np.dot(q, v)) / (qn * vn)
    assert got == pytest.approx(want, abs=1e-12)


@settings(max_examples=10, deadline=None)
@given(
    vecs=st.lists(vectors, min_size=1, max_size=4),
    seed=st.integers(min_value=0, max_value=2**16),
)
def test_pq_arrow_matches_expr_on_arbitrary_vectors(spark, vecs, seed):
    """pq_code_arrow must stay bit-equal to pq_code_expr on ARBITRARY
    float32 vectors and random small codebooks, not just the shipped
    fixtures — the equality claim is about fold order, upcast, and
    first-min tie-break, none of which may depend on the data."""
    import random

    from pythonvectordb_spark.operators.search import pq_code_arrow, pq_code_expr

    rng = random.Random(seed)
    # 2 subspaces x 3 centroids x DIM//2 dims of small uniform floats
    books = [
        [[rng.uniform(-1, 1) for _ in range(DIM // 2)] for _ in range(3)]
        for _ in range(2)
    ]
    df = spark.createDataFrame([(v,) for v in vecs], "v array<float>")
    got = df.select(
        pq_code_expr("v", books).alias("e"), pq_code_arrow("v", books).alias("a")
    ).collect()
    for r in got:
        assert list(r.e) == list(r.a)


@settings(deadline=None, max_examples=40)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_roundtrip_properties(h, w, seed):
    """Any uint8 greyscale image: encode->decode preserves the shape,
    bounds the reconstruction error by the quant-table contract margin,
    and the constant-block prediction holds wherever an aligned 8x8
    block is constant."""
    from pythonvectordb_spark.functions.jpeg import jpeg_decode, jpeg_encode

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    # plant a constant aligned 8x8 block whenever one fits, so the
    # integer contract is exercised on every large-enough random image
    # (DCT blocks are independent, so the surrounding noise can't leak
    # into the planted block's coefficients)
    v = int(rng.integers(0, 256))
    if h >= 8 and w >= 8:
        img[:8, :8] = v
    dec = jpeg_decode(jpeg_encode(img))
    assert dec.shape == (h, w)
    assert int(np.abs(dec.astype(np.int64) - img.astype(np.int64)).max()) <= 48
    if h >= 8 and w >= 8:
        t = v - 128
        r = (abs(t) + 1) // 3 * (1 if t >= 0 else -1)  # round half away
        expect = min(255, max(0, 128 + 3 * r))
        assert np.array_equal(dec[:8, :8], np.full((8, 8), expect, np.uint8))
