"""Migration interop: reference-format .npz round trip (the format a
reference user's saved databases are in)."""

import json

import numpy as np
import pytest
from pyspark.sql import functions as F


def _make_reference_npz(path, n=20, dim=64, seed=7):
    """Build an npz in the reference's documented format (SURVEY §2.2):
    L2-normalized float32 randn, quantized to int8 at scale 127 with
    truncation toward zero — the same recipe its benchmarks use."""
    rng = np.random.default_rng(seed)
    v = rng.standard_normal((n, dim)).astype(np.float32)
    v = v / np.linalg.norm(v, axis=1, keepdims=True)
    q = np.clip(v * 127, -128, 127).astype(np.int8)  # trunc toward zero
    ids = np.array([f"vec_{i}" for i in range(n)])
    np.savez_compressed(
        path,
        version="1.0.0",
        dimension=dim,
        vectors=q,
        vector_ids=ids,
        id_to_index={f"vec_{i}": i for i in range(n)},
        metadata={f"vec_{i}": {"index": i} for i in range(n)},
        vector_count=n,
        deleted_count=0,
    )
    return q


def test_npz_import_roundtrip(spark, tmp_path):
    from pythonvectordb_spark.sources.npz_compat import load_npz, save_npz

    src = str(tmp_path / "ref.npz")
    q = _make_reference_npz(src)
    df = load_npz(spark, src)
    assert df.count() == 20
    row = df.filter(F.col("vec_id") == "vec_3").first()
    assert list(row.qvec) == [int(x) for x in q[3]]
    assert json.loads(row.metadata) == {"index": 3}

    # export back and re-import: identical payload
    out = str(tmp_path / "back.npz")
    save_npz(df, out, dimension=64)
    df2 = load_npz(spark, out)
    a = sorted((r.vec_id, tuple(r.qvec)) for r in df.collect())
    b = sorted((r.vec_id, tuple(r.qvec)) for r in df2.collect())
    assert a == b


def test_npz_import_validations(spark, tmp_path):
    from pythonvectordb_spark.sources.npz_compat import load_npz

    with pytest.raises(FileNotFoundError):
        load_npz(spark, str(tmp_path / "missing.npz"))

    bad = str(tmp_path / "bad.npz")
    np.savez_compressed(
        bad,
        version="1.0.0",
        dimension=64,
        vectors=np.zeros((3, 64), dtype=np.int8),
        vector_ids=np.array(["a", "b"]),  # count mismatch
        id_to_index={},
        metadata={},
        vector_count=3,
        deleted_count=0,
    )
    with pytest.raises(ValueError, match="IDs count"):
        load_npz(spark, bad)


def test_npz_imported_vectors_searchable(spark, tmp_path):
    """End to end: imported reference data is directly searchable (the
    int8 payload is the engine's native storage)."""
    from pythonvectordb_spark.operators.search import knn_search
    from pythonvectordb_spark.sources.npz_compat import load_npz

    src = str(tmp_path / "ref.npz")
    q = _make_reference_npz(src)
    df = load_npz(spark, src)
    # query with row 5's dequantized vector; expect vec_5 at rank 1
    query = [float(x) / 127.0 for x in q[5]]
    top = knn_search(df, query, k=3, id_col="vec_id").first()
    assert top.vec_id == "vec_5"
    assert top.score > 0.99
