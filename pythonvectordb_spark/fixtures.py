"""Deterministic fixtures shared by queries(), oracle_sql(), tests, bench.

All vectors are seeded float32 (matching the reference's synthetic recipe,
benchmark_suite.py:60-61: randn -> L2 normalize) and then round-tripped
through Python floats, so the exact same double values are embedded as
literals in both the Spark plan and the DuckDB oracle SQL.
"""

from __future__ import annotations

import numpy as np

DIM = 64  # driver testdata embedding dimension (FIXTURES.md §B)


def _seeded_unit(seed: int, dim: int = DIM) -> list[float]:
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim).astype(np.float32)
    v = (v / np.linalg.norm(v)).astype(np.float32)
    return [float(x) for x in v]


# flagship single query (seed 42, like everything in the testdata)
QUERY_VEC = _seeded_unit(42)
# a second query for filtered search
QUERY_VEC_2 = _seeded_unit(7)

# fixed random hyperplanes for LSH (6 bits -> 64 buckets)
_rng = np.random.default_rng(1234)
HYPERPLANES = [[float(x) for x in _rng.standard_normal(DIM).astype(np.float32)] for _ in range(6)]

# fixed IVF codebook: 8 seeded unit centroids
CENTROIDS = [_seeded_unit(100 + i) for i in range(8)]

# product-quantization codebooks: 8 subspaces of 8 dims, 16 centroids
# each. Seeded normals SCALED TO THE DATA SHELL: unit-norm 64-dim
# vectors have sub-vector coordinates ~N(0, 1/64), so centroids are
# drawn at per-dim std 1/sqrt(DIM) — unscaled N(0,1) centroids sit ~8x
# outside the data and the argmin collapses onto a handful of codes.
# (At scale these come from per-subspace KMeans; any fixed codebook
# matching the data's scale exercises the operator.) 64 float dims
# (256 B) compress to 8 one-byte codes.
PQ_M = 8          # subspaces
PQ_KS = 16        # centroids per subspace
PQ_SUB_DIM = DIM // PQ_M
_pq_rng = np.random.default_rng(4321)
PQ_CODEBOOKS = [
    [
        [
            float(x)
            for x in (_pq_rng.standard_normal(PQ_SUB_DIM) / np.sqrt(DIM)).astype(
                np.float32
            )
        ]
        for _ in range(PQ_KS)
    ]
    for _ in range(PQ_M)
]
