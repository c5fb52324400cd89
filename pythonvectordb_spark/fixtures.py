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
