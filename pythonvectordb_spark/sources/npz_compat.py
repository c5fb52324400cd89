"""Migration path for the reference's ``.npz`` persistence format, so a
user of the reference can point this engine at their saved databases.

Format (reference ``save``, pythonvectordb.py:557-582): one compressed
npz with keys ``version, dimension, vectors (int8 [n, dim]),
vector_ids (str array), id_to_index (pickled dict), metadata (pickled
dict keyed by id), vector_count, deleted_count``. ``load``
(pythonvectordb.py:584-646) validates version/dimension/shape/count.

Import produces the engine's table shape: (vec_id string, qvec
ArrayType(ByteType), metadata json string) — the int8 payload is carried
over untouched (it IS the reference's storage), so scores computed here
match scores the reference would produce for the same stored data.

The npz is a single-host artifact; import reads it on the driver and
parallelizes. That's the right shape for a one-time migration — steady
state uses parquet snapshots (sources.snapshot).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    ByteType,
    StringType,
    StructField,
    StructType,
)

NPZ_SCHEMA = StructType(
    [
        StructField("vec_id", StringType()),
        StructField("qvec", ArrayType(ByteType())),
        StructField("metadata", StringType()),  # JSON; schemaless in the reference
    ]
)


def load_npz(spark: SparkSession, filepath: str, expected_version: str = "1.0.0") -> DataFrame:
    """Import a reference-format .npz database as a DataFrame.

    Mirrors the reference's load validations (version/dim/shape/count,
    pythonvectordb.py:616-630) and raises ValueError on violations.
    """
    import numpy as np

    try:
        data = np.load(filepath, allow_pickle=True)
    except FileNotFoundError:
        raise FileNotFoundError(f"Database file not found: {filepath}")
    except Exception as e:  # corrupt archive
        raise ValueError(f"Invalid database file: {e}")

    version = str(data["version"])
    if version != expected_version:
        raise ValueError(f"Unsupported version: {version}")
    dimension = int(data["dimension"])
    vectors = data["vectors"]
    vector_ids = [str(x) for x in data["vector_ids"].tolist()]
    metadata = data["metadata"].item() if "metadata" in data else {}
    vector_count = int(data["vector_count"])

    if dimension <= 0:
        raise ValueError(f"Invalid dimension: {dimension}")
    if vectors.shape != (vector_count, dimension):
        raise ValueError("Vector shape mismatch")
    if len(vector_ids) != vector_count:
        raise ValueError("Vector IDs count mismatch")

    rows = [
        (
            vid,
            [int(b) for b in vectors[i]],
            json.dumps(metadata.get(vid, {}), sort_keys=True),
        )
        for i, vid in enumerate(vector_ids)
    ]
    return spark.createDataFrame(rows, NPZ_SCHEMA)


def save_npz(df: DataFrame, filepath: str, dimension: int, version: str = "1.0.0") -> None:
    """Export the engine's table back to the reference's .npz format
    (collects to the driver — a migration/interop artifact, not a
    distributed sink)."""
    import numpy as np

    rows = df.select("vec_id", "qvec", "metadata").collect()
    n = len(rows)
    vectors = np.zeros((n, dimension), dtype=np.int8)
    ids = []
    meta: dict[str, dict] = {}
    for i, r in enumerate(rows):
        vectors[i] = np.array(r.qvec, dtype=np.int8)
        vid = str(r.vec_id)
        ids.append(vid)
        md = json.loads(r.metadata) if r.metadata else {}
        if md:
            meta[vid] = md
    np.savez_compressed(
        filepath,
        version=version,
        dimension=dimension,
        vectors=vectors,
        vector_ids=np.array(ids),
        id_to_index={vid: i for i, vid in enumerate(ids)},
        metadata=meta,
        vector_count=n,
        deleted_count=0,
    )
