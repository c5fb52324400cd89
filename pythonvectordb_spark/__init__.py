"""pythonvectordb_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of the reference `PythonVectorDB`
(in-memory int8-quantized brute-force vector DB; see SURVEY.md), rebuilt
Spark-first for 100 TB scale.

Design stance (SURVEY.md §7):
  * One Parquet-backed vector table ``(vec_id, embedding, qvec, metadata…)``;
    immutable snapshots, never positional state.
  * Every operator is a pure ``DataFrame -> DataFrame`` function.
  * Native ``pyspark.sql.functions`` expressions (whole-stage codegen) for
    all hot paths; Pandas UDFs only where built-ins can't express semantics.
  * No custom Catalyst rules needed (SURVEY.md §4).
"""

__version__ = "0.1.0"

from pythonvectordb_spark.session import get_spark  # noqa: F401
