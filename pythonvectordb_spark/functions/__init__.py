from pythonvectordb_spark.functions.vector import (  # noqa: F401
    cosine_similarity,
    cosine_similarity_int8,
    dequantize,
    dot,
    l2_norm,
    l2_normalize,
    quantize,
)
