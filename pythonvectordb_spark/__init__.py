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
from pythonvectordb_spark.functions.vector import (  # noqa: F401
    cosine_similarity,
    cosine_similarity_int8,
    cosine_similarity_int8_sym,
    dequantize,
    l2_normalize,
    quantize,
)
from pythonvectordb_spark.operators.search import (  # noqa: F401
    ann_ivf_pq_search,
    ann_ivf_search,
    ann_lsh_multiprobe_search,
    ann_lsh_search,
    ann_pq_search,
    get_vector,
    pq_code_expr,
    knn_join,
    knn_search,
    knn_search_float,
    l2_knn_search,
    mips_search,
    rrf_fuse,
    with_qvec,
)
from pythonvectordb_spark.operators.curation import (  # noqa: F401
    cap_per_source,
    decontaminate,
    dup_cluster_stats,
    pii_scrub,
    stratified_sample,
)
from pythonvectordb_spark.operators.mutation import (  # noqa: F401
    add_vectors,
    delete_vectors,
    upsert_vectors,
)
from pythonvectordb_spark.operators.dedup import (  # noqa: F401
    connected_components,
    dedup_exact,
    embedding_near_dup,
    incremental_minhash_dedup,
    minhash_lsh_pairs,
    minhash_side,
    ngram_jaccard_pairs,
    resolve_duplicates,
    semantic_dedup_pairs,
    simhash_pairs,
)
from pythonvectordb_spark.operators.textops import (  # noqa: F401
    build_vocab,
    chunk_documents,
    corpus_stats,
    encode_tokens,
    pack_sequences,
)
from pythonvectordb_spark.operators.timeseries import (  # noqa: F401
    asof_join,
    hypertable_rollup,
    moving_window_stats,
    sessionize,
)
from pythonvectordb_spark.operators.sketch import (  # noqa: F401
    cms_build,
    cms_estimate,
    key_skew_report,
)
from pythonvectordb_spark.operators.export import (  # noqa: F401
    assign_shards,
    shard_stats,
    write_training_shards,
)
from pythonvectordb_spark.operators.graph import pagerank  # noqa: F401
from pythonvectordb_spark.sources.snapshot import (  # noqa: F401
    build_vector_table,
    load_snapshot,
    save_snapshot,
    validate_batch,
)
from pythonvectordb_spark.serving import (  # noqa: F401
    KnnServer,
    quantize_query,
)
from pythonvectordb_spark.operators.layout import (  # noqa: F401
    bloom_pass_filter,
    bloom_semi_join,
    snapshot_diff,
    zorder_key,
    zorder_pruning_stats,
)
from pythonvectordb_spark.sources.zonemap import (  # noqa: F401
    build_zone_map,
    pruned_read,
    zone_files_for_range,
)
