"""Query registry: every implemented operator exposed as a
``(spark, sf_dir) -> DataFrame`` callable plus a DuckDB oracle SQL string
with matching column names and types (driver contract, __spark_entry__.py).

Parity conventions (see oracle.py):
  * scores rounded to 9 dp on both sides (raw agreement is ~1 ULP);
  * integer outputs exact, cast to BIGINT/INT explicitly on both sides;
  * deterministic tie-breaks (score DESC, id ASC) everywhere.

Split into per-family modules in round 8; slimmed in round 9 (VERDICT
r8 task 7): the QUERIES/ORACLES assemblies are now BUILT from the
family modules off the ordered name list below instead of 1,500 lines
of mechanical re-exports, and any name the single-file registry
exported (q_*/o_* functions, shared constants) resolves lazily via the
module __getattr__ — `from pythonvectordb_spark.registry import X`
keeps working for every X the family modules define.

_ORDER is the driver contract's load-bearing part: the CORRECTNESS
window checks the FIRST 50 entries each round, so never-witnessed /
schema-stale queries lead (contract test
tests/test_registry_contract.py) followed by previously-witnessed
queries oldest-witness-first (tools/rotation_plan.py mechanizes the
rotation; _core.STALE_UNTIL is the shared schema-change ledger).
"""

from __future__ import annotations

import importlib

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# family modules that define q_<name> / o_<name> pairs (one module per
# operator family; _core holds shared constants + SQL helper builders)
_FAMILIES = (
    "vector",
    "retrieval",
    "dedup",
    "text",
    "media",
    "relational",
    "stats",
    "timeseries",
    "sketch",
    "graph",
    "layout",
    "curation",
    "streaming",
    "mllib",
)

# Registry order (round-10 rotation): the thirteen new MLlib queries
# (FPGrowth rules, PCA compaction, TVS model selection, PrefixSpan
# paths, LinearRegression / ChiSquareTest / Summarizer / MinMaxScaler /
# StandardScaler / Imputer / CountVectorizer+IDF twins, the
# QuantileDiscretizer rank audit, and the BisectingKMeans census) lead
# as the never-witnessed prefix, then the 36-query r3 cohort and the
# stalest-r4 tail fills the front-50; everything after is
# oldest-witness-first (the full tools/rotation_plan.py recommendation).
_ORDER = (
    "mllib_fpgrowth_rules", "mllib_pca_compaction", "mllib_model_selection",
    "mllib_prefixspan_paths", "mllib_linreg_twin", "mllib_chisq_twin",
    "mllib_summarizer_twin", "mllib_minmax_scale",
    "mllib_standard_scaler", "mllib_imputer_twin", "mllib_quantile_buckets",
    "mllib_bisecting_kmeans", "mllib_countvec_idf", "mllib_multiclass_eval",
    "weighted_sample_per_lang", "bigram_surprisal", "event_funnel",
    "retention_cohorts", "pq_encode", "ann_lsh", "ann_pq_trained",
    "ann_ivf_pq_trained", "matview_user_spend_twin", "dedup_gate_twin",
    "events_by_hour", "nation_customer_stats", "value_percentiles", "events_cube",
    "customer_set_ops", "asof_purchase_attribution", "sessionize_events",
    "hypertable_rollup", "cms_user_estimates", "zorder_pruning", "snapshot_diff",
    "bloom_prune_join", "boilerplate_share", "repetition_stats", "chunk_documents",
    "quality_filter", "unigram_surprisal", "lateship_priority_counts", "knn_classify",
    "top_brands_by_share", "promo_revenue_share", "top_supplier_revenue",
    "heavy_part_suppliers", "sole_late_suppliers", "nation_profit_trend",
    "min_cost_supplier", "hybrid_rrf_search", "training_shard_stats",
    "source_token_caps", "event_key_skew", "trade_pagerank", "fuzzy_source_pairs",
    "event_value_mad", "zone_pruned_scan", "approx_percentile_error",
    "media_image_stats", "dedup_simhash_wide", "duplicate_spans", "media_image_resize",
    "approx_distinct_error", "contamination_spans", "scrub_spans", "source_mixture",
    "interleave_audit", "mutual_knn", "importance_weights", "media_audio_stats",
    "media_audio_resample", "corpus_drift", "hard_negatives", "dup_source_matrix",
    "containment_pairs", "split_leakage", "nb_lang_confusion", "perplexity_buckets",
    "zipf_fit", "cluster_split_leakage", "epoch_plan", "dedup_inflation",
    "quantization_recall", "minhash_precision", "contrastive_triplets",
    "dq_violations", "tokenizer_fertility", "bpe_merge_pairs", "unimax_epochs",
    "mmr_rerank", "ann_recall_curve", "k_anonymity", "resolve_keep_best",
    "rbo_overlap", "ngram_coverage", "dedup_threshold_curve", "minhash_estimate_error",
    "supplier_part_counts", "neyman_allocation", "source_entropy", "embedding_drift",
    "dedup_graph_triangles", "heaps_law", "good_turing", "truncation_stats",
    "source_kl_matrix", "source_lang_mi", "pmi_collocations", "bootstrap_order_ci",
    "ivf_balance", "cusum_shift", "ks_drift", "dedup_kcore", "revenue_gini",
    "arrival_burstiness", "event_type_affinity", "benford_digits", "fk_orphans",
    "event_debounce", "conversion_lag", "user_behavior_entropy", "km_survival",
    "hourly_acf", "rank_stability", "trimmed_value_stats", "twonn_intrinsic_dim",
    "hourly_xcorr", "kendall_tau", "hhi_concentration", "mann_whitney", "runs_test",
    "hill_tail_index", "ivf_silhouette", "embedding_effective_rank",
    "dedup_assortativity", "copurchase_lift", "markov_entropy_rate",
    "discount_elasticity", "return_rate_wilson", "priority_segment_chisq",
    "interpurchase_gap", "source_ttr", "source_decile_shift", "session_depth_hist",
    "brand_pareto", "customer_rfm", "fk_fanout_stats", "token_rank_drift",
    "source_js_matrix", "weekday_uniformity", "yearly_value_quartiles", "value_anova",
    "lognormal_jb", "hour_profile_fit", "return_curve", "user_lifecycle_census",
    "order_reconciliation", "user_activity_dispersion", "coldstart_rates",
    "event_bigram_oov", "hour_circular_concentration", "conversion_rate_shift",
    "brand_yoy_growth", "dup_cluster_purity", "single_source_parts",
    "basket_diversity", "priority_leadtime", "tax_discount_chisq", "weekend_value_mw",
    "lang_length_anova", "shard_uniformity", "price_ending_profile",
    "realized_vs_retail", "segment_acctbal_profile", "supplier_balance_corr",
    "dedup_method_agreement", "basket_size_value", "anomalous_days",
    "heldout_cross_entropy", "quality_pass_by_source", "priority_mix_drift",
    "customer_brand_breadth", "nation_trade_balance", "brand_market_presence",
    "returnflag_quantity_mw", "daypart_value_anova", "mllib_word2vec",
    "mllib_ivf_search", "mllib_brp_neardup", "mllib_minhash_dedup", "media_jpeg_stats",
    "media_jpeg_roundtrip", "kneser_ney_bigrams", "ngram_novelty",
    "source_compressibility", "ivf_nprobe_curve", "discount_quantity_spearman",
    "nb_calibration_bins", "bpe_merge_table", "bpe_trained_fertility",
    "kruskal_wallis", "brown_forsythe", "cohens_kappa", "ewma_daily_value",
    "revenue_drawdown", "sign_bit_recall", "matryoshka_recall", "embedding_anisotropy",
    "ndcg_ivf", "mrr_lsh", "kmv_distinct_users", "bloom_fpr_purchases", "trade_hits",
    "burrows_delta", "nb_auc", "holt_linear_forecast", "theil_sen_trend",
    "label_centroid_affinity", "value_wasserstein_drift", "daily_max_gumbel",
    "bpe_encode_pieces", "friedman_types_by_day", "mann_kendall_trend", "nb_class_f1",
    "wilcoxon_week_over_week", "chao1_vocab_richness", "approx_value_percentiles",
    "approx_distinct_events", "mllib_logreg_gate", "value_wasserstein_timecut",
    "kmv_custkey_overlap", "welch_ttest_sources", "dedup_mcnemar", "markov_stationary",
    "adamic_adar_mutual_knn", "hellinger_value_drift", "gpd_tail_fit",
    "mahalanobis_outliers", "pettitt_changepoint", "dow_seasonal_decomposition",
    "ljung_box_daily", "logrank_segments", "ks_bh_fdr", "stratification_deff",
    "quantization_saturation", "source_vocab_jaccard", "nb_average_precision",
    "mllib_isotonic_calibration", "mllib_als_retrieval", "knn_search",
    "knn_search_filtered", "knn_search_float", "get_vector", "get_vectors",
    "quantize_vectors", "knn_join", "ann_ivf", "ann_ivf_filtered", "knn_l2",
    "knn_mips", "add_vectors", "delete_vectors", "upsert_vectors", "normalize_vectors",
    "vector_stats", "label_centroids", "udtf_token_stats", "label_qsum_grouped_agg",
    "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh", "simhash_fingerprints",
    "dedup_simhash", "dedup_embedding", "dedup_resolve", "pipeline_clean_corpus",
    "token_counts", "text_quality", "lang_id", "doc_fingerprint",
    "rolling_fingerprint", "tfidf_terms", "multimodal_join", "media_features",
    "media_features_arrow", "media_resize", "media_frame_sample", "pricing_summary",
    "part_brand_stats", "forecast_revenue", "shipping_priority", "regional_revenue",
    "bilateral_trade", "customer_distribution", "brand_revenue_share",
    "customer_order_running", "mktsegment_rollup", "gate_champion_challenger",
    "order_priority_counts", "ann_lsh_multiprobe", "distinct_agg_stats",
    "salted_segment_revenue", "events_tumbling", "large_volume_orders",
    "brand_size_revenue", "orders_priority_pivot", "orders_priority_unpivot",
    "props_json_stats", "top_dims_per_vector", "nation_market_share", "returned_items",
    "customer_order_frame", "event_type_medians", "events_value_histogram",
    "small_quantity_revenue", "idle_rich_customers", "customer_quartiles",
    "embedding_dimension_stats", "bpe_token_counts", "latest_event_per_user",
    "deterministic_sample", "adjacent_doc_similarity", "event_transitions",
    "purchase_click_interval_join", "moving_window_stats", "cms_heavy_hitters",
    "scd2_user_state", "user_event_paths", "event_outliers", "events_grouping_sets",
    "decontaminate_corpus", "pii_scrub_stats", "stratified_corpus_sample",
    "dup_cluster_sizes", "corpus_token_share", "ann_pq", "event_value_regression",
    "ann_ivf_pq", "semantic_dedup", "pack_sequences", "build_vocab", "encode_tokens",
    "corpus_stats", "incremental_dedup", "value_equidepth_bins", "bm25_rank",
    "top_events_per_user",
)


def _module(fam: str):
    return importlib.import_module(f"pythonvectordb_spark.registry.{fam}")


def _build() -> tuple[
    dict[str, Callable[[SparkSession, str], DataFrame]], dict[str, str]
]:
    by_name: dict[str, object] = {}
    for fam in _FAMILIES:
        by_name.update(
            (k, v) for k, v in vars(_module(fam)).items()
            if k.startswith(("q_", "o_")) and callable(v)
        )
    queries = {}
    oracles = {}
    missing = []
    for name in _ORDER:
        q = by_name.get("q_" + name)
        o = by_name.get("o_" + name)
        if q is None or o is None:
            missing.append(name)
            continue
        queries[name] = q
        oracles[name] = o()
    if missing:  # fail loudly at import: a renamed/dropped binding is a bug
        raise ImportError(f"registry _ORDER names without q_/o_ bindings: {missing}")
    # symmetric check (ADVICE r9): a q_/o_ pair defined in a family
    # module but forgotten from _ORDER would otherwise silently never
    # register (never rotate into the front-50, never get witnessed).
    extras = sorted(
        k[2:] for k in by_name
        if k.startswith("q_") and k[2:] not in queries
    )
    if extras:
        raise ImportError(f"registry q_* bindings missing from _ORDER: {extras}")
    return queries, oracles


QUERIES, ORACLES = _build()


def __getattr__(name: str):
    """PEP 562 lazy re-export: resolve any name a family module (or
    _core) defines, so pre-split import sites keep working without a
    1,500-line explicit re-export block."""
    for fam in ("_core",) + _FAMILIES:
        mod = _module(fam)
        if hasattr(mod, name):
            val = getattr(mod, name)
            # cache: repeat lookups skip the linear module scan, and the
            # first winner (_core-first order) is frozen deterministically
            globals()[name] = val
            return val
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
