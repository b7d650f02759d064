"""The driver-facing registry: QUERIES / ORACLES key -> pipeline/SQL.

Dict literals and every registration verbatim from the former
plans/queries.py (round 9 split) — key ORDER is the driver's grading
window contract and is preserved exactly.
"""

from __future__ import annotations
import os
from collections.abc import Callable
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from datalake_indexes_spark.index.builder import build_index, with_global_row_number
from datalake_indexes_spark.index.lake_index import LakeIndex
from datalake_indexes_spark.operators.cocoa import COCOA, is_numeric_flags
from datalake_indexes_spark.operators.duplicates import DuplicateDetection
from datalake_indexes_spark.operators.mate import MATE
from datalake_indexes_spark.plans import oracle
from datalake_indexes_spark.functions.text import tokenize_col
from datalake_indexes_spark.sources.catalog import ALL_TABLE_NAMES, TESTDATA_LAKE_SPEC

from datalake_indexes_spark.plans.queries._q_ann import (
    q_ann_cluster_purity,
    q_ann_cosine_topk,
    q_ann_hard_negatives,
    q_ann_ivf_indexed,
    q_ann_ivf_pq,
    q_ann_ivf_pq_refined,
    q_ann_ivf_topk,
    q_ann_knn_classify,
    q_ann_knn_graph,
    q_ann_lsh_multiprobe,
    q_ann_lsh_topk,
    q_ann_margin_blocked,
    q_ann_margin_mining,
    q_ann_margin_rescore,
    q_ann_mmr_topk,
    q_ann_nn_descent,
    q_ann_nn_descent2,
    q_ann_pq_topk,
    q_ann_quantized_topk,
    q_ann_range_blocked,
    q_ann_range_search,
    q_ann_recall_report,
    q_correlation_matrix,
    q_embedding_centroids,
    q_embedding_covariance,
    q_embedding_drift,
    q_ml_cv_folds,
    q_ml_embedding_isotropy,
    q_ml_nb_calibration,
    q_ml_nb_langid,
    q_ml_pca_identity,
    q_ml_pca_project,
    q_robust_scale_stats,
    q_target_encode,
)
from datalake_indexes_spark.plans.queries._base import (
    BM25_QUERY_TERMS,
    BURST_TOLERANCE_US,
    CORPUS_SAMPLE_FRACTIONS,
    DECONTAM_MODULUS,
    FUNNEL_STEPS,
    GOV_PSEUDO_SECRET,
    HEADER_SEARCH_QUERY,
    KS_DRIFT_COLUMNS,
    RANGE_JOIN_WINDOW_US,
    REPEAT_SPAN,
    SELF_SENT,
    TREND_X_ORIGIN_US,
    V3_LOGPROB_MIN,
    V3_QUALITY_MIN,
    WEB_BLOCKLIST,
    XSPAN_Q1,
    XSPAN_Q2,
)
from datalake_indexes_spark.plans.queries._q_corpus import (
    q_corpus_audit,
    q_corpus_budget_select,
    q_corpus_chunk,
    q_corpus_cluster_split,
    q_corpus_data_card,
    q_corpus_delivery,
    q_corpus_diff,
    q_corpus_diff_census,
    q_corpus_drop_audit,
    q_corpus_group_split,
    q_corpus_mix,
    q_corpus_novelty,
    q_corpus_pack,
    q_corpus_pack_fill,
    q_corpus_pack_harmonic,
    q_corpus_pareto,
    q_corpus_pipeline_census,
    q_corpus_prep,
    q_corpus_prep_full,
    q_corpus_prep_v2,
    q_corpus_prep_v3,
    q_corpus_sample,
    q_corpus_sample_exact,
    q_corpus_sample_weighted,
    q_corpus_select_dsir,
    q_corpus_select_ppl,
    q_corpus_split,
)
from datalake_indexes_spark.plans.queries._q_dedup import (
    q_contamination_report,
    q_corpus_boiler_by_source,
    q_decontaminate,
    q_decontaminate_spans,
    q_dedup_chunks,
    q_dedup_clusters,
    q_dedup_clusters_distributed,
    q_dedup_containment,
    q_dedup_cross_spans,
    q_dedup_earliest,
    q_dedup_embedding_cosine,
    q_dedup_embedding_multiprobe,
    q_dedup_exact,
    q_dedup_incremental,
    q_dedup_incremental_neardup,
    q_dedup_incremental_report,
    q_dedup_keep_best,
    q_dedup_minhash_lsh,
    q_dedup_neardup_est,
    q_dedup_ngram_capped,
    q_dedup_ngram_jaccard,
    q_dedup_prefix_join,
    q_dedup_recall_report,
    q_dedup_repeated_spans,
    q_dedup_self_removal,
    q_dedup_self_spans,
    q_dedup_simhash,
    q_dedup_source_matrix,
    q_dedup_span_removal,
    q_dedup_subset,
    q_dedup_threshold_sweep,
    q_semantic_dedup,
)
from datalake_indexes_spark.plans.queries._q_dup import (
    q_dup_groups_planted,
    q_dup_row_groups,
    q_dup_row_groups_planted,
    q_dup_rows_planted,
    q_dup_table_relations,
    q_dup_table_relations_planted,
)
from datalake_indexes_spark.plans.queries._q_events import (
    q_events_ab_cuped,
    q_events_ab_test,
    q_events_absorption,
    q_events_anomaly,
    q_events_anomaly_running,
    q_events_anomaly_seasonal,
    q_events_asof_join,
    q_events_attribution,
    q_events_changepoint,
    q_events_cohort,
    q_events_concurrency,
    q_events_cube,
    q_events_decay_stats,
    q_events_dedup_bursts,
    q_events_forecast_backtest,
    q_events_funnel,
    q_events_funnel_timing,
    q_events_gap_stats,
    q_events_growth,
    q_events_holt,
    q_events_interval_pairs,
    q_events_item_pairs,
    q_events_json_extract,
    q_events_json_profile,
    q_events_mann_kendall,
    q_events_mwu,
    q_events_range_join,
    q_events_removal_effects,
    q_events_resample,
    q_events_rfm,
    q_events_rolling,
    q_events_rollup,
    q_events_scd2,
    q_events_scd2_lookup,
    q_events_seasonality,
    q_events_session_paths,
    q_events_sessionize,
    q_events_survival,
    q_events_theil_sen,
    q_events_transitions,
    q_events_trend,
    q_events_twap,
    q_events_wau,
    q_events_window_agg,
    q_events_xcorr,
)
from datalake_indexes_spark.plans.queries._q_graph import (
    q_graph_clustering,
    q_graph_hits,
    q_graph_kcore,
    q_graph_label_prop,
    q_graph_link_prediction,
    q_graph_modularity,
    q_graph_pagerank,
    q_graph_ppr,
    q_graph_triangles,
)
from datalake_indexes_spark.plans.queries._q_index import (
    q_add_external_features,
    q_cocoa_order_index,
    q_column_profiles,
    q_enrichment_features,
    q_fk_sample,
    q_functional_deps,
    q_get_table_pivot,
    q_header_search,
    q_inclusion_deps,
    q_index_cells,
    q_is_numeric,
    q_join_cardinalities,
    q_join_paths,
    q_lake_validate,
    q_semantic_types,
    q_skew_report,
    q_table_info,
    q_tables_with_all_tokens,
)
from datalake_indexes_spark.plans.queries._q_mate_cocoa import (
    q_cocoa_enrich,
    q_cocoa_multicolumn,
    q_mate_batch,
    q_mate_bloom,
    q_mate_linear,
    q_mate_multi,
    q_mate_ratio,
    q_mate_single,
    q_mate_triple,
)
from datalake_indexes_spark.plans.queries._q_multimodal import (
    q_multimodal_audio_features,
    q_multimodal_features,
    q_multimodal_frame_stats,
    q_multimodal_jpeg_pixel_stats,
    q_multimodal_metadata,
    q_multimodal_pixel_stats,
    q_multimodal_sample_stats,
)
from datalake_indexes_spark.plans.queries._q_profiling import (
    q_column_benford,
    q_column_chi2,
    q_column_histograms,
    q_column_minhash,
    q_column_moments,
    q_column_mutual_info,
    q_column_outliers,
    q_column_percentiles,
    q_column_quantile_buckets,
    q_column_top_values,
    q_discovery_domains,
    q_dp_counts,
    q_dp_sums,
    q_entity_resolution,
    q_export_balanced_shards,
    q_export_shard_fingerprints,
    q_export_shard_manifest,
    q_fs_record_linkage,
    q_fuzzy_join_names,
    q_governance_forget,
    q_governance_k_anonymity,
    q_governance_pseudonymize,
    q_k_anonymity,
    q_k_suppress,
    q_profile_drift,
    q_profile_ks_drift,
    q_profile_psi,
    q_union_search,
    q_union_search_recall,
    q_union_search_sketch,
    q_web_blocklist,
    q_web_canonical,
    q_web_domain_cap,
    q_web_domain_stats,
    q_web_extract_links,
    q_web_link_census,
    q_winsorize_stats,
)
from datalake_indexes_spark.plans.queries._q_text import (
    q_bm25_indexed,
    q_bm25_topk,
    q_hybrid_rrf,
    q_search_proximity,
    q_search_proximity_indexed,
    q_text_bigram_logprob,
    q_text_boilerplate_lines,
    q_text_bpe_counts,
    q_text_c4_filters,
    q_text_canonicalize,
    q_text_compressibility,
    q_text_content_type,
    q_text_dsir_weights,
    q_text_entropy,
    q_text_fingerprint,
    q_text_gopher_filters,
    q_text_keywords,
    q_text_kn_logprob,
    q_text_langid,
    q_text_line_dedup,
    q_text_normalize,
    q_text_paragraph_filter,
    q_text_pii_scrub,
    q_text_pmi,
    q_text_ppl_buckets,
    q_text_quality,
    q_text_quality_normalized,
    q_text_readability,
    q_text_repetition,
    q_text_script_ratios,
    q_text_simhash,
    q_text_tfidf_sim,
    q_text_token_counts,
    q_text_unigram_logprob,
    q_text_zipf,
    q_tfidf_topk,
    q_vocab_growth,
    q_vocab_heaps_fit,
    q_vocab_heavy_hitters,
    q_vocab_topk,
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "index_cells": q_index_cells,
    "index_table_info": q_table_info,
    "index_is_numeric": q_is_numeric,
    "index_column_profiles": q_column_profiles,
    "header_search": q_header_search,
    "cocoa_order_index": q_cocoa_order_index,
    "mate_join_search_single": q_mate_single,
    "mate_join_search_multi": q_mate_multi,
    "mate_join_search_triple": q_mate_triple,
    "mate_join_search_ratio": q_mate_ratio,
    "cocoa_enrich": q_cocoa_enrich,
    "cocoa_enrich_multicolumn": q_cocoa_multicolumn,
    "dup_row_groups": q_dup_row_groups,
    "dup_table_relations": q_dup_table_relations,
    "dup_rows_planted": q_dup_rows_planted,
    "dup_row_groups_planted": q_dup_row_groups_planted,
    "dup_table_relations_planted": q_dup_table_relations_planted,
    "dup_groups_planted": q_dup_groups_planted,
    "get_table_pivot": q_get_table_pivot,
    "k_anonymity": q_k_anonymity,
    "k_suppress": q_k_suppress,
    "dp_group_counts": q_dp_counts,
    "dp_group_sums": q_dp_sums,
    "add_external_features": q_add_external_features,
    "enrichment_features": q_enrichment_features,
    "mate_join_search_linear": q_mate_linear,
    "mate_join_search_bloom": q_mate_bloom,
    "dedup_exact": q_dedup_exact,
    "dedup_earliest": q_dedup_earliest,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_source_matrix": q_dedup_source_matrix,
    "dedup_neardup_est": q_dedup_neardup_est,
    "dedup_minhash_clusters": q_dedup_clusters,
    "dedup_clusters_distributed": q_dedup_clusters_distributed,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_ngram_capped": q_dedup_ngram_capped,
    "dedup_containment": q_dedup_containment,
    "dedup_recall_report": q_dedup_recall_report,
    "dedup_subset": q_dedup_subset,
    "dedup_repeated_spans": q_dedup_repeated_spans,
    "dedup_span_removal": q_dedup_span_removal,
    "dedup_cross_spans": q_dedup_cross_spans,
    "decontaminate_spans": q_decontaminate_spans,
    "dedup_self_spans": q_dedup_self_spans,
    "dedup_self_removal": q_dedup_self_removal,
    "contamination_report": q_contamination_report,
    "dedup_chunks": q_dedup_chunks,
    "fuzzy_join_names": q_fuzzy_join_names,
    "entity_resolution": q_entity_resolution,
    "fs_record_linkage": q_fs_record_linkage,
    "text_simhash": q_text_simhash,
    "dedup_simhash": q_dedup_simhash,
    "dedup_embedding_cosine": q_dedup_embedding_cosine,
    "ann_cosine_topk": q_ann_cosine_topk,
    "ann_hard_negatives": q_ann_hard_negatives,
    "ann_knn_classify": q_ann_knn_classify,
    "ann_cluster_purity": q_ann_cluster_purity,
    "ann_ivf_topk": q_ann_ivf_topk,
    "ann_ivf_indexed": q_ann_ivf_indexed,
    "ann_quantized_topk": q_ann_quantized_topk,
    "ann_lsh_topk": q_ann_lsh_topk,
    "ann_lsh_multiprobe_topk": q_ann_lsh_multiprobe,
    "ann_pq_topk": q_ann_pq_topk,
    "corpus_prep": q_corpus_prep,
    "corpus_prep_full": q_corpus_prep_full,
    "corpus_prep_v2": q_corpus_prep_v2,
    "text_token_counts": q_text_token_counts,
    "corpus_budget_select": q_corpus_budget_select,
    "text_quality": q_text_quality,
    "text_langid": q_text_langid,
    "text_fingerprint": q_text_fingerprint,
    "text_pii_scrub": q_text_pii_scrub,
    "text_repetition": q_text_repetition,
    "text_content_type": q_text_content_type,
    "web_canonical_urls": q_web_canonical,
    "web_domain_stats": q_web_domain_stats,
    "web_blocklist": q_web_blocklist,
    "web_extract_links": q_web_extract_links,
    "web_link_census": q_web_link_census,
    "web_domain_cap": q_web_domain_cap,
    "events_dedup_bursts": q_events_dedup_bursts,
    "events_attribution": q_events_attribution,
    "events_interval_pairs": q_events_interval_pairs,
    "export_balanced_shards": q_export_balanced_shards,
    "corpus_group_split": q_corpus_group_split,
    "corpus_pipeline_census": q_corpus_pipeline_census,
    "events_trend": q_events_trend,
    "column_quantile_buckets": q_column_quantile_buckets,
    "column_chi2": q_column_chi2,
    "export_shard_manifest": q_export_shard_manifest,
    "text_bpe_counts": q_text_bpe_counts,
    "export_shard_fingerprints": q_export_shard_fingerprints,
    "text_script_ratios": q_text_script_ratios,
    "text_keywords": q_text_keywords,
    "text_entropy": q_text_entropy,
    "corpus_sample": q_corpus_sample,
    "corpus_pack": q_corpus_pack,
    "multimodal_features": q_multimodal_features,
    "multimodal_pixel_stats": q_multimodal_pixel_stats,
    "multimodal_jpeg_pixel_stats": q_multimodal_jpeg_pixel_stats,
    "multimodal_frame_stats": q_multimodal_frame_stats,
    "multimodal_sample_stats": q_multimodal_sample_stats,
    "multimodal_metadata": q_multimodal_metadata,
    "events_window_agg": q_events_window_agg,
    "events_sessionize": q_events_sessionize,
    "events_json_extract": q_events_json_extract,
    "events_json_profile": q_events_json_profile,
    "decontaminate": q_decontaminate,
    "bm25_topk": q_bm25_topk,
    "tfidf_topk": q_tfidf_topk,
    "events_asof_join": q_events_asof_join,
    "events_scd2": q_events_scd2,
    "events_transitions": q_events_transitions,
    "events_item_pairs": q_events_item_pairs,
    "fk_sample": q_fk_sample,
    "governance_pseudonymize": q_governance_pseudonymize,
    "governance_k_anonymity": q_governance_k_anonymity,
    "corpus_delivery": q_corpus_delivery,
    "skew_report": q_skew_report,
    "text_compressibility": q_text_compressibility,
    "corpus_data_card": q_corpus_data_card,
    "text_paragraph_filter": q_text_paragraph_filter,
    "text_c4_filters": q_text_c4_filters,
    "events_seasonality": q_events_seasonality,
    "events_session_paths": q_events_session_paths,
    "events_anomaly_seasonal": q_events_anomaly_seasonal,
    "events_concurrency": q_events_concurrency,
    "events_twap": q_events_twap,
    "ann_centroids": q_embedding_centroids,
    "ann_knn_graph": q_ann_knn_graph,
    "ml_embedding_cov": q_embedding_covariance,
    "ml_pca_project": q_ml_pca_project,
    "ml_pca_identity": q_ml_pca_identity,
    "ann_recall_report": q_ann_recall_report,
    "semantic_dedup": q_semantic_dedup,
    "corpus_mix": q_corpus_mix,
    "corpus_chunk": q_corpus_chunk,
    "events_range_join": q_events_range_join,
    "bm25_indexed": q_bm25_indexed,
    "events_funnel": q_events_funnel,
    "vocab_topk": q_vocab_topk,
    "corpus_split": q_corpus_split,
    "events_rollup": q_events_rollup,
    "column_top_values": q_column_top_values,
    "hybrid_rrf": q_hybrid_rrf,
    "events_cohort": q_events_cohort,
    "events_anomaly": q_events_anomaly,
    "graph_pagerank": q_graph_pagerank,
    "graph_hits": q_graph_hits,
    "graph_ppr": q_graph_ppr,
    "graph_triangles": q_graph_triangles,
    "graph_clustering": q_graph_clustering,
    "graph_link_prediction": q_graph_link_prediction,
    "graph_kcore": q_graph_kcore,
    "column_moments": q_column_moments,
    "column_benford": q_column_benford,
    "profile_ks_drift": q_profile_ks_drift,
    "events_forecast_backtest": q_events_forecast_backtest,
    "events_holt": q_events_holt,
    "events_decay_stats": q_events_decay_stats,
    "events_theil_sen": q_events_theil_sen,
    "events_mann_kendall": q_events_mann_kendall,
    "events_mwu": q_events_mwu,
    "text_normalize": q_text_normalize,
    "text_zipf": q_text_zipf,
    "text_readability": q_text_readability,
    "events_survival": q_events_survival,
    "column_mutual_info": q_column_mutual_info,
    "events_ab_test": q_events_ab_test,
    "events_changepoint": q_events_changepoint,
    "events_ab_cuped": q_events_ab_cuped,
    "events_funnel_timing": q_events_funnel_timing,
    "corpus_drop_audit": q_corpus_drop_audit,
    "corpus_novelty": q_corpus_novelty,
    "corpus_pareto": q_corpus_pareto,
    "events_scd2_lookup": q_events_scd2_lookup,
    "events_rfm": q_events_rfm,
    "events_xcorr": q_events_xcorr,
    "events_absorption": q_events_absorption,
    "events_removal_effects": q_events_removal_effects,
    "profile_psi": q_profile_psi,
    "embedding_drift": q_embedding_drift,
    "graph_label_prop": q_graph_label_prop,
    "graph_modularity": q_graph_modularity,
    "column_percentiles": q_column_percentiles,
    "vocab_heavy_hitters": q_vocab_heavy_hitters,
    "events_gap_stats": q_events_gap_stats,
    "events_wau": q_events_wau,
    "governance_forget": q_governance_forget,
    "events_rolling": q_events_rolling,
    "lake_validate": q_lake_validate,
    "inclusion_deps": q_inclusion_deps,
    "join_paths": q_join_paths,
    "column_minhash": q_column_minhash,
    "profile_drift": q_profile_drift,
    "functional_deps": q_functional_deps,
    "join_cardinalities": q_join_cardinalities,
    "column_histograms": q_column_histograms,
    "union_search": q_union_search,
    "union_search_recall": q_union_search_recall,
    "semantic_types": q_semantic_types,
    "events_growth": q_events_growth,
    "events_resample": q_events_resample,
    "text_tfidf_sim": q_text_tfidf_sim,
    "column_outliers": q_column_outliers,
    "discovery_domains": q_discovery_domains,
    "mate_join_search_batch": q_mate_batch,
    "corpus_sample_exact": q_corpus_sample_exact,
    "events_cube": q_events_cube,
    "union_search_sketch": q_union_search_sketch,
    "ann_ivf_pq": q_ann_ivf_pq,
    "events_anomaly_running": q_events_anomaly_running,
    "corpus_sample_weighted": q_corpus_sample_weighted,
    "dedup_embedding_multiprobe": q_dedup_embedding_multiprobe,
    "text_unigram_logprob": q_text_unigram_logprob,
    "text_bigram_logprob": q_text_bigram_logprob,
    "text_pmi": q_text_pmi,
    "winsorize_stats": q_winsorize_stats,
    "ml_corr_matrix": q_correlation_matrix,
    "ml_robust_scale": q_robust_scale_stats,
    "ml_target_encode": q_target_encode,
    "text_canonicalize": q_text_canonicalize,
    "tables_with_all_tokens": q_tables_with_all_tokens,
    "dedup_keep_best": q_dedup_keep_best,
    "corpus_prep_v3": q_corpus_prep_v3,
    "corpus_audit": q_corpus_audit,
    "text_quality_normalized": q_text_quality_normalized,
    "ml_cv_folds": q_ml_cv_folds,
    "corpus_diff": q_corpus_diff,
    "ann_range_search": q_ann_range_search,
    "corpus_diff_census": q_corpus_diff_census,
    "ann_range_blocked": q_ann_range_blocked,
}


ORACLES: dict[str, str] = {
    "index_cells": oracle.index_cells_sql(),
    "index_table_info": oracle.table_info_sql(),
    "index_is_numeric": oracle.is_numeric_sql(),
    "index_column_profiles": oracle.column_profiles_sql(),
    "header_search": oracle.header_search_sql(HEADER_SEARCH_QUERY, k=10),
    "cocoa_order_index": oracle.cocoa_order_index_sql(),
    "mate_join_search_single": oracle.mate_join_search_sql(
        "customer", ["c_custkey"], ["c_custkey"], k=10, k_c=500
    ),
    "mate_join_search_multi": oracle.mate_join_search_sql(
        "lineitem",
        ["l_orderkey", "l_partkey"],
        ["l_orderkey", "l_linenumber"],
        k=10,
        k_c=500,
    ),
    "mate_join_search_ratio": oracle.mate_join_search_sql(
        "customer", ["c_custkey"], ["c_custkey"], k=10, k_c=500, min_join_ratio=50
    ),
    "mate_join_search_triple": oracle.mate_join_search_sql(
        "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey"],
        ["l_orderkey", "l_linenumber"],
        k=10,
        k_c=500,
    ),
    "cocoa_enrich": oracle.cocoa_enrich_sql(
        "customer", "c_custkey", "c_acctbal", ["c_custkey"], k_t=5, k_c=20
    ),
    "cocoa_enrich_multicolumn": oracle.cocoa_multicolumn_sql(
        "customer", ["c_custkey"], "c_acctbal", ["c_custkey"], k=5, k_c=500, k_features=10
    ),
    "dup_row_groups": oracle.dup_row_groups_sql(),
    "dup_table_relations": oracle.dup_table_relations_sql(),
    "dup_rows_planted": oracle.dup_rows_planted_sql(),
    "dup_row_groups_planted": oracle.dup_row_groups_planted_sql(),
    "dup_table_relations_planted": oracle.dup_table_relations_planted_sql(),
    "dup_groups_planted": oracle.dup_groups_planted_sql(),
    "get_table_pivot": oracle.get_table_pivot_sql("nation"),
    "k_anonymity": oracle.k_anonymity_sql(k=10),
    "k_suppress": oracle.k_suppress_sql(k=10),
    "dp_group_counts": oracle.dp_counts_sql(epsilon=1.0, seed="dp"),
    "dp_group_sums": oracle.dp_sums_sql(
        lo=0.0, hi=10_000.0, epsilon=1.0, seed="dp-sum"
    ),
    "add_external_features": oracle.add_external_features_sql(),
    "enrichment_features": oracle.cocoa_multicolumn_sql(
        "customer", ["c_custkey"], "c_acctbal", ["c_custkey"],
        k=5, k_c=500, k_features=10, materialize=True,
    ),
    "mate_join_search_linear": oracle.mate_join_search_sql(
        "customer", ["c_custkey"], ["c_custkey"], k=10, k_c=500
    ),
    "mate_join_search_bloom": oracle.mate_join_search_sql(
        "customer", ["c_custkey"], ["c_custkey"], k=10, k_c=500
    ),
    "dedup_exact": oracle.dedup_exact_sql(),
    "dedup_earliest": """
SELECT doc_id, n_chars
FROM (SELECT doc_id, n_chars,
             row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
      FROM documents)
WHERE rn = 1
""",
    "dedup_minhash_lsh": oracle.dedup_minhash_lsh_sql(threshold=0.7),
    "dedup_source_matrix": oracle.dedup_source_matrix_sql(threshold=0.7),
    "dedup_neardup_est": oracle.dedup_neardup_est_sql(threshold=0.5),
    "dedup_minhash_clusters": oracle.dedup_clusters_sql(threshold=0.7),
    # distributed CC must produce the identical cluster table
    "dedup_clusters_distributed": oracle.dedup_clusters_sql(threshold=0.7),
    "dedup_ngram_jaccard": oracle.dedup_ngram_jaccard_sql(threshold=0.7),
    "dedup_ngram_capped": oracle.dedup_ngram_capped_sql(threshold=0.7, max_freq=50),
    "dedup_containment": oracle.dedup_containment_sql(threshold=0.8, max_freq=500),
    "dedup_recall_report": oracle.dedup_recall_report_sql(threshold=0.7),
    "dedup_subset": oracle.dedup_subset_sql(threshold=0.8, max_freq=500),
    "dedup_repeated_spans": oracle.dedup_repeated_spans_sql(REPEAT_SPAN),
    "dedup_span_removal": oracle.dedup_span_removal_sql(REPEAT_SPAN),
    "dedup_cross_spans": oracle.dedup_cross_spans_sql(XSPAN_Q1, XSPAN_Q2),
    "decontaminate_spans": oracle.decontaminate_spans_sql(XSPAN_Q1, XSPAN_Q2),
    "dedup_self_spans": oracle.dedup_self_spans_sql(SELF_SENT),
    "dedup_self_removal": oracle.dedup_self_removal_sql(SELF_SENT),
    "contamination_report": oracle.contamination_report_sql(XSPAN_Q1, XSPAN_Q2),
    "dedup_chunks": oracle.dedup_chunks_sql(chunk_words=4, min_doc_freq=2),
    "fuzzy_join_names": oracle.fuzzy_join_names_sql(max_distance=1),
    "entity_resolution": oracle.entity_resolution_sql(max_distance=1),
    "fs_record_linkage": oracle.fs_record_linkage_sql(),
    "text_simhash": oracle.text_simhash_sql(),
    "dedup_simhash": oracle.dedup_simhash_sql(max_hamming=8),
    "graph_triangles": oracle.graph_triangles_sql(max_hamming=8),
    "graph_clustering": oracle.graph_clustering_sql(max_hamming=8),
    "dedup_embedding_cosine": oracle.dedup_embedding_cosine_sql(threshold=0.4, n_planes=4),
    "ann_cosine_topk": oracle.ann_cosine_topk_sql(k=5, n_queries=10),
    "ann_hard_negatives": oracle.ann_hard_negatives_sql(),
    "ann_knn_classify": oracle.ann_knn_classify_sql(k=5, n_queries=10),
    "ann_cluster_purity": oracle.ann_cluster_purity_sql(n_centroids=16),
    "ann_ivf_topk": oracle.ann_ivf_topk_sql(k=5, n_queries=10),
    "ann_knn_graph": oracle.ann_knn_graph_sql(k=5),
    "ml_embedding_cov": oracle.embedding_covariance_sql(),
    "ml_pca_identity": oracle.pca_identity_sql(n_components=8),
    "ann_recall_report": oracle.ann_recall_report_sql(k=5, n_queries=10),
    # identical contract to the inline path — same oracle
    "ann_ivf_indexed": oracle.ann_ivf_topk_sql(k=5, n_queries=10),
    "ann_quantized_topk": oracle.ann_quantized_topk_sql(k=5, n_queries=10),
    "ann_lsh_topk": oracle.ann_lsh_topk_sql(k=5, n_queries=10, n_planes=6, dim=64),
    "ann_lsh_multiprobe_topk": oracle.ann_lsh_multiprobe_topk_sql(
        k=5, n_queries=10, n_tables=4, n_planes=6, dim=64
    ),
    "corpus_prep": oracle.corpus_prep_sql(),
    "corpus_prep_full": oracle.corpus_prep_full_sql(),
    "corpus_prep_v2": oracle.corpus_prep_v2_sql(modulus=DECONTAM_MODULUS),
    "text_token_counts": oracle.text_token_counts_sql(),
    "text_bpe_counts": oracle.text_bpe_counts_sql(n_merges=64),
    "corpus_budget_select": oracle.corpus_budget_select_sql(budget=20_000),
    "text_quality": oracle.text_quality_sql(),
    "text_langid": oracle.text_langid_sql(),
    "text_fingerprint": oracle.text_fingerprint_sql(),
    "text_pii_scrub": oracle.text_pii_scrub_sql(),
    "text_repetition": oracle.text_repetition_sql(),
    "text_content_type": oracle.text_content_type_sql(),
    "web_canonical_urls": oracle.web_canonical_sql(),
    "web_domain_stats": oracle.web_domain_stats_sql(),
    "web_blocklist": oracle.web_blocklist_sql(WEB_BLOCKLIST),
    "web_extract_links": oracle.web_extract_links_sql(),
    "web_link_census": oracle.web_link_census_sql(),
    "web_domain_cap": oracle.web_domain_cap_sql(cap=25),
    "events_dedup_bursts": oracle.events_dedup_bursts_sql(BURST_TOLERANCE_US),
    "events_attribution": oracle.events_attribution_sql(7_200_000_000),
    "events_interval_pairs": oracle.events_interval_pairs_sql(7_200_000_000),
    "export_balanced_shards": oracle.export_balanced_shards_sql(n_shards=8),
    "corpus_group_split": oracle.corpus_group_split_sql(),
    "corpus_pipeline_census": oracle.corpus_pipeline_census_sql(),
    "events_trend": oracle.events_trend_sql(TREND_X_ORIGIN_US),
    "column_quantile_buckets": oracle.column_quantile_buckets_sql(nbuckets=8),
    "column_chi2": oracle.column_chi2_sql("lang", "source"),
    "export_shard_manifest": oracle.export_shard_manifest_sql(n_shards=8),
    "export_shard_fingerprints": oracle.export_shard_fingerprints_sql(n_shards=8),
    "text_script_ratios": oracle.text_script_ratios_sql(),
    "text_keywords": oracle.text_keywords_sql(k=3),
    "text_entropy": oracle.text_entropy_sql(),
    "corpus_sample": oracle.corpus_sample_sql(CORPUS_SAMPLE_FRACTIONS),
    "corpus_pack": oracle.corpus_pack_sql(token_budget=2048),
    "multimodal_features": oracle.multimodal_features_sql(),
    "multimodal_pixel_stats": oracle.multimodal_pixel_stats_sql(),
    "multimodal_jpeg_pixel_stats": oracle.multimodal_jpeg_pixel_stats_sql(),
    "multimodal_frame_stats": oracle.multimodal_frame_stats_sql(),
    "multimodal_sample_stats": oracle.multimodal_sample_stats_sql(),
    "multimodal_metadata": oracle.multimodal_metadata_sql(),
    "events_window_agg": oracle.events_window_agg_sql(),
    "events_sessionize": oracle.events_sessionize_sql(gap_seconds=1800),
    "events_json_extract": oracle.events_json_extract_sql(),
    "events_json_profile": oracle.events_json_profile_sql(),
    "decontaminate": oracle.decontaminate_sql(
        n=5, min_overlap=3, modulus=DECONTAM_MODULUS
    ),
    "bm25_topk": oracle.bm25_topk_sql(BM25_QUERY_TERMS, k=10),
    "tfidf_topk": oracle.tfidf_topk_sql(BM25_QUERY_TERMS, k=10),
    "events_asof_join": oracle.events_asof_join_sql(),
    "events_scd2": oracle.events_scd2_sql(),
    "events_transitions": oracle.events_transitions_sql(),
    "events_item_pairs": oracle.events_item_pairs_sql(min_support=2),
    "fk_sample": oracle.fk_sample_sql(fraction=0.1),
    "governance_pseudonymize": oracle.governance_pseudonymize_sql(GOV_PSEUDO_SECRET),
    "governance_k_anonymity": oracle.governance_k_anonymity_sql(k=5),
    "corpus_delivery": oracle.corpus_delivery_sql(n_shards=8),
    "skew_report": oracle.skew_report_sql(),
    "corpus_data_card": oracle.corpus_data_card_sql(),
    "text_paragraph_filter": oracle.text_paragraph_filter_sql(),
    "text_c4_filters": oracle.text_c4_filters_sql(),
    "events_seasonality": oracle.events_seasonality_sql(),
    "events_session_paths": oracle.events_session_paths_sql(gap_seconds=1800, n=3, k=20),
    "events_anomaly_seasonal": oracle.events_anomaly_seasonal_sql(),
    "events_concurrency": oracle.events_concurrency_sql(gap_seconds=1800),
    "events_twap": oracle.events_twap_sql(),
    "ann_centroids": oracle.embedding_centroids_sql(),
    "semantic_dedup": oracle.semantic_dedup_sql(n_centroids=16, threshold=0.4),
    "corpus_mix": oracle.corpus_mix_sql(alpha=0.5, max_repeat=4.0),
    "corpus_chunk": oracle.corpus_chunk_sql(chunk_tokens=64, overlap=16),
    "events_range_join": oracle.events_range_join_sql(window_us=RANGE_JOIN_WINDOW_US),
    # identical contract to the inline path — same oracle
    "bm25_indexed": oracle.bm25_topk_sql(BM25_QUERY_TERMS, k=10),
    "events_funnel": oracle.events_funnel_sql(FUNNEL_STEPS),
    "vocab_topk": oracle.vocab_topk_sql(k=50),
    "corpus_split": oracle.corpus_split_sql(),
    "ann_pq_topk": oracle.ann_pq_topk_sql(k=5, n_queries=10, m=4, ksub=16),
    "events_rollup": oracle.events_rollup_sql(),
    "column_top_values": oracle.column_top_values_sql(k=3, min_count=2),
    "hybrid_rrf": oracle.hybrid_rrf_sql(
        BM25_QUERY_TERMS, query_vec_id=0, k=10, k_each=20
    ),
    "events_cohort": oracle.events_cohort_sql(),
    "events_anomaly": oracle.events_anomaly_sql(),
    "graph_pagerank": oracle.graph_pagerank_sql(damping=0.85, iters=6, threshold=0.7),
    "graph_hits": oracle.graph_hits_sql(iters=4),
    "graph_ppr": oracle.graph_ppr_sql(iters=6),
    "events_rolling": oracle.events_rolling_sql(window_rows=3),
    "lake_validate": oracle.lake_validate_sql(total_cap=300_000.0),
    "inclusion_deps": oracle.inclusion_deps_sql(),
    "join_paths": oracle.join_paths_sql(src_table=6, dst_table=0, max_hops=4),
    "column_minhash": oracle.column_minhash_sql(k=16),
    "profile_drift": oracle.profile_drift_sql(nbins=10, shift=50),
    "profile_psi": oracle.profile_psi_sql(nbins=10, shift=50),
    "embedding_drift": oracle.embedding_drift_sql(plant_shift=0.35),
    "functional_deps": oracle.functional_deps_sql(),
    "join_cardinalities": oracle.join_cardinalities_sql(),
    "column_histograms": oracle.column_histograms_sql(nbins=10),
    "union_search": oracle.union_search_sql(
        TESTDATA_LAKE_SPEC["customer"].table_id, k=10
    ),
    "union_search_recall": oracle.union_search_recall_sql(
        TESTDATA_LAKE_SPEC["customer"].table_id, k=10
    ),
    "semantic_types": oracle.semantic_types_sql(
        "orders",
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
         "o_orderdate", "o_orderpriority"],
    ),
    "events_growth": oracle.events_growth_sql(),
    "events_resample": oracle.events_resample_sql(),
    "text_tfidf_sim": oracle.text_tfidf_pairs_sql(threshold=0.5),
    "column_outliers": oracle.column_outliers_sql(),
    "discovery_domains": oracle.domain_clusters_sql(),
    # per-query twin of the batch: each member reuses the trusted
    # single-query oracle under its query_id tag
    "mate_join_search_batch": (
        "SELECT 'cust' AS query_id, * FROM ("
        + oracle.mate_join_search_sql("customer", ["c_custkey"], ["c_custkey"], k=10, k_c=500)
        + ") UNION ALL SELECT 'ord' AS query_id, * FROM ("
        + oracle.mate_join_search_sql("orders", ["o_orderkey"], ["o_orderkey"], k=10, k_c=500)
        + ")"
    ),
    "corpus_sample_exact": oracle.corpus_sample_exact_sql(n_per_stratum=20),
    "events_cube": oracle.events_cube_sql(),
    "union_search_sketch": oracle.union_search_approx_sql(
        TESTDATA_LAKE_SPEC["customer"].table_id, k=10, sig_k=32, bands=8
    ),
    "ann_ivf_pq": oracle.ann_ivf_pq_topk_sql(
        k=5, n_queries=10, n_centroids=16, n_probe=4, m=4, ksub=16
    ),
    "events_anomaly_running": oracle.events_anomaly_running_sql(z_threshold=3.0),
    "corpus_sample_weighted": oracle.corpus_sample_weighted_sql(k=100),
    "dedup_embedding_multiprobe": oracle.dedup_embedding_multiprobe_sql(
        threshold=0.4, n_tables=4, n_planes=6, dim=64
    ),
    "text_unigram_logprob": oracle.text_unigram_logprob_sql(),
    "text_bigram_logprob": oracle.text_bigram_logprob_sql(k_smooth=0.5),
    "text_pmi": oracle.text_pmi_sql(),
    "winsorize_stats": oracle.winsorize_stats_sql(p_low=0.01, p_high=0.99),
    "ml_corr_matrix": oracle.correlation_matrix_sql(),
    "ml_robust_scale": oracle.robust_scale_stats_sql(),
    "ml_target_encode": oracle.target_encode_sql(n_folds=5, smoothing=20.0),
    "text_canonicalize": oracle.text_canonicalize_sql(),
    "tables_with_all_tokens": oracle.tables_with_all_tokens_sql(
        ["FURNITURE", "BUILDING"]
    ),
    "dedup_keep_best": oracle.dedup_keep_best_sql(threshold=0.7),
    "corpus_prep_v3": oracle.corpus_prep_v3_sql(
        quality_min=V3_QUALITY_MIN, logprob_min=V3_LOGPROB_MIN
    ),
    "corpus_audit": oracle.corpus_audit_sql(
        quality_min=V3_QUALITY_MIN, logprob_min=V3_LOGPROB_MIN
    ),
    "text_quality_normalized": oracle.text_quality_normalized_sql(),
    "ml_cv_folds": oracle.ml_cv_folds_sql(k=5),
    "corpus_diff": oracle.snapshot_diff_sql(),
    "ann_range_search": oracle.ann_range_search_sql(
        threshold=0.2, k_cap=100, n_queries=10
    ),
    "corpus_diff_census": oracle.snapshot_diff_census_sql(),
    "ann_range_blocked": oracle.ann_range_blocked_sql(
        threshold=0.2, k_cap=100, n_queries=10, n_planes=6, dim=64
    ),
    "graph_link_prediction": oracle.graph_link_prediction_sql(max_hamming=8),
    "graph_kcore": oracle.graph_kcore_sql(k=2, rounds=8, max_hamming=8),
    "column_moments": oracle.column_moments_sql(),
    "column_benford": oracle.benford_audit_sql(),
    "profile_ks_drift": oracle.ks_drift_sql(
        "lineitem", "l_returnflag = \'R\'", KS_DRIFT_COLUMNS
    ),
    "events_forecast_backtest": oracle.rolling_forecast_backtest_sql(window_rows=5),
    "events_holt": oracle.holt_forecast_sql(),
    "events_decay_stats": oracle.decay_weighted_stats_sql(),
    "events_theil_sen": oracle.theil_sen_trend_sql(),
    "events_mann_kendall": oracle.mann_kendall_trend_sql(),
    "events_mwu": oracle.mann_whitney_u_sql(),
    "text_normalize": oracle.normalize_text_sql(),
    "text_zipf": oracle.zipf_fit_sql(top_n=1000),
    "text_readability": oracle.readability_scores_sql(),
    "events_survival": oracle.survival_curve_sql(),
    "column_mutual_info": oracle.categorical_mutual_info_sql("lang", "source"),
    "events_ab_test": oracle.ab_conversion_test_sql(),
    "events_ab_cuped": oracle.ab_cuped_test_sql(),
    "events_funnel_timing": oracle.funnel_timing_sql(list(FUNNEL_STEPS)),
    "corpus_drop_audit": oracle.corpus_drop_audit_sql(),
    "corpus_novelty": oracle.doc_novelty_sql(n=3, modulus=6),
    "corpus_pareto": oracle.pareto_report_sql(),
    "events_scd2_lookup": oracle.scd2_lookup_sql(),
    "events_rfm": oracle.rfm_segments_sql(),
    "events_xcorr": oracle.rate_cross_correlation_sql("signup", "purchase"),
    "events_absorption": oracle.markov_absorption_sql(),
    "events_removal_effects": oracle.markov_removal_effects_sql(),
    "events_changepoint": oracle.cusum_changepoints_sql(
        plant_predicate="event_type <> 'click' OR epoch_us(ts) < (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 FROM events) OR event_id % 5 = 0"
    ),
    "graph_label_prop": oracle.graph_label_prop_sql(rounds=10, max_hamming=8),
    "graph_modularity": oracle.graph_modularity_sql(max_hamming=8),
    "column_percentiles": oracle.column_percentiles_sql(),
    "vocab_heavy_hitters": oracle.heavy_hitters_sql(m=200),
    "events_gap_stats": oracle.inter_arrival_stats_sql(),
    "events_wau": oracle.rolling_active_users_sql(window_periods=7),
    "governance_forget": oracle.cascade_forget_sql(modulus=37),
}


QUERIES["ann_mmr_topk"] = q_ann_mmr_topk


ORACLES["ann_mmr_topk"] = oracle.ann_mmr_topk_sql(
    k=8, lam=0.7, candidates=40, n_queries=5
)


QUERIES["multimodal_audio_features"] = q_multimodal_audio_features


ORACLES["multimodal_audio_features"] = oracle.multimodal_audio_features_sql()


QUERIES["corpus_select_dsir"] = q_corpus_select_dsir


ORACLES["corpus_select_dsir"] = oracle.corpus_select_dsir_sql(
    fraction=0.25, n_buckets=256, alpha=0.5
)


QUERIES["corpus_pack_harmonic"] = q_corpus_pack_harmonic


QUERIES["corpus_pack_fill"] = q_corpus_pack_fill


ORACLES["corpus_pack_harmonic"] = oracle.corpus_pack_harmonic_sql(
    token_budget=64, salt_buckets=32
)


ORACLES["corpus_pack_fill"] = oracle.corpus_pack_fill_sql(
    token_budget=64, salt_buckets=32
)


QUERIES["text_gopher_filters"] = q_text_gopher_filters


QUERIES["text_dsir_weights"] = q_text_dsir_weights


QUERIES["ml_nb_langid"] = q_ml_nb_langid


ORACLES["text_gopher_filters"] = oracle.text_gopher_filters_sql(
    min_words=30, min_stopwords=1
)


ORACLES["text_dsir_weights"] = oracle.text_dsir_weights_sql(
    n_buckets=256, alpha=0.5
)


ORACLES["ml_nb_langid"] = oracle.ml_nb_langid_sql(n_buckets=512, alpha=1.0)


QUERIES["search_proximity"] = q_search_proximity


ORACLES["search_proximity"] = oracle.search_proximity_sql(BM25_QUERY_TERMS, k=10)


QUERIES["search_proximity_indexed"] = q_search_proximity_indexed


ORACLES["search_proximity_indexed"] = oracle.search_proximity_sql(
    BM25_QUERY_TERMS, k=10
)


QUERIES["corpus_cluster_split"] = q_corpus_cluster_split


ORACLES["corpus_cluster_split"] = oracle.corpus_cluster_split_sql(
    train=0.8, val=0.1, threshold=0.7
)


QUERIES["ann_ivf_pq_refined"] = q_ann_ivf_pq_refined


ORACLES["ann_ivf_pq_refined"] = oracle.ann_ivf_pq_refined_sql(
    k=5, c_factor=3, n_queries=10, n_centroids=16, n_probe=4, m=4, ksub=16
)


QUERIES["dedup_incremental_neardup"] = q_dedup_incremental_neardup


ORACLES["dedup_incremental_neardup"] = oracle.dedup_incremental_neardup_sql(
    threshold=0.7
)


QUERIES["dedup_prefix_join"] = q_dedup_prefix_join


QUERIES["dedup_threshold_sweep"] = q_dedup_threshold_sweep


QUERIES["dedup_incremental"] = q_dedup_incremental


QUERIES["dedup_incremental_report"] = q_dedup_incremental_report


ORACLES["dedup_prefix_join"] = oracle.dedup_ngram_jaccard_sql(threshold=0.8)


ORACLES["dedup_threshold_sweep"] = oracle.dedup_threshold_sweep_sql()


ORACLES["dedup_incremental"] = oracle.dedup_incremental_sql()


ORACLES["dedup_incremental_report"] = oracle.dedup_incremental_report_sql(
    k_hashes=3, hex_len=3
)


QUERIES["ann_margin_mining"] = q_ann_margin_mining


ORACLES["ann_margin_mining"] = oracle.ann_margin_mining_sql(k=4, threshold=1.1)


QUERIES["ann_margin_blocked"] = q_ann_margin_blocked


ORACLES["ann_margin_blocked"] = oracle.ann_margin_blocked_sql(
    k=4, threshold=1.1, n_centroids=16, n_probe=2
)


QUERIES["ann_margin_rescore"] = q_ann_margin_rescore


ORACLES["ann_margin_rescore"] = oracle.ann_margin_rescore_sql(
    k=4, threshold=1.1, n_centroids=16, n_probe=2
)


QUERIES["ann_nn_descent"] = q_ann_nn_descent


ORACLES["ann_nn_descent"] = oracle.ann_nn_descent_sql(k=5)


QUERIES["ann_nn_descent2"] = q_ann_nn_descent2


QUERIES["text_kn_logprob"] = q_text_kn_logprob


ORACLES["text_kn_logprob"] = oracle.text_kn_logprob_sql(discount=0.75)


QUERIES["corpus_select_ppl"] = q_corpus_select_ppl


ORACLES["corpus_select_ppl"] = oracle.corpus_select_ppl_sql(
    n_buckets=3, discount=0.75
)


QUERIES["text_ppl_buckets"] = q_text_ppl_buckets


ORACLES["text_ppl_buckets"] = oracle.text_ppl_buckets_sql(
    n_buckets=3, discount=0.75
)


QUERIES["vocab_growth"] = q_vocab_growth


QUERIES["vocab_heaps_fit"] = q_vocab_heaps_fit


ORACLES["vocab_growth"] = oracle.vocab_growth_curve_sql(interval=10)


ORACLES["vocab_heaps_fit"] = oracle.vocab_heaps_fit_sql(interval=10)


QUERIES["corpus_boiler_by_source"] = q_corpus_boiler_by_source


ORACLES["corpus_boiler_by_source"] = oracle.corpus_boilerplate_by_source_sql(
    min_docs=2
)


ORACLES["ann_nn_descent2"] = oracle.ann_nn_descent_sql(k=5, rounds=2)


QUERIES["ml_embedding_isotropy"] = q_ml_embedding_isotropy


ORACLES["ml_embedding_isotropy"] = oracle.ml_embedding_isotropy_sql()


QUERIES["ml_nb_calibration"] = q_ml_nb_calibration


ORACLES["ml_nb_calibration"] = oracle.ml_nb_calibration_sql(
    n_buckets=512, alpha=1.0, bin_width=2.0, n_bins=16
)


QUERIES["text_boilerplate_lines"] = q_text_boilerplate_lines


QUERIES["text_line_dedup"] = q_text_line_dedup


ORACLES["text_boilerplate_lines"] = oracle.text_boilerplate_lines_sql(min_docs=2)


ORACLES["text_line_dedup"] = oracle.text_line_dedup_sql(min_docs=2)


_DRIVER_PRIORITY: list[str] = [
    # reference core: cell index (pinned)
    "index_cells",
    # MATE joinability search (the reference's headline operator, pinned)
    "mate_join_search_single",
    "mate_join_search_multi",
    "mate_join_search_triple",
    "mate_join_search_bloom",
    # COCOA correlation enrichment (pinned)
    "cocoa_enrich",
    "cocoa_enrich_multicolumn",
    # duplicate detection (planted variants grade non-vacuously, pinned)
    "dup_row_groups_planted",
    "dup_table_relations_planted",
    "dup_groups_planted",
    # reconstruction (pinned)
    "get_table_pivot",
    # one pinned flagship per pipeline family (trimmed to 15 pins total
    # per the r6 verdict: dedup_exact / ann_cosine_topk / text_quality
    # have each been driver-graded in multiple rounds — their slots now
    # rotate, and their families stay pinned via corpus_prep_full /
    # multimodal / events / graph below plus the r7 additions)
    "corpus_prep_full",
    "multimodal_features",
    "events_window_agg",
    "graph_pagerank",
    # --- rotating slots: never-driver-graded keys (round-9 batch) ---
    # the r8-verdict backlog (PLANS.md "Round 9 rotation backlog"): the
    # ANN/discovery reps, the corpus lifecycle, events depth, the text
    # quality family, and the multimodal/fk/lake stragglers.  The
    # backlog named 36 keys for 35 slots; corpus_sample defers to r10
    # (its family is graded here via _exact and _weighted).  Keys
    # rotated OUT remain strict-green in the full-registry sf0.01
    # sweep and prior CORRECTNESS_r files.
    "ann_knn_classify",
    "ann_cluster_purity",
    "ann_ivf_indexed",
    "ann_quantized_topk",
    "ann_lsh_multiprobe_topk",
    "ann_centroids",
    "ann_knn_graph",
    "ann_recall_report",
    "ann_range_blocked",
    "dedup_embedding_multiprobe",
    # corpus lifecycle
    "corpus_prep_v2",
    "corpus_budget_select",
    "corpus_sample_exact",
    "corpus_sample_weighted",
    "corpus_pack",
    "corpus_chunk",
    "corpus_split",
    "corpus_data_card",
    # events depth
    "events_seasonality",
    "events_twap",
    "events_xcorr",
    "events_mann_kendall",
    "events_decay_stats",
    "events_forecast_backtest",
    # text quality family
    "text_repetition",
    "text_content_type",
    "text_script_ratios",
    "text_keywords",
    "text_entropy",
    "text_readability",
    "text_c4_filters",
    # multimodal / fk / lake stragglers
    "multimodal_jpeg_pixel_stats",
    "multimodal_sample_stats",
    "fk_sample",
    "lake_validate",
]


from datalake_indexes_spark.plans.queries._q_multimodal import (  # noqa: E402
    q_multimodal_cmyk_pixel_stats,
)

QUERIES["multimodal_cmyk_pixel_stats"] = q_multimodal_cmyk_pixel_stats
ORACLES["multimodal_cmyk_pixel_stats"] = oracle.multimodal_cmyk_pixel_stats_sql()


def _reorder(d: dict) -> dict:
    head = {k: d[k] for k in _DRIVER_PRIORITY if k in d}
    return head | {k: v for k, v in d.items() if k not in head}


QUERIES = _reorder(QUERIES)


ORACLES = _reorder(ORACLES)


