"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship extraction job on sf0.001.
``queries()``/``oracle_sql()`` — one entry per implemented operator
family from SURVEY.md §2 plus the training-data-pipeline operators;
the driver cross-checks each against DuckDB at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from ocrd_segment_spark import contract as C
from ocrd_segment_spark import contract_levels as L
from ocrd_segment_spark import contract_graph as G
from ocrd_segment_spark import contract_ml as M
from ocrd_segment_spark import contract_web as WB
from ocrd_segment_spark import contract_ingest as I
from ocrd_segment_spark import contract_pages as PG
from ocrd_segment_spark.pipeline import extract_pages


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: segment SQL-synthesized Common-Crawl-style pages with
    the frozen kernel (boilerplate nav + link-farm dropped, heading +
    body kept in reading order), then per-lang extraction metrics."""
    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages = docs.select(
        F.col("doc_id").cast("string").alias("url"),
        F.expr(
            "concat('<html><body>"
            "<nav><ul><li><a href=\"/m\">menu one</a> <a href=\"/n\">menu two</a></li></ul></nav>"
            "<h1>', source, '</h1>"
            "<p><a href=\"/q\">', source, ' ', source, '</a></p>"
            "<p>', text, '</p></body></html>')"
        ).cast("binary").alias("html"),
    )
    out = extract_pages(pages)
    joined = out.join(
        docs.select(F.col("doc_id").cast("string").alias("url"), "lang"), "url"
    )
    return joined.groupBy("lang").agg(
        F.count("*").alias("pages"),
        F.sum(F.col("lineage.n_kept").cast("long")).alias("regions_kept"),
        F.sum(F.col("lineage.n_dropped").cast("long")).alias("regions_dropped"),
        F.sum(F.col("lineage.parse_failed").cast("long")).alias("parse_failures"),
        F.sum(F.length("extracted_text").cast("long")).alias("total_chars"),
    )


_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # extraction kernel (S1/S7/P1/P5/W1/J2/G17 composition)
    "extract_single_para": C.q_extract_single_para,
    "extract_boiler_reading_order": C.q_extract_boiler_reading_order,
    "extract_containment_repair": C.q_extract_containment_repair,
    "extract_region_spans": C.q_extract_region_spans,
    # geometry / repair family
    "g7_consistency_clip": C.q_g7_consistency_clip,
    "g9_simplify_gap_merge": C.q_g9_simplify_gap_merge,
    "j2_overlap_theta_join": C.q_j2_overlap_theta_join,
    "j6_iou_match": C.q_j6_iou_match,
    "plausibilize_kernel": C.q_plausibilize_kernel,
    # windows
    "w1_reading_order": C.q_w1_reading_order,
    "w2_rerank_after_delete": C.q_w2_rerank_after_delete,
    "w5_score_stable_sort": C.q_w5_score_stable_sort,
    # joins
    "j1_full_outer_align": C.q_j1_full_outer_align,
    "j4_key_fallback_join": C.q_j4_key_fallback_join,
    "j5_suffix_match_join": C.q_j5_suffix_match_join,
    "j6_anti_semi_misses": C.q_j6_anti_semi_misses,
    "j7_reading_order_ref_join": C.q_j7_reading_order_ref_join,
    # aggregations
    "a1_a2_match_stats": C.q_a1_a2_match_stats,
    "a4_median_scale": C.q_a4_median_scale,
    "a6_dense_ids": C.q_a6_dense_ids,
    "a7_category_vocab": C.q_a7_category_vocab,
    "a8_level_accounting": C.q_a8_level_accounting,
    "s4_collect_group": C.q_s4_collect_group,
    "a_pricing_summary": C.q_a_pricing_summary,
    # scalar function families
    "p4_textequiv_select": C.q_p4_textequiv_select,
    "misc_scalar_functions": C.q_misc_scalar_functions,
    # COCO export + replace-text modules
    "coco_export_annotations": C.q_coco_export_annotations,
    "replace_text_accounting": C.q_replace_text_accounting,
    # evaluate-analog module (operators/evaluate.py)
    "eval_per_image_stats": C.q_eval_per_image_stats,
    "eval_per_cat_micro": C.q_eval_per_cat_micro,
    # dedup / training-data ops
    "dedup_exact": M.q_dedup_exact,
    "dedup_ngram_jaccard": M.q_dedup_ngram_jaccard,
    "dedup_minhash_lsh": M.q_dedup_minhash_lsh,
    "dedup_minhash_capped": M.q_dedup_minhash_capped,
    "dedup_jaccard_verify": M.q_dedup_jaccard_verify,
    "dedup_simhash": M.q_dedup_simhash,
    "fingerprint_rolling": M.q_fingerprint_rolling,
    "dedup_components": M.q_dedup_components,
    "embed_cosine_neardup": M.q_embed_cosine_neardup,
    "skew_salted_host_agg": M.q_skew_salted_host_agg,
    # text analysis
    "lang_id_heuristic": M.q_lang_id_heuristic,
    "lang_id_ngram": M.q_lang_id_ngram,
    "langid_confusion": M.q_langid_confusion,
    "quality_score": M.q_quality_score,
    "quality_classifier": M.q_quality_classifier,
    "token_count": M.q_token_count,
    "token_count_bpe": M.q_token_count_bpe,
    # similarity search
    "ann_cosine_topk": M.q_ann_cosine_topk,
    "ann_lsh_buckets": M.q_ann_lsh_buckets,
    "ann_ivf_assign": M.q_ann_ivf_assign,
    "ann_ivf_incremental": M.q_ann_ivf_incremental,
    # multimodal + event-time windows
    "multimodal_meta": M.q_multimodal_meta,
    "events_hourly_window": M.q_events_hourly_window,
    "session_windows": M.q_session_windows,
    "sliding_window_counts": M.q_sliding_window_counts,
    "tfidf_top_terms": M.q_tfidf_top_terms,
    "ann_kmeans_iterations": M.q_ann_kmeans_iterations,
    # deterministic sampling / leakage-safe splits
    "sample_hash_deterministic": M.q_sample_hash_deterministic,
    "sample_stratified": M.q_sample_stratified,
    "split_leakage_safe": M.q_split_leakage_safe,
    "domain_cap_sample": M.q_domain_cap_sample,
    "token_budget_sample": M.q_token_budget_sample,
    "token_budget_stratified": M.q_token_budget_stratified,
    "host_blocklist": M.q_host_blocklist,
    "gopher_quality_rules": M.q_gopher_quality_rules,
    "paragraph_dedup": M.q_paragraph_dedup,
    "span_preserving_cleanup": M.q_span_preserving_cleanup,
    "within_doc_dedup": M.q_within_doc_dedup,
    "url_canonicalize": M.q_url_canonicalize,
    "pii_redaction": M.q_pii_redaction,
    "pii_redaction_spans": M.q_pii_redaction_spans,
    "decontaminate_benchmark": M.q_decontaminate,
    "ann_ivf_search": M.q_ann_ivf_search,
    "ann_recall_audit": M.q_ann_recall_audit,
    "domain_stats": M.q_domain_stats,
    "domain_blocklist": M.q_domain_blocklist,
    "nfc_normalization": M.q_nfc_normalization,
    "dedup_incremental_merge": M.q_dedup_incremental_merge,
    "dedup_cross_candidates": M.q_dedup_cross_candidates,
    "dedup_lsh_incremental": M.q_dedup_lsh_incremental,
    "char_entropy": M.q_char_entropy,
    "lm_bigram_score": M.q_lm_bigram_score,
    "lm_perlang_score": M.q_lm_perlang_score,
    "ccnet_buckets": M.q_ccnet_buckets,
    "corpus_card": M.q_corpus_card,
    "compression_ratio": M.q_compression_ratio,
    "dedup_exact_substring": M.q_dedup_exact_substring,
    # hierarchy levels (extract_lines/words/glyphs analogs) + inheritance
    "extract_word_spans": L.q_extract_word_spans,
    "extract_word_spans_multi": L.q_extract_word_spans_multi,
    "word_reconstruct_digest": L.q_word_reconstruct_digest,
    # S5 from-masks analog: label-run segmentation import
    "s5_label_segmentation": L.q_s5_label_segmentation,
    # ocrd-segment-project analog: per-level hull shrink
    "project_hull_roundtrip": L.q_project_hull_roundtrip,
    # S11 xlsx-sink analog: editable GT review table
    "s11_gt_review_table": L.q_s11_gt_review_table,
    "extract_line_spans": L.q_extract_line_spans,
    "extract_glyph_spans": L.q_extract_glyph_spans,
    "inherit_fallback_chain": L.q_inherit_fallback_chain,
    # formerly pytest-only §2 operators
    "s10_byte_digest": L.q_s10_byte_digest,
    "a9_unaccounted_audit": L.q_a9_unaccounted_audit,
    "g2_make_valid": L.q_g2_make_valid,
    "g3_join_hull": L.q_g3_join_hull,
    "g10_spread": L.q_g10_spread,
    "g13_predicates": L.q_g13_predicates,
    # COCO AP/AR summary + frame rebase
    "eval_map_summary": L.q_eval_map_summary,
    # foreground-masked (only-fg) evaluation
    "eval_only_fg": L.q_eval_only_fg,
    "replace_rebase_roundtrip": L.q_replace_rebase_roundtrip,
    # non-text (media) region candidates
    "extract_media_regions": L.q_extract_media_regions,
    # nested reading-order groups (flat adjacency encoding)
    "reading_order_groups": L.q_reading_order_groups,
    # S13 colordict sink + S2/P5 feature chains
    "s13_colordict": L.q_s13_colordict,
    "s2_feature_chain": L.q_s2_feature_chain,
    # TextStyle runs from inline tags + CSS (kernel 1.5.0)
    "extract_style_runs": L.q_extract_style_runs,
    # dir/rtl reading-direction inheritance (orientation analog)
    "extract_reading_direction": L.q_extract_reading_direction,
    "extract_pre_verbatim": L.q_extract_pre_verbatim,
    # full from-coco processor (apply imported segmentation)
    "coco_apply_roundtrip": L.q_coco_apply_roundtrip,
    # TextEquiv history-preserving replace (insert at index 0)
    "replace_textequiv_history": L.q_replace_textequiv_history,
    # link graph / corpus layout (contract_graph.py)
    "outlink_host_edges": G.q_outlink_host_edges,
    "anchor_text_topk": G.q_anchor_text_topk,
    "linkgraph_pagerank": G.q_linkgraph_pagerank,
    "url_latest_snapshot": G.q_url_latest_snapshot,
    "dedup_keep_best": G.q_dedup_keep_best,
    "shard_by_tokens": G.q_shard_by_tokens,
    # head metadata: canonical link + robots meta (operators/headmeta.py)
    "head_meta_harvest": G.q_head_meta_harvest,
    "canonical_collapse": G.q_canonical_collapse,
    # inverted index + BM25 retrieval (operators/index.py)
    "inverted_postings": G.q_inverted_postings,
    "bm25_topk": G.q_bm25_topk,
    # Bloom-filter url seen-set (operators/bloom.py)
    "bloom_seen_probe": G.q_bloom_seen_probe,
    # hreflang translation clusters (operators/headmeta.py)
    "hreflang_clusters": G.q_hreflang_clusters,
    # robots.txt parsing + frontier filter (operators/robots.py)
    "robots_rules_parse": G.q_robots_rules_parse,
    "robots_frontier_filter": G.q_robots_frontier_filter,
    # descriptive page metadata (operators/headmeta.page_meta)
    "page_meta_harvest": G.q_page_meta_harvest,
    # packed training sequences (operators/sampling.pack_sequences)
    "pack_sequences": G.q_pack_sequences,
    # incremental postings extension (operators/index.index_add_batch)
    "index_add_batch": G.q_index_add_batch,
    # Dolma-style unit-grain bloom dedup (operators/bloom.py)
    "paragraph_bloom_flags": G.q_paragraph_bloom_flags,
    # cross-snapshot corpus diff (operators/snapshots.py)
    "corpus_diff": G.q_corpus_diff,
    # sitemap harvesting + robots Sitemap: directives (operators/sitemaps.py)
    "sitemap_harvest": G.q_sitemap_harvest,
    "robots_sitemaps": G.q_robots_sitemaps,
    # span-preserving sentence segmentation (operators/sentences.py)
    "sentence_spans": G.q_sentence_spans,
    # BPE merge training (operators/bpe.train_merges)
    "bpe_train_merges": G.q_bpe_train_merges,
    # charset sniffing (functions/charset.py)
    "charset_sniff": G.q_charset_sniff,
    # typographic punctuation fold (functions/normalize.py)
    "punct_fold": G.q_punct_fold,
    # robots crawl-delay harvest (operators/robots.crawl_delays)
    "robots_crawl_delay": G.q_robots_crawl_delay,
    # temperature-based language mixture weights (operators/sampling)
    "lang_mixture_weights": G.q_lang_mixture_weights,
    # reciprocal-link fraction (operators/linkgraph)
    "link_reciprocity": G.q_link_reciprocity,
    # positional postings + exact phrase retrieval (operators/index)
    "positional_postings": G.q_positional_postings,
    "phrase_topk": G.q_phrase_topk,
    # warm-started PageRank (incremental crawl-over-crawl re-rank)
    "pagerank_warm_start": G.q_pagerank_warm_start,
    # sketches / scheduling / structured data (session 4)
    "hll_host_cardinality": WB.q_hll_host_cardinality,
    "hll_merge_parity": WB.q_hll_merge_parity,
    "cms_heavy_hitters": WB.q_cms_heavy_hitters,
    "hits_scores": WB.q_hits_scores,
    "crawl_wave_plan": WB.q_crawl_wave_plan,
    "jsonld_types": WB.q_jsonld_types,
    "index_delete_parity": WB.q_index_delete_parity,
    "content_type_sniff": WB.q_content_type_sniff,
    "epoch_shuffle": WB.q_epoch_shuffle,
    "mixture_sample": WB.q_mixture_sample,
    "lang_mix_stats": WB.q_lang_mix_stats,
    "warc_ingest": I.q_warc_ingest,
    "trustrank_scores": I.q_trustrank,
    "dedup_containment": I.q_dedup_containment,
    "hist_quantiles": I.q_hist_quantiles,
    "feed_harvest": I.q_feed_harvest,
    "redirect_resolve": I.q_redirect_resolve,
    "change_rates": G.q_change_rates,
    "feed_discovery": G.q_feed_discovery,
    "outlinks_nofollow": G.q_outlinks_nofollow,
    "sitemap_hints": G.q_sitemap_hints,
    "host_quality_priors": G.q_host_quality_priors,
    "low_quality_hosts": G.q_low_quality_hosts,
    "pq_adc_topk": M.q_pq_adc_topk,
    "ivfpq_search": M.q_ivfpq_search,
    "url_trap_templates": I.q_url_trap_templates,
    "pdf_text_extract": I.q_pdf_text_extract,
    "pdf_meta_links": I.q_pdf_meta_links,
    "warc_bytes_parity": I.q_warc_bytes_parity,
    "media_meta": I.q_media_meta,
    "semantic_dedup": M.q_semantic_dedup,
    "mirror_hosts": G.q_mirror_hosts,
    "c4_line_clean": M.q_c4_line_clean,
    "dsir_logweights": M.q_dsir_logweights,
    "dsir_select": M.q_dsir_select,
    # soft-404 / error-page detection (operators/softerrors.py)
    "soft404_flags": PG.q_soft404_flags,
    "soft404_host_rates": PG.q_soft404_host_rates,
    # HTML table extraction + markdown serialization (operators/tables.py)
    "html_table_cells": PG.q_html_table_cells,
    "tables_markdown": PG.q_tables_markdown,
    # Unicode script mix + homoglyph confusables (operators/scriptmix.py)
    "script_mix": PG.q_script_mix,
    # IDN-spoof host flags (functions/urls.with_host_script_flags)
    "host_confusables": PG.q_host_confusables,
    # heading outline / section tree (operators/outline.py)
    "heading_outline": PG.q_heading_outline,
    # publish-date harvest (operators/headmeta.with_publish_date)
    "publish_date_harvest": PG.q_publish_date,
    # list extraction + markdown bullets (operators/tables)
    "list_items_markdown": PG.q_list_items,
    # image-text pair harvest (operators/images.py)
    "image_text_pairs": PG.q_image_pairs,
    # noai / noimageai opt-out flags (operators/headmeta.with_ai_optout)
    "ai_optout_flags": PG.q_ai_optout,
    # figure captions + caption screen (operators/images)
    "caption_quality": PG.q_caption_quality,
}

_ORACLES: dict[str, str] = {
    "extract_single_para": C.O_EXTRACT_SINGLE_PARA,
    "extract_boiler_reading_order": C.O_EXTRACT_BOILER,
    "extract_containment_repair": C.O_EXTRACT_CONTAINMENT,
    "extract_region_spans": C.O_EXTRACT_SPANS,
    "g7_consistency_clip": C.O_G7_CLIP,
    "g9_simplify_gap_merge": C.O_G9_SIMPLIFY,
    "j2_overlap_theta_join": C.O_J2_OVERLAP,
    "j6_iou_match": C.O_J6_IOU,
    "plausibilize_kernel": C.O_PLAUSIBILIZE,
    "w1_reading_order": C.O_W1,
    "w2_rerank_after_delete": C.O_W2,
    "w5_score_stable_sort": C.O_W5,
    "j1_full_outer_align": C.O_J1,
    "j4_key_fallback_join": C.O_J4,
    "j5_suffix_match_join": C.O_J5,
    "j6_anti_semi_misses": C.O_J6_MISSES,
    "j7_reading_order_ref_join": C.O_J7,
    "a1_a2_match_stats": C.O_A1_A2,
    "a4_median_scale": C.O_A4,
    "a6_dense_ids": C.O_A6,
    "a7_category_vocab": C.O_A7,
    "a8_level_accounting": C.O_A8,
    "s4_collect_group": C.O_S4,
    "a_pricing_summary": C.O_PRICING,
    "p4_textequiv_select": C.O_P4_TEXTEQUIV,
    "misc_scalar_functions": C.O_MISC_SCALARS,
    "coco_export_annotations": C.O_COCO_EXPORT,
    "replace_text_accounting": C.O_REPLACE_TEXT,
    "eval_per_image_stats": C.O_EVAL_PER_IMAGE,
    "eval_per_cat_micro": C.O_EVAL_PER_CAT,
    "dedup_exact": M.O_DEDUP_EXACT,
    "dedup_ngram_jaccard": M.O_DEDUP_JACCARD,
    "dedup_minhash_lsh": M.O_DEDUP_MINHASH,
    "dedup_minhash_capped": M.O_DEDUP_MINHASH_CAPPED,
    "dedup_jaccard_verify": M.O_DEDUP_JACCARD_VERIFY,
    "dedup_simhash": M.O_DEDUP_SIMHASH,
    "fingerprint_rolling": M.O_FINGERPRINT,
    "dedup_components": M.O_DEDUP_COMPONENTS,
    "embed_cosine_neardup": M.O_EMBED_NEARDUP,
    "skew_salted_host_agg": M.O_SKEW_SALTED,
    "lang_id_heuristic": M.O_LANG_ID,
    "lang_id_ngram": M.O_LANG_ID_NGRAM,
    "langid_confusion": M.O_LANGID_CONFUSION,
    "quality_score": M.O_QUALITY,
    "quality_classifier": M.O_QUALITY_CLF,
    "token_count": M.O_TOKEN_COUNT,
    "token_count_bpe": M.O_TOKEN_BPE,
    "ann_cosine_topk": M.O_ANN_COSINE,
    "ann_lsh_buckets": M.O_ANN_LSH,
    "ann_ivf_assign": M.O_ANN_IVF,
    "ann_ivf_incremental": M.O_ANN_IVF_INCREMENTAL,
    "multimodal_meta": M.O_MULTIMODAL,
    "events_hourly_window": M.O_EVENTS_WINDOW,
    "session_windows": M.O_SESSION_WINDOWS,
    "sliding_window_counts": M.O_SLIDING_WINDOW,
    "tfidf_top_terms": M.O_TFIDF,
    "ann_kmeans_iterations": M.O_KMEANS,
    "sample_hash_deterministic": M.O_SAMPLE_HASH,
    "sample_stratified": M.O_SAMPLE_STRATIFIED,
    "split_leakage_safe": M.O_SPLIT_LEAKAGE,
    "domain_cap_sample": M.O_DOMAIN_CAP,
    "token_budget_sample": M.O_TOKEN_BUDGET,
    "token_budget_stratified": M.O_TOKEN_BUDGET_STRAT,
    "host_blocklist": M.O_HOST_BLOCKLIST,
    "gopher_quality_rules": M.O_GOPHER,
    "paragraph_dedup": M.O_PARAGRAPH_DEDUP,
    "span_preserving_cleanup": M.O_SPAN_CLEANUP,
    "within_doc_dedup": M.O_WITHIN_DEDUP,
    "url_canonicalize": M.O_URL_CANON,
    "pii_redaction": M.O_PII,
    "pii_redaction_spans": M.O_PII_SPANS,
    "decontaminate_benchmark": M.O_DECONTAMINATE,
    "ann_ivf_search": M.O_ANN_IVF_SEARCH,
    "ann_recall_audit": M.O_ANN_RECALL,
    "domain_stats": M.O_DOMAIN_STATS,
    "domain_blocklist": M.O_DOMAIN_BLOCKLIST,
    "nfc_normalization": M.O_NFC,
    "dedup_incremental_merge": M.O_DEDUP_MERGE,
    "dedup_cross_candidates": M.O_DEDUP_CROSS,
    "dedup_lsh_incremental": M.O_DEDUP_LSH_INCREMENTAL,
    "char_entropy": M.O_CHAR_ENTROPY,
    "lm_bigram_score": M.O_LM_BIGRAM,
    "lm_perlang_score": M.O_LM_PERLANG,
    "ccnet_buckets": M.O_CCNET_BUCKETS,
    "corpus_card": M.O_CORPUS_CARD,
    "dedup_exact_substring": M.O_DEDUP_SUBSTRING,
    "extract_word_spans": L.O_WORD_SPANS,
    "extract_word_spans_multi": L.O_WORD_SPANS_MULTI,
    "word_reconstruct_digest": L.O_WORD_RECONSTRUCT,
    "s5_label_segmentation": L.O_S5_LABELS,
    "project_hull_roundtrip": L.O_PROJECT_HULL,
    "s11_gt_review_table": L.O_S11_REVIEW,
    "extract_line_spans": L.O_LINE_SPANS,
    "extract_glyph_spans": L.O_GLYPH_SPANS,
    "inherit_fallback_chain": L.O_INHERIT_CHAIN,
    "s10_byte_digest": L.O_S10_DIGEST,
    "a9_unaccounted_audit": L.O_A9_AUDIT,
    "g2_make_valid": L.O_G2_VALID,
    "g3_join_hull": L.O_G3_HULL,
    "g10_spread": L.O_G10_SPREAD,
    "g13_predicates": L.O_G13_PREDICATES,
    "eval_map_summary": L.O_EVAL_MAP,
    "eval_only_fg": L.O_EVAL_ONLY_FG,
    "replace_rebase_roundtrip": L.O_REBASE_ROUNDTRIP,
    "extract_media_regions": L.O_MEDIA_REGIONS,
    "reading_order_groups": L.O_RO_GROUPS,
    "s13_colordict": L.O_S13_COLORDICT,
    "s2_feature_chain": L.O_S2_FEATURE_CHAIN,
    "extract_style_runs": L.O_STYLE_RUNS,
    "extract_reading_direction": L.O_READING_DIRECTION,
    "extract_pre_verbatim": L.O_PRE_VERBATIM,
    "coco_apply_roundtrip": L.O_COCO_APPLY,
    "replace_textequiv_history": L.O_TEXTEQUIV_HISTORY,
    "outlink_host_edges": G.O_OUTLINK_EDGES,
    "anchor_text_topk": G.O_ANCHOR_TOPK,
    "linkgraph_pagerank": G.O_LINKGRAPH_PAGERANK,
    "url_latest_snapshot": G.O_URL_SNAPSHOT,
    "dedup_keep_best": G.O_DEDUP_KEEP_BEST,
    "shard_by_tokens": G.O_SHARD_BY_TOKENS,
    "head_meta_harvest": G.O_HEAD_META,
    "canonical_collapse": G.O_CANONICAL_COLLAPSE,
    "inverted_postings": G.O_INVERTED_POSTINGS,
    "bm25_topk": G.O_BM25_TOPK,
    "bloom_seen_probe": G.O_BLOOM_SEEN_PROBE,
    "hreflang_clusters": G.O_HREFLANG_CLUSTERS,
    "robots_rules_parse": G.O_ROBOTS_RULES,
    "robots_frontier_filter": G.O_ROBOTS_FRONTIER,
    "page_meta_harvest": G.O_PAGE_META,
    "pack_sequences": G.O_PACK_SEQUENCES,
    "index_add_batch": G.O_INDEX_ADD_BATCH,
    "paragraph_bloom_flags": G.O_PARAGRAPH_BLOOM,
    "corpus_diff": G.O_CORPUS_DIFF,
    "sitemap_harvest": G.O_SITEMAP_HARVEST,
    "robots_sitemaps": G.O_ROBOTS_SITEMAPS,
    "sentence_spans": G.O_SENTENCE_SPANS,
    "bpe_train_merges": G.O_BPE_TRAIN,
    "charset_sniff": G.O_CHARSET_SNIFF,
    "punct_fold": G.O_PUNCT_FOLD,
    "robots_crawl_delay": G.O_ROBOTS_CRAWL_DELAY,
    "lang_mixture_weights": G.O_LANG_MIXTURE,
    "link_reciprocity": G.O_LINK_RECIPROCITY,
    "positional_postings": G.O_POSITIONAL_POSTINGS,
    "phrase_topk": G.O_PHRASE_TOPK,
    "pagerank_warm_start": G.O_PAGERANK_WARM,
    "hll_host_cardinality": WB.O_HLL_HOST_CARDINALITY,
    "hll_merge_parity": WB.O_HLL_MERGE_PARITY,
    "cms_heavy_hitters": WB.O_CMS_HEAVY_HITTERS,
    "hits_scores": WB.O_HITS_SCORES,
    "crawl_wave_plan": WB.O_CRAWL_WAVE_PLAN,
    "jsonld_types": WB.O_JSONLD_TYPES,
    "index_delete_parity": WB.O_INDEX_DELETE_PARITY,
    "content_type_sniff": WB.O_CONTENT_TYPE_SNIFF,
    "epoch_shuffle": WB.O_EPOCH_SHUFFLE,
    "mixture_sample": WB.O_MIXTURE_SAMPLE,
    "lang_mix_stats": WB.O_LANG_MIX_STATS,
    "warc_ingest": I.O_WARC_INGEST,
    "trustrank_scores": I.O_TRUSTRANK,
    "dedup_containment": I.O_DEDUP_CONTAINMENT,
    "hist_quantiles": I.O_HIST_QUANTILES,
    "feed_harvest": I.O_FEED_HARVEST,
    "redirect_resolve": I.O_REDIRECT_RESOLVE,
    "change_rates": G.O_CHANGE_RATES,
    "feed_discovery": G.O_FEED_DISCOVERY,
    "outlinks_nofollow": G.O_OUTLINKS_NOFOLLOW,
    "sitemap_hints": G.O_SITEMAP_HINTS,
    "host_quality_priors": G.O_HOST_QUALITY_PRIORS,
    "low_quality_hosts": G.O_LOW_QUALITY_HOSTS,
    "pq_adc_topk": M.O_PQ_ADC_TOPK,
    "ivfpq_search": M.O_IVFPQ_SEARCH,
    "url_trap_templates": I.O_URL_TRAP_TEMPLATES,
    "pdf_text_extract": I.O_PDF_TEXT_EXTRACT,
    "pdf_meta_links": I.O_PDF_META_LINKS,
    "warc_bytes_parity": I.O_WARC_BYTES_PARITY,
    "media_meta": I.O_MEDIA_META,
    "semantic_dedup": M.O_SEMANTIC_DEDUP,
    "mirror_hosts": G.O_MIRROR_HOSTS,
    "c4_line_clean": M.O_C4_LINE_CLEAN,
    "dsir_logweights": M.O_DSIR_LOGWEIGHTS,
    "dsir_select": M.O_DSIR_SELECT,
    "soft404_flags": PG.O_SOFT404_FLAGS,
    "soft404_host_rates": PG.O_SOFT404_HOST_RATES,
    "html_table_cells": PG.O_HTML_TABLE_CELLS,
    "tables_markdown": PG.O_TABLES_MARKDOWN,
    "script_mix": PG.O_SCRIPT_MIX,
    "host_confusables": PG.O_HOST_CONFUSABLES,
    "heading_outline": PG.O_HEADING_OUTLINE,
    "publish_date_harvest": PG.O_PUBLISH_DATE,
    "list_items_markdown": PG.O_LIST_ITEMS,
    "image_text_pairs": PG.O_IMAGE_PAIRS,
    "ai_optout_flags": PG.O_AI_OPTOUT,
    "caption_quality": PG.O_CAPTION_QUALITY,
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
