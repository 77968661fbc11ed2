"""Pin the registry's exact name ORDER — it is load-bearing: the driver's
correctness gate attests a PREFIX (the first 50 names) each round, so a
mid-round insertion into the window silently changes which operators get
their CORRECTNESS row. Any reordering must be a deliberate, reviewed edit
of both entry_queries.REGISTRY and this literal list (see the round-5
split of entry_queries.py into searchengine_spark/entry/ family modules).
"""

from searchengine_spark.entry_queries import REGISTRY, all_oracle_sql, all_queries

EXPECTED_ORDER = [
    "dedup_components_lsls",
    "consolidated_topk",
    "pq_topk",
    "ivf_topk",
    "ann_topk",
    "cosine_topk",
    "percolate_hits",
    "wand_topk",
    "wand_term_topk",
    "batch_wand_topk",
    "wand_topk_deletes",
    "federated_topk",
    "federated_wand_topk",
    "merge_segments_roundtrip",
    "segment_roundtrip",
    "phrase_topk",
    "near_topk",
    "bm25f_topk",
    "bm25_topk_multi",
    "reference_topk",
    "fielded_reference_topk",
    "term_stats",
    "corpus_scalars",
    "tf_postings",
    "token_counts",
    "quality_score",
    "dedup_components",
    "ngram_jaccard_pairs",
    "minhash_dedup_pairs",
    "span_dups",
    "clean_corpus",
    "hybrid_rrf_topk",
    "mmr_topk",
    "budget_select",
    "facet_ranges",
    "facet_stats",
    "facet_top_hits",
    "facet_percentiles",
    "facet_histogram",
    "facet_counts",
    "function_score_topk",
    "media_features",
    "media_decode",
    "media_resize",
    "video_frame_sample",
    "pii_scan",
    "sessionized_counts",
    "sessionized_counts_bucketed",
    "user_top_events",
    "event_props_stats",
    "windowed_counts",
    "source_divergence",
    "source_term_cardinality",
    "span_dup_flags",
    "dis_max_topk",
    "ltr_features",
    "rescore_topk",
    "stemmed_topk",
    "substring_search",
    "term_vectors",
    "significant_terms",
    "rank_eval",
    "msm_topk",
    "explain_score",
    "lm_dirichlet_topk",
    "decay_topk",
    "synonym_topk",
    "filtered_topk",
    "match_count",
    "collapse_topk",
    "prefix_search",
    "fuzzy_search",
    "regex_search",
    "slop_topk",
    "prf_topk",
    "more_like_this",
    "asof_enrich",
    "event_bigrams",
    "boolean_topk",
    "search_snippets",
    "doc_keywords",
    "suggest_prefix",
    "did_you_mean",
    "quality_quantiles",
    "source_mix",
    "doc_fingerprint",
    "payload_meta",
    "doc_lengths",
    "bm25_topk_rare",
    "bm25_topk_dupterms",
    "bm25_page2",
    "reference_topk_capped",
    "fielded_topk",
    "batch_topk",
    "doc_id_rank",
    "dedup_exact",
    "dedup_keep_best",
    "quality_weighted_sample",
    "split_contamination",
    "dedup_keep_first",
    "pack_bins",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "simhash32",
    "simhash_pairs",
    "embedding_dup_pairs",
    "embedding_dup_components",
    "lang_id",
    "split_assign",
    "turn_context",
    "conversation_text",
    "role_spans",
    "tool_usage",
    "tool_transitions",
    "stratified_sample",
    "bigram_pmi",
    "doc_logprob",
    "doc_bigram_logprob",
    "repetition_stats",
]


def test_registry_order_pinned():
    assert [n for n, _ in REGISTRY] == EXPECTED_ORDER


def test_registry_names_unique_and_callable():
    names = [n for n, _ in REGISTRY]
    assert len(names) == len(set(names))
    assert all(callable(fn) for _, fn in REGISTRY)


def test_every_query_has_an_oracle():
    q, o = all_queries(), all_oracle_sql()
    assert set(q) == set(o)
    assert list(q) == EXPECTED_ORDER


def test_gate_window_head_is_current_round():
    """The window head must hold the never-attested + changed-this-round
    names (round 5): the log-diameter CC twin, the consolidation
    lifecycle query, and the hash-sampled quantizer family."""
    head = EXPECTED_ORDER[:7]
    assert head == [
        "dedup_components_lsls", "consolidated_topk", "pq_topk",
        "ivf_topk", "ann_topk", "cosine_topk", "percolate_hits",
    ]
