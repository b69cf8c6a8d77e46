"""Query registry package. Importing this package imports every query
module so their ``@register`` decorators populate the registry.

Registration order matters: the driver's correctness gate checks queries
in registration order and caps how many it samples per round (~50).
After importing, ``_PRIORITY`` re-orders the registry so the checked
window always covers the entries with the least prior driver evidence:
never-checked queries first (new registrations this round), then the
stalest previously-green queries (oldest driver row first), with the
freshest-green entries re-checking last.  The tier comments in
``_PRIORITY`` record the evidence map the current ordering was derived
from.
"""

from incubator_flink_spark.queries import (  # noqa: F401
    cdc_queries,
    cep_queries,
    corpus,
    documents,
    embeddings,
    events,
    mv_queries,
    pipeline,
    relational,
    scalar,
    star,
    subqueries,
    tpch,
)
from incubator_flink_spark.queries import registry as _registry
from incubator_flink_spark.queries.registry import REGISTRY, oracle_sql, queries

_PRIORITY = [
    # The driver samples the first ~50 registered queries per round.  The
    # round-4 evidence map: 176/190 queries driver-green at least once;
    # 14 never had a driver row (the round-4 registrations that
    # overflowed r4's 50-query window — 11 value-exact locally, 3 newly
    # oracle-backed this round via unrolled-CTE oracles: the BPE train /
    # encode pair and the k-core peel).  Round 5's window packs (a)
    # those 14 — making driver evidence TOTAL across the registry,
    # (b) tier B: every round-5 registration (each checked exact at
    # sf0.01 AND sf0.1 at registration time), and (c) the stalest
    # greens (round-1-only evidence) topping the window up to ~50.
    #
    # -- tier A (1-14): never driver-checked in any round -------------------
    "source_drift",
    "retention_matrix",
    "part_copurchase_kcore",
    "star_growth_compare",
    "star_weekly_compare",
    "star_return_rate_rank",
    "collocations_pmi",
    "langid_confusion",
    "star_rfm_segments",
    "label_centroid_similarity",
    "star_basket_rules",
    "session_stats",
    "bpe_train_merges",
    "bpe_encode_corpus",
    # -- tier B: new round-5 registrations (never checked by definition) ----
    "embedding_ivfpq_ingest",
    "star_repeat_purchase_chain",
    "star_channel_exclusive",
    "star_channel_returns_rollup",
    "cep_skip_to_first",
    "bitext_margin_mining",
    "hybrid_rrf_topk",
    "source_cap_sample",
    "word_personalized_pagerank",
    "multi_signal_dedup",
    "contrastive_triplets",
    "curation_funnel",
    "attribution_last_touch",
    "timeseries_gapfill",
    "event_outliers_mad",
    "winnowing_pairs",
    "record_linkage_blocked",
    "word_closeness_landmarks",
    "subquery_above_group_avg",
    "event_transition_matrix",
    "compaction_plan",
    "export_manifest",
    "conversion_latency_cohorts",
    "rake_keyphrases",
    "mv_incremental_orders",
    "mv_affected_group_max",
    "scd2_dimension_build",
    "part_copurchase_ktruss",
    "embedding_top_pc",
    "asof_nearest_tolerance",
    "star_two_hop_exists",
    "weighted_sample_es",
    "embedding_abtt_stats",
    "cep_all_rows_funnel",
    "curriculum_order",
    "unpivot_quantities",
    "embedding_top2_pc",
    "hll_by_language",
    "histogram_quantiles",
    # -- tier C: round-1-green only — stalest driver evidence ---------------
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "dedup_simhash",
    "ngram_jaccard_pairs",
    "text_quality",
    "lang_id_ngram",
    "token_count",
    "doc_fingerprint",
    "multimodal_features",
    "word_count",
    "top_words_per_lang",
    "ann_cosine_topk",
    "embedding_near_pairs",
    "embedding_lsh_topk",
    "tpch_q2",
    "tpch_q4",
    "tpch_q8",
    "tpch_q13",
    "tpch_q14",
    "tpch_q16",
    "tpch_q17",
    "tpch_q20",
    "tpch_q21",
    "interval_join",
    "asof_temporal_join",
    "window_topn_events",
    "window_join",
    # -- tier D: oldest round-2-green, topping the window up to ~50 ---------
    "cep_funnel",
    "embedding_ivf_topk",
    "doc_embedding_join",
    "tpch_q6",
    "tpch_q7",
    "tpch_q10",
    "tpch_q11",
    "tpch_q12",
    "tpch_q15",
    "tpch_q19",
    "tpch_q22",
    # -- tier E (51+): remaining round-2-green, then round-3/4-green
    #    auto-appends last (freshest evidence) ------------------------------
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q9",
    "tpch_q18",
    "window_tumble",
    "window_hop",
    "window_session",
    "window_cumulate",
    "count_window_agg",
    "over_range_time",
    "join_inner",
    "join_full_outer",
    "join_anti",
    "join_non_equi",
    "set_intersect_all",
    "set_except_all",
    "agg_grouping_sets",
    "agg_distinct",
    "agg_pivot",
    "agg_percentiles",
    "window_topn",
    "window_range_frame",
    "window_lead_lag",
    "sort_limit_offset",
    "dedup_keep_first_batch",
    "unnest_words",
    "values_inline",
    "scalar_string_funcs",
    "scalar_temporal_funcs",
    "scalar_json_funcs",
    "scalar_collection_funcs",
    "window_session_dynamic",
    "changelog_normalize_batch",
    "retract_aggregate_batch",
    "cdc_debezium_normalize",
    "semantic_dedup",
    "temporal_join_sql",
    "decontaminate_ngram",
]


def _reorder() -> None:
    ordered = {}
    for name in _PRIORITY:
        if name in REGISTRY:
            ordered[name] = REGISTRY[name]
    for name, q in REGISTRY.items():
        if name not in ordered:
            ordered[name] = q
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder()

__all__ = ["REGISTRY", "queries", "oracle_sql"]
