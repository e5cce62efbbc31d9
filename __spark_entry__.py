"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``lvm_datapipe_spark``; this module only adapts it to
the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from lvm_datapipe_spark.queries import QUERIES

    return QUERIES["q1_pricing_summary"](spark, SF0001)


# The driver's correctness gate checks only the FIRST 50 entries of
# ``queries()``.  Rotation policy (documented per round in COVERAGE.md):
#   1. queries CHANGED or ADDED this round lead (their prior rows, if any,
#      no longer describe the shipped code);
#   2. queries that have never held an official row;
#   3. deterministic twins of the rows-only approximate entries;
#   4. the remaining slots re-check the queries whose last official green
#      row is OLDEST, so every query periodically re-enters the window and
#      a silent regression cannot hide outside it indefinitely.
# Everything rotated out stays verified locally every round via
# ``tools/check_correctness.py`` (168/168 oracle-paired queries green at
# the r5 cut; 170 declared).
_CHECK_FIRST = [
    # -- 1. changed in r5 (re-pointed to the LSH scale path / un-hinted
    #       customer join) + added in r5
    "dedup_embedding_cosine",
    "dedup_clusters",
    "split_leakage_safe",
    "j4_region_revenue",
    "w5_deciles_bucketed",
    "q14_promo_revenue",
    "q18_large_orders",
    "embedding_centroid_by_label",
    "w9_lead_lag",
    "text_chunk_overlap",
    "text_char_diversity",
    # r5 batch 2: the classic join-shape family + pipeline operators
    "q4_order_priority",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q8_market_share",
    "q13_order_distribution",
    "q17_small_quantity_revenue",
    "q19_disjunctive_revenue",
    "q21_blocking_supplier",
    "q22_inactive_balance",
    "bloom_pruned_semi_join",
    "scd2_docs_merge",
    "text_zscore_by_lang",
    "sample_match_target",
    "events_markov_transitions",
    "agg_correlation",
    "sample_top_p_by_lang",
    "ann_pq_adc_topk",
    "pipeline_incremental",
    "text_dup_sentence_fraction",
    "quality_logit",
    "events_mad_outliers",
    "dq_report",
    "graph_supplier_triangles",
    "basket_part_lift",
    "sample_temperature_mix",
    "events_top_trigrams",
    "dataset_card_by_source",
    "match_view_purchase_mutual",
    "ann_ivfpq_topk",
    "w10_share_of_group",
    "histogram2d_qty_price",
    # -- 2. r4 additions that fell outside r4's 50-entry window
    "langid_confusion",
    "dedup_incremental_cross",
    "text_sentences",
    "events_zscore_outliers",
    "retention_cohorts",
    "funnel_view_click_purchase",
    # -- 3. deterministic twins of the two rows-only entries
    "ann_ivf_fixed_topk",
    "agg_distinct_count",
    # -- 4. oldest-row veterans: NONE this round — the 42 r5 additions/
    #       changes plus the 6 never-checked r4 queries and the 2 twins
    #       fill all 50 slots.  Thirty-two late-r5 additions follow the window
    #       (profile_lineitem_numeric, text_novelty_score,
    #       dedup_soft_weights, events_native_session_window,
    #       dedup_ppjoin_pairs, and the session-3 TPC-H completions
    #       q2_min_cost_supplier, q9_nation_profit, q11_important_parts,
    #       q12_priority_by_returnflag, q15_top_supplier,
    #       q16_supplier_part_count, q20_excess_share_suppliers,
    #       range_join_active_spans, doc_contiguous_ids,
    #       graph_nation_pagerank, scd2_temporal_join,
    #       agg_incremental_merge, events_sliding_distinct_users,
    #       negatives_ring_by_lang, curriculum_schedule, dedup_substring_spans,
    #       agg_mode_brand_per_type,
    #       events_props_variant,
    #       user_value_profiles,
    #       events_autocorrelation,
    #       events_changepoint,
    #       events_winsorized, events_trend_slope, agg_skewness_by_type,
    #       pipeline_pretrain_full,
    #       events_seasonal_residuals,
    #       events_interarrival_stats — all
    #       locally green) and lead r6's never-officially-checked group.  Every rotated-out veteran held a green
    #       official row in r1-r4 AND is green in the r5 local full run
    #       (tools/check_correctness.py, 168/168 oracle-paired); the oldest (a5, a6,
    #       a7, a8, w1, w2, set ops, the dedup family, ...) lead the r6
    #       veteran re-check queue.  Also permanently out-of-window:
    #       approx_distinct_users + ann_ivf_topk (rows-only by design;
    #       exact twins in group 3) and ann_cosine_topk (unit-test-pinned;
    #       shares its ranking oracle shape with ann_ivf_fixed_topk).
]


def _ordered(mapping: dict) -> dict:
    out = {n: mapping[n] for n in _CHECK_FIRST if n in mapping}
    out.update({n: v for n, v in mapping.items() if n not in out})
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from lvm_datapipe_spark.queries import QUERIES

    # fail loudly on a typo'd name: silently skipping would waste that
    # query's one shot at an official CORRECTNESS row
    missing = [n for n in _CHECK_FIRST if n not in QUERIES]
    assert not missing, f"unknown names in _CHECK_FIRST: {missing}"
    return _ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each oracle-checkable query."""
    from lvm_datapipe_spark.queries import ORACLE_SQL

    return _ordered(ORACLE_SQL)
