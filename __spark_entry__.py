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
# ``tools/check_correctness.py`` (101/101 green at the r5 cut).
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
    # -- 4. oldest official row (r1-r3; rotated out during r4), in
    #       registration order.  Left out (37 slots for 40 candidates):
    #       approx_distinct_users + ann_ivf_topk (rows-only by design;
    #       their exact twins sit in group 3), ann_cosine_topk
    #       (unchanged; pinned by brute_force_topk unit tests and shares
    #       its ranking oracle shape with in-window ann_ivf_fixed_topk),
    #       and w4_running_total / c14_json_extract / hypertable_rollup /
    #       semi_join_high_value_orders / text_winnow_fingerprint /
    #       q3_shipping_priority (displaced by the six r5-added queries —
    #       q18_large_orders re-pins the left-semi and join-agg-topk
    #       shapes with its own oracle; all six are next-oldest for r6).
    "a5_corpus_stats",
    "a6_histogram",
    "a7_value_counts",
    "a8_count_consistency",
    "a9_derived_size",
    "w1_clip_numbering",
    "w2_best_per_group",
    "set_union_shards",
    "set_except_finished",
    "sort_limit_topk",
    "c7_extract_answer",
    "events_tumbling_window",
    "w3_sessionize",
    "text_token_count",
    "text_quality",
    "text_langid",
    "text_fingerprint",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_levenshtein",
    "ann_lsh_near_dup",
    "asof_last_view_before_purchase",
    "range_join_first_day_events",
    "agg_rollup",
    "agg_cube",
    "c2_path_functions",
    "c5_clean_caption",
    "c9_frame_indices",
    "text_bpe_token_count",
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
