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
# ``tools/check_correctness.py`` (401/401 oracle-paired queries green in
# the latest full local sweep; 403 declared).  The rotation itself is
# mechanically auditable: ``tools/window_history.py`` reconstructs
# query -> official-round history from the committed CORRECTNESS_r*.json
# artifacts into WINDOW_HISTORY.json (regenerated each closing sweep) —
# tier 2 draws from its ``never_checked`` list, tier 4 from
# ``oldest_green_first``.
_CHECK_FIRST = [
    # -- 1. changed in r7 (their prior rows no longer describe the shipped
    #       code): the adaptive-LSH re-point (plane count derived from a
    #       corpus count, stamped as a literal and mirrored in the oracle)
    #       and this round's PPJoin verify rewrite + qini quantile mirror +
    #       winnowing dead-join drop
    "dedup_winnowing_pairs",        # dead tie-break join dropped (13.8->4s)
    "dedup_ppjoin_pairs",           # verify via token-set array_intersect
    "uplift_qini_by_decile",        # oracle now replays Spark percentile
    "dedup_embedding_cosine",       # adaptive plane count (SCALE_BENCH 12)
    "dedup_clusters",               # adaptive plane count
    "dedup_representatives",        # adaptive plane count
    "split_leakage_safe",           # adaptive plane count
    "graph_supplier_triangles",     # adjacency-intersection rewrite
    "graph_kcore_parts",            # peel-loop lineage truncation
    # -- 1b. ADDED this round (r7): the spatial-grid family (grid NN is
    #        verified against a brute-force oracle), the mergeable bottom-k
    #        quantile sample, trigram stupid-backoff LM scoring, the
    #        entity-resolution blocking family, and the selection-parity
    #        fairness audit — first official rows
    "geo_grid_density",
    "geo_grid_radius_nn",
    "geo_colocation_quotient",
    "sketch_bottomk_quantile_sample",
    "text_trigram_stupid_backoff",
    "er_customer_linkage_pairs",
    "er_blocking_quality",
    "fairness_selection_parity",
    "knn_loo_accuracy",
    "curation_loo_source_impact",
    "kmeans_lloyd_round",
    "sketch_kmv_distinct",
    "geo_dbscan_core_points",
    "graph_jaccard_link_prediction",
    "geo_quadkey_pyramid",
    "markov_absorption_to_purchase",
    "geo_bipartite_nearest_supplier",
    "events_watermark_drop_audit",
    # -- 2. never-officially-checked additions, oldest first (the r5/r6
    #       overflow — 201 queries have never held a driver row with a
    #       50-slot window; CORRECTNESS_LOCAL_r{N}.json is the complete
    #       per-round record, this window retires the backlog ~43/round)
    "funnel_first_touch_counts",
    "events_gapfill_hourly",
    "label_agreement_kappa",
    "gini_engagement_by_type",
    "user_type_diversity",
    "pareto_half_revenue_customers",
    "ann_recall_eval",
    "events_wma_hourly",
    "partition_skew_report",
    "weighted_median_price_by_brand",
    "vocab_churn_halves",
    "attribution_linear_exact",
    "next_event_training_pairs",
    "pipeline_sft_examples",
    "bm25_topk",
    "hybrid_rank_fusion",
    "skipgram_pairs",
    "postings_topk_by_term",
    "pmi_skipgram_lift",
    "doc_hashed_features",
    "sparse_cosine_topk",
    "kanonymity_audit",
    "item_item_cosine",
    # (slots 1-50 above fill the driver window; the 18 backlog veterans the
    #  r7 additions displaced — bootstrap_mean_replicates,
    #  graph_triangle_counts,
    #  audience_overlap_pairs, text_rank_normalize, text_readability,
    #  mix_budget_spillover,
    #  hard_negative_mining, bitext_margin_pairs,
    #  shard_manifest, theil_sen_slope_by_user, icl_similarity_chain,
    #  preference_pairs_dpo, attribution_time_decay, bootstrap_ci_mean,
    #  survival_risk_table, length_bucket_batches, calibration_table,
    #  events_burst_detection — rejoin the never-checked backlog, which
    #  continues in declaration order next round:
    #  quantile_normalize_sources, revenue_mom_growth, benford_first_digit,
    #  ... through the session-13 additions — all green in this round's
    #  committed full sf0.01 sweep, CORRECTNESS_LOCAL_r7.json
    #  (tools/check_correctness.py, 401/401 oracle-paired))
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
