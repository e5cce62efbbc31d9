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
# ``tools/check_correctness.py`` (410/410 oracle-paired queries green in
# the latest full local sweep; 412 declared).  The rotation itself is
# mechanically auditable: ``tools/window_history.py`` reconstructs
# query -> official-round history from the committed CORRECTNESS_r*.json
# artifacts into WINDOW_HISTORY.json (regenerated each closing sweep) —
# tier 2 draws from its ``never_checked`` list, tier 4 from
# ``oldest_green_first``.
_CHECK_FIRST = [
    # -- 1. CHANGED or ADDED in r10.  Three additions (the r9 verdict's
    #       ≤5/round growth budget): estimator/layout audits debuting
    #       with oracle rows — MinHash-estimate-vs-exact-Jaccard error,
    #       token-weighted lang×source mixture lift, and the sequence-
    #       packing split/fill audit.
    "minhash_jaccard_error",
    "mixture_lang_source_lift",
    "pack_split_stats",
    "graph_kcore_parts",            # + converged OUTPUT COLUMN (r9
                                    # verdict item 4; oracle emits the
                                    # fixpoint's constant TRUE)
    "split_leakage_measure",        # CC engine -> two-phase (A/B 1.63x,
                                    # SCALE_BENCH §19); also clears a
                                    # backlog slot (was never-checked)
    "dedup_transitivity_inflation",  # CC engine -> two-phase (A/B 1.63x);
                                     # also clears a backlog slot
    "dedup_clusters",               # CC engine -> two-phase (r10 profile:
                                    # the LSH graph runs 12 min-label
                                    # rounds — chains, not cliques; fresh
                                    # min-of-2 full-query A/B 1.61x,
                                    # SCALE_BENCH §19)
    "dedup_cluster_size_hist",      # same switch, A/B 1.55x; also clears
                                    # a backlog slot (never-checked; a
                                    # CENSUS_5 bench-frozen heavy)
    "events_watermark_drop_audit",  # body UNCHANGED in r10 — held in
                                    # tier 1 one extra round per r9
                                    # verdict item 7 so the stabilized
                                    # form logs a clean consecutive row
    # -- 4. TIER-4 VETERAN RE-CHECKS: the remaining r3/r4 veterans the r9
    #       window could not fit (queued there, endorsed by the verdict).
    #       Source: WINDOW_HISTORY.json oldest_green_first filtered to
    #       last_official <= 4 — all fifteen r3 rows plus the oldest r4
    #       asof twin.
    "agg_cube",
    "agg_rollup",
    "ann_cosine_topk",
    "ann_lsh_near_dup",
    "asof_last_view_before_purchase",
    # (asof_next_purchase_after_view — the r4 twin — yielded its slot to
    #  the two dedup-cluster CC switches above; re-enters tier 4 in r11)
    "events_tumbling_window",
    "hypertable_rollup",
    "q3_shipping_priority",
    "range_join_first_day_events",
    "semi_join_high_value_orders",
    "sort_limit_topk",
    "text_fingerprint",
    "text_langid",
    "text_token_count",
    "text_winnow_fingerprint",
    # -- 2. never-officially-checked backlog, declaration order resuming
    #       at parts_in_all_regions (mechanical source:
    #       WINDOW_HISTORY.json never_checked ∩ ORACLE_SQL, QUERIES
    #       declaration order; CORRECTNESS_LOCAL_r{N}.json remains the
    #       complete per-round record).  approx_distinct_users /
    #       ann_ivf_topk are EXCLUDED from backlog slots: rows-only by
    #       design (approximate ops), they can never hold an oracle row —
    #       their deterministic twins carry the full rows.
    "parts_in_all_regions",
    "conversion_wilson_ci",
    "events_peak_hours_nms",
    "set_intersect_all",
    "grpo_group_advantages",
    "source_distinctive_terms",
    "embedding_centroid_drift",
    "events_cusum_shift",
    "user_streak_histogram",
    "session_bounce_stats",
    "orders_pareto_skyline",
    "funnel_within_hour",
    "dup_graph_degree_hist",
    "forecast_seasonal_naive_backtest",
    "customer_order_regularity",
    "session_handoff_matrix",
    "user_lifecycle_accounting",
    "revenue_bridge_by_month",
    "attribution_position_based",
    "ab_diff_in_diff",
    "conversion_latency_quantiles",
    "embedding_top_pc_power_iteration",
    "source_venn_overlap",
    "range_partition_boundaries",
    "session_top_paths",
    "dedup_method_agreement",       # first official row for a GRAPH_ANN_6
                                    # bench-frozen heavy (min-label kept
                                    # after the r10 A/B — SCALE_BENCH §19)
    # (slots 1-50 above fill the driver window: 3 added + 6 changed + 15
    #  veterans + 26 backlog -> never_checked 127 -> 98 (three window
    #  entries — the two r9-switch heavies and dedup_cluster_size_hist —
    #  were themselves never-checked).  The backlog continues in
    #  declaration order at ship_latency_by_priority,
    #  skyline_dominance_counts, events_debounce_collapse,
    #  cohort_ltv_curve — everything outside the window is green in the
    #  committed full sf0.01 sweep, CORRECTNESS_LOCAL_r10
    #  (tools/check_correctness.py, 410/410 oracle-paired))
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
