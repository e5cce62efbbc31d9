"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with the JVM-side noop sink (no collect, no
Python serialization in the measured path).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one per operator family; heavy hitters first.
BENCH_QUERIES = [
    "q1_pricing_summary",
    "j4_region_revenue",
    "j2_enrichment_join",
    "a1_breakpoint",
    "w1_clip_numbering",
    "w2_best_per_group",
    "w3_sessionize",
    "events_tumbling_window",
    "a6_histogram",
    "f2_resume_anti_join",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "ann_cosine_topk",
    "dedup_embedding_cosine",
    "text_quality",
    # added in round 2 once green (VERDICT r1 item 8): keep ABOVE list stable
    # so totals stay comparable; per-query times carry the comparison
    "c7_extract_answer",
    "c9_frame_indices",
    "ann_lsh_near_dup",
]


def main() -> None:
    from lvm_datapipe_spark.queries import QUERIES
    from lvm_datapipe_spark.session import get_spark

    spark = get_spark("lvm-datapipe-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM once per code-path family (relational agg, shingle+md5,
    # vector math) at the smallest sf so the measured numbers reflect
    # steady-state throughput — what a long-running cluster actually does —
    # not first-query JIT/codegen compilation.
    warm_sf = "/root/testdata/sf0.001"
    for warm_q in ("q1_pricing_summary", "dedup_minhash_lsh", "dedup_simhash",
                   "dedup_ngram_jaccard", "ann_cosine_topk", "ann_lsh_near_dup",
                   "text_quality", "w3_sessionize"):
        QUERIES[warm_q](spark, warm_sf).write.format("noop").mode("overwrite").save()
    QUERIES["q1_pricing_summary"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    times: dict[str, float] = {}
    for name in BENCH_QUERIES:
        if name not in QUERIES:
            continue
        t0 = time.perf_counter()
        QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - t0, 4)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": round(sum(times.values()), 4),
                "unit": "sec",
                "queries": times,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
