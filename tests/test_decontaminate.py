"""Benchmark decontamination (operators/decontaminate.py)."""

from __future__ import annotations

from lvm_datapipe_spark.operators.decontaminate import (
    contamination_pairs,
    decontaminate,
)


def _corpus(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "a completely different document with its own words"),
            (3, "prefix junk the quick brown fox jumps over something else"),
        ],
        ["doc_id", "text"],
    )


def _bench(spark):
    return spark.createDataFrame(
        [(100, "eval item the quick brown fox jumps over the fence")],
        ["bench_id", "text"],
    )


def test_contamination_pairs(spark):
    got = {
        (r.doc_id, r.bench_id, r.n_common)
        for r in contamination_pairs(
            _corpus(spark), _bench(spark), n=5, min_common=1
        ).collect()
    }
    # docs 1 and 3 share "the quick brown fox jumps" (+ more for doc 1)
    assert {(d, b) for d, b, _ in got} == {(1, 100), (3, 100)}
    by_doc = {d: n for d, _, n in got}
    assert by_doc[1] >= 2 and by_doc[3] >= 1


def test_min_common_threshold(spark):
    got = {
        r.doc_id
        for r in contamination_pairs(
            _corpus(spark), _bench(spark), n=5, min_common=3
        ).collect()
    }
    assert got == {1}  # doc 3 shares only two 5-grams, doc 1 shares three


def test_decontaminate_drops_flagged(spark):
    kept = {
        r.doc_id
        for r in decontaminate(_corpus(spark), _bench(spark), n=5).collect()
    }
    assert kept == {2}


def test_benchmark_side_broadcasts(spark):
    out = contamination_pairs(_corpus(spark), _bench(spark), n=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
