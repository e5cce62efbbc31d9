"""Bucketed co-located join tests: same-bucketed tables must join without a
shuffle on either side."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from lvm_datapipe_spark.catalog import load_table
from lvm_datapipe_spark.plans.bucketing import bucketed_join, count_exchanges, write_bucketed


@pytest.fixture()
def bucketed_tables(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_quantity"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    write_bucketed(li, "b_lineitem", "l_orderkey", n_buckets=8)
    write_bucketed(orders, "b_orders", "l_orderkey", n_buckets=8)
    yield "b_lineitem", "b_orders"
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    shutil.rmtree("spark-warehouse", ignore_errors=True)


def test_bucketed_join_is_shuffle_free(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    joined = bucketed_join(spark, lt, rt, "l_orderkey")
    assert count_exchanges(joined) == 0  # co-located: no Exchange on either side
    # and it computes the same result as the plain shuffled join
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    want = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    assert joined.count() == want


def test_unbucketed_join_shuffles(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem", rebalance=False)
    orders = load_table(spark, sf_dir, "orders", rebalance=False).withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    # force a non-broadcast join for comparison
    joined = li.hint("merge").join(orders.hint("merge"), "l_orderkey")
    assert count_exchanges(joined) >= 2  # both sides shuffle without buckets


def test_band_store_join_is_colocated(spark, sf_dir):
    """MinHash band index persisted bucketed on (band, bucket): the
    candidate self-join plans WITHOUT an Exchange under the join — the only
    shuffle left is the final pair distinct — and the pairs are identical
    to the in-memory LSH path."""
    from lvm_datapipe_spark.catalog import load_table
    from lvm_datapipe_spark.operators import dedup as D
    from lvm_datapipe_spark.plans.bucketing import count_exchanges

    docs = load_table(spark, sf_dir, "documents")
    D.write_band_store(spark, docs, "band_store_test")
    try:
        out = D.candidate_pairs_from_band_store(spark, "band_store_test")
        assert count_exchanges(out) == 1  # only the distinct; none for the join
        got = {(r.id_a, r.id_b) for r in out.collect()}
        mem = D.lsh_candidate_pairs(D.minhash_signatures(docs))
        want = {(r.id_a, r.id_b) for r in mem.collect()}
        D.release(mem)
        assert got == want and len(want) > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS band_store_test")
