"""Sequence packing (operators/packing.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lvm_datapipe_spark.operators.packing import pack_sequences, pack_utilization


def _sized(spark, rows, cols=("doc_id", "n_tokens")):
    return spark.createDataFrame(rows, list(cols))


def test_pack_layout_exact(spark):
    # stream: 100 + 100 + 300 + 600 tokens, ctx 256
    df = _sized(spark, [(1, 100), (2, 100), (3, 300), (4, 600)])
    out = {r.doc_id: r for r in pack_sequences(df, "n_tokens", ctx_len=256).collect()}
    assert (out[1].start_offset, out[1].pack_id, out[1].pack_offset, out[1].n_packs) == (0, 0, 0, 1)
    assert (out[2].start_offset, out[2].pack_id, out[2].pack_offset, out[2].n_packs) == (100, 0, 100, 1)
    # doc 3: tokens 200..499 → spans packs 0 and 1
    assert (out[3].start_offset, out[3].pack_id, out[3].n_packs) == (200, 0, 2)
    # doc 4: tokens 500..1099 → packs 1..4
    assert (out[4].start_offset, out[4].pack_id, out[4].n_packs) == (500, 1, 4)


def test_pack_sharded_independent_streams(spark):
    df = _sized(
        spark,
        [(1, "a", 100), (2, "a", 100), (3, "b", 100)],
        cols=("doc_id", "shard", "n_tokens"),
    )
    out = {
        r.doc_id: r
        for r in pack_sequences(df, "n_tokens", shard_col="shard", ctx_len=128).collect()
    }
    assert out[3].start_offset == 0  # shard b starts its own stream
    assert out[2].start_offset == 100


def test_zero_token_doc(spark):
    df = _sized(spark, [(1, 0), (2, 50)])
    out = {r.doc_id: r for r in pack_sequences(df, "n_tokens", ctx_len=64).collect()}
    assert out[1].n_packs == 1 and out[1].start_offset == 0
    assert out[2].start_offset == 0  # empty doc consumes no stream space


def test_utilization_full_windows(spark):
    df = _sized(spark, [(1, 100), (2, 100), (3, 300), (4, 524)])  # total 1024 = 4x256
    packed = pack_sequences(df, "n_tokens", ctx_len=256)
    util = {r.pack_id: r for r in pack_utilization(packed, ctx_len=256).collect()}
    assert set(util) == {0, 1, 2, 3}
    for pid in util:
        assert util[pid].tokens == 256  # stream exactly fills every window
        assert abs(util[pid].utilization - 1.0) < 1e-12


def test_utilization_partial_tail(spark):
    df = _sized(spark, [(1, 300)])
    packed = pack_sequences(df, "n_tokens", ctx_len=256)
    util = {r.pack_id: r.tokens for r in pack_utilization(packed, ctx_len=256).collect()}
    assert util == {0: 256, 1: 44}


def test_deterministic_under_repartition(spark):
    rows = [(i, (i * 37) % 91 + 1) for i in range(200)]
    df = _sized(spark, rows)
    a = {(r.doc_id, r.pack_id, r.pack_offset) for r in pack_sequences(df, "n_tokens").collect()}
    b = {
        (r.doc_id, r.pack_id, r.pack_offset)
        for r in pack_sequences(df.repartition(13), "n_tokens").collect()
    }
    assert a == b
