"""Python UDTF surface: deterministic row expansion through a lateral
join, checked against a pure-Python model."""

from __future__ import annotations

import re

from lvm_datapipe_spark.functions.udtfs import register_udtfs

MAX_CHARS = 120  # SentenceChunks.MAX_CHARS (the decorator wraps the class)


def _model(text, cap=120):
    parts = [s for s in re.split(r"(?<=[.!?])\s+", text) if s]
    out, chunk, size, idx, pos, start = [], [], 0, 0, 0, 0
    for s in parts:
        if chunk and size + 1 + len(s) > cap:
            out.append((idx, start, " ".join(chunk)))
            idx += 1
            chunk, size = [], 0
            start = pos
        chunk.append(s)
        size += (1 if size else 0) + len(s)
        pos += len(s) + 1
    if chunk:
        out.append((idx, start, " ".join(chunk)))
    return out


def test_sentence_chunks_lateral_join(spark):
    register_udtfs(spark)
    texts = [
        "One short. " * 3,
        "A much longer sentence that runs on and on to approach the cap. "
        "Second sentence here! Third? Fourth sentence to overflow the "
        "first chunk boundary. Fifth one lands in chunk two.",
        "",
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id int, text string"
    )
    df.createOrReplaceTempView("udtf_docs")
    rows = spark.sql(
        "SELECT d.doc_id, s.chunk_idx, s.start_pos, s.chunk "
        "FROM udtf_docs d, LATERAL sentence_chunks(d.text) s"
    ).collect()
    got = {(r.doc_id, r.chunk_idx, r.start_pos, r.chunk) for r in rows}
    want = {
        (i, ci, sp, ch)
        for i, t in enumerate(texts)
        for ci, sp, ch in _model(t)
    }
    assert got == want
    # every chunk respects the cap unless it is a single oversized sentence
    for _, _, _, ch in got:
        assert len(ch) <= MAX_CHARS or " " not in ch


def test_sentence_chunks_null_yields_no_rows(spark):
    register_udtfs(spark)
    df = spark.createDataFrame([(1, None)], "doc_id int, text string")
    df.createOrReplaceTempView("udtf_docs_null")
    n = spark.sql(
        "SELECT * FROM udtf_docs_null d, LATERAL sentence_chunks(d.text)"
    ).count()
    assert n == 0
