"""Bloom-filter join pruning — the runtime-filter primitive for selective
fact ⋈ dim joins at 100 TB.

When a dimension-side predicate keeps only a small fraction of join keys,
shuffling the ENTIRE fact table into the join wastes almost all of the
shuffle: most fact rows match nothing.  The classic fix (Spark's own
runtime row-level filtering, Trino/Velox dynamic filters) is to build a
fixed-size Bloom bitmap over the qualifying dim keys, ship it to every
fact scan task, and drop non-matching rows BEFORE the exchange.  The
bitmap is metadata-sized (m bits regardless of key count — 64 Kbit covers
tens of thousands of keys at ~1% FP), so the build-side aggregate +
driver collect is the same bounded-metadata pattern as the IVF probe-cell
collect (similarity.py): the thing collected cannot grow with the corpus.

False positives only COST, never corrupt: the exact semi join still runs
above the pre-filter, so the result is bit-identical to the unfiltered
semi join (which is exactly what the DuckDB oracle replays).  The k hash
positions come from Spark's xxhash64 (JVM codegen, no UDF) with the hash
index mixed in as an extra hashed column; the whole membership test is
ONE parsed SQL expression (the sql_fold trick from similarity.py — no
py4j round-trip per bitmap word), so whole-stage codegen keeps it inside
the scan stage.

The reference has no runtime-filter analog (single-process scripts scan
what they're given — e.g. video_split_ffmpeg.py walks its whole input
dir); this is the Spark-first shape the same workload needs on a cluster.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "bloom_bitmap",
    "bloom_might_contain",
    "bloom_prefiltered_semi_join",
    "bloom_size",
]

_WORD = 64


def _position_sql(key_sql: str, i: int, m_bits: int) -> str:
    """SQL text for the i-th bit position of a key: xxhash64(key, i) mod m."""
    return f"pmod(xxhash64({key_sql}, {i}), {m_bits})"


def bloom_bitmap(
    dim: DataFrame, key_col: str, m_bits: int = 1 << 16, n_hashes: int = 3
) -> list[int]:
    """Aggregate the dim side's qualifying keys into an m-bit Bloom bitmap,
    returned as a list of m/64 longs.

    Distributed shape: each key row emits its k bit positions (narrow),
    then ONE keyed aggregate ORs the per-word masks together — map-side
    partial bit_or means each executor sends at most m/64 rows.  The
    collect is bounded by m (a build parameter), never by the key count.
    """
    if m_bits % _WORD:
        raise ValueError("m_bits must be a multiple of 64")
    n_words = m_bits // _WORD
    pos_arr = ",".join(_position_sql(key_col, i, m_bits) for i in range(n_hashes))
    words = (
        dim.selectExpr(f"explode(array({pos_arr})) AS p")
        .selectExpr(
            f"CAST(p / {_WORD} AS INT) AS w",
            f"shiftleft(CAST(1 AS BIGINT), CAST(p % {_WORD} AS INT)) AS m",
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("word"))
        .collect()
    )
    bitmap = [0] * n_words
    for r in words:
        bitmap[r["w"]] = r["word"]
    return bitmap


def bloom_might_contain(
    bitmap: list[int], key_sql: str, n_hashes: int = 3
) -> Column:
    """Membership test against a literal bitmap — pure JVM expression.

    ``key_sql`` is the key as SQL text (a column name or expression).  The
    bitmap folds into one array literal inside a single F.expr parse; each
    of the k positions checks its bit with shiftright/AND.
    """
    m_bits = len(bitmap) * _WORD
    arr = "array(" + ",".join(f"CAST({w} AS BIGINT)" for w in bitmap) + ")"
    checks = []
    for i in range(n_hashes):
        p = _position_sql(key_sql, i, m_bits)
        word = f"element_at({arr}, CAST(({p}) / {_WORD} AS INT) + 1)"
        checks.append(
            f"(shiftright({word}, CAST(({p}) % {_WORD} AS INT)) & 1) = 1"
        )
    return F.expr(" AND ".join(checks))


def bloom_prefiltered_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int = 1 << 16,
    n_hashes: int = 3,
) -> DataFrame:
    """Exact left-semi join with a Bloom pre-filter on the fact side.

    Result is IDENTICAL to ``fact.join(dim, fact[fact_key] == dim[dim_key],
    "left_semi")`` — the Bloom stage only prunes rows that cannot match, so
    false positives are removed by the exact semi join that follows.  What
    changes is the shuffle volume: only fact rows whose key might be in the
    dim survive to the exchange.
    """
    bitmap = bloom_bitmap(dim, dim_key, m_bits=m_bits, n_hashes=n_hashes)
    pre = fact.filter(bloom_might_contain(bitmap, fact_key, n_hashes))
    return pre.join(dim, pre[fact_key] == dim[dim_key], "left_semi")


def bloom_size(n_keys: int, fpp: float = 0.01) -> tuple[int, int]:
    """Classic Bloom sizing: (m_bits, n_hashes) for a target false-positive
    rate — m = −n·ln(p)/ln(2)², k = (m/n)·ln(2) — with m rounded UP to a
    multiple of 64 (the bitmap word) and k clamped to [1, 8].  At 100 TB
    this is how the pre-filter stays a fixed-cost decision: pick the FP
    budget (wasted-shuffle fraction), derive the bitmap size, and the
    collect stays bounded by YOUR parameter regardless of corpus growth."""
    import math

    if n_keys <= 0:
        return 64, 1
    m = int(math.ceil(-n_keys * math.log(fpp) / (math.log(2) ** 2)))
    m = ((m + 63) // 64) * 64
    k = max(1, min(8, round(m / n_keys * math.log(2))))
    return m, k
