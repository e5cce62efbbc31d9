"""Z-order (Morton-curve) clustered writes — multi-dimensional data
skipping for the 100 TB scan.

Parquet row-group pruning works off per-file/per-row-group min-max
statistics, so it only helps along dimensions the layout is sorted by: a
plain ``sortWithinPartitions(a)`` gives perfect pruning on ``a`` and NONE
on ``b``.  Interleaving the bits of both (bucketized) dimensions into one
Morton key and range-partitioning + sorting by it clusters the data along
BOTH axes at once — every file covers a small rectangle of (a, b) space,
so a conjunctive range filter on either or both columns prunes most
files before any row is read.  This is the layout trick behind
Delta/Iceberg ``OPTIMIZE ZORDER BY`` and ClickHouse's space-filling-curve
indexes, expressed with stock Spark: an expression key + repartitionByRange
+ sortWithinPartitions; nothing engine-specific.

The Morton key is a flat shift/mask SQL expression (whole-stage codegen,
no UDF); bucketization to ``bits`` levels per dimension bounds the
expression at 2·bits terms.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "morton_key",
    "zorder_bucket",
    "write_zordered",
    "hilbert_key_udf",
    "write_hilbert",
]


def zorder_bucket(col_sql: str, lo: float, hi: float, bits: int = 8) -> str:
    """SQL text bucketizing a numeric column into [0, 2^bits): clamp to
    [lo, hi], scale, floor.  Monotone in the input, so per-file min-max on
    the RAW column stays tight when the layout sorts by the bucket."""
    n = 1 << bits
    return (
        f"least({n - 1}, greatest(0, CAST(floor("
        f"(({col_sql}) - {float(lo)!r}D) / ({float(hi)!r}D - {float(lo)!r}D) * {n}"
        f") AS INT)))"
    )


def morton_key(a_sql: str, b_sql: str, bits: int = 8) -> Column:
    """Interleave the low ``bits`` bits of two bucket expressions into one
    Morton key: a's bit i lands at position 2i, b's at 2i+1.  One flat
    shift/mask expression — 2·bits codegen terms, no UDF."""
    terms = []
    for i in range(bits):
        terms.append(f"(shiftleft((shiftright(CAST({a_sql} AS BIGINT), {i}) & 1), {2 * i}))")
        terms.append(f"(shiftleft((shiftright(CAST({b_sql} AS BIGINT), {i}) & 1), {2 * i + 1}))")
    return F.expr(" + ".join(terms))


def write_zordered(
    df: DataFrame,
    path: str,
    a_sql: str,
    b_sql: str,
    bits: int = 8,
    n_files: int = 8,
) -> None:
    """Write ``df`` as parquet clustered along the (a, b) Morton curve:
    range-partition on the key (each output file owns a contiguous curve
    segment = a small rectangle of the 2-D space), sort within partitions
    so row groups inside a file are tight too.  Readers need nothing
    special — parquet min-max pruning on the raw columns does the
    skipping."""
    _write_curve_clustered(
        df.withColumn("_zkey", morton_key(a_sql, b_sql, bits)),
        path, "_zkey", n_files,
    )


def _write_curve_clustered(keyed: DataFrame, path: str, key_col: str, n_files: int) -> None:
    """Shared layout-write recipe for every space-filling curve: range-
    partition on the key (each file owns a contiguous curve segment),
    sort within partitions, drop the key, overwrite parquet."""
    (
        keyed.repartitionByRange(n_files, key_col)
        .sortWithinPartitions(key_col)
        .drop(key_col)
        .write.mode("overwrite")
        .parquet(path)
    )


def hilbert_key_udf(bits: int = 8):
    """Arrow-batched Hilbert index (xy2d): bucketized (a, b) → position on
    the order-``bits`` Hilbert curve.

    Hilbert beats Morton on locality — EVERY pair of consecutive curve
    positions is an adjacent cell (Manhattan distance 1), where Morton
    jumps across the space at power-of-two boundaries — so file rectangles
    are tighter for the same file count.  The cost: the xy2d rotation
    state cannot unroll into a flat SQL expression (each level rewrites
    both coordinates — exponential term growth), so the key is a
    vectorized-numpy pandas UDF.  That is a WRITE-TIME-only cost in a
    layout rewrite job; readers never compute the key (parquet min-max
    pruning works off the raw columns), so the query hot path stays
    whole-stage-codegen exactly like the Morton path.
    """

    @F.pandas_udf("long")
    def hilbert(a: pd.Series, b: pd.Series) -> pd.Series:
        # null buckets → null key (matching the Morton expression, whose
        # null arithmetic yields null) — a NaN→int64 cast would produce
        # platform-dependent garbage curve positions
        mask = a.isna() | b.isna()
        x = a.fillna(0).to_numpy(dtype=np.int64).copy()
        y = b.fillna(0).to_numpy(dtype=np.int64).copy()
        d = np.zeros_like(x)
        s = np.int64(1 << (bits - 1))
        while s > 0:
            rx = ((x & s) > 0).astype(np.int64)
            ry = ((y & s) > 0).astype(np.int64)
            d += s * s * ((3 * rx) ^ ry)
            # rotate quadrant: classic xy2d step, vectorized
            flip = (ry == 0) & (rx == 1)
            x_f = np.where(flip, s - 1 - x, x)
            y_f = np.where(flip, s - 1 - y, y)
            swap = ry == 0
            x, y = (
                np.where(swap, y_f, x_f),
                np.where(swap, x_f, y_f),
            )
            s >>= 1
        out = pd.Series(d, dtype="Int64")
        out[mask.to_numpy()] = pd.NA
        return out

    return hilbert


def write_hilbert(
    df: DataFrame,
    path: str,
    a_sql: str,
    b_sql: str,
    bits: int = 8,
    n_files: int = 8,
) -> None:
    """:func:`write_zordered` on the Hilbert curve: same range-partition +
    in-partition sort recipe, tighter per-file rectangles."""
    key = hilbert_key_udf(bits)
    _write_curve_clustered(
        df.withColumn(
            "_hkey", key(F.expr(a_sql).cast("long"), F.expr(b_sql).cast("long"))
        ),
        path, "_hkey", n_files,
    )
