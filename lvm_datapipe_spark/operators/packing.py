"""Sequence packing: assign documents to fixed-size training windows.

Language-model training consumes fixed-length token windows (e.g. 4096
tokens), not documents.  The standard streaming pack — concatenate
documents in a deterministic order into one token stream, then cut the
stream every ``ctx_len`` tokens — is a pure prefix-sum computation, which
makes it exact, order-independent-reproducible, and window-function-shaped
(no sequential driver loop, unlike first-fit bin packing, which is
inherently serial and gains ~nothing in padding efficiency at web scale).

Per document this emits:

- ``start_offset``: the document's first token's position in the stream;
- ``pack_id``: the window containing that first token;
- ``n_packs``: how many windows the document spans (≥ 2 when it crosses a
  boundary — consumers either split the doc across windows or re-pad,
  both decisions derivable from these columns);
- ``pack_offset``: position within its first window.

Scale shape: one window cumsum per shard.  A single global ordering would
serialize on one partition at 100 TB, so packing is per-``shard_col``
(e.g. source, date bucket, or a hash bucket from
``operators.sampling.hash_bucket``): each shard's stream is independent,
the window partitions by shard, and shards pack in parallel.  Pass
``shard_col=None`` only for corpus sizes where one sort partition is fine
(tests, small curation runs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    token_col: str,
    order_col: str = "doc_id",
    shard_col: str | None = None,
    ctx_len: int = 2048,
) -> DataFrame:
    """Streaming concat-and-chunk packing: documents ordered by
    ``order_col`` (within ``shard_col`` if given) are laid head-to-tail in
    a token stream cut every ``ctx_len`` tokens.  Deterministic given the
    ordering columns — exactly replayable as a SQL window query."""
    if shard_col is None:
        w = Window.orderBy(order_col)
    else:
        w = Window.partitionBy(shard_col).orderBy(order_col)
    cum = F.sum(F.col(token_col)).over(w)
    out = df.withColumn("start_offset", cum - F.col(token_col))
    return (
        out.withColumn(
            "pack_id", F.floor(F.col("start_offset") / ctx_len).cast("long")
        )
        .withColumn(
            "pack_offset", (F.col("start_offset") % ctx_len).cast("long")
        )
        .withColumn(
            "n_packs",
            F.when(
                F.col(token_col) == 0, F.lit(1)
            ).otherwise(
                F.floor(
                    (F.col("start_offset") + F.col(token_col) - 1) / ctx_len
                ).cast("long")
                - F.col("pack_id")
                + 1
            ),
        )
    )


def pack_utilization(
    packed: DataFrame, token_col: str = "n_tokens", ctx_len: int = 2048
) -> DataFrame:
    """Packing efficiency per pack: tokens landing in each window over the
    window size.  Streaming concat always fills every window except the
    final one per shard, so this is mostly a sanity/monitoring aggregate."""
    spans = packed.select(
        F.explode(
            F.sequence(F.col("pack_id"), F.col("pack_id") + F.col("n_packs") - 1)
        ).alias("pack_id"),
        "start_offset",
        token_col,
    )
    # tokens of this doc inside this particular window
    win_start = F.col("pack_id") * ctx_len
    doc_start = F.col("start_offset")
    doc_end = F.col("start_offset") + F.col(token_col)
    in_window = F.least(doc_end, win_start + ctx_len) - F.greatest(doc_start, win_start)
    return (
        spans.withColumn("tokens_in_pack", in_window)
        .groupBy("pack_id")
        .agg(
            F.sum("tokens_in_pack").alias("tokens"),
            (F.sum("tokens_in_pack") / ctx_len).alias("utilization"),
        )
    )
