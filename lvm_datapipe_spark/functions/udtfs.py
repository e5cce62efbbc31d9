"""Python user-defined TABLE functions — the row-expanding end of the UDF
surface (§2.9).

Position in the hierarchy (ARCHITECTURE §1): native expressions beat
Arrow-batched pandas UDFs beat everything else, and every hot-path
operator in this repo is native — ``text_sentences`` and
``text_chunk_overlap`` do these exact expansions with explode/substring
at scan speed.  A UDTF is the right tool ONLY when one input row must
become a VARIABLE number of rows through logic that genuinely needs
imperative Python (stateful parsers, third-party tokenizers) — the
lateral-join integration means the expansion still runs per-executor and
composes with the rest of the plan instead of collecting to the driver.

These UDTFs are pure functions of their inputs, so their queries remain
oracle-checkable (this PySpark version exposes no determinism flag on
``udtf``; purity is by construction and pinned by the model-comparison
test).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

__all__ = ["SentenceChunks", "register_udtfs"]


@udtf(returnType="chunk_idx int, start_pos int, chunk string")
class SentenceChunks:
    """Greedy sentence-packing chunker: split text on sentence enders, then
    pack consecutive sentences into chunks of at most ``max_chars`` —
    never splitting inside a sentence (unless a single sentence alone
    exceeds the cap, which becomes its own chunk).  One input row yields
    a variable number of (chunk_idx, start_pos, chunk) rows; the greedy
    carry-over across sentences is the imperative part a pure
    explode/substring expression can't express."""

    MAX_CHARS = 120

    def eval(self, text: str):  # noqa: D102 — UDTF contract
        if text is None:
            return
        # sentence split on . ! ? followed by whitespace (same convention
        # as the native text_sentences query)
        import re

        parts = [s for s in re.split(r"(?<=[.!?])\s+", text) if s]
        chunk: list[str] = []
        size = 0
        idx = 0
        pos = 0
        start = 0
        for s in parts:
            if chunk and size + 1 + len(s) > self.MAX_CHARS:
                yield idx, start, " ".join(chunk)
                idx += 1
                chunk, size = [], 0
                start = pos
            chunk.append(s)
            size += (1 if size else 0) + len(s)
            pos += len(s) + 1
        if chunk:
            yield idx, start, " ".join(chunk)


def register_udtfs(spark) -> None:
    """Register every UDTF for SQL lateral-join use."""
    spark.udtf.register("sentence_chunks", SentenceChunks)
