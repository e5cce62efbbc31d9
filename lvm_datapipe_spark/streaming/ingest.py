"""Streaming corpus ingest with INCREMENTAL near-dup flagging — the
continuous form of the nightly MinHash-LSH cross-dedup
(operators/dedup.py::minhash_lsh_pairs_cross).

Every micro-batch of arriving documents is banded (shingle → MinHash
signature → LSH band buckets), its bands are APPENDED to a persistent
band store stamped with the batch id, and each document is flagged
duplicate iff it shares a band bucket with a document from an EARLIER
batch, or with a smaller-id document in its own batch — FIRST SEEN WINS,
the incremental-ingest semantic (the keeper of a dup group is whoever
arrived first; id order only breaks ties inside one batch).  The batch
stamp is what makes crash replays idempotent: a replayed batch re-appends
band rows under its OWN batch id, which the earlier-batch predicate
excludes, so its flags are recomputed identically instead of every doc
matching its own residue.

Output lands partitioned by batch_id through the idempotent
dynamic-overwrite sink (a replayed batch overwrites its own partition).
At 100 TB the band store is the bucketed table form
(dedup.write_band_store) so the per-batch probe join is co-located; the
plain parquet append here keeps the streaming loop format-agnostic.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["start_incremental_dedup"]


def start_incremental_dedup(
    docs: DataFrame,
    band_dir: str,
    out_dir: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    k: int = 16,
    bands: int = 4,
    rows: int = 4,
):
    """Start the ingest-and-flag loop over a streaming documents frame."""
    from lvm_datapipe_spark.operators.dedup import band_buckets, minhash_signatures
    from lvm_datapipe_spark.sources.sinks import write_partitioned

    def _step(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        new_bands = band_buckets(
            minhash_signatures(batch_df, text_col, id_col, n, k),
            id_col,
            bands,
            rows,
        ).withColumn("batch_id", F.lit(int(batch_id)))
        new_bands.write.mode("append").parquet(band_dir)
        store = spark.read.parquet(band_dir)
        mine = new_bands.select(
            F.col(id_col).alias("_me"), "band", "bucket"
        )
        other = store.select(
            F.col(id_col).alias("_other"),
            "band",
            "bucket",
            F.col("batch_id").alias("_ob"),
        )
        earlier_or_tiebreak = (F.col("_ob") < int(batch_id)) | (
            (F.col("_ob") == int(batch_id)) & (F.col("_other") < F.col("_me"))
        )
        dup_ids = (
            mine.join(other, ["band", "bucket"])
            .filter(earlier_or_tiebreak)
            .select(F.col("_me").alias(id_col))
            .distinct()
            .withColumn("_dup", F.lit(True))
        )
        flagged = (
            batch_df.select(id_col)
            .join(dup_ids, id_col, "left_outer")
            .select(
                id_col,
                F.coalesce(F.col("_dup"), F.lit(False)).alias("is_dup"),
                F.lit(int(batch_id)).alias("batch_id"),
            )
        )
        write_partitioned(flagged, out_dir, ["batch_id"])

    os.makedirs(os.path.dirname(band_dir) or ".", exist_ok=True)
    return (
        docs.writeStream.foreachBatch(_step)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )
