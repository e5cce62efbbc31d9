"""Sidecar score/caption tables (S10/S11, J3).

- ``mvs_scores.txt``: space-separated ``score runtime clip_name`` lines
  written by the MV-extraction shell driver (scripts/run_extract_mvs.sh:14-20)
- ``sum_caption.csv``: (clip_path, raw LLM output) rows
  (evaluations/sum_caption_llama.py:52-55,106)

Both read with explicit schemas and join back to the clips table on clip id
(the reference carries the filename precisely to allow this merge; no merge
code ships — SURVEY.md J3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lvm_datapipe_spark.functions.strings import extract_answer_words, file_stem
from lvm_datapipe_spark.schemas import MVS_SCORES_SCHEMA, SUM_CAPTION_SCHEMA


def read_mvs_scores(spark: SparkSession, path: str) -> DataFrame:
    """S11 — space-separated sidecar; clip_name column normalized to the
    bare clip id (basename sans extension) for the J3 join."""
    df = spark.read.csv(path, sep=" ", schema=MVS_SCORES_SCHEMA)
    return df.withColumn("clip_id", file_stem(F.col("clip_id")))


def write_mvs_scores(df: DataFrame, path: str) -> None:
    df.select("score", "runtime_s", "clip_id").write.mode("overwrite").csv(path, sep=" ")


def read_sum_captions(spark: SparkSession, path: str) -> DataFrame:
    """S10 — CSV of raw LLM outputs, with the C7 answer-word extraction
    (``Answer: [...]`` regex, sum_caption_llama.py:42-50) applied as a
    native expression."""
    # escape='"' = standard CSV doubled-quote escaping (Spark's default is
    # backslash, which silently truncates quoted LLM output)
    df = spark.read.csv(path, schema=SUM_CAPTION_SCHEMA, escape='"')
    return df.select(
        "clip_path",
        file_stem(F.col("clip_path")).alias("clip_id"),
        extract_answer_words(F.col("raw_llm_output")).alias("objects"),
    )


def join_sidecar(clips: DataFrame, sidecar: DataFrame, key: str = "clip_id") -> DataFrame:
    """J3 — broadcast left join of a sidecar back into clips."""
    return clips.join(F.broadcast(sidecar), on=key, how="left")
