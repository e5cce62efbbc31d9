"""Metadata table sources/sinks (S3-S9, SURVEY.md §2.1).

The reference stores clip metadata three ways — whole-shard JSON arrays,
JSONL appended per clip, and one-JSON-file-per-clip directories — and ships
hand-written converters between them (``merged_metadata``/``sort_metadata``,
``data_schema/macvid.py:46-76``).  Here each layout is just a Spark
source/sink over the same explicit schema; the canonical store is a Parquet
snapshot (columnar, splittable — the file-per-clip layout is a small-files
antipattern at scale and exists only as an export mode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def load_json_array_shards(
    spark: SparkSession, paths: list[str] | str, schema: T.StructType
) -> DataFrame:
    """S3 — whole-shard JSON arrays (``video_dataset_x.json``); multiple META
    paths concatenate (``data_schema/macvid.py:146-159``) — in Spark a path
    list is an implicit union.  Always explicit-schema: per-clip files can be
    partially filled, so inference is never relied on (SURVEY.md §1.2)."""
    return spark.read.option("multiLine", "true").schema(schema).json(paths)


def load_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """S4 (read side) — JSONL is Spark's native JSON format."""
    return spark.read.schema(schema).json(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "append") -> None:
    """S4 — the appended-JSONL sink (``utils/scenecut.py:105,119``).  The
    malformed-array append+repair dance (S5, scene_cut.py:249-279) has no
    equivalent: JSONL needs no repair."""
    df.write.mode(mode).json(path)


def load_per_clip_dir(spark: SparkSession, directory: str, schema: T.StructType) -> DataFrame:
    """S8 — ``merged_metadata``: read a folder of one-JSON-per-clip files as
    one table (``data_schema/macvid.py:46-60``) — a plain multiLine scan
    over a glob, no custom merge code."""
    return (
        spark.read.option("multiLine", "true")
        .schema(schema)
        .json(f"{directory}/*.json")
    )


def export_per_clip_json(df: DataFrame, directory: str, clip_id_col: str = "clip_id") -> None:
    """S6/S7 — ``sort_metadata`` export: one directory per clip id.  Export
    mode ONLY (small-files antipattern; the canonical sink is
    :func:`write_snapshot` in plans.pipeline)."""
    df.write.mode("overwrite").partitionBy(clip_id_col).json(directory)


def snapshot_done_markers(spark: SparkSession, directory: str) -> DataFrame:
    """F2's ``done`` side — scan a per-clip sink directory into (clip_id,
    size_bytes), the reference's os.path.exists/getsize resume check
    (``aesthetic_score.py:98``, ``ocr_score.py:64``) as a listing scan."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.json")
        .option("recursiveFileLookup", "true")
        .load(directory)
    )
    clip_id = F.regexp_replace(
        F.element_at(F.split("path", "/"), -1), r"\.json$", ""
    )
    return files.select(clip_id.alias("clip_id"), F.col("length").alias("size_bytes"))


def load_evolving_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet directory whose batches were written under EVOLVING
    schemas (new columns appearing over time — the normal life of a
    long-lived snapshot store).  ``mergeSchema`` unions all file footers:
    columns absent in older files surface as nulls, so downstream code sees
    one stable superset schema.  Schema merge reads every footer — at 100 TB
    pin the merged schema in a catalog after the first read rather than
    re-merging per query."""
    return spark.read.option("mergeSchema", "true").parquet(path)
