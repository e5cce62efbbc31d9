"""Video directory sources (S1/S2).

Reference: ``os.listdir(vid_dir)`` + extension whitelist
(``utils/scenecut.py:101-112``, ``evaluations/scene_cut.py:196-200,237-245``).
Spark: the ``binaryFile`` source yields (path, modificationTime, length,
content) with partition-parallel listing; the extension predicate is a
``pathGlobFilter`` pushed into the file index, so excluded files are never
opened.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lvm_datapipe_spark.functions.strings import file_extension

# utils/scenecut.py:108-112 whitelist + our test container format
VIDEO_EXTENSIONS = ("mp4", "avi", "mkv", "mov", "wmv", "flv", "webm", "mpeg", "mpg", "fvid")


def scan_video_dir(
    spark: SparkSession,
    directory: str,
    extensions: tuple[str, ...] = VIDEO_EXTENSIONS,
    with_content: bool = True,
) -> DataFrame:
    """S1+S2 — list a video directory as (path, length, content?).

    ``binaryFile`` keeps whole payloads in executor memory — at scale prefer
    ``with_content=False`` (listing only) and let decode UDFs open paths
    from shared storage (SURVEY.md §7 "hard parts").
    """
    pattern = "*.{" + ",".join(extensions) + "}"
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .option("recursiveFileLookup", "true")
        .load(directory)
    )
    cols = ["path", "length"] + (["content"] if with_content else [])
    return df.select(*cols)


def filter_video_extensions(
    df: DataFrame, path_col: str = "path", extensions: tuple[str, ...] = VIDEO_EXTENSIONS
) -> DataFrame:
    """S2 as a relational predicate, for pre-listed path tables (the
    reference's rsplit('.')-in-whitelist check)."""
    return df.filter(file_extension(F.col(path_col)).isin(*extensions))
