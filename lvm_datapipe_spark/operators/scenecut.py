"""Scene detection + clip table construction (EP1, M1/M2).

Reference shape (utils/scenecut.py:88-127): per video — decode, detect scene
boundaries (PySceneDetect ContentDetector), split with ffmpeg, emit one
nested-JSON record per clip.  Spark shape (SURVEY.md §3 EP1):

    binaryFile scan → mapInPandas(detect_scenes) → explode(scenes)
    → withColumn(clip metadata exprs) → write parquet

The detector here is the deterministic content-delta analog of
ContentDetector (threshold on mean abs frame delta; reference threshold 30.0,
scene_cut.py:191) running on FVID payloads; a real adapter would call
PySceneDetect behind the same mapInPandas signature.  The physical ffmpeg
split (M2) is modeled as a byte-range materialization UDF — see
``split_clip_bytes`` — since clips of an FVID are themselves valid FVID.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from lvm_datapipe_spark import fakevideo
from lvm_datapipe_spark.functions.strings import clip_id, file_stem

DEFAULT_THRESHOLD = 30.0  # scene_cut.py:191 / utils/scenecut.py:96

SCENES_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("start_frame", T.IntegerType()),
            T.StructField("end_frame", T.IntegerType()),
            T.StructField("start_s", T.DoubleType()),
            T.StructField("end_s", T.DoubleType()),
        ]
    )
)


def detect_scene_bounds(frames: np.ndarray, fps: float, threshold: float) -> list[tuple]:
    """Content-delta scene detection: boundary wherever the mean absolute
    pixel delta between consecutive frames exceeds ``threshold`` (the
    HSV-delta ContentDetector analog).  Returns [(start_f, end_f_exclusive,
    start_s, end_s), ...] — the whole video as one scene when no boundary
    fires, matching PySceneDetect."""
    n = frames.shape[0]
    if n == 0:
        return []
    deltas = np.abs(np.diff(frames.astype(np.float64), axis=0)).mean(axis=(1, 2))
    bounds = [0] + [i + 1 for i, d in enumerate(deltas) if d > threshold] + [n]
    out = []
    for s, e in zip(bounds[:-1], bounds[1:]):
        out.append((int(s), int(e), s / fps, e / fps))
    return out


def detect_scenes(
    videos: DataFrame,
    content_col: str = "content",
    threshold: float = DEFAULT_THRESHOLD,
    out_col: str = "scenes",
) -> DataFrame:
    """M1 — one row per video gains a ``scenes`` array (the flatMap/UDTF
    shape noted in SURVEY.md §2.9: array-returning pandas UDF + explode)."""

    @pandas_udf(SCENES_TYPE)
    def _detect(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for content in batches:
            out = []
            for data in content:
                try:
                    v = fakevideo.decode(data)
                    out.append(detect_scene_bounds(v.frames, v.fps, threshold))
                except Exception:  # noqa: BLE001 — F4 null-row semantics
                    out.append(None)
            yield pd.Series(out, dtype=object)

    return videos.withColumn(out_col, _detect(F.col(content_col)))


def explode_scenes_to_clips(
    videos_with_scenes: DataFrame,
    path_col: str = "path",
    scenes_col: str = "scenes",
) -> DataFrame:
    """Explode scenes → one clip row per scene with the reference's clip
    metadata: video_id from the filename, clip index = per-video row_number
    ordered by start_frame (scene_cut.py:82 loop counter), clip_id =
    ``f'{video_id}_{idx:07d}'`` (C1), duration in seconds (C8).
    """
    w = Window.partitionBy("video_id").orderBy(F.col("scene.start_frame"))
    return (
        videos_with_scenes.filter(F.col(scenes_col).isNotNull())
        .select(
            file_stem(F.col(path_col)).alias("video_id"),
            F.col(path_col).alias("video_path"),
            F.explode(F.col(scenes_col)).alias("scene"),
        )
        .withColumn("clip_index", F.row_number().over(w) - 1)
        .select(
            "video_id",
            "video_path",
            clip_id(F.col("video_id"), F.col("clip_index")).alias("clip_id"),
            F.col("clip_index"),
            F.col("scene.start_frame").alias("start_frame"),
            F.col("scene.end_frame").alias("end_frame"),
            F.col("scene.start_s").alias("start_s"),
            F.col("scene.end_s").alias("end_s"),
            (F.col("scene.end_s") - F.col("scene.start_s")).alias("clip_duration"),
        )
    )


CLIP_BYTES_TYPE = T.BinaryType()


def split_clip_bytes(
    clips: DataFrame, content_col: str = "content", out_col: str = "clip_content"
) -> DataFrame:
    """M2 — physical clip split.  The reference shells out to ffmpeg per
    scene (split_video_ffmpeg, utils/scenecut.py:120-121); here the split is
    a byte-range re-encode of the FVID payload (a real adapter would invoke
    ffmpeg in a foreachPartition with the same columns).  Null content or
    bounds → null clip (F4)."""

    @pandas_udf(CLIP_BYTES_TYPE)
    def _split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.Series]:
        for pdf in batches:
            out = []
            for data, s, e in zip(pdf["content"], pdf["start_frame"], pdf["end_frame"]):
                try:
                    v = fakevideo.decode(data)
                    clip = fakevideo.FakeVideo(
                        v.height, v.width, v.fps, v.frames[int(s) : int(e)]
                    )
                    out.append(fakevideo.encode(clip))
                except Exception:  # noqa: BLE001
                    out.append(None)
            yield pd.Series(out, dtype=object)

    packed = F.struct(
        F.col(content_col).alias("content"),
        F.col("start_frame").alias("start_frame"),
        F.col("end_frame").alias("end_frame"),
    )
    return clips.withColumn(out_col, _split(packed))


def scene_cut(
    videos: DataFrame,
    path_col: str = "path",
    content_col: str = "content",
    threshold: float = DEFAULT_THRESHOLD,
    materialize_clips: bool = True,
) -> DataFrame:
    """EP1 end-to-end: videos(path, content) → clips table with per-clip
    metadata (+ clip payloads when ``materialize_clips``).  The reference's
    joblib chunking / breakpoint-resume scaffolding (scene_cut.py:226-263)
    is replaced by Spark task parallelism + the generic resume anti-join."""
    with_scenes = detect_scenes(videos, content_col, threshold)
    clips = explode_scenes_to_clips(with_scenes, path_col)
    if materialize_clips:
        # join the raw payload (NOT with_scenes — that would run the
        # detector a second time down the second lineage)
        payload = videos.select(F.col(path_col).alias("video_path"), F.col(content_col))
        clips = split_clip_bytes(clips.join(payload, "video_path"))
    return clips
