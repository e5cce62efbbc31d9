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


def have_pyscenedetect() -> bool:
    import importlib.util

    return importlib.util.find_spec("scenedetect") is not None


def pyscenedetect_bounds(
    data: bytes, threshold: float = DEFAULT_THRESHOLD, scenedetect_mod=None
) -> list[tuple] | None:
    """M1 real adapter — PySceneDetect ContentDetector, the exact reference
    call sequence (scene_cut.py:162-172: open_video → SceneManager →
    add_detector(ContentDetector(threshold)) → detect_scenes →
    get_scene_list).  Scene list timecodes convert to the same
    (start_f, end_f, start_s, end_s) tuples as the content-delta analog.

    ``scenedetect_mod`` is injectable for tests; default imports the real
    package (import-guarded by callers via :func:`have_pyscenedetect`).
    """
    import tempfile

    sd = scenedetect_mod
    if sd is None:
        import scenedetect as sd  # noqa: F811 — optional dependency

    with tempfile.NamedTemporaryFile(suffix=".mp4") as tmp:
        tmp.write(data)
        tmp.flush()
        video = sd.open_video(tmp.name)
        manager = sd.SceneManager()
        manager.add_detector(sd.ContentDetector(threshold=threshold))
        manager.detect_scenes(video)
        scenes = manager.get_scene_list()
    out = []
    for start, end in scenes:
        out.append(
            (
                int(start.get_frames()),
                int(end.get_frames()),
                float(start.get_seconds()),
                float(end.get_seconds()),
            )
        )
    return out


def _detect_one(data: bytes, threshold: float) -> list[tuple] | None:
    """Per-video dispatch: FVID → content-delta analog; real containers →
    PySceneDetect when importable on this worker; else None (F4 null row)."""
    if data is None:
        return None
    try:
        if fakevideo.is_fvid(data):
            v = fakevideo.decode(data)
            return detect_scene_bounds(v.frames, v.fps, threshold)
        if have_pyscenedetect():
            return pyscenedetect_bounds(data, threshold)
        return None
    except Exception:  # noqa: BLE001 — F4 null-row semantics
        return None


def detect_scenes(
    videos: DataFrame,
    content_col: str = "content",
    threshold: float = DEFAULT_THRESHOLD,
    out_col: str = "scenes",
) -> DataFrame:
    """M1 — one row per video gains a ``scenes`` array (the flatMap/UDTF
    shape noted in SURVEY.md §2.9: array-returning pandas UDF + explode).
    Backend resolves per worker inside the UDF (:func:`_detect_one`)."""

    @pandas_udf(SCENES_TYPE)
    def _detect(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for content in batches:
            yield pd.Series(
                [_detect_one(data, threshold) for data in content], dtype=object
            )

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


def have_ffmpeg() -> bool:
    import shutil

    return shutil.which("ffmpeg") is not None


def ffmpeg_split_argv(
    video_path: str, start_s: float, end_s: float, out_path: str
) -> list[str]:
    """The per-scene ffmpeg invocation of split_video_ffmpeg
    (utils/scenecut.py:120-121): accurate seek (``-ss`` after ``-i``),
    duration-bounded, stream re-encode so the cut lands on the exact frame."""
    return [
        "ffmpeg", "-nostdin", "-y",
        "-i", video_path,
        "-ss", f"{start_s:.6f}",
        "-t", f"{end_s - start_s:.6f}",
        "-map", "0",
        "-c:v", "libx264", "-preset", "fast", "-crf", "21",
        "-c:a", "aac",
        out_path,
    ]


def _ffmpeg_split_partition(rows, out_dir: str, runner) -> int:
    """Executor-side body of the M2 ffmpeg adapter: one subprocess per clip
    row, null-safe, counts successful splits.  ``runner`` is the subprocess
    entry point — the real one below, a recorder in tests."""
    n = 0
    for row in rows:
        if row.video_path is None or row.start_s is None or row.end_s is None:
            continue
        out_path = f"{out_dir}/{row.clip_id}.mp4"
        try:
            runner(ffmpeg_split_argv(row.video_path, row.start_s, row.end_s, out_path))
            n += 1
        except Exception:  # noqa: BLE001 — one bad clip must not kill the task
            continue
    return n


def ffmpeg_split_clips(clips: DataFrame, out_dir: str) -> None:
    """M2 real adapter — physically split source videos into per-clip mp4
    files with ffmpeg, one subprocess per clip row, fanned out with
    ``foreachPartition`` (the executors shell out in parallel; no data moves
    through the driver).  Requires the ffmpeg binary on the workers
    (:func:`have_ffmpeg`); ``split_clip_bytes`` remains the in-engine
    byte-range splitter for FVID payloads."""
    import subprocess

    def _run(argv):  # pragma: no cover — needs the real binary
        subprocess.run(argv, capture_output=True, check=True)

    def _partition(rows):  # pragma: no cover — executor-side
        _ffmpeg_split_partition(rows, out_dir, _run)

    clips.select("clip_id", "video_path", "start_s", "end_s").foreachPartition(
        _partition
    )


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


def boundary_f1(
    pred: DataFrame,
    gold: DataFrame,
    tol_s: float = 0.5,
    video_col: str = "path",
    t_col: str = "start_s",
) -> DataFrame:
    """Scene-boundary detection quality: per-video precision/recall/F1 of
    predicted boundaries against gold at a time tolerance — the eval loop
    for tuning detector thresholds (PySceneDetect's threshold=27, the
    FVID analog's delta) against human-labelled cuts.

    Matching is GREEDY-BY-PROXIMITY made deterministic as one-to-one
    nearest-neighbor within ±tol_s: a range join keyed on the video
    (never a cross product across videos) pairs each prediction with
    candidate gold cuts, then two window passes keep each (pred, gold)
    pair only if each side is the other's best match (distance, then
    earlier time as tie-break).  All shuffles are video-keyed; per-video
    boundary counts are tiny, so the quadratic-within-tolerance candidate
    set is bounded by boundary density, not corpus size.

    F1 uses the 0/0→0 convention (a video with no gold and no predicted
    boundaries scores precision=recall=f1=1).
    """
    p = pred.select(
        F.col(video_col).alias("_v"), F.col(t_col).cast("double").alias("tp")
    ).filter(F.col("tp") > 0)
    g = gold.select(
        F.col(video_col).alias("_v"), F.col(t_col).cast("double").alias("tg")
    ).filter(F.col("tg") > 0)
    cand = p.join(g, "_v").filter(F.abs(F.col("tp") - F.col("tg")) <= tol_s)
    d = F.abs(F.col("tp") - F.col("tg"))
    w_pred = Window.partitionBy("_v", "tp").orderBy(d.asc(), F.col("tg").asc())
    w_gold = Window.partitionBy("_v", "tg").orderBy(d.asc(), F.col("tp").asc())
    matched = (
        cand.withColumn("_rp", F.row_number().over(w_pred))
        .withColumn("_rg", F.row_number().over(w_gold))
        .filter((F.col("_rp") == 1) & (F.col("_rg") == 1))
        .groupBy("_v")
        .agg(F.count(F.lit(1)).alias("n_match"))
    )
    np_ = p.groupBy("_v").agg(F.count(F.lit(1)).alias("n_pred"))
    ng = g.groupBy("_v").agg(F.count(F.lit(1)).alias("n_gold"))
    j = (
        np_.join(ng, "_v", "full_outer")
        .join(matched, "_v", "left_outer")
        .select(
            F.col("_v").alias(video_col),
            F.coalesce("n_pred", F.lit(0)).alias("n_pred"),
            F.coalesce("n_gold", F.lit(0)).alias("n_gold"),
            F.coalesce("n_match", F.lit(0)).alias("n_match"),
        )
    )
    prec = F.when(F.col("n_pred") == 0,
                  F.when(F.col("n_gold") == 0, 1.0).otherwise(0.0)).otherwise(
        F.col("n_match") / F.col("n_pred")
    )
    rec = F.when(F.col("n_gold") == 0,
                 F.when(F.col("n_pred") == 0, 1.0).otherwise(0.0)).otherwise(
        F.col("n_match") / F.col("n_gold")
    )
    f1 = F.when((prec + rec) == 0.0, 0.0).otherwise(2 * prec * rec / (prec + rec))
    return j.select(
        video_col, "n_pred", "n_gold", "n_match",
        prec.alias("precision"), rec.alias("recall"), f1.alias("f1"),
    )
