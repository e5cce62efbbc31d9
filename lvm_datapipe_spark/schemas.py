"""Canonical schemas for the clip-metadata data model.

The reference declares its schema as a Python dict of typed defaults
(``data_schema/macvid.py:11-44``, duplicated at
``evaluations/scene_cut.py:38-72``) and tolerates partially-filled records by
falling back to defaults (``evaluations/scene_cut.py:120-137``).  Here the
same model is one explicit nullable ``StructType`` — Spark nullability +
``F.coalesce`` replace the try/except defaulting, and schema inference is
never relied on (per-clip JSON files can be partially filled).

Two dialects, as in the reference:
- ``CLIP_SCHEMA``: nested working schema (basic / scene / camera / misc),
- ``FLAT_SCHEMA``: flat published MMTrail schema (``README.md:37-63``).
"""

from __future__ import annotations

from pyspark.sql import types as T

# -- nested working schema ---------------------------------------------------

# [height, width] — reference uses a 2-int list (macvid.py:16)
RESOLUTION = T.ArrayType(T.IntegerType())

# [start_idx, end_idx] frame span (macvid.py:21) — struct is cleaner than a
# positional array and enables range-join conditions on frame spans.
FRAME_SPAN = T.StructType(
    [
        T.StructField("start_frame", T.IntegerType()),
        T.StructField("end_frame", T.IntegerType()),
    ]
)

# {category, action, action_speed} (macvid.py:30-36)
SCENE_OBJECT = T.StructType(
    [
        T.StructField("category", T.StringType()),
        T.StructField("action", T.StringType()),
        T.StructField("action_speed", T.StringType()),
    ]
)

BASIC = T.StructType(
    [
        T.StructField("video_id", T.StringType()),
        T.StructField("video_path", T.StringType()),
        T.StructField("video_duration", T.DoubleType()),
        T.StructField("video_resolution", RESOLUTION),
        T.StructField("video_fps", T.DoubleType()),
        T.StructField("clip_id", T.StringType()),
        T.StructField("clip_path", T.StringType()),
        T.StructField("clip_duration", T.DoubleType()),
        T.StructField("clip_start_end_idx", FRAME_SPAN),
        # one score per sampled frame (README.md:50, aesthetic_score.py:132)
        T.StructField("optimal_score", T.ArrayType(T.DoubleType())),
    ]
)

SCENE = T.StructType(
    [
        T.StructField("captions", T.StringType()),
        T.StructField("place", T.StringType()),
        T.StructField("background", T.StringType()),
        T.StructField("style", T.StringType()),
        T.StructField("num_of_objects", T.IntegerType()),
        T.StructField("objects", T.ArrayType(SCENE_OBJECT)),
        T.StructField("imaging_quality", T.DoubleType()),
        T.StructField("ocr_score", T.DoubleType()),
    ]
)

CAMERA = T.StructType(
    [
        T.StructField("view_scale", T.StringType()),
        T.StructField("movement", T.StringType()),
        T.StructField("speed", T.StringType()),
    ]
)

CLIP_SCHEMA = T.StructType(
    [
        T.StructField("basic", BASIC),
        T.StructField("scene", SCENE),
        T.StructField("camera", CAMERA),
        # schemaless misc section (macvid.py:43); captions land in
        # misc.frame_caption (coca_caption.py:101)
        T.StructField("misc", T.MapType(T.StringType(), T.StringType())),
    ]
)

# -- flat published MMTrail schema (README.md:37-63) -------------------------

TIMED_CAPTION = T.StructType(
    [T.StructField("text", T.StringType()), T.StructField("time", T.StringType())]
)

FLAT_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType()),
        T.StructField("clip_id", T.StringType()),
        T.StructField("clip_path", T.StringType()),
        T.StructField("clip_duration", T.DoubleType()),
        T.StructField("image_quality", T.DoubleType()),
        T.StructField("of_score", T.DoubleType()),
        T.StructField("aesthetic_score", T.ArrayType(T.DoubleType())),
        T.StructField("ocr_score", T.DoubleType()),
        T.StructField("frame_caption", T.ArrayType(T.StringType())),
        T.StructField("caption", T.StringType()),
        T.StructField("polish_caption", T.StringType()),
        T.StructField("merge_caption", T.StringType()),
        T.StructField("objects", T.ArrayType(T.StringType())),
        T.StructField("background", T.StringType()),
        T.StructField("vocal_caption", T.StringType()),
        T.StructField("music_caption", T.ArrayType(TIMED_CAPTION)),
    ]
)

# -- auxiliary tables --------------------------------------------------------

# scene-detection output before explode (M1 shape, scene_cut.py:162-172)
SCENES_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType()),
        T.StructField(
            "scenes",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("start_frame", T.IntegerType()),
                        T.StructField("end_frame", T.IntegerType()),
                        T.StructField("start_s", T.DoubleType()),
                        T.StructField("end_s", T.DoubleType()),
                    ]
                )
            ),
        ),
    ]
)

# mvs_scores.txt sidecar: `score runtime clip_name` space-separated lines
# (scripts/run_extract_mvs.sh:14-20)
MVS_SCORES_SCHEMA = T.StructType(
    [
        T.StructField("score", T.DoubleType()),
        T.StructField("runtime_s", T.DoubleType()),
        T.StructField("clip_id", T.StringType()),
    ]
)

# sum_caption.csv sidecar (sum_caption_llama.py:52-55,106)
SUM_CAPTION_SCHEMA = T.StructType(
    [
        T.StructField("clip_path", T.StringType()),
        T.StructField("raw_llm_output", T.StringType()),
    ]
)

# done-marker listing used by the resume anti-join (F2,
# aesthetic_score.py:98 / ocr_score.py:64 — empty files are re-done)
DONE_MARKERS_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("size_bytes", T.LongType()),
    ]
)
