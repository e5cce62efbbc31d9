"""End-to-end media pipeline tests (SURVEY.md §5 plan items 3+4): synthetic
videos → scene cut → frame sampling → scorer stubs → snapshot/resume,
asserting the reference's invariants (count consistency, duration
completeness, clip-id format)."""

from __future__ import annotations

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from lvm_datapipe_spark import fakevideo
from lvm_datapipe_spark.functions.strings import clean_caption
from lvm_datapipe_spark.operators import media, scenecut
from lvm_datapipe_spark.operators.relational import drop_failed_rows, resume_anti_join
from lvm_datapipe_spark.plans import pipeline
from lvm_datapipe_spark.sources import metadata as meta_src
from lvm_datapipe_spark.sources import sidecars
from lvm_datapipe_spark.sources.video import scan_video_dir

N_VIDEOS = 10


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("videos")
    fakevideo.write_corpus(str(d), [f"vid_{i:05d}" for i in range(N_VIDEOS)])
    (d / "notes.txt").write_text("not a video")  # S2 must exclude
    return str(d)


@pytest.fixture(scope="module")
def videos(spark, corpus_dir):
    return scan_video_dir(spark, corpus_dir).cache()


@pytest.fixture(scope="module")
def clips(spark, videos):
    return scenecut.scene_cut(videos).cache()


# -- codec ------------------------------------------------------------------


def test_fakevideo_roundtrip():
    v = fakevideo.generate("vid_test", n_scenes=2)
    data = fakevideo.encode(v)
    info = fakevideo.probe(data)
    assert info["n_frames"] == v.n_frames and info["fps"] == v.fps
    back = fakevideo.decode(data)
    assert np.array_equal(back.frames, v.frames)
    frames = fakevideo.decode_frames(data, [0, v.n_frames - 1, 10**9])
    assert frames[1] == frames[2]  # out-of-range clamps to last (cv2 behavior)


def test_detect_scene_bounds_exact():
    segs = [np.full((5, 4, 4), 40, np.uint8), np.full((7, 4, 4), 200, np.uint8)]
    v = fakevideo.FakeVideo(4, 4, 25.0, np.concatenate(segs))
    bounds = scenecut.detect_scene_bounds(v.frames, v.fps, threshold=30.0)
    assert bounds == [(0, 5, 0.0, 0.2), (5, 12, 0.2, 12 / 25.0)]


# -- scan + scene cut -------------------------------------------------------


def test_scan_excludes_non_videos(videos):
    paths = [r.path for r in videos.select("path").collect()]
    assert len(paths) == N_VIDEOS
    assert all(p.endswith(".fvid") for p in paths)


def test_scene_cut_invariants(spark, videos, clips):
    rows = clips.collect()
    # count consistency (A8): clips == sum of per-video scenes
    total_scenes = sum(
        len(fakevideo.probe(r.content) and scenecut.detect_scene_bounds(
            fakevideo.decode(r.content).frames, 25.0, 30.0))
        for r in videos.collect()
    )
    assert len(rows) == total_scenes
    # clip_id format (C1): video_id + 7-digit zero-padded index
    for r in rows:
        assert r.clip_id == f"{r.video_id}_{r.clip_index:07d}"
    # duration completeness (A1): every video's clips sum to its duration
    per_video = (
        clips.groupBy("video_id").agg(F.sum("clip_duration").alias("total")).collect()
    )
    durations = {
        r.path.split("/")[-1][:-5]: fakevideo.probe(r.content)["duration_s"]
        for r in videos.collect()
    }
    for r in per_video:
        assert abs(durations[r.video_id] - r.total) < 1e-6
    # clip payloads decode to exactly the scene's frame span
    for r in rows[:5]:
        v = fakevideo.decode(r.clip_content)
        assert v.n_frames == r.end_frame - r.start_frame


def test_scene_cut_null_on_corrupt(spark):
    bad = spark.createDataFrame([("x.fvid", bytearray(b"JUNKJUNKJUNK"))], ["path", "content"])
    out = scenecut.detect_scenes(bad)
    assert out.filter(F.col("scenes").isNotNull()).count() == 0


# -- frame sampling + scorers ----------------------------------------------


@pytest.fixture(scope="module")
def scored_input(clips):
    withp = media.probe_videos(clips, content_col="clip_content")
    return withp.select(
        "clip_id",
        F.col("clip_content").alias("content"),
        F.col("probe.height").alias("height"),
        F.col("probe.width").alias("width"),
        F.col("probe.n_frames").alias("n_frames"),
    ).cache()


def test_sampling_policies(scored_input):
    fr = media.with_sampled_frames(scored_input, policy="fractions")
    row = fr.select("n_frames", "frames").first()
    assert len(row.frames) == 3  # [0.2, 0.5, 0.8]
    fml = media.with_sampled_frames(scored_input, policy="first_mid_last").first()
    assert len(fml.frames) == 3
    st = media.with_sampled_frames(scored_input, policy="stride", stride=10)
    r = st.select("n_frames", "frames").first()
    assert len(r.frames) == (r.n_frames + 9) // 10


def test_sampling_resize_at_decode(scored_input):
    """Decord-parity target_hw: frames come out of the decoder already at
    (h, w) — exact nearest-neighbor of the native frame — and the
    height/width columns follow so scorers reshape correctly."""
    import numpy as np

    native = scored_input.select("content", "height", "width").first()
    out = media.with_sampled_frames(
        scored_input, policy="first_mid_last", target_hw=(24, 32)
    )
    row = out.select("frames", "height", "width").first()
    assert (row.height, row.width) == (24, 32)
    assert all(len(f) == 24 * 32 for f in row.frames)

    full = media.with_sampled_frames(
        scored_input, policy="first_mid_last"
    ).select("frames").first()
    want = media._resize_nn(
        np.frombuffer(full.frames[0], dtype=np.uint8).reshape(
            native.height, native.width
        ),
        24,
        32,
    ).tobytes()
    assert bytes(row.frames[0]) == want


def test_sampling_resize_preserves_metadata_on_failed_rows(spark):
    """target_hw must not stamp (h, w) onto rows whose decode FAILED — the
    frames column is null there and the original metadata must survive."""
    df = spark.createDataFrame(
        [("bad", bytearray(b"\x00not-a-video"), 480, 640)],
        "clip_id string, content binary, height int, width int",
    )
    row = (
        media.with_sampled_frames(df, policy="first_mid_last", target_hw=(24, 32))
        .select("frames", "height", "width")
        .first()
    )
    assert row.frames is None
    assert (row.height, row.width) == (480, 640)


def test_scorers(scored_input):
    df = media.with_sampled_frames(scored_input, policy="fractions")
    for name in ("aesthetic", "imaging_quality", "ocr", "motion", "caption"):
        df = media.apply_scorer(df, name)
    row = df.first()
    assert len(row.optimal_score) == 3 and all(0 <= s <= 10 for s in row.optimal_score)
    assert 0.0 <= row.imaging_quality <= 100.0
    assert row.ocr_score >= 0.0
    assert row.of_score >= 0.0  # within-scene motion is small but nonnegative
    assert len(row.frame_caption_raw) == 3
    # C5 cleanup strips the generation markers
    cleaned = (
        df.select(clean_caption(F.col("frame_caption_raw")[0]).alias("c")).first().c
    )
    assert "<start_of_text>" not in cleaned and "<end_of_text>" not in cleaned


def test_decode_failure_yields_null_row(spark):
    df = spark.createDataFrame(
        [("good.fvid", fakevideo.encode(fakevideo.generate("ok"))), ("bad.fvid", bytearray(b"XXXX"))],
        ["path", "content"],
    )
    sampled = media.with_sampled_frames(df)
    assert sampled.filter(F.col("frames").isNotNull()).count() == 1
    assert drop_failed_rows(sampled, "frames").count() == 1


def test_kernel_math():
    # shoelace on a unit square
    sq = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], float)
    assert media.shoelace_area(sq) == 1.0
    # ocr area normalization: one 8x6 box on a 32x24 frame, 2 frames
    s = media.ocr_area_score([[0.0, 8.0, 0.0, 6.0]], [], 32, 24, 2)
    assert s == (8 * 6) / (32 * 24 * 2)
    # motion magnitude of constant frames is 0
    f = [np.zeros((4, 4)), np.zeros((4, 4))]
    assert media.motion_magnitude(f) == 0.0
    assert media.pixel_normalize(np.array([[255]])).item() == 1.0
    assert media.pixel_normalize(np.array([[0]])).item() == -1.0


# -- pipeline orchestration --------------------------------------------------


def test_run_stage_resume(spark, scored_input):
    def scorer(df):
        return media.apply_scorer(
            media.with_sampled_frames(df), "imaging_quality"
        ).drop("frames")

    snap = pipeline.run_stage(scored_input, scorer, "imaging_quality")
    assert snap.filter(F.col("imaging_quality").isNull()).count() == 0
    first = {r.clip_id: r.imaging_quality for r in snap.collect()}
    # second run: everything done -> scorer untouched rows pass through
    snap2 = pipeline.run_stage(snap, scorer, "imaging_quality")
    second = {r.clip_id: r.imaging_quality for r in snap2.collect()}
    assert first == second


def test_pipeline_checkpoints(spark, scored_input, tmp_path):
    def mk(name):
        def scorer(df):
            return media.apply_scorer(media.with_sampled_frames(df), name).drop("frames")

        return scorer

    out = pipeline.run_pipeline(
        scored_input,
        [("imaging_quality", mk("imaging_quality")), ("of_score", mk("motion"))],
        checkpoint_dir=str(tmp_path / "ckpt"),
        spark=spark,
    )
    assert out.filter(F.col("imaging_quality").isNull() | F.col("of_score").isNull()).count() == 0
    pipeline.assert_counts_consistent(out, scored_input.count())


# -- metadata + sidecar sources ---------------------------------------------


def test_jsonl_roundtrip(spark, clips, tmp_path):
    path = str(tmp_path / "meta_jsonl")
    slim = clips.select("clip_id", "video_id", "clip_duration")
    meta_src.write_jsonl(slim, path)
    back = meta_src.load_jsonl(spark, path, slim.schema)
    assert back.count() == slim.count()
    assert {r.clip_id for r in back.collect()} == {r.clip_id for r in slim.collect()}


def test_per_clip_dir_and_done_markers(spark, clips, tmp_path):
    d = tmp_path / "per_clip"
    d.mkdir()
    rows = clips.select("clip_id", "video_id", "clip_duration").collect()
    for r in rows[:6]:
        (d / f"{r.clip_id}.json").write_text(
            json.dumps({"clip_id": r.clip_id, "video_id": r.video_id, "clip_duration": r.clip_duration})
        )
    (d / f"{rows[6].clip_id}.json").write_text("")  # empty marker -> re-do
    schema = clips.select("clip_id", "video_id", "clip_duration").schema
    merged = meta_src.load_per_clip_dir(spark, str(d), schema)
    assert merged.filter(F.col("clip_id").isNotNull()).count() == 6
    done = meta_src.snapshot_done_markers(spark, str(d))
    # binaryFile skips zero-byte files, which IS the ocr_score.py:64
    # semantics: an empty marker never counts as done
    assert done.count() == 6
    from lvm_datapipe_spark.operators.relational import resume_anti_join_redo_empty

    todo = resume_anti_join_redo_empty(clips, done)
    assert todo.count() == clips.count() - 6  # empty marker stays todo


def test_mvs_sidecar_join(spark, clips, tmp_path):
    p = tmp_path / "mvs_scores.txt"
    rows = clips.select("clip_id").collect()
    lines = [f"{0.5 + i} {0.01} {r.clip_id}.mp4" for i, r in enumerate(rows[:4])]
    lines.append("9.9 0.01 not_a_clip.mp4")  # orphan id -> left-join null side
    p.write_text("\n".join(lines) + "\n")
    mvs = sidecars.read_mvs_scores(spark, str(p))
    assert mvs.count() == 5
    joined = sidecars.join_sidecar(clips, mvs.select("clip_id", "score"))
    assert joined.filter(F.col("score").isNotNull()).count() == 4
    assert joined.count() == clips.count()


def test_sum_captions_extraction(spark, tmp_path):
    p = tmp_path / "sum_caption.csv"
    p.write_text(
        'clips/c1.mp4,"some text Answer: [""car"", ""tree""] tail"\n'
        "clips/c2.mp4,no answer marker here\n"
    )
    df = sidecars.read_sum_captions(spark, str(p))
    out = {r.clip_id: r.objects for r in df.collect()}
    assert out["c1"] == ["car", "tree"]
    assert out["c2"] == []


def test_resume_anti_join_integration(spark, clips):
    done = clips.select("clip_id").limit(4)
    todo = resume_anti_join(clips, done)
    assert todo.count() == clips.count() - 4


# -- real-container (ISO-BMFF) probe + cv2 adapter ---------------------------


def _mp4_fixture(**kw):
    from lvm_datapipe_spark.operators import mp4

    return mp4.build_minimal_mp4(**kw)


def test_mp4_probe_roundtrip():
    from lvm_datapipe_spark.operators import mp4

    data = _mp4_fixture(width=128, height=72, n_frames=250, fps=25.0)
    got = mp4.probe_mp4(data)
    assert got == {
        "height": 72, "width": 128, "fps": 25.0, "n_frames": 250, "duration_s": 10.0,
    }


def test_mp4_probe_rejects_garbage_and_truncation():
    from lvm_datapipe_spark.operators import mp4

    assert mp4.probe_mp4(b"not a container at all") is None
    data = _mp4_fixture()
    assert mp4.is_mp4(data[:40])  # sniff passes on the ftyp header...
    assert mp4.probe_mp4(data[:40]) is None  # ...but no moov -> None


def test_probe_udf_reads_real_mp4_container(spark):
    from lvm_datapipe_spark.operators.media import probe_videos

    rows = [("a.mp4", _mp4_fixture(width=64, height=48, n_frames=30, fps=10.0)),
            ("b.bin", b"garbage")]
    df = spark.createDataFrame(rows, ["path", "content"])
    got = {r.path: r.probe.asDict() for r in probe_videos(df).collect()}
    assert got["a.mp4"] == {
        "height": 48, "width": 64, "fps": 10.0, "n_frames": 30, "duration_s": 3.0,
    }
    assert all(v is None for v in got["b.bin"].values())


def test_mp4_decode_without_cv2_yields_null_row(spark):
    # probe succeeds on the container, but with no codec lib installed the
    # decode falls to the cv2 ImportError guard -> frames column is NULL (F4)
    from lvm_datapipe_spark.operators.media import with_sampled_frames

    df = spark.createDataFrame([("a.mp4", _mp4_fixture())], ["path", "content"])
    row = with_sampled_frames(df).collect()[0]
    assert row.frames is None


def test_cv2_adapter_with_injected_module(monkeypatch):
    """Drive the real cv2 adapter code path (seek via CAP_PROP_POS_FRAMES,
    grayscale convert, byte packing) through an injected fake module — the
    container ships no cv2, but the adapter must be exercised, not dead."""
    import sys
    import types

    import numpy as np

    from lvm_datapipe_spark.operators import media

    calls = {"seeks": [], "released": False}

    class _FakeCap:
        def __init__(self, path):
            self.pos = 0

        def set(self, prop, val):
            assert prop == 99  # CAP_PROP_POS_FRAMES routed through
            calls["seeks"].append(int(val))
            self.pos = int(val)

        def read(self):
            return True, np.full((48, 64, 3), self.pos % 256, dtype=np.uint8)

        def release(self):
            calls["released"] = True

    fake = types.ModuleType("cv2")
    fake.VideoCapture = _FakeCap
    fake.CAP_PROP_POS_FRAMES = 99
    fake.COLOR_BGR2GRAY = 6
    fake.cvtColor = lambda f, code: f[:, :, 0]
    monkeypatch.setitem(sys.modules, "cv2", fake)

    out = media._decode_frames(_mp4_fixture(), [0, 5, 7])
    assert calls["seeks"] == [0, 5, 7] and calls["released"]
    assert len(out) == 3 and all(len(f) == 48 * 64 for f in out)
    assert out[1] == bytes([5]) * (48 * 64)

    # resize-at-decode flows through the cv2 adapter too
    resized = media._decode_frames(_mp4_fixture(), [3], target_hw=(12, 16))
    assert len(resized) == 1 and len(resized[0]) == 12 * 16
    assert resized[0] == bytes([3]) * (12 * 16)  # constant frame survives nn


# -- M1/M2 real adapters (PySceneDetect / ffmpeg), driven via injection ------


def test_pyscenedetect_adapter_call_sequence_and_conversion():
    """Adapter must follow the reference call sequence (open_video ->
    SceneManager -> add_detector(ContentDetector(threshold)) -> detect ->
    get_scene_list) and convert FrameTimecode pairs to the analog's tuple
    shape."""
    import types

    from lvm_datapipe_spark.operators import scenecut as SC

    calls = []

    class _TC:
        def __init__(self, frames, fps):
            self.f, self.fps = frames, fps

        def get_frames(self):
            return self.f

        def get_seconds(self):
            return self.f / self.fps

    class _Manager:
        def __init__(self):
            calls.append("SceneManager")

        def add_detector(self, det):
            calls.append(("add_detector", det))

        def detect_scenes(self, video):
            calls.append(("detect_scenes", video))

        def get_scene_list(self):
            return [(_TC(0, 10.0), _TC(25, 10.0)), (_TC(25, 10.0), _TC(40, 10.0))]

    fake = types.ModuleType("scenedetect")
    fake.open_video = lambda path: f"video:{path}"
    fake.SceneManager = _Manager
    fake.ContentDetector = lambda threshold: ("ContentDetector", threshold)
    out = SC.pyscenedetect_bounds(b"fakebytes", threshold=27.0, scenedetect_mod=fake)
    assert out == [(0, 25, 0.0, 2.5), (25, 40, 2.5, 4.0)]
    assert ("add_detector", ("ContentDetector", 27.0)) in calls


def test_detect_one_null_for_real_container_without_pyscenedetect():
    from lvm_datapipe_spark.operators import mp4
    from lvm_datapipe_spark.operators import scenecut as SC

    assert SC.have_pyscenedetect() is False  # not shipped in this container
    assert SC._detect_one(mp4.build_minimal_mp4(), 30.0) is None
    assert SC._detect_one(None, 30.0) is None


def test_ffmpeg_split_partition_with_recorder(tmp_path):
    """M2 adapter body: one ffmpeg invocation per clip row with the
    reference's accurate-seek argv; bad rows skipped, successes counted."""
    from types import SimpleNamespace

    from lvm_datapipe_spark.operators import scenecut as SC

    rows = [
        SimpleNamespace(clip_id="v1_0000000", video_path="/data/v1.mp4", start_s=0.0, end_s=2.5),
        SimpleNamespace(clip_id="v1_0000001", video_path="/data/v1.mp4", start_s=2.5, end_s=4.0),
        SimpleNamespace(clip_id="bad", video_path=None, start_s=None, end_s=None),
    ]
    recorded = []
    n = SC._ffmpeg_split_partition(iter(rows), str(tmp_path), recorded.append)
    assert n == 2 and len(recorded) == 2
    argv = recorded[0]
    assert argv[0] == "ffmpeg" and argv[-1] == f"{tmp_path}/v1_0000000.mp4"
    i = argv.index("-ss")
    assert argv[i + 1] == "0.000000"
    assert "-i" in argv and argv[argv.index("-i") + 1] == "/data/v1.mp4"


def test_ffmpeg_split_partition_survives_runner_failure(tmp_path):
    from types import SimpleNamespace

    from lvm_datapipe_spark.operators import scenecut as SC

    def boom(argv):
        raise RuntimeError("ffmpeg exploded")

    rows = [SimpleNamespace(clip_id="c", video_path="/v.mp4", start_s=0.0, end_s=1.0)]
    assert SC._ffmpeg_split_partition(iter(rows), str(tmp_path), boom) == 0


def test_decord_adapter_with_injected_module(monkeypatch):
    """Decord path (the reference's decoder): batched get_batch access at
    NATIVE resolution, the shared deterministic _resize_nn post-decode, and
    ROUNDED BT.601 grayscale — installing decord must not change a single
    frame byte relative to the cv2/FVID paths."""
    import sys
    import types

    import numpy as np

    from lvm_datapipe_spark.operators import media

    seen = {}

    class _Batch:
        def __init__(self, arr):
            self.arr = arr

        def asnumpy(self):
            return self.arr

    class _VideoReader:
        def __init__(self, fobj, **kwargs):
            seen["kwargs"] = kwargs

        def get_batch(self, indices):
            seen["indices"] = list(indices)
            arr = np.zeros((len(indices), 48, 64, 3), dtype=np.uint8)
            arr[..., 0] = 100  # R
            arr[..., 1] = 50   # G
            arr[..., 2] = 205  # B -> luminance 82.62: rint=83, trunc=82
            return _Batch(arr)

    fake = types.ModuleType("decord")
    fake.__spec__ = __import__("importlib.machinery", fromlist=["ModuleSpec"]).ModuleSpec(
        "decord", None
    )
    fake.VideoReader = _VideoReader
    monkeypatch.setitem(sys.modules, "decord", fake)

    out = media._decode_frames(_mp4_fixture(), [0, 5], target_hw=(24, 32))
    # bit-identity: the codec decodes NATIVE (no resize kwargs); resize is
    # the shared _resize_nn, luminance is rounded not truncated
    assert seen["kwargs"] == {}
    assert seen["indices"] == [0, 5]
    want = round(0.299 * 100 + 0.587 * 50 + 0.114 * 205)  # BT.601, rounded
    assert len(out) == 2 and all(len(f) == 24 * 32 for f in out)
    assert out[0] == bytes([want]) * (24 * 32)


def test_boundary_f1_matches_hand_computed(spark):
    from lvm_datapipe_spark.operators.scenecut import boundary_f1

    pred = spark.createDataFrame(
        [
            # v1: 10.2 matches 10.0; 20.9 misses 20.0 (tol 0.5); 30.0 exact
            ("v1", 10.2), ("v1", 20.9), ("v1", 30.0),
            # v2: two preds near one gold — only ONE may match (one-to-one)
            ("v2", 5.1), ("v2", 5.3),
            # v3: pred but no gold
            ("v3", 1.0),
        ],
        "path string, start_s double",
    )
    gold = spark.createDataFrame(
        [
            ("v1", 10.0), ("v1", 20.0), ("v1", 30.0),
            ("v2", 5.0),
            # v4: gold but no pred
            ("v4", 2.0),
        ],
        "path string, start_s double",
    )
    rows = {r.path: r for r in boundary_f1(pred, gold, tol_s=0.5).collect()}
    v1 = rows["v1"]
    assert (v1.n_pred, v1.n_gold, v1.n_match) == (3, 3, 2)
    assert abs(v1.f1 - 2 / 3) < 1e-12
    v2 = rows["v2"]
    assert (v2.n_pred, v2.n_gold, v2.n_match) == (2, 1, 1)  # one-to-one
    assert rows["v3"].precision == 0.0 and rows["v3"].recall == 0.0
    assert rows["v4"].recall == 0.0 and rows["v4"].n_pred == 0


def test_boundary_f1_video_keyed_no_cross_product(spark):
    from lvm_datapipe_spark.operators.scenecut import boundary_f1

    pred = spark.createDataFrame([("a", 1.0)], "path string, start_s double")
    gold = spark.createDataFrame([("a", 1.1)], "path string, start_s double")
    plan = (
        boundary_f1(pred, gold)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
