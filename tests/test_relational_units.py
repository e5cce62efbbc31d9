"""Unit tests for operator semantics on tiny in-memory DataFrames, mirroring
the reference behaviors they re-implement (SURVEY.md §5 plan, item 2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lvm_datapipe_spark.functions import strings as S
from lvm_datapipe_spark.operators import aggregates as A
from lvm_datapipe_spark.operators import relational as R


def test_resume_anti_join(spark):
    clips = spark.createDataFrame([("a",), ("b",), ("c",)], ["clip_id"])
    done = spark.createDataFrame([("b",), ("zz",)], ["clip_id"])
    out = {r.clip_id for r in R.resume_anti_join(clips, done).collect()}
    assert out == {"a", "c"}


def test_resume_anti_join_redo_empty(spark):
    # ocr_score.py:64 — zero-byte done markers are re-processed
    clips = spark.createDataFrame([("a",), ("b",), ("c",)], ["clip_id"])
    done = spark.createDataFrame([("a", 10), ("b", 0)], ["clip_id", "size_bytes"])
    out = {r.clip_id for r in R.resume_anti_join_redo_empty(clips, done).collect()}
    assert out == {"b", "c"}


def test_find_breakpoint(spark):
    # video v1: clips sum to duration (done); v2: 5s gap (not done)
    rows = [
        ("v1", 10.0, 4.0),
        ("v1", 10.0, 6.0),
        ("v2", 20.0, 15.0),
    ]
    df = spark.createDataFrame(rows, ["video_id", "video_duration", "clip_duration"])
    done = A.find_breakpoint(df)
    assert [r.video_id for r in done.collect()] == ["v1"]


def test_histogram_numpy_semantics(spark):
    # np.histogram semantics: left-closed right-open, final bin unbounded here
    df = spark.createDataFrame([(0.0,), (4.9,), (5.0,), (100.0,)], ["d"])
    out = {r.bucket: r.n for r in A.histogram(df, "d", [0.0, 5.0, 10.0]).collect()}
    assert out == {0: 2, 1: 1, 2: 1}


def test_clip_id_format(spark):
    df = spark.createDataFrame([("vid_00042", 7)], ["vid", "idx"])
    row = df.select(S.clip_id("vid", "idx").alias("cid")).first()
    assert row.cid == "vid_00042_0000007"  # scene_cut.py:82 format


def test_path_functions(spark):
    df = spark.createDataFrame([("group_3/vid_00042.MP4",)], ["p"])
    row = df.select(
        S.path_basename("p").alias("base"),
        S.path_dirname("p").alias("dir"),
        S.file_extension("p").alias("ext"),
        S.file_stem("p").alias("stem"),
    ).first()
    assert (row.base, row.dir, row.ext, row.stem) == (
        "vid_00042.MP4",
        "group_3",
        "mp4",
        "vid_00042",
    )


def test_clean_caption(spark):
    raw = "<start_of_text>a red car driving <end_of_text>junk"
    df = spark.createDataFrame([(raw,)], ["c"])
    assert df.select(S.clean_caption("c").alias("c")).first().c == "a red car driving"


def test_extract_answer_words(spark):
    rows = [
        ('blah Answer: ["car", "tree", "sky"] more',),
        ("no answer here",),
    ]
    df = spark.createDataFrame(rows, ["raw"])
    out = [r.w for r in df.select(S.extract_answer_words("raw").alias("w")).collect()]
    assert out[0] == ["car", "tree", "sky"]
    assert out[1] == []  # sum_caption_llama.py:50 returns [] on no match


def test_frame_sampling_indices(spark):
    df = spark.createDataFrame([(100,)], ["n"])
    row = df.select(
        S.frame_indices_at_fractions("n", [0.2, 0.5, 0.8]).alias("fr"),
        S.stride_frame_indices("n", 10).alias("st"),
    ).first()
    assert row.fr == [20, 50, 80]  # coca_caption.py:44 policy
    assert row.st == list(range(0, 100, 10))  # ocr_score.py:16-21 policy


def test_best_per_group_tiebreak(spark):
    rows = [("v1", "c1", 5.0), ("v1", "c2", 5.0), ("v2", "c3", 1.0)]
    df = spark.createDataFrame(rows, ["video_id", "clip_id", "score"])
    out = R.best_per_group(df, "video_id", "score", "clip_id")
    got = {(r.video_id, r.clip_id) for r in out.collect()}
    assert got == {("v1", "c1"), ("v2", "c3")}


def test_union_and_subtract(spark):
    a = spark.createDataFrame([(1,), (2,)], ["x"])
    b = spark.createDataFrame([(2,), (3,)], ["x"])
    assert sorted(r.x for r in R.union_shards(a, b).collect()) == [1, 2, 2, 3]
    assert [r.x for r in R.finished_set_difference(a, b).collect()] == [1]


def test_count_consistency(spark):
    records = spark.createDataFrame([(i,) for i in range(10)], ["x"])
    files = spark.createDataFrame([(i,) for i in range(12)], ["x"])
    row = A.count_consistency(records, files).first()
    assert (row.record_count, row.file_count, row.delta, row.ok) == (10, 12, 2, True)


def test_drop_failed_rows(spark):
    df = spark.createDataFrame([("a", "x"), ("b", None)], ["id", "frames"])
    assert [r.id for r in R.drop_failed_rows(df).collect()] == ["a"]


def test_span_seconds(spark):
    df = spark.createDataFrame([(100, 250, 25.0)], ["s", "e", "fps"])
    assert df.select(S.span_seconds("s", "e", "fps").alias("d")).first().d == 6.0


def test_asof_join_fills_right_row_atomically(spark):
    """A right row with a NULL in one value column must NOT have that column
    backfilled from an older right row (torn row) — the as-of match picks one
    right row and takes all its values, like the join-then-rank oracle."""
    from lvm_datapipe_spark.operators.asof import asof_join

    left = spark.createDataFrame([("u", 100)], ["k", "t"])
    right = spark.createDataFrame(
        [("u", 10, "old_a", "old_b"), ("u", 50, None, "new_b")],
        ["k", "t", "va", "vb"],
    )
    out = asof_join(
        left, right, key="k", left_ts="t", right_ts="t",
        right_values=["va", "vb"], tie_col="vb",
    ).collect()
    assert len(out) == 1
    r = out[0]
    # newest right row (t=50) atomically: va stays NULL, vb is new_b
    assert r.va is None and r.vb == "new_b"


def test_asof_join_no_right_match_is_all_null(spark):
    from lvm_datapipe_spark.operators.asof import asof_join

    left = spark.createDataFrame([("u", 5)], ["k", "t"])
    right = spark.createDataFrame([("u", 50, "a", "b")], ["k", "t", "va", "vb"])
    out = asof_join(
        left, right, key="k", left_ts="t", right_ts="t",
        right_values=["va", "vb"], tie_col="vb",
    ).collect()
    assert len(out) == 1 and out[0].va is None and out[0].vb is None


def test_asof_join_forward_direction(spark):
    """Forward as-of: earliest right row with t >= left t; equal-ts rows
    match; ties at the same ts break least-wins; no future match → null."""
    from lvm_datapipe_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("u", 50), ("u", 100), ("u", 300)], ["k", "t"]
    )
    right = spark.createDataFrame(
        [("u", 40, "past"), ("u", 100, "b_tie"), ("u", 100, "a_tie"), ("u", 200, "later")],
        ["k", "t", "va"],
    )
    out = {
        r.t: r.va
        for r in asof_join(
            left, right, key="k", left_ts="t", right_ts="t",
            right_values=["va"], direction="forward",
        ).collect()
    }
    assert out[50] == "a_tie"   # skips the past row, takes earliest future
    assert out[100] == "a_tie"  # equal ts matches; least tie wins
    assert out[300] is None     # nothing at-or-after


def test_snapshot_diff_statuses(spark):
    from lvm_datapipe_spark.operators.relational import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["doc_id", "fingerprint"]
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "C2"), (4, "d")], ["doc_id", "fingerprint"]
    )
    got = {r.doc_id: r.status for r in snapshot_diff(old, new).collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "modified", 4: "added"}


# ---------------------------------------------------------------------------
# binned_range_join (keyless point-in-interval as a hash join)
# ---------------------------------------------------------------------------


def _brj_fixtures(spark):
    pts = spark.createDataFrame(
        [(1, 5), (2, 17), (3, 42), (4, 99), (5, -3)], ["pid", "t"]
    )
    ivs = spark.createDataFrame(
        [(10, 0, 10), (11, 4, 45), (12, 40, 44), (13, 200, 300)],
        ["iv_id", "t0", "t1"],
    )
    return pts, ivs


@pytest.mark.slow  # >=7 s equivalence test (r11 tier split)
def test_binned_range_join_matches_naive(spark):
    from lvm_datapipe_spark.operators.asof import binned_range_join

    pts, ivs = _brj_fixtures(spark)
    naive = {
        (r["pid"], r["iv_id"])
        for r in pts.crossJoin(ivs)
        .filter("t >= t0 and t <= t1")
        .collect()
    }
    for width in (1, 7, 10, 1000):  # exactness must not depend on the width
        got = {
            (r["pid"], r["iv_id"])
            for r in binned_range_join(pts, ivs, "t", "t0", "t1", width).collect()
        }
        assert got == naive, f"width={width}"


def test_binned_range_join_left_keeps_unmatched(spark):
    from lvm_datapipe_spark.operators.asof import binned_range_join

    pts, ivs = _brj_fixtures(spark)
    out = binned_range_join(pts, ivs, "t", "t0", "t1", 10, how="left").collect()
    by_pid = {}
    for r in out:
        by_pid.setdefault(r["pid"], []).append(r["iv_id"])
    assert sorted(by_pid[5]) == [None]        # t=-3 matches nothing
    assert sorted(by_pid[4]) == [None]        # t=99 matches nothing
    assert sorted(by_pid[2]) == [11]
    assert sorted(by_pid[3]) == [11, 12]
    # matched points do NOT also emit a null row
    assert None not in by_pid[3]


def test_binned_range_join_is_hash_join(spark):
    from lvm_datapipe_spark.operators.asof import binned_range_join

    pts, ivs = _brj_fixtures(spark)
    plan = (
        binned_range_join(pts, ivs, "t", "t0", "t1", 10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_binned_range_join_rejects_bad_how(spark):
    import pytest

    from lvm_datapipe_spark.operators.asof import binned_range_join

    pts, ivs = _brj_fixtures(spark)
    with pytest.raises(ValueError, match="inner|left"):
        binned_range_join(pts, ivs, "t", "t0", "t1", 10, how="outer")


# ---------------------------------------------------------------------------
# contiguous_ids (distributed zipWithIndex without a global window)
# ---------------------------------------------------------------------------


def test_contiguous_ids_match_global_row_number(spark):
    from lvm_datapipe_spark.operators.relational import contiguous_ids

    rows = [(k, f"g{k % 3}") for k in (7, 1, 9, 4, 2, 8, 0, 5, 3, 6)]
    df = spark.createDataFrame(rows, ["k", "g"])
    got = {
        r["k"]: r["row_id"]
        for r in contiguous_ids(df, ["g", "k"]).collect()
    }
    expected_order = sorted(rows, key=lambda r: (r[1], r[0]))
    assert got == {k: i for i, (k, _) in enumerate(expected_order)}


def test_contiguous_ids_stable_under_input_layout(spark):
    from lvm_datapipe_spark.operators.relational import contiguous_ids

    df = spark.createDataFrame([(i,) for i in range(97)], ["k"])
    a = {r["k"]: r["row_id"] for r in contiguous_ids(df, ["k"]).collect()}
    b = {
        r["k"]: r["row_id"]
        for r in contiguous_ids(df.repartition(13), ["k"]).collect()
    }
    assert a == b == {i: i for i in range(97)}


def test_contiguous_ids_no_single_partition_exchange(spark):
    from lvm_datapipe_spark.operators.relational import contiguous_ids

    df = spark.createDataFrame([(i,) for i in range(50)], ["k"])
    plan = (
        contiguous_ids(df, ["k"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange SinglePartition" not in plan
    assert "Window" not in plan


def test_binned_range_join_exact_beyond_double_precision(spark):
    from lvm_datapipe_spark.operators.asof import binned_range_join

    # epoch-nanosecond scale: 2^53 + k are NOT representable as doubles —
    # float binning would misbin and silently drop true matches
    base = 2**53
    pts = spark.createDataFrame(
        [(1, base + 1), (2, base + 3), (3, base + 10)], "pid: long, t: long"
    )
    ivs = spark.createDataFrame(
        [(7, base, base + 4)], "iv: long, t0: long, t1: long"
    )
    got = sorted(
        (r["pid"], r["iv"])
        for r in binned_range_join(pts, ivs, "t", "t0", "t1", 3).collect()
    )
    assert got == [(1, 7), (2, 7)]


def test_binned_range_join_negative_values_floor_bins(spark):
    from lvm_datapipe_spark.operators.asof import binned_range_join

    # integer floor division must round toward -inf (DIV truncates): the
    # point -1 and interval [-2, 0] share bin -1 at width 2
    pts = spark.createDataFrame([(1, -1)], "pid: long, t: long")
    ivs = spark.createDataFrame([(9, -2, 0)], "iv: long, t0: long, t1: long")
    assert [(r["pid"], r["iv"])
            for r in binned_range_join(pts, ivs, "t", "t0", "t1", 2).collect()
            ] == [(1, 9)]
