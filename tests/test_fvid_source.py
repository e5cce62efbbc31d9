"""Python DataSource tests: scan-time video probing (header-only I/O)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lvm_datapipe_spark import fakevideo
from lvm_datapipe_spark.sources.fvid_source import register


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("ds_videos")
    fakevideo.write_corpus(str(d), [f"src_{i}" for i in range(9)])
    (d / "junk.txt").write_text("not a video")
    (d / "broken.fvid").write_bytes(b"XX")  # unreadable -> skipped
    register(spark)
    return str(d)


@pytest.mark.slow  # >=7 s equivalence test (r11 tier split)
def test_probe_source_matches_codec(spark, corpus):
    df = spark.read.format("fvid").load(corpus)
    rows = {r.path.split("/")[-1]: r for r in df.collect()}
    assert len(rows) == 9  # junk + broken excluded
    for name, r in rows.items():
        v = fakevideo.generate(name[:-5])
        assert (r.height, r.width, r.n_frames) == (v.height, v.width, v.n_frames)
        assert abs(r.duration_s - v.duration_s) < 1e-9


def test_probe_source_parallelism_and_filters(spark, corpus):
    df = spark.read.format("fvid").option("numPartitions", 3).load(corpus)
    assert df.rdd.getNumPartitions() == 3
    short = df.filter(F.col("duration_s") < 2.0)
    assert short.count() == sum(
        1 for i in range(9) if fakevideo.generate(f"src_{i}").duration_s < 2.0
    )
