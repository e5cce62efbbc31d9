"""Pipeline CLI tests: the reference's script-per-stage workflow end to end
through the command-line surface (scenecut -> score -> score -> analyze ->
export), including resume on re-run."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from lvm_datapipe_spark import fakevideo
from lvm_datapipe_spark.cli import main


@pytest.fixture(scope="module")
def work(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    fakevideo.write_corpus(str(d / "videos"), [f"clipv_{i}" for i in range(5)])
    return d


def test_cli_full_pipeline(spark, work, capsys):
    videos = str(work / "videos")
    snap0, snap1, snap2 = str(work / "s0"), str(work / "s1"), str(work / "s2")

    assert main(["scenecut", "--video-dir", videos, "--out", snap0], spark=spark) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["stage"] == "scenecut" and out["clips"] > 0

    assert main(
        ["score", "--snapshot", snap0, "--out", snap1, "--scorer", "imaging_quality"],
        spark=spark,
    ) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["scored"] == out["total"]

    assert main(
        ["score", "--snapshot", snap1, "--out", snap2, "--scorer", "aesthetic"],
        spark=spark,
    ) == 0
    capsys.readouterr()

    # resume semantics: scoring an already-scored snapshot changes nothing
    before = {
        r.clip_id: r.imaging_quality for r in spark.read.parquet(snap2).collect()
    }
    snap3 = str(work / "s3")
    assert main(
        ["score", "--snapshot", snap2, "--out", snap3, "--scorer", "imaging_quality"],
        spark=spark,
    ) == 0
    capsys.readouterr()
    after = {r.clip_id: r.imaging_quality for r in spark.read.parquet(snap3).collect()}
    assert before == after

    assert main(["analyze", "--snapshot", snap3], spark=spark) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["stats"]["n"] == sum(out["histogram"].values())

    flat_dir = str(work / "flat")
    assert main(["export-flat", "--snapshot", snap3, "--out", flat_dir], spark=spark) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] == len(after)
    flat = spark.read.json(flat_dir)
    assert "image_quality" in flat.columns  # published MMTrail name
    assert flat.filter(F.col("image_quality").isNotNull()).count() == len(after)


def test_cli_curate_matches_query_semantics(spark, work, capsys):
    """curate = the oracle-checked pipeline_curate composition over an
    arbitrary documents parquet; output is split-partitioned and idempotent
    on re-run."""
    docs_path = str(work / "docs.parquet")
    from lvm_datapipe_spark.catalog import load_table

    load_table(spark, "/root/testdata/sf0.001", "documents").write.mode(
        "overwrite"
    ).parquet(docs_path)
    out_dir = str(work / "curated")
    assert main(["curate", "--docs", docs_path, "--out", out_dir], spark=spark) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["stage"] == "curate" and rep["kept"] > 0
    assert set(rep["splits"]) <= {"train", "val", "test"}
    assert rep["kept"] == sum(rep["splits"].values())

    first = {
        (r.doc_id, r.split) for r in spark.read.parquet(out_dir).collect()
    }
    # deterministic: re-running produces the identical assignment
    assert main(["curate", "--docs", docs_path, "--out", out_dir], spark=spark) == 0
    capsys.readouterr()
    second = {
        (r.doc_id, r.split) for r in spark.read.parquet(out_dir).collect()
    }
    assert first == second


def test_cli_zorder_and_retention(spark, tmp_path):
    import glob
    import json as _json

    from lvm_datapipe_spark import cli
    from lvm_datapipe_spark.sources.sinks import write_partitioned

    src = str(tmp_path / "ev")
    df = spark.createDataFrame(
        [(a, b, f"2024-0{1 + a % 3}-01") for a in range(32) for b in range(32)],
        "a int, b int, day string",
    )
    df.write.mode("overwrite").parquet(src)

    out = str(tmp_path / "evz")
    assert cli.main(
        ["zorder", "--table", src, "--out", out, "--by", "a", "b",
         "--bits", "5", "--files", "8"],
        spark=spark,
    ) == 0
    assert spark.read.parquet(out).count() == 1024
    assert len(glob.glob(out + "/part-*.parquet")) >= 4

    store = str(tmp_path / "store")
    write_partitioned(df, store, ["day"])
    assert cli.main(
        ["retention", "--table", store, "--partition-col", "day",
         "--keep-from", "2024-02-01"],
        spark=spark,
    ) == 0
    days = {str(r.day) for r in spark.read.parquet(store).select("day").distinct().collect()}
    assert days == {"2024-02-01", "2024-03-01"}


def test_cli_dq_gate(spark, tmp_path):
    import pytest as _pytest

    from lvm_datapipe_spark import cli

    good = str(tmp_path / "good")
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
    ).write.mode("overwrite").parquet(good)
    assert cli.main(
        ["dq", "--table", good, "--not-null", "id", "v", "--unique", "id"],
        spark=spark,
    ) == 0

    bad = str(tmp_path / "bad")
    spark.createDataFrame(
        [(1, "a"), (1, "b"), (None, "c")], "id long, v string"
    ).write.mode("overwrite").parquet(bad)
    with _pytest.raises(SystemExit) as e:
        cli.main(["dq", "--table", bad, "--not-null", "id", "--unique", "id"], spark=spark)
    assert e.value.code == 2


def test_cli_profile_and_manifest(spark, tmp_path, capsys):
    import json as _json

    import pytest as _pytest

    from lvm_datapipe_spark import cli

    t = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(1, 2.0), (2, 4.0), (3, None)], "id long, x double"
    ).write.mode("overwrite").parquet(t)

    assert cli.main(["profile", "--table", t], spark=spark) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["columns"]["x"]["n_nulls"] == 1
    assert out["columns"]["id"]["max"] == 3.0

    assert cli.main(["manifest", "--table", t], spark=spark) == 0
    assert cli.main(["manifest", "--table", t, "--verify"], spark=spark) == 0
    # tamper -> verify exits nonzero
    import glob

    victim = sorted(glob.glob(t + "/part-*.parquet"))[0]
    with open(victim, "r+b") as f:
        f.seek(8)
        f.write(b"\xff")
    with _pytest.raises(SystemExit) as e:
        cli.main(["manifest", "--table", t, "--verify"], spark=spark)
    assert e.value.code == 2


def test_cli_bpe_fit(spark, tmp_path, capsys):
    from lvm_datapipe_spark.operators.bpe import learn_bpe_merges

    corpus = ["low low low lower", "newest newest newest lowest"] * 3
    df = spark.createDataFrame([(t,) for t in corpus], ["text"])
    table = str(tmp_path / "docs.parquet")
    df.write.parquet(table)
    out = str(tmp_path / "merges.json")
    rc = main(
        ["bpe", "--table", table, "--out", out, "--n-merges", "8"],
        spark=spark,
    )
    assert rc == 0
    status = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert status["stage"] == "bpe" and status["n_merges"] > 0
    saved = json.load(open(out))["merges"]
    want, _ = learn_bpe_merges(df, n_merges=8)
    assert [tuple(m) for m in saved] == want


def test_cli_zorder_hilbert_curve(spark, tmp_path, capsys):
    src = str(tmp_path / "src.parquet")
    (
        spark.range(512)
        .withColumn("a", (F.col("id") * 7919) % 64)
        .withColumn("b", (F.col("id") * 104729) % 64)
        .write.parquet(src)
    )
    out = str(tmp_path / "hil")
    rc = main(
        ["zorder", "--table", src, "--out", out, "--by", "a", "b",
         "--bits", "6", "--files", "4", "--curve", "hilbert"],
        spark=spark,
    )
    assert rc == 0
    status = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert status["curve"] == "hilbert" and status["rows"] == 512
    assert spark.read.parquet(out).count() == 512


def test_cli_wds_export(spark, tmp_path, capsys):
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(f"d{i}", f"text {i}") for i in range(12)], "key string, txt string"
    ).write.parquet(src)
    out = str(tmp_path / "wds")
    rc = main(
        ["wds-export", "--table", src, "--out", out,
         "--columns", "txt:txt", "--shard-size", "5", "--overwrite"],
        spark=spark,
    )
    assert rc == 0
    status = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert status["rows"] == 12 and status["shards"] >= 1
    from lvm_datapipe_spark.sources.webdataset import read_webdataset

    assert read_webdataset(spark, out).count() == 12


def test_cli_query_stage(spark, tmp_path, capsys):
    from lvm_datapipe_spark.cli import main

    # parquet output mode
    out = str(tmp_path / "q6")
    main(
        ["query", "--name", "q6_forecast_revenue",
         "--sf-dir", "/root/testdata/sf0.001", "--out", out],
        spark=spark,
    )
    import json as _json

    line = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["stage"] == "query" and line["rows"] == 1
    assert spark.read.parquet(out).columns == ["revenue", "n_items"]
    # print mode
    main(
        ["query", "--name", "a7_value_counts",
         "--sf-dir", "/root/testdata/sf0.001", "--limit", "3"],
        spark=spark,
    )
    line = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["rows_shown"] == 3
    # unknown name fails loudly with suggestions
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        main(["query", "--name", "q6_forecast_revenu"], spark=spark)
