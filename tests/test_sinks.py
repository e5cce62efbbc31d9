"""Partitioned sink semantics: dynamic overwrite must be per-slice
idempotent; compaction must shrink file counts without changing data."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from lvm_datapipe_spark.sources.sinks import compact_dir, write_partitioned


def _files(path: str) -> list[str]:
    return [
        f
        for f in glob.glob(f"{path}/**/*.parquet", recursive=True)
        if "/_" not in f
    ]


def test_dynamic_overwrite_replaces_only_incoming_partitions(spark, tmp_path):
    p = str(tmp_path / "tbl")
    full = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["id", "part", "v"]
    )
    write_partitioned(full, p, ["part"])
    # reprocess ONLY partition 'b' with a corrected value
    fixed_b = spark.createDataFrame([(2, "b", 99.0)], ["id", "part", "v"])
    write_partitioned(fixed_b, p, ["part"])
    got = {
        (r.id, r.part, r.v) for r in spark.read.parquet(p).collect()
    }
    # a and c survive, b replaced — NOT truncated to just b
    assert got == {(1, "a", 10.0), (2, "b", 99.0), (3, "c", 30.0)}


def test_static_overwrite_truncates_by_contrast(spark, tmp_path):
    p = str(tmp_path / "tbl")
    full = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], ["id", "part", "v"]
    )
    write_partitioned(full, p, ["part"])
    fixed_b = spark.createDataFrame([(2, "b", 99.0)], ["id", "part", "v"])
    write_partitioned(fixed_b, p, ["part"], dynamic=False)
    assert {r.part for r in spark.read.parquet(p).collect()} == {"b"}


def test_sort_by_orders_within_files(spark, tmp_path):
    p = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, "a", float(100 - i)) for i in range(100)], ["id", "part", "v"]
    ).repartition(1)
    write_partitioned(df, p, ["part"], sort_by=["v"])
    import pyarrow.parquet as pq

    f = _files(p)[0]
    vs = pq.read_table(f, columns=["v"]).column("v").to_pylist()
    assert vs == sorted(vs)


def test_compact_dir_shrinks_file_count_preserves_data(spark, tmp_path):
    p = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, f"p{i % 2}", float(i)) for i in range(200)], ["id", "part", "v"]
    ).repartition(16)
    write_partitioned(df, p, ["part"])
    assert len(_files(p)) > 8  # fragmented: many tasks x 2 partitions
    before = {(r.id, r.part, r.v) for r in spark.read.parquet(p).collect()}
    compact_dir(spark, p, partition_by=["part"], target_file_mb=128)
    assert len(_files(p)) <= 4
    after = {(r.id, r.part, r.v) for r in spark.read.parquet(p).collect()}
    assert after == before
    # partition layout survived (directory-partitioned, prunable)
    assert glob.glob(f"{p}/part=p0/*.parquet")


def test_compact_dir_returns_actual_count_and_cleans_swap_dirs(spark, tmp_path):
    import os

    p = str(tmp_path / "tbl2")
    df = spark.createDataFrame(
        [(i, f"p{i % 3}", float(i)) for i in range(90)], ["id", "part", "v"]
    ).repartition(8)
    write_partitioned(df, p, ["part"])
    n = compact_dir(spark, p, partition_by=["part"], target_file_mb=128)
    # returned count == data files actually on disk (the partitioned branch
    # writes one file per non-empty (task, partition) pair, which need not
    # equal the coalesce estimate)
    assert n == len(_files(p))
    # the rename-aside swap leaves no temp/old directories behind
    assert not os.path.exists(p + "__old")
    assert not os.path.exists(p + "__compact_tmp")


def test_retention_sweep_drops_only_expired_partitions(spark, tmp_path):
    from pyspark.sql import functions as F

    from lvm_datapipe_spark.sources.sinks import retention_sweep, write_partitioned

    df = spark.createDataFrame(
        [(d, i) for i, d in enumerate(["2024-01-01", "2024-02-01", "2024-03-01", "2024-04-01"])],
        "day string, v long",
    )
    out = str(tmp_path / "store")
    write_partitioned(df, out, ["day"])

    # dry run: reports, deletes nothing
    assert retention_sweep(out, "day", "2024-03-01", dry_run=True) == [
        "2024-01-01",
        "2024-02-01",
    ]
    assert spark.read.parquet(out).count() == 4

    dropped = retention_sweep(out, "day", "2024-03-01")
    assert dropped == ["2024-01-01", "2024-02-01"]
    back = spark.read.parquet(out)
    assert sorted(str(r["day"]) for r in back.select("day").collect()) == [
        "2024-03-01",
        "2024-04-01",
    ]
    # idempotent
    assert retention_sweep(out, "day", "2024-03-01") == []


def test_orc_roundtrip_preserves_data(spark, tmp_path):
    # second columnar format through the same sink conventions
    from lvm_datapipe_spark.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "lang", "n_chars"
    )
    out = str(tmp_path / "docs_orc")
    docs.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, docs.collect()))


def test_missing_partitions_reports_holes(spark, tmp_path):
    from lvm_datapipe_spark.sources.sinks import missing_partitions, write_partitioned

    out = str(tmp_path / "bf")
    df = spark.createDataFrame(
        [("2024-01-01", 1), ("2024-01-03", 2)], "day string, v long"
    )
    write_partitioned(df, out, ["day"])
    want = ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"]
    assert missing_partitions(out, "day", want) == ["2024-01-02", "2024-01-04"]
    assert missing_partitions(str(tmp_path / "absent"), "day", want) == want


def test_read_parquet_tolerant_skips_corrupt_file(spark, tmp_path):
    from lvm_datapipe_spark.sources.sinks import read_parquet_tolerant

    out = str(tmp_path / "tol")
    spark.range(0, 100).repartition(4).write.mode("overwrite").parquet(out)
    import glob

    victim = sorted(glob.glob(out + "/part-*.parquet"))[0]
    with open(victim, "r+b") as f:
        f.truncate(32)  # destroy footer

    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    with _pytest.raises(Exception):
        spark.read.parquet(out).count()  # strict read fails

    n = read_parquet_tolerant(spark, out, schema="id long").count()
    assert 0 < n < 100  # survivors only; the corrupt file's rows are lost
