"""Versioned-table transaction log (sources/txlog.py): commit/read/time
travel, append copy-on-write, optimistic-concurrency conflicts,
crash-orphan invisibility, and vacuum retention."""

from __future__ import annotations

import json
import os

import pytest

from lvm_datapipe_spark.sources import txlog


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, val string")


def test_commit_read_roundtrip_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    v1 = txlog.commit(spark, _df(spark, [(1, "a"), (2, "b")]), t)
    v2 = txlog.commit(spark, _df(spark, [(3, "c")]), t)  # overwrite
    assert (v1, v2) == (1, 2)
    assert {r["id"] for r in txlog.read(spark, t).collect()} == {3}
    # time travel: version 1 is still exactly its original content
    assert {r["id"] for r in txlog.read(spark, t, version=1).collect()} == {1, 2}


def test_append_references_parent_files(spark, tmp_path):
    t = str(tmp_path / "tbl")
    txlog.commit(spark, _df(spark, [(1, "a")]), t)
    v2 = txlog.commit(spark, _df(spark, [(2, "b")]), t, op="append")
    assert {r["id"] for r in txlog.read(spark, t).collect()} == {1, 2}
    # copy-on-write: v2's manifest REFERENCES v1's files, it does not
    # rewrite them — append cost is O(new data)
    m = json.load(open(os.path.join(t, "_txlog", f"{v2:08d}.json")))
    assert any("/v00000001/" in f for f in m["files"])
    assert m["n_rows"] == 2
    h = txlog.history(t)
    assert [(e["version"], e["op"]) for e in h] == [(1, "overwrite"), (2, "append")]


def test_version_conflict_on_concurrent_commit(spark, tmp_path):
    t = str(tmp_path / "tbl")
    txlog.commit(spark, _df(spark, [(1, "a")]), t)
    # simulate a racing committer that already created version 2's manifest
    rival = os.path.join(t, "_txlog", "00000002.json")
    with open(rival, "w") as f:
        json.dump({"version": 2, "parent": 1, "op": "overwrite",
                   "files": [], "n_rows": 0}, f)
    with pytest.raises(txlog.VersionConflict):
        txlog.commit(spark, _df(spark, [(9, "z")]), t)


def test_crash_orphan_is_invisible_to_readers(spark, tmp_path):
    t = str(tmp_path / "tbl")
    txlog.commit(spark, _df(spark, [(1, "a")]), t)
    # a crash between data write and manifest create leaves only a data
    # dir: readers resolve through the pointer and never see it
    orphan = os.path.join(t, "data", "v00000002")
    os.makedirs(orphan)
    _df(spark, [(99, "junk")]).write.mode("overwrite").parquet(orphan)
    assert {r["id"] for r in txlog.read(spark, t).collect()} == {1}
    # ...and vacuum removes the orphan
    result = txlog.vacuum(t, keep_last=5)
    assert "v00000002" in result["removed_dirs"]
    assert {r["id"] for r in txlog.read(spark, t).collect()} == {1}


def test_vacuum_drops_old_versions_keeps_recent(spark, tmp_path):
    t = str(tmp_path / "tbl")
    for i in range(1, 5):
        txlog.commit(spark, _df(spark, [(i, "x")]), t)
    result = txlog.vacuum(t, keep_last=2)
    assert result["dropped_versions"] == [1, 2]
    # retained versions still read fine
    assert {r["id"] for r in txlog.read(spark, t, version=3).collect()} == {3}
    assert {r["id"] for r in txlog.read(spark, t, version=4).collect()} == {4}
    # dropped versions fail loudly, not silently-empty
    with pytest.raises(FileNotFoundError):
        txlog.read(spark, t, version=1)


def test_vacuum_keeps_files_referenced_by_retained_appends(spark, tmp_path):
    # an append chain: v3 references v1's data files, so vacuum(keep 2)
    # must NOT remove v1's data dir even though manifest 1 is dropped
    t = str(tmp_path / "tbl")
    txlog.commit(spark, _df(spark, [(1, "a")]), t)
    txlog.commit(spark, _df(spark, [(2, "b")]), t, op="append")
    txlog.commit(spark, _df(spark, [(3, "c")]), t, op="append")
    result = txlog.vacuum(t, keep_last=2)
    assert result["dropped_versions"] == [1]
    assert result["removed_dirs"] == []  # v1 data still referenced by v2/v3
    assert {r["id"] for r in txlog.read(spark, t).collect()} == {1, 2, 3}


def test_read_empty_table_fails_loudly(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        txlog.read(spark, str(tmp_path / "nope"))


def test_diff_files_reads_only_the_delta(spark, tmp_path):
    t = str(tmp_path / "tbl")
    txlog.commit(spark, _df(spark, [(1, "a"), (2, "b")]), t)
    txlog.commit(spark, _df(spark, [(3, "c")]), t, op="append")
    txlog.commit(spark, _df(spark, [(4, "d")]), t, op="append")
    # incremental contract: exactly the rows added between the versions
    assert {r["id"] for r in txlog.diff_files(spark, t, 1, 3).collect()} == {3, 4}
    assert {r["id"] for r in txlog.diff_files(spark, t, 2, 3).collect()} == {4}
    # from version 0 (empty) the delta is the whole table
    assert {r["id"] for r in txlog.diff_files(spark, t, 0, 2).collect()} == {1, 2, 3}
    # no delta -> empty frame with the table schema, not an error
    assert txlog.diff_files(spark, t, 3, 3).count() == 0
