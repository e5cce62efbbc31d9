"""WebDataset-style sharded tar export — the delivery format LVM/LLM
training loaders stream (public format: tar archives of per-sample files,
grouped by a common key prefix; see the webdataset project's spec).

Spark has no tar sink, so the writer is ``foreachPartition`` imperative IO
— the legitimate "sink edge" use of per-partition code (the same class as
the ffmpeg clip writer in operators/scenecut.py).  Scale shape:

- one tar SHARD per ``shard_size`` samples within each partition, named
  ``shard-{partition:05d}-{seq:05d}.tar`` — writers never contend on a
  file, no global coordination, and a re-run with the same partitioning
  overwrites the same shard names (idempotent);
- samples are written in the partition's row order — pre-sort/
  pre-repartition upstream to control shard composition (e.g.
  ``contiguous_ids`` then ``repartitionByRange`` for size-balanced,
  deterministic shards);
- each sample becomes ``{key}.{ext}`` members; binary columns pass
  through raw, everything else is utf-8 text or JSON.

The loader side (``read_webdataset``) exists for round-trip tests and
small-scale inspection: it lists shards on the driver and parallelizes
member extraction — tar is a stream format, so random access within a
shard is linear; production loaders stream shards whole, which is the
point of the format.
"""

from __future__ import annotations

import io
import json
import os
import tarfile


def write_webdataset(
    df,
    path: str,
    key_col: str,
    columns: dict[str, str],
    shard_size: int = 1000,
) -> None:
    """Write ``df`` as tar shards under ``path``.

    ``columns`` maps column name → member extension; extension ``json``
    serializes the value as JSON, anything else writes text/bytes raw
    (binary columns must already be ``bytes``)."""
    os.makedirs(path, exist_ok=True)
    cols = dict(columns)
    key = key_col

    def write_partition(rows):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        seq = 0
        tar = None
        n_in_shard = 0
        try:
            for row in rows:
                if tar is None:
                    name = os.path.join(
                        path, f"shard-{pid:05d}-{seq:05d}.tar"
                    )
                    tar = tarfile.open(name, "w")
                k = str(row[key])
                for col, ext in cols.items():
                    v = row[col]
                    if v is None:
                        continue
                    if ext == "json":
                        data = json.dumps(v, sort_keys=True).encode()
                    elif isinstance(v, (bytes, bytearray)):
                        data = bytes(v)
                    else:
                        data = str(v).encode()
                    info = tarfile.TarInfo(name=f"{k}.{ext}")
                    info.size = len(data)
                    info.mtime = 0  # reproducible archives
                    tar.addfile(info, io.BytesIO(data))
                n_in_shard += 1
                if n_in_shard >= shard_size:
                    tar.close()
                    tar, n_in_shard, seq = None, 0, seq + 1
        finally:
            if tar is not None:
                tar.close()

    df.foreachPartition(write_partition)


def read_webdataset(spark, path: str):
    """Round-trip reader: (shard, key, ext, content bytes) rows — one task
    per shard."""
    shards = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".tar")
    )

    def read_shard(it):
        for shard in it:
            with tarfile.open(shard, "r") as tar:
                for m in tar.getmembers():
                    stem, dot, ext = m.name.rpartition(".")
                    data = tar.extractfile(m).read()
                    yield (os.path.basename(shard), stem, ext, bytearray(data))

    rdd = spark.sparkContext.parallelize(shards, max(len(shards), 1)).mapPartitions(
        read_shard
    )
    return spark.createDataFrame(
        rdd, "shard string, key string, ext string, content binary"
    )


# ---------------------------------------------------------------------------
# First-class sink: df.write.format("webdataset") via the Spark 4 Python
# DataSource WRITER API (the read-side sibling is sources/fvid_source.py).
# ---------------------------------------------------------------------------

try:  # pyspark >= 4 only
    from dataclasses import dataclass

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceWriter,
        WriterCommitMessage,
    )

    @dataclass
    class _ShardCommit(WriterCommitMessage):
        partition_id: int
        n_rows: int
        shards: list

    class WebDatasetWriter(DataSourceWriter):
        """Per-task writer: same shard layout as :func:`write_webdataset`
        (``shard-{pid:05d}-{seq:05d}.tar``), but committed through the
        DataSourceWriter protocol — a failed task's partial shards are
        reported via abort() and never acknowledged, and commit() writes a
        ``_SUCCESS``-style manifest of acknowledged shards so readers can
        distinguish a complete export from a died-midway one (the
        coordination foreachPartition cannot give)."""

        def __init__(self, options, overwrite: bool):
            self.path = options.get("path")
            if not self.path:
                raise ValueError("path option is required")
            self.key_col = options.get("key_col", "key")
            # "col:ext,col2:ext2"
            spec = options.get("columns", "")
            self.columns = dict(
                part.split(":", 1) for part in spec.split(",") if part
            )
            if not self.columns:
                raise ValueError(
                    "columns option is required, e.g. 'txt:txt,payload:bin'"
                )
            self.shard_size = int(options.get("shard_size", "1000"))

        def write(self, rows):
            import io
            import json as _json
            import os
            import tarfile

            from pyspark import TaskContext

            os.makedirs(self.path, exist_ok=True)
            pid = TaskContext.get().partitionId()
            seq = n_in_shard = n_rows = 0
            tar = None
            shards = []
            try:
                for row in rows:
                    if tar is None:
                        name = os.path.join(
                            self.path, f"shard-{pid:05d}-{seq:05d}.tar"
                        )
                        shards.append(os.path.basename(name))
                        tar = tarfile.open(name, "w")
                    k = str(row[self.key_col])
                    for col, ext in self.columns.items():
                        v = row[col]
                        if v is None:
                            continue
                        if ext == "json":
                            data = _json.dumps(v, sort_keys=True).encode()
                        elif isinstance(v, (bytes, bytearray)):
                            data = bytes(v)
                        else:
                            data = str(v).encode()
                        info = tarfile.TarInfo(name=f"{k}.{ext}")
                        info.size = len(data)
                        info.mtime = 0
                        tar.addfile(info, io.BytesIO(data))
                    n_rows += 1
                    n_in_shard += 1
                    if n_in_shard >= self.shard_size:
                        tar.close()
                        tar, n_in_shard, seq = None, 0, seq + 1
            finally:
                if tar is not None:
                    tar.close()
            return _ShardCommit(pid, n_rows, shards)

        def commit(self, messages):
            import json as _json
            import os

            manifest = {
                "n_rows": sum(m.n_rows for m in messages),
                "shards": sorted(s for m in messages for s in m.shards),
            }
            with open(os.path.join(self.path, "_manifest.json"), "w") as f:
                _json.dump(manifest, f, sort_keys=True)

        def abort(self, messages):
            # acknowledged shards from completed tasks are left on disk but
            # NOT manifested — readers keying on _manifest.json skip them
            pass

    class WebDatasetDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "webdataset"

        def writer(self, schema, overwrite: bool) -> WebDatasetWriter:
            return WebDatasetWriter(self.options, overwrite)

except ImportError:  # pragma: no cover — pyspark<4 fallback
    WebDatasetDataSource = None  # type: ignore[assignment]


def register_webdataset(spark) -> None:
    """Register the sink: ``df.write.format("webdataset").option(...)
    .mode("append").save()``."""
    if WebDatasetDataSource is None:  # pragma: no cover
        raise RuntimeError("webdataset DataSource needs pyspark >= 4")
    spark.dataSource.register(WebDatasetDataSource)
