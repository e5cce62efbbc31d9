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
