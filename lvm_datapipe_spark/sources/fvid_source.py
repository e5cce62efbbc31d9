"""Python DataSource: video-directory probe at scan time (SURVEY.md §4
item 3 — "a Python data source for video directory → (path, duration, fps,
resolution) rows so probing happens at scan time").

Spark 4's Python DataSource API makes this a real source::

    spark.dataSource.register(FvidDataSource)
    spark.read.format("fvid").load("/corpus/dir")
    # -> path, height, width, fps, n_frames, duration_s

The scan reads ONLY the fixed-size header of each file (no payload I/O), and
files are split across input partitions so probing parallelizes across the
cluster.  Real containers (mp4/mkv) would swap the header parse for an
ffprobe call in ``_probe_file`` — same source contract.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

HEADER_BYTES = 16  # covers the FVID fixed header


class FvidDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "fvid"

    def schema(self) -> str:
        return (
            "path string, height int, width int, fps double, "
            "n_frames int, duration_s double"
        )

    def reader(self, schema) -> "FvidReader":
        return FvidReader(self.options)


class FvidReader(DataSourceReader):
    def __init__(self, options):
        self.directory = options.get("path")
        self.n_partitions = int(options.get("numPartitions", 8))
        if not self.directory:
            raise ValueError("fvid source requires a path")

    def partitions(self):
        files = sorted(
            os.path.join(self.directory, f)
            for f in os.listdir(self.directory)
            if f.endswith(".fvid")
        )
        n = max(1, min(self.n_partitions, len(files)))
        chunks = [files[i::n] for i in range(n)]
        return [InputPartition(c) for c in chunks if c]

    def read(self, partition):
        from lvm_datapipe_spark import fakevideo

        for path in partition.value:
            try:
                with open(path, "rb") as f:
                    header = f.read(HEADER_BYTES)
                info = fakevideo.probe(header)
            except Exception:  # noqa: BLE001 — unreadable file → skip
                continue
            yield (
                path,
                info["height"],
                info["width"],
                info["fps"],
                info["n_frames"],
                info["duration_s"],
            )


def register(spark) -> None:
    spark.dataSource.register(FvidDataSource)
