"""S12 — YAML-config catalog.

Reference: ``configs/meta_config.yaml:1-4`` declares ``data_root`` plus a
``META`` list of metadata shard paths; ``data_schema/macvid.py:78-93``
resolves them to a dataset.  Same contract here: the config names the shards,
the loader returns ONE DataFrame (multi-shard concat = implicit union of the
path list, S3).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from lvm_datapipe_spark.schemas import CLIP_SCHEMA
from lvm_datapipe_spark.sources.metadata import load_json_array_shards


@dataclass
class MetaConfig:
    data_root: str
    meta: list[str]

    @property
    def meta_paths(self) -> list[str]:
        return [
            p if os.path.isabs(p) else os.path.join(self.data_root, p) for p in self.meta
        ]


def load_meta_config(path: str) -> MetaConfig:
    """Parse the reference's meta_config.yaml shape (import-guarded: falls
    back to a minimal line parser if pyyaml is ever absent)."""
    try:
        import yaml

        with open(path) as f:
            raw = yaml.safe_load(f)
        return MetaConfig(data_root=raw["data_root"], meta=list(raw.get("META", [])))
    except ImportError:
        data_root, meta, in_meta = "", [], False
        with open(path) as f:
            for line in f:
                line = line.rstrip()
                if line.startswith("data_root:"):
                    data_root = line.split(":", 1)[1].strip().strip("'\"")
                    in_meta = False
                elif line.startswith("META:"):
                    in_meta = True
                elif in_meta and line.strip().startswith("- "):
                    meta.append(line.strip()[2:].strip().strip("'\""))
        return MetaConfig(data_root=data_root, meta=meta)


def load_clips(
    spark: SparkSession,
    config: MetaConfig | str,
    schema: T.StructType = CLIP_SCHEMA,
) -> DataFrame:
    """The ``macvid_path_dict`` + ``_make_dataset`` replacement
    (macvid.py:95-100,146-159): config → one clips DataFrame across all
    declared shards."""
    if isinstance(config, str):
        config = load_meta_config(config)
    return load_json_array_shards(spark, config.meta_paths, schema)
